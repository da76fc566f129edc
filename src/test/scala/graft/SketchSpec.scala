package graft

import org.apache.spark.sql.functions._

/** Error-bound verification for the approximate sketch aggregates
  * witnessed (rows-only) by q45: the driver cannot oracle-check
  * implementation-defined sketches against DuckDB, so the accuracy
  * contract is pinned here instead — a broken sketch fails this suite
  * even though the correctness gate only row-counts q45.
  */
class SketchSpec extends SparkSpec {

  private lazy val lineitem = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")

  test("approx_count_distinct is within 3x the configured rsd of the exact count") {
    val rsd = 0.05
    val rows = lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), rsd).as("approx"),
        countDistinct(col("l_orderkey")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx").toDouble
      val exact = r.getAs[Long]("exact").toDouble
      val relErr = math.abs(approx - exact) / exact
      // HLL++ standard error is rsd; 3 sigma is a safe deterministic
      // bound for a fixed dataset (observed ~1.5% here).
      assert(relErr <= 3 * rsd,
        s"flag ${r.get(0)}: approx=$approx exact=$exact relErr=$relErr > ${3 * rsd}")
    }
  }

  test("approx_percentile lands within the accuracy-implied rank window") {
    val accuracy = 1000 // q45's setting: rank error <= n / accuracy
    val rows = lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        expr(s"approx_percentile(l_extendedprice, 0.5, $accuracy)").as("approx_median"),
        // Exact quantiles at 0.5 +- rank tolerance (1/accuracy, padded
        // 2x for the boundary): the approximate median must fall in
        // this window if the GK sketch honors its epsilon.
        expr("percentile(l_extendedprice, 0.498)").as("lo"),
        expr("percentile(l_extendedprice, 0.502)").as("hi"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getAs[Number]("approx_median").doubleValue()
      val lo = r.getAs[Double]("lo")
      val hi = r.getAs[Double]("hi")
      assert(m >= lo && m <= hi,
        s"flag ${r.get(0)}: approx median $m outside exact rank window [$lo, $hi]")
    }
  }

  test("hllRollup: union of per-group sketches equals a direct corpus sketch") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val out = graft.operators.Sketches.hllRollup(docs, "text", "source").collect()
    assert(out.length > 1)
    val all = out.filter(_.getAs[String]("group_value") == "__ALL__")
    assert(all.length == 1)
    out.foreach { r =>
      assert(r.getAs[Boolean]("est_in_bounds"),
        s"${r.get(0)}: estimate outside ±5% of exact ${r.get(1)}")
      assert(r.getAs[Boolean]("merged_ok"),
        s"${r.get(0)}: merged estimate drifted > tol·exact from direct")
    }
  }

  test("hllRollup is partitioning-invariant (sketch merge is commutative)") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val a = graft.operators.Sketches.hllRollup(docs, "text", "source")
      .orderBy("group_value").collect().toSeq
    val b = graft.operators.Sketches.hllRollup(docs.repartition(7), "text", "source")
      .orderBy("group_value").collect().toSeq
    assert(a == b)
  }
}
