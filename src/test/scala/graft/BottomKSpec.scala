package graft

import org.apache.spark.sql.functions._

/** `graft_bottom_k` — the bounded bottom-k aggregate replacing the
  * per-group rank-window sample in Mixing's survey estimators. The
  * contract under test: identical selection to
  * `row_number().over(partitionBy(g).orderBy(…)) <= k` on
  * duplicate-free keys, under ANY partitioning (partial aggregation
  * merges heaps), with k bounding every buffer. */
class BottomKSpec extends SparkSpec {
  import spark.implicits._

  graft.functions.catalyst.GraftFunctions.register(spark)

  test("bottom-k of longs equals sort-ascending-take-k, any partitioning") {
    val df = spark.range(0, 10000).selectExpr(
      "cast(pmod(hash(id), 7) as bigint) AS g",
      "cast(pmod(hash(id * 31), 100000) as bigint) AS v")
    val expected = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.take(25).toSeq).toMap
    for (parts <- Seq(1, 7, 64)) {
      val got = df.repartition(parts)
        .groupBy(col("g")).agg(expr("graft_bottom_k(v, 25)").as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("struct child: payload rides along, order is field-by-field") {
    val df = Seq((1L, "b", 10L), (1L, "a", 20L), (1L, "c", 30L),
      (2L, "z", 1L)).toDF("g", "k", "v")
    val got = df.groupBy(col("g"))
      .agg(expr("graft_bottom_k(struct(k, v), 2)").as("s"))
      .select(col("g"), expr("transform(s, x -> x.k)").as("ks"),
        expr("transform(s, x -> x.v)").as("vs"))
      .collect().map(r =>
        (r.getLong(0), r.getSeq[String](1), r.getSeq[Long](2))).toSet
    assert(got == Set((1L, Seq("a", "b"), Seq(20L, 10L)),
      (2L, Seq("z"), Seq(1L))))
  }

  test("selection matches the rank window it replaces (unique tiebreak)") {
    val df = spark.range(0, 5000).selectExpr(
      "cast(pmod(hash(id), 5) as bigint) AS g",
      "cast(pmod(hash(id * 17), 37) as bigint) AS h", // heavy hash ties
      "cast(id as string) AS k",       // unique tiebreak
      "id AS v")
    val win = df.selectExpr("g", "h", "k", "v",
      "row_number() OVER (PARTITION BY g ORDER BY h, k) AS rn")
      .where(col("rn") <= 50)
      .select(col("g"), col("k")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val agg = df.groupBy(col("g"))
      .agg(expr("graft_bottom_k(struct(h, k, v), 50)").as("s"))
      .select(col("g"), explode(expr("transform(s, x -> x.k)")).as("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(agg == win)
  }

  test("nulls are skipped; k larger than the group returns all rows sorted") {
    val df = Seq((1L, Some(3L)), (1L, None), (1L, Some(1L)))
      .toDF("g", "v")
    val got = df.groupBy(col("g"))
      .agg(expr("graft_bottom_k(v, 100)").as("s"))
      .head().getSeq[Long](1)
    assert(got == Seq(1L, 3L))
  }

  test("error contracts fail at ANALYSIS time: non-literal k, out-of-range k, unorderable child") {
    import org.apache.spark.sql.AnalysisException
    val df = Seq((1L, 2L)).toDF("g", "v")
    // an invalid k must fail the plan, not a retried executor task
    intercept[AnalysisException] {
      df.groupBy(col("g")).agg(expr("graft_bottom_k(v, g)")).queryExecution
        .executedPlan
    }
    intercept[AnalysisException] {
      df.groupBy(col("g")).agg(expr("graft_bottom_k(v, 0)")).queryExecution
        .executedPlan
    }
    intercept[AnalysisException] {
      df.selectExpr("map('a', 1) AS m", "g")
        .groupBy(col("g")).agg(expr("graft_bottom_k(m, 2)")).queryExecution
        .executedPlan
    }
  }
}
