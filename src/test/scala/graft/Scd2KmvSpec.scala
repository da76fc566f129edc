package graft

import graft.operators.{Sketches, TimeSeries}
import org.apache.spark.sql.functions._

/** Unit contracts for the Batch-12 extensions: SCD2 interval building
  * and KMV join-overlap estimation — the hand-computable fixtures
  * behind the q298–q299 corpus witnesses.
  */
class Scd2KmvSpec extends SparkSpec {

  import spark.implicits._

  test("scd2Intervals: collapse runs, half-open intervals, open current row") {
    val df = Seq(
      (1L, 10L, 1L, "gold"), (1L, 20L, 2L, "gold"), (1L, 30L, 3L, "silver"),
      (1L, 40L, 4L, "gold"),
      (2L, 10L, 5L, "basic")
    ).toDF("k", "ts", "id", "tier")
    val out = TimeSeries.scd2Intervals(df, "k", "ts", "id", "tier")
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "gold", 10L, 30L), (1L, "silver", 30L, 40L), (1L, "gold", 40L, -1L),
      (2L, "basic", 10L, -1L)))
  }

  test("scd2Intervals: null attribute runs are intervals; ord breaks ts ties") {
    val df = Seq(
      (1L, 10L, 1L, null), (1L, 10L, 2L, null), (1L, 10L, 3L, "x")
    ).toDF("k", "ts", "id", "a")
    val out = TimeSeries.scd2Intervals(df, "k", "ts", "id", "a")
      .orderBy("valid_from", "attr").collect()
    assert(out.length == 2)
    assert(out.exists(r => r.isNullAt(1))) // the null run survives as one row
  }

  test("scd2 composes with the as-of join: facts see the version valid at their time") {
    val dim = Seq((1L, 10L, 1L, "v1"), (1L, 30L, 2L, "v2"))
      .toDF("k", "ts", "id", "attr")
    val ivl = TimeSeries.scd2Intervals(dim, "k", "ts", "id", "attr")
    val facts = Seq((1L, 15L), (1L, 30L), (1L, 99L)).toDF("k", "ft")
    val joined = graft.operators.AsofJoin.asofJoin(
      facts, ivl.select(col("k"), col("valid_from"), col("attr")),
      Seq("k"), "ft", "valid_from", Seq("attr"), "valid_from")
    val got = joined.orderBy("ft").collect().map(_.getAs[String]("r_attr")).toSeq
    assert(got == Seq("v1", "v2", "v2"))
  }

  test("kmvOverlapEstimate: small domains are exact (sketch saw everything)") {
    val a = (1L to 50L).map(Tuple1(_)).toDF("k")
    val b = (26L to 80L).map(Tuple1(_)).toDF("k")
    val r = Sketches.kmvOverlapEstimate(a, "k", b, "k", k = 256).collect()(0)
    // union 80 < k: est_union exact, overlap exact (25 shared keys)
    assert(r.getAs[Long]("est_union") == 80L)
    assert(r.getAs[Long]("est_overlap") == 25L)
    assert(r.getAs[Long]("exact_overlap") == 25L)
  }

  test("kmvOverlapEstimate: sketched estimate lands near truth on large domains") {
    val a = (1L to 20000L).map(Tuple1(_)).toDF("k")
    val b = (10001L to 30000L).map(Tuple1(_)).toDF("k")
    val r = Sketches.kmvOverlapEstimate(a, "k", b, "k", k = 256).collect()(0)
    assert(r.getAs[Long]("exact_overlap") == 10000L)
    val est = r.getAs[Long]("est_overlap")
    // KMV with k=256: relative error ~ 1/sqrt(k) ≈ 6%; allow 4x slack
    assert(est > 4000L && est < 16000L, s"estimate off: $est")
    val eu = r.getAs[Long]("est_union")
    assert(eu > 18000L && eu < 42000L, s"union estimate off: $eu")
  }
}
