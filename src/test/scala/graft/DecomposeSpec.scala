package graft

import graft.operators.{RobustStats, TimeSeries}

/** Unit contracts for percentile bands and the STL-lite seasonal
  * decomposition — the fixtures behind the q302–q303 witnesses.
  */
class DecomposeSpec extends SparkSpec {

  import spark.implicits._

  test("percentileBands: nearest-rank picks exact order statistics") {
    // group g: values 10..100 (n=10): p500 -> rank 5 -> 50; p900 -> rank 9 -> 90
    val df = (1 to 10).map(i => ("g", i.toLong * 10, i.toLong))
      .toDF("grp", "v", "id")
    val r = RobustStats.percentileBands(df, Seq("grp"), "v", "id",
      Seq(500, 900)).collect()(0)
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Long]("p500") == 50L)
    assert(r.getAs[Long]("p900") == 90L)
  }

  test("percentileBands: singleton group returns its value at every band") {
    val df = Seq(("solo", 42L, 1L)).toDF("grp", "v", "id")
    val r = RobustStats.percentileBands(df, Seq("grp"), "v", "id",
      Seq(10, 500, 1000)).collect()(0)
    assert(r.getAs[Long]("p10") == 42L)
    assert(r.getAs[Long]("p500") == 42L)
    assert(r.getAs[Long]("p1000") == 42L)
  }

  private val D = 86400L * 1000000000L

  test("seasonalDecompose: a planted weekly pattern is recovered") {
    // 8 full weeks: phase p gets 10 + (3 on phase 2) events per day.
    val ts = (0 until 56).flatMap { day =>
      val n = if (day % 7 == 2) 13 else 10
      Seq.fill(n)(day.toLong * D)
    }
    val out = TimeSeries.seasonalDecompose(ts.map(Tuple1(_)).toDF("ts"),
      "ts", 86400L, 7)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("seasonal_milli")).toMap
    // loaded phase clearly positive, others clearly negative-ish
    assert(out(2L) > 2000L, s"phase 2 seasonal: $out")
    (0L to 6L).filter(_ != 2L).foreach(p =>
      assert(out(p) < 500L, s"phase $p should sit near/below baseline: $out"))
  }

  test("seasonalDecompose: a flat series has ~zero seasonal components") {
    val ts = (0 until 28).flatMap(day => Seq.fill(5)(day.toLong * D))
    val out = TimeSeries.seasonalDecompose(ts.map(Tuple1(_)).toDF("ts"),
      "ts", 86400L, 7)
      .collect().map(_.getAs[Long]("seasonal_milli"))
    // interior trend is exactly 5000 milli; only the window edges
    // leave small artifacts
    assert(out.forall(s => math.abs(s) <= 600L), out.mkString(","))
  }
}
