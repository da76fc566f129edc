package graft

import graft.operators.{Mixing, RobustStats}
import org.apache.spark.sql.functions._

/** Unit contracts for the Batch-6 extensions: Lorenz curve, ECDF
  * scoring, and the Herfindahl concentration index — the
  * hand-computable fixtures behind the q283–q285 corpus witnesses.
  */
class ConcentrationSpec extends SparkSpec {

  import spark.implicits._

  test("lorenzCurve: perfectly equal masses climb linearly") {
    val df = (1 to 20).map(i => (i.toLong, 5L)).toDF("e", "m")
    val out = Mixing.lorenzCurve(df, "e", "m", nBuckets = 10).collect()
    assert(out.length == 10)
    assert(out.forall(_.getAs[Long]("n_entities") == 2L))
    val shares = out.map(_.getAs[Long]("cum_share_ppm")).toSeq
    assert(shares == (1 to 10).map(_ * 100000L))
  }

  test("lorenzCurve: one whale owns the tail bucket") {
    // 9 users with mass 1, one with mass 91 -> top decile holds 91%.
    val df = ((1 to 9).map(i => (i.toLong, 1L)) :+ (10L, 91L)).toDF("e", "m")
    val out = Mixing.lorenzCurve(df, "e", "m", nBuckets = 10)
      .orderBy("bucket").collect()
    assert(out.last.getAs[Long]("mass") == 91L)
    assert(out.last.getAs[Long]("cum_share_ppm") == 1000000L)
    assert(out(8).getAs[Long]("cum_share_ppm") == 90000L) // 9/100
  }

  test("ecdfScore: min, max, between-reference, and beyond-range values") {
    val ref = Seq(10L, 20L, 20L, 30L).map(Tuple1(_)).toDF("v")
    val df = Seq((1L, 5L), (2L, 10L), (3L, 15L), (4L, 20L), (5L, 30L), (6L, 99L))
      .toDF("id", "v")
    val out = RobustStats.ecdfScore(df, ref, "v").orderBy("id")
      .collect().map(_.getAs[Long]("ecdf_ppm")).toSeq
    // N=4: P(<=5)=0, P(<=10)=1/4, P(<=15)=1/4, P(<=20)=3/4, P(<=30)=1, P(<=99)=1
    assert(out == Seq(0L, 250000L, 250000L, 750000L, 1000000L, 1000000L))
  }

  test("concentrationIndex: monopoly = 1e6, k equal subgroups = 1e6/k") {
    val df = (Seq.fill(6)(("mono", "s1")) ++
      Seq(("quad", "a"), ("quad", "b"), ("quad", "c"), ("quad", "d")))
      .toDF("g", "s")
    val out = Mixing.concentrationIndex(df, "g", "s")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("hhi_ppm")).toMap
    assert(out("mono") == 1000000L)
    assert(out("quad") == 250000L)
  }
}
