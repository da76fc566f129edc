package graft

import graft.operators.{Funnel, TimeSeries}

/** Unit contracts for the Batch-7 extensions: ordered behavior motifs
  * and offline change-point detection — the hand-computable fixtures
  * behind the q286–q287 corpus witnesses.
  */
class MotifSpec extends SparkSpec {

  import spark.implicits._

  test("motifCounts: trigrams slide in event order; short users contribute nothing") {
    val ev = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "c"),
      (1L, 40L, 4L, "a"), // user 1: a>b>c, b>c>a
      (2L, 10L, 5L, "a"), (2L, 20L, 6L, "b"), (2L, 30L, 7L, "c"),
      (3L, 10L, 8L, "x"), (3L, 20L, 9L, "y") // too short
    ).toDF("u", "ts", "id", "e")
    val out = Funnel.motifCounts(ev, "u", "ts", "id", "e", len = 3, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a>b>c" -> 2L, "b>c>a" -> 1L))
  }

  test("motifCounts: ordering is (ts, id), not arrival order; len=2 gives bigrams") {
    val ev = Seq(
      (1L, 20L, 2L, "b"), (1L, 10L, 1L, "a"), (1L, 20L, 3L, "c")
    ).toDF("u", "ts", "id", "e") // order: a(10), b(20,id2), c(20,id3)
    val out = Funnel.motifCounts(ev, "u", "ts", "id", "e", len = 2, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a>b" -> 1L, "b>c" -> 1L))
  }

  private val G = 1000000000L

  test("bestMeanShift finds the level change, earliest split on ties") {
    // buckets 0..3 have 1 event, buckets 4..7 have 5 -> split after bucket 3.
    val ts = (0 to 3).flatMap(t => Seq.fill(1)(t.toLong * G)) ++
      (4 to 7).flatMap(t => Seq.fill(5)(t.toLong * G))
    val r = TimeSeries.bestMeanShift(ts.map(Tuple1(_)).toDF("ts"), "ts", 1L)
      .collect()(0)
    assert(r.getAs[Long]("split_bucket") == 3L)
    assert(r.getAs[Long]("n_left") == 4L && r.getAs[Long]("n_right") == 4L)
    assert(r.getAs[Long]("mean_left_micro") == 1000000L)
    assert(r.getAs[Long]("mean_right_micro") == 5000000L)
    assert(r.getAs[Long]("shift_micro") == 4000000L)
  }

  test("bestMeanShift on a flat series returns shift 0") {
    val ts = (0 to 9).map(t => t.toLong * G)
    val r = TimeSeries.bestMeanShift(ts.map(Tuple1(_)).toDF("ts"), "ts", 1L)
      .collect()(0)
    assert(r.getAs[Long]("shift_micro") == 0L)
    assert(r.getAs[Long]("split_bucket") == 0L) // earliest tie
  }
}
