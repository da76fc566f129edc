package graft

import graft.operators.{Components, Relevance, RobustStats}
import org.apache.spark.sql.functions._

/** Unit contracts for the Batch-2 extensions: conjunctive retrieval,
  * cross-source quantile normalization, and link prediction — the
  * hand-computable fixtures behind the q271–q273 corpus witnesses.
  */
class RetrievalGraphSpec extends SparkSpec {

  import spark.implicits._

  test("conjunctiveTopK: AND semantics, tf ranking, duplicate query terms collapse") {
    val docs = Seq(
      (1L, "a b a c"), // has a,b,c; score for {a,b} = 3
      (2L, "a a a"), // missing b
      (3L, "b a"), // score 2
      (4L, "c c") // missing both
    ).toDF("id", "text")
    val out = Relevance.conjunctiveTopK(docs, "id", "text",
      Seq("a", "b", "a"), k = 10).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 3L), (3L, 2L)))
  }

  test("conjunctiveTopK: k truncates after the (score DESC, id) order") {
    val docs = Seq((1L, "x"), (2L, "x x"), (3L, "x x x")).toDF("id", "text")
    val out = Relevance.conjunctiveTopK(docs, "id", "text", Seq("x"), k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(3L, 2L))
  }

  test("quantileNormalize: two groups map onto the pooled distribution") {
    // pooled sorted values: 1,2,3,4 (ordinals 1..4), N=4.
    // group g1 = (1, 3): rs=1 -> ord 1 -> 1; rs=2 -> ord 4 -> 4.
    // group g2 = (2, 4): same ordinals -> 1 and 4.
    val df = Seq((1L, "g1", 1L), (2L, "g1", 3L), (3L, "g2", 2L), (4L, "g2", 4L))
      .toDF("id", "g", "v")
    val out = RobustStats.quantileNormalize(df, "v", "g", "id")
      .orderBy("id").collect()
    assert(out.map(_.getAs[Long]("qnorm")).toSeq == Seq(1L, 4L, 1L, 4L))
  }

  test("quantileNormalize: singleton group lands on the pooled median ordinal") {
    val df = Seq((1L, "big", 10L), (2L, "big", 20L), (3L, "big", 30L),
      (4L, "big", 40L), (5L, "solo", 999L))
      .toDF("id", "g", "v")
    val out = RobustStats.quantileNormalize(df, "v", "g", "id")
      .where(col("g") === "solo").collect()
    // N=5 -> median ordinal 1+(4 div 2)=3 -> third-smallest value (30).
    assert(out.length == 1 && out(0).getAs[Long]("qnorm") == 30L)
  }

  test("quantileNormalize preserves in-group rank order") {
    val df = (1 to 20).map(i => (i.toLong, s"g${i % 3}", (i * 7 % 13).toLong))
      .toDF("id", "g", "v")
    val out = RobustStats.quantileNormalize(df, "v", "g", "id")
      .select("g", "v", "id", "qnorm").collect()
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(r => (r.getLong(1), r.getLong(2)))
      val qs = sorted.map(_.getAs[Long]("qnorm"))
      assert(qs.zip(qs.tail).forall { case (a, b) => a <= b })
    }
  }

  test("linkPrediction: path graph scores the open wedge, skips existing edges") {
    // Path 1-2-3: only non-edge pair with a common neighbor is (1,3).
    val e = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val out = Components.linkPrediction(e, "a", "b", k = 10).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(0) == 1L && r.getLong(1) == 3L)
    assert(r.getAs[Long]("cn") == 1L)
    assert(r.getAs[Long]("du") == 1L && r.getAs[Long]("dv") == 1L)
    assert(r.getAs[Long]("jaccard_ppm") == 1000000L) // 1/(1+1-1)
  }

  test("linkPrediction: square graph — diagonals share two neighbors") {
    // Cycle 1-2-3-4-1: non-edges (1,3) and (2,4), each with cn=2,
    // jaccard = 2/(2+2-2) = 1.
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    val out = Components.linkPrediction(e, "a", "b", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("cn")))
    assert(out.toSet == Set((1L, 3L, 2L), (2L, 4L, 2L)))
  }

  test("linkPrediction: hub cap drops the hub as intermediate but keeps its degree") {
    // Star: hub 0 connected to 1..5; spokes share only the hub.
    val e = (1L to 5L).map(i => (0L, i)).toDF("a", "b")
    val capped = Components.linkPrediction(e, "a", "b", k = 100, maxDegree = 4L)
    assert(capped.count() == 0L) // hub degree 5 > 4: no wedges generated
    val full = Components.linkPrediction(e, "a", "b", k = 100)
    assert(full.count() == 10L) // C(5,2) spoke pairs
    // spoke degrees are 1 each, cn=1 -> jaccard 1/(1+1-1)=1e6
    assert(full.collect().forall(_.getAs[Long]("jaccard_ppm") == 1000000L))
  }

  test("noveltyCurve: first occurrence assigns the type, fallback shingle counts") {
    // maxid 3, 2 buckets of width 2. Bucket 0 coins 'a b c' and
    // 'b c d' (3 occurrences incl. the doc-1 repeat); bucket 1 coins
    // 'c d e' and the short-doc fallback 'x'.
    val docs = Seq((0L, "a b c d"), (1L, "a b c"), (2L, "b c d e"),
      (3L, "x")).toDF("doc_id", "text")
    val out = Relevance.noveltyCurve(docs, "doc_id", "text", nBuckets = 2)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (0L, 2L, 3L, 2L, 2L, 666666L),
      (1L, 2L, 3L, 2L, 4L, 666666L)))
  }
}
