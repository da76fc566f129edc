package graft

import graft.operators.{DedupOps, SimilarityOps}
import org.apache.spark.sql.functions._

/** Unit contracts for the Batch-9 extensions: integer power iteration
  * and longest-shared-run dedup evidence — the hand-computable
  * fixtures behind the q291–q292 corpus witnesses.
  */
class SharedRunSpec extends SparkSpec {

  import spark.implicits._

  test("longestSharedRun: copied passage yields a long diagonal run") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"intro words here $shared tail one"),
      (2L, s"$shared completely different ending text"),
      (3L, "nothing in common with the others at all")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("a_id", "b_id")
    val out = DedupOps.longestSharedRun(docs, "doc_id", "text", pairs,
      "a_id", "b_id").orderBy("a_id", "b_id").collect()
    val r12 = out(0)
    // 8 shared tokens -> 6 consecutive shared shingles -> run_tokens 8
    assert(r12.getAs[Long]("run_shingles") == 6L)
    assert(r12.getAs[Long]("run_tokens") == 8L)
    val r13 = out(1)
    assert(r13.getAs[Long]("n_shared") == 0L &&
      r13.getAs[Long]("run_tokens") == 0L)
  }

  test("longestSharedRun: scattered shared shingles do not form a run") {
    // same trigram appears at misaligned positions twice
    val docs = Seq(
      (1L, "a b c x x x a b c y y y"),
      (2L, "z z a b c w w w w a b c")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("a_id", "b_id")
    val r = DedupOps.longestSharedRun(docs, "doc_id", "text", pairs,
      "a_id", "b_id").collect()(0)
    // 'a b c' matches at 4 (pa,pb) combos on 4 different diagonals
    assert(r.getAs[Long]("n_shared") == 4L)
    assert(r.getAs[Long]("run_shingles") == 1L)
    assert(r.getAs[Long]("run_tokens") == 3L)
  }

  test("powerIterationInt recovers the dominant direction of a planted matrix") {
    // rows concentrated on dimension 2 with noise elsewhere
    val rows = (1 to 100).map { i =>
      val v = Array.fill(8)(0.001f * (i % 7))
      v(2) = if (i % 2 == 0) 0.9f else -0.9f // dominant +/- dim 2
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = SimilarityOps.powerIterationInt(df, "vec_id", "embedding",
      iters = 4, scale = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(math.abs(out(2L)) == 1000L, s"dominant dim must saturate: $out")
    (0L to 7L).filter(_ != 2L).foreach(j =>
      assert(math.abs(out(j)) < 100L, s"off dims stay small: $out"))
  }

  test("powerIterationInt is deterministic and dimension-complete") {
    val df = (1 to 50).map(i => (i.toLong,
      Seq(0.1f * (i % 3), -0.2f * (i % 5), 0.3f))).toDF("vec_id", "embedding")
    val a = SimilarityOps.powerIterationInt(df, "vec_id", "embedding", iters = 2)
      .collect().map(_.toString).toSeq
    val b = SimilarityOps.powerIterationInt(df, "vec_id", "embedding", iters = 2)
      .collect().map(_.toString).toSeq
    assert(a == b && a.length == 3)
  }
}
