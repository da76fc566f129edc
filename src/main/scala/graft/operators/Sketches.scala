package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable-sketch helpers over Spark's built-in sketch aggregates.
  *
  * [[countMin]] wraps `count_min_sketch` (Cormode & Muthukrishnan,
  * 2005): a `d × w` integer counter matrix supporting point
  * frequency estimates with the one-sided guarantee
  * `exact ≤ estimate ≤ exact + ε·N` (with probability 1 − δ) — the
  * complement of the Misra–Gries native aggregate (`graft_mg_topk`
  * answers "what are the heavy items", CM answers "how often does
  * THIS item occur" for items chosen after the scan).
  *
  * Scale shape: the sketch is a partial-aggregated single pass —
  * per-partition sketches merge by cell-wise integer addition
  * (commutative/associative, so estimates are partitioning-invariant,
  * spec-pinned) — and its size is `O((e/ε)·ln(1/δ))` counters,
  * independent of corpus size; only the sketch reaches the driver. */
object Sketches {

  /** One-pass count-min sketch + exact row count over `c`.
    * Returns the driver-side sketch (bounded: `ceil(e/eps) ·
    * ceil(ln(1/(1-confidence)))` longs) and N. */
  def countMin(df: DataFrame, c: String, eps: Double, confidence: Double,
               seed: Int = 42): (CountMinSketch, Long) = {
    require(eps > 0 && eps < 1, "eps must be in (0, 1)")
    require(confidence > 0 && confidence < 1, "confidence must be in (0, 1)")
    val row = df.agg(
      expr(s"count_min_sketch($c, CAST($eps AS DOUBLE), CAST($confidence AS DOUBLE), $seed)").as("s"),
      count(col(c)).as("n")).head()
    val sk = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](0)))
    (sk, row.getLong(1))
  }
}
