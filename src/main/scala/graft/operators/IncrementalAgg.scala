package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (algebraic) aggregate maintenance: apply a CDC delta
  * stream of inserts and deletes to an ALREADY-AGGREGATED table
  * without rescanning the base facts — the materialized-view
  * maintenance identity for distributive aggregates
  * (count/sum, and anything derived from them downstream).
  * At 100 TB this is the difference between an O(delta) nightly
  * refresh and an O(corpus) recompute; q280 witnesses
  * maintain(base, delta) == recompute(facts ⊖ deletes ⊕ inserts)
  * against the independent oracle.
  */
object IncrementalAgg {

  /** Maintain a per-key `(cnt, total)` aggregate under a delta of
    * `'I'` (insert) / `'D'` (delete) rows. `base` carries
    * `keyCols + (cnt, total)`; `delta` carries
    * `keyCols + (opCol, valueCol)`. Deletes must reference rows that
    * were counted (the CDC contract — this operator maintains, it
    * does not re-derive truth); a key whose count reaches zero drops
    * out, a key first seen in the delta appears. Any op value other
    * than I/D raises (loudly, not silently skewing the view).
    *
    * Scale shape: the delta aggregates FIRST (map-side combine down
    * to its key cardinality), then one key-keyed full-outer equi-join
    * against the base AGGREGATE — both sides key-cardinality-sized,
    * never fact-sized. No window, no recompute of history.
    */
  def maintainCountSum(base: DataFrame, delta: DataFrame,
                       keyCols: Seq[String], opCol: String,
                       valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val sgn = expr(
      s"CASE WHEN $opCol = 'I' THEN 1L WHEN $opCol = 'D' THEN -1L " +
        s"ELSE raise_error(concat('maintainCountSum: unknown op ', $opCol)) END")
    val d = delta
      .withColumn("__sgn", sgn)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__sgn")).cast("bigint").as("__dc"),
        sum(col("__sgn") * col(valueCol)).cast("bigint").as("__ds"))
    base.join(d, keyCols, "full_outer")
      .select(keyCols.map(col) ++ Seq(
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("__dc"), lit(0L)))
          .cast("bigint").as("cnt"),
        (coalesce(col("total"), lit(0L)) + coalesce(col("__ds"), lit(0L)))
          .cast("bigint").as("total")): _*)
      .where(col("cnt") > 0)
  }
}
