package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust-statistics preprocessing: per-group quantile winsorization
  * (outlier clipping) — the standard guard before computing means /
  * fitting normalizers on heavy-tailed numeric columns (token counts,
  * prices, latencies).
  *
  * Not in the reference (polario is dataset I/O only — SURVEY.md §0).
  *
  * Scale shape: the per-group quantile table is one aggregation
  * (exact `percentile` is a sort-based agg — switch to
  * `approx_percentile` at 100 TB, same plan shape) and is
  * group-cardinality-sized, so it joins back as a BROADCAST — the
  * data table is never shuffled at all.
  */
object RobustStats {

  /** Clip `valueCol` (as double) into its per-`groupCol`
    * `[lo, hi]` quantile envelope; adds the clipped value as `out`.
    * `exact = false` uses `approx_percentile` (GK sketch) for the
    * bounds — the 100 TB setting. */
  def winsorize(df: DataFrame, valueCol: String, groupCol: String,
                lo: Double, hi: Double, out: String,
                exact: Boolean = true): DataFrame = {
    require(lo >= 0 && lo < hi && hi <= 1, "need 0 <= lo < hi <= 1")
    val reserved = Set("__lo", "__hi", out)
    val collisions = df.columns.toSet.intersect(reserved)
    require(collisions.isEmpty,
      s"winsorize reserves column names ${reserved.mkString(", ")}; " +
        s"rename the colliding input columns: ${collisions.mkString(", ")}")
    val pct = if (exact) "percentile" else "approx_percentile"
    val bounds = df.groupBy(col(groupCol)).agg(
      expr(s"$pct($valueCol, $lo)").as("__lo"),
      expr(s"$pct($valueCol, $hi)").as("__hi"))
    df.join(broadcast(bounds), groupCol)
      .withColumn(out,
        least(greatest(col(valueCol).cast("double"), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }
}
