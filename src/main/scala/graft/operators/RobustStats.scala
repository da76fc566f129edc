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

  /** Cross-source score calibration: `out` = the value's
    * `percent_rank` WITHIN its `groupCol` over the total order
    * `(valueCol, idCol)` — mapping every source's score distribution
    * onto [0, 1], so a single global threshold means the same thing
    * for every source ("top 10% of web" == "top 10% of books" — raw
    * quality scores are never comparable across sources). The
    * continuous partner of the ntile bucketing in q68;
    * `(rank−1)/(n−1)` is one exact-integer division, bitwise across
    * engines.
    *
    * Scale shape: one shuffle on `groupCol` + a per-group sort —
    * the unavoidable shape of exact in-group ranking; a group too
    * large for one task's sort calibrates against
    * [[winsorize]]-style quantile grids instead (approximate,
    * constant memory). */
  def withCalibratedRank(df: DataFrame, valueCol: String, groupCol: String,
                         idCol: String, out: String = "calibrated"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(!df.columns.contains(out),
      s"withCalibratedRank reserves column name $out")
    df.withColumn(out,
      percent_rank().over(
        Window.partitionBy(col(groupCol)).orderBy(col(valueCol), col(idCol))))
  }

  /** Robust outlier flag via the median absolute deviation: marks
    * `valueCol` rows with `|x − median| > k · MAD` within their
    * `groupCol` (the classic robust z-score — unlike mean/stddev
    * gates, one huge outlier can't inflate the threshold that was
    * supposed to catch it). `k = 3` is the conventional cutoff.
    * With MAD = 0 (over half the group identical) any deviation
    * flags, the standard degenerate-case behavior.
    *
    * Scale shape: two group-bounded aggregations (median, then MAD
    * of deviations — exact `percentile` here; `exact = false` flips
    * both to GK `approx_percentile`, the 100 TB setting) each joined
    * back as a BROADCAST, so the data table itself is never
    * shuffled. */
  def madOutliers(df: DataFrame, valueCol: String, groupCol: String,
                  k: Double = 3.0, out: String = "is_outlier",
                  exact: Boolean = true): DataFrame = {
    require(k > 0, "k must be positive")
    val reserved = Set("__med", "__adev", "__mad", out)
    val collisions = df.columns.toSet.intersect(reserved)
    require(collisions.isEmpty,
      s"madOutliers reserves column names ${reserved.mkString(", ")}; " +
        s"rename the colliding input columns: ${collisions.mkString(", ")}")
    val pct = if (exact) "percentile" else "approx_percentile"
    val med = df.groupBy(col(groupCol))
      .agg(expr(s"$pct($valueCol, 0.5)").as("__med"))
    val withDev = df.join(broadcast(med), Seq(groupCol))
      .withColumn("__adev", abs(col(valueCol).cast("double") - col("__med")))
    val mad = withDev.groupBy(col(groupCol))
      .agg(expr(s"$pct(__adev, 0.5)").as("__mad"))
    withDev.join(broadcast(mad), Seq(groupCol))
      .withColumn(out, col("__adev") > lit(k) * col("__mad"))
      .drop("__med", "__adev", "__mad")
  }
}
