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

  /** Two-sample Kolmogorov–Smirnov statistic between groups `ga` and
    * `gb` of `groupCol`: `D = max_v |F_a(v) − F_b(v)|` over the
    * pooled observed values — the numeric-column drift gate (is this
    * month's length/score distribution the same as last month's?)
    * complementing the token-distribution drift probe.
    *
    * Exactness: per-value ECDF steps are `cum/n` — one integer
    * division each, subtract, abs (fixed IEEE tree); the max is
    * order-insensitive. Bitwise-portable.
    *
    * Scale shape (100 TB): the pooled table reduces to one row per
    * DISTINCT value with both groups' counts (map-side combined);
    * cumulative counts over that table use the same quantile-bucket
    * decomposition as the shard planners — per-bucket totals
    * collected as driver offsets, one bucket-partitioned window —
    * never a single-partition sort. Empty groups raise (the statistic
    * is undefined, and a silent 0 would read as "no drift").
    *
    * Output: one row `(n_a, n_b, ks)`. */
  def ksStatistic(df: DataFrame, valueCol: String, groupCol: String,
                  ga: String, gb: String, buckets: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets >= 1, "buckets must be positive")
    val cnt = df
      .where(col(groupCol).isin(ga, gb) && col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("double").as("__v"))
      .agg(
        sum(when(col(groupCol) === ga, 1L).otherwise(0L)).as("__ca"),
        sum(when(col(groupCol) === gb, 1L).otherwise(0L)).as("__cb"))
    val bounds =
      if (buckets == 1) Array.empty[Double]
      else cnt.stat.approxQuantile("__v",
        (1 until buckets).map(_.toDouble / buckets).toArray, 0.001).distinct.sorted
    val bktExpr = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col("__v") > lit(b), 1).otherwise(0)
    }
    val withB = cnt.withColumn("__bkt", bktExpr)
    val sums = withB.groupBy(col("__bkt"))
      .agg(sum(col("__ca")).as("sa"), sum(col("__cb")).as("sb"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val offsets = (0 to bounds.length).scanLeft((0L, 0L)) { (acc, b) =>
      val (sa, sb) = sums.getOrElse(b, (0L, 0L))
      (acc._1 + sa, acc._2 + sb)
    }.init.zipWithIndex.map { case ((oa, ob), b) => (b, oa, ob) }
    val (na, nb) = sums.values.foldLeft((0L, 0L)) {
      case ((a, b), (sa, sb)) => (a + sa, b + sb)
    }
    require(na > 0 && nb > 0,
      s"ksStatistic: group counts must be positive (got $ga=$na, $gb=$nb)")
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toDF("__bkt", "__oa", "__ob")
    val w = Window.partitionBy(col("__bkt")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB.join(broadcast(offDf), Seq("__bkt"))
      .withColumn("__fa",
        (sum(col("__ca")).over(w) + col("__oa")).cast("double") / lit(na.toDouble))
      .withColumn("__fb",
        (sum(col("__cb")).over(w) + col("__ob")).cast("double") / lit(nb.toDouble))
      .agg(max(abs(col("__fa") - col("__fb"))).as("ks"))
      .select(lit(na).as("n_a"), lit(nb).as("n_b"), col("ks"))
  }
}
