package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Ceiling on the (distinct_a × distinct_b) cell product the
    * value-domain cross joins ([[relativeEffect]], [[hodgesLehmann]])
    * will materialize: 1e8 cells ≈ one comfortably-shuffled frame.
    * The guard converts "a float-valued metric silently detonates a
    * cross join" into a loud instruction to pre-bucket. */
  val DefaultMaxPairCells: Long = 100000000L

  /** Raise when the per-arm distinct-value cardinalities of a
    * (__arm, __v) frame would cross-multiply past `maxPairCells`.
    * Runs on the RAW arm/value projection, BEFORE the cell histogram
    * is built or checkpointed — the refusal must fire without first
    * materializing the near-row-count frame it protects against. */
  private def guardPairCells(base: DataFrame, maxPairCells: Long,
                             caller: String): Unit = {
    require(maxPairCells > 0, s"$caller: maxPairCells must be positive")
    val card = base.groupBy(col("__arm"))
      .agg(countDistinct(col("__v")).cast("bigint").as("__k")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ka = card.getOrElse(0L, 0L)
    val kb = card.getOrElse(1L, 0L)
    // overflow-safe product compare
    require(ka == 0L || kb <= maxPairCells / ka,
      s"$caller: the value domain is near-continuous — $ka × $kb " +
        s"distinct-value cells would materialize ${"≈" + (ka.toDouble * kb)}" +
        s" pairs (cap $maxPairCells). Pre-bucket the metric (e.g. " +
        "integer-divide it to a coarser unit) or raise maxPairCells")
  }

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
    val cnt = df
      .where(col(groupCol).isin(ga, gb) && col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("double").as("__v"))
      .agg(
        sum(when(col(groupCol) === ga, 1L).otherwise(0L)).as("__ca"),
        sum(when(col(groupCol) === gb, 1L).otherwise(0L)).as("__cb"))
    val (cum, totals) = Sequencing.runningTotalsBefore(
      cnt, "__v", "__v", Seq("__ca", "__cb"), buckets, "ksStatistic")
    val (na, nb) = (totals("__ca"), totals("__cb"))
    require(na > 0 && nb > 0,
      s"ksStatistic: group counts must be positive (got $ga=$na, $gb=$nb)")
    cum
      .withColumn("__fa",
        (col("__cum___ca") + col("__ca")).cast("double") / lit(na.toDouble))
      .withColumn("__fb",
        (col("__cum___cb") + col("__cb")).cast("double") / lit(nb.toDouble))
      .agg(max(abs(col("__fa") - col("__fb"))).as("ks"))
      .select(lit(na).as("n_a"), lit(nb).as("n_b"), col("ks"))
  }

  /** Per-group min-max scaling to [0, 1]: `out = (x − min)/(max −
    * min)` over the group's own range — the feature-prep normalizer
    * beside [[withCalibratedRank]]'s rank calibration (min-max keeps
    * distribution SHAPE; percent_rank flattens it). One subtraction
    * and one division on the raw values — bitwise-portable; a
    * constant group (max = min) yields NULL, stated explicitly on
    * both engines (DuckDB would give ±inf on the raw division).
    *
    * Scale shape: one group-bounded min/max aggregate broadcast back;
    * the corpus never shuffles. */
  def withMinMaxScaled(df: DataFrame, valueCol: String, groupCol: String,
                       out: String = "scaled"): DataFrame = {
    val reserved = Set("__mn", "__mx", out)
    val collisions = df.columns.toSet.intersect(reserved)
    require(collisions.isEmpty,
      s"withMinMaxScaled reserves ${reserved.mkString(", ")}; " +
        s"rename the colliding input columns: ${collisions.mkString(", ")}")
    val mm = df.groupBy(col(groupCol)).agg(
      min(col(valueCol).cast("double")).as("__mn"),
      max(col(valueCol).cast("double")).as("__mx"))
    df.join(broadcast(mm), Seq(groupCol))
      .withColumn(out,
        when(col("__mx") > col("__mn"),
          (col(valueCol).cast("double") - col("__mn")) /
            (col("__mx") - col("__mn"))))
      .drop("__mn", "__mx")
  }

  /** Exact WEIGHTED percentiles: for each rational quantile
    * `(num, den)`, the smallest value whose inclusive cumulative
    * weight reaches `num/den` of the total — e.g. with token-count
    * weights over document length, "the length below which half of
    * all TOKEN mass lives", the corpus-planning stat a row-median
    * misrepresents when long docs carry most of the tokens.
    *
    * Exactness: the threshold test is the cross-multiplied integer
    * comparison `cum·den ≥ num·total` (DECIMAL(38,0) — no float
    * quantile math at all); the result is a VALUE from the data,
    * bitwise by construction.
    *
    * Scale shape: weights pre-aggregated per distinct value (map-side
    * combined), cumulative sums via the shared quantile-bucket
    * decomposition ([[Sequencing.runningTotalsBefore]] — no global
    * sort), then one tiny filtered min-aggregate per requested
    * quantile over the checkpointed cum table. Null values are
    * excluded; null/negative weights and an all-zero total raise.
    *
    * Output: one row per quantile `(p_num, p_den, value)`, input
    * order. */
  def weightedPercentiles(df: DataFrame, valueCol: String,
                          weightCol: String, quantiles: Seq[(Int, Int)],
                          buckets: Int = 32): DataFrame = {
    require(quantiles.nonEmpty, "quantiles must be non-empty")
    quantiles.foreach { case (n, d) =>
      require(d > 0 && n > 0 && n <= d, s"quantile $n/$d not in (0, 1]")
    }
    val vw = df
      .where(col(valueCol).isNotNull)
      .withColumn("__w1", expr(
        s"CASE WHEN $weightCol IS NULL OR $weightCol < 0 " +
          s"THEN raise_error('weightedPercentiles: null/negative $weightCol') " +
          s"ELSE CAST($weightCol AS BIGINT) END"))
      .groupBy(col(valueCol).cast("double").as("__v"))
      .agg(sum(col("__w1")).as("__w"))
    val (cumRaw, totals) = Sequencing.runningTotalsBefore(
      vw, "__v", "__v", Seq("__w"), buckets, "weightedPercentiles")
    val total = totals("__w")
    require(total > 0, "weightedPercentiles: total weight must be positive")
    val cum = cumRaw.localCheckpoint() // reused once per quantile
    quantiles.zipWithIndex.map { case ((n, d), i) =>
      cum
        .where((col("__cum___w") + col("__w")).cast("decimal(38,0)") * lit(d.toLong)
          >= lit(n.toLong).cast("decimal(38,0)") * lit(total))
        .agg(min(col("__v")).as("value"))
        .select(lit(i).as("__qi"), lit(n).as("p_num"), lit(d).as("p_den"),
          col("value"))
    }.reduce(_.union(_)).orderBy("__qi").drop("__qi")
  }

  /** Kendall rank agreement between two integer-quantized scores per
    * group — do two quality scorers ORDER the corpus the same way?
    * (The scorer-drift QA that Pearson on raw scores misses.) Exact
    * joint-frequency-cell formulation: reduce the corpus to cells
    * `(group, x, y, n)`, then enumerate each unordered cell pair
    * once in `(x, y)`-lexicographic canonical order and bin it —
    * concordant (`x` and `y` agree on direction), discordant
    * (opposite), tied-in-x / tied-in-y (one side equal), plus the
    * within-cell both-tied pairs `n(n−1)/2`. All BIGINT;
    * `tau_a_ppm = sign(C−D) · (10⁶·|C−D| div n(n−1)/2)` — sign
    * OUTSIDE the divide (engines disagree on negative integer
    * division; q201 precedent). NULL when a group has <2 rows.
    *
    * Scale shape (100 TB): the corpus collapses MAP-SIDE to the
    * distinct-cell frame (one groupBy); the pair enumeration is a
    * group-keyed self-join of cells — quadratic in CELLS per group,
    * never in rows. The operator is built for QUANTIZED scores
    * (permille/deciles — this library's convention); pre-bucket a
    * continuous score before calling, or the cell frame is the data.
    * Output: group cols + `(n, concordant, discordant, tie_x, tie_y,
    * tie_xy, tau_a_ppm)`. */
  def kendallTau(df: DataFrame, xCol: String, yCol: String,
                 groupCols: Seq[String]): DataFrame = {
    val reserved = Set("n", "concordant", "discordant", "tie_x", "tie_y",
      "tie_xy", "tau_a_ppm")
    require(df.columns.toSet.intersect(reserved).isEmpty,
      s"kendallTau reserves ${reserved.mkString(", ")}")
    val g = if (groupCols.nonEmpty) groupCols else Seq("__g")
    val base = (if (groupCols.nonEmpty) df else df.withColumn("__g", lit(1)))
      .withColumn("__x", expr(
        s"CASE WHEN $xCol IS NULL THEN " +
          s"raise_error('kendallTau: null $xCol has no rank') ELSE $xCol END"))
      .withColumn("__y", expr(
        s"CASE WHEN $yCol IS NULL THEN " +
          s"raise_error('kendallTau: null $yCol has no rank') ELSE $yCol END"))
    val cells = base.groupBy((g.map(col) :+ col("__x")) :+ col("__y"): _*)
      .agg(count(lit(1)).cast("bigint").as("__n"))
    val a = cells.select(g.map(col) ++
      Seq(col("__x").as("__x1"), col("__y").as("__y1"), col("__n").as("__n1")): _*)
    val b = cells.select(g.map(col) ++
      Seq(col("__x").as("__x2"), col("__y").as("__y2"), col("__n").as("__n2")): _*)
    // canonical order: every unordered distinct-cell pair exactly once
    val pairs = a.join(b, g)
      .where(col("__x1") < col("__x2") ||
        (col("__x1") === col("__x2") && col("__y1") < col("__y2")))
    val prod = col("__n1") * col("__n2")
    val pairAgg = pairs.groupBy(g.map(col): _*).agg(
      sum(when(col("__x1") < col("__x2") && col("__y1") < col("__y2"), prod)
        .otherwise(0L)).as("concordant"),
      sum(when(col("__x1") < col("__x2") && col("__y1") > col("__y2"), prod)
        .otherwise(0L)).as("discordant"),
      sum(when(col("__x1") === col("__x2"), prod).otherwise(0L)).as("tie_x"),
      sum(when(col("__y1") === col("__y2") && col("__x1") < col("__x2"), prod)
        .otherwise(0L)).as("tie_y"))
    val cellAgg = cells.groupBy(g.map(col): _*).agg(
      sum(col("__n")).cast("bigint").as("n"),
      sum(expr("__n * (__n - 1L) div 2L")).cast("bigint").as("tie_xy"))
    val out = cellAgg.join(pairAgg, g, "left")
      .na.fill(0L, Seq("concordant", "discordant", "tie_x", "tie_y"))
      // |C−D| reaches n(n−1)/2, so the 10⁶-scaled numerator (and the
      // pair-count denominator) ride on DECIMAL(38,0) — int64 would
      // wrap past ~4.3M rows per group
      .withColumn("tau_a_ppm", expr(
        "CASE WHEN n < 2 THEN NULL ELSE " +
          "CAST(sign(concordant - discordant) AS BIGINT) * " +
          "((cast(1000000 as decimal(38,0)) * abs(concordant - discordant)) " +
          "div (cast(n as decimal(38,0)) * (n - 1L) div 2L)) END"))
    (if (groupCols.isEmpty) out.drop("__g") else out)
      .select((groupCols.map(col) ++ Seq(col("n"), col("concordant"),
        col("discordant"), col("tie_x"), col("tie_y"), col("tie_xy"),
        col("tau_a_ppm"))): _*)
  }

  /** Nonparametric two-sample EFFECT SIZES — the numbers to report
    * next to a Mann–Whitney p-value: the relative effect
    * `p̂ = P(X < Y) + ½·P(X = Y)` (Brunner–Munzel's estimand;
    * 500000 ppm = stochastically equal) and Cliff's delta
    * `δ = P(X < Y) − P(X > Y)` (0 = no dominance). Both are exact
    * floored ppm ratios of integer pair counts computed on per-arm
    * VALUE CELLS — `p̂` via `(10⁶·(2·gt + eq)) div (2·n₁·n₂)`, δ
    * sign-split. One row: `(n_a, n_b, p_hat_ppm, cliffs_delta_ppm)`;
    * an empty arm yields NULLs.
    *
    * Scale shape (100 TB): rows collapse to per-arm value histograms;
    * the pair sums run on the (distinct_a × distinct_b) cell frame —
    * value-cardinality-bounded, never row-quadratic. That bound is
    * only a bound while the value domain is discrete: a
    * near-continuous metric (epoch nanos, unrounded scores) makes
    * distinct_a·distinct_b row-quadratic again, so the cell cross
    * join is guarded at `maxPairCells` — above it, raise and tell
    * the caller to pre-bucket (integer-divide) the metric. */
  def relativeEffect(df: DataFrame, armBCond: org.apache.spark.sql.Column,
                     valueCol: String,
                     maxPairCells: Long = DefaultMaxPairCells): DataFrame = {
    // NULL metric rows are dropped up front (the [[distributionDrift]]
    // convention): counted in n_a/n_b but unable to score a pair,
    // they would bias p-hat/delta toward zero
    val base = df.select(when(armBCond, 1L).otherwise(0L).as("__arm"),
      col(valueCol).cast("bigint").as("__v"))
      .where(col("__v").isNotNull)
    guardPairCells(base, maxPairCells, "relativeEffect")
    val cells = base.groupBy(col("__arm"), col("__v"))
      .agg(count(lit(1)).cast("bigint").as("__n"))
      .localCheckpoint()
    val a = cells.where(col("__arm") === 0L)
      .select(col("__v").as("__va"), col("__n").as("__na"))
    val b = cells.where(col("__arm") === 1L)
      .select(col("__v").as("__vb"), col("__n").as("__nb"))
    // pair counts ride on DECIMAL(38,0): gt/lt/eq reach n_a·n_b, and
    // the 10⁶-scaled ppm numerators below reach 10⁶·n_a·n_b — int64
    // would wrap once n_a·n_b > ~4.6e12 (arms of ~2M rows)
    val pairs = a.crossJoin(b).agg(
      sum(when(col("__vb") > col("__va"), expr("__na * __nb"))
        .otherwise(0L).cast("decimal(38,0)")).as("__gt"),
      sum(when(col("__vb") < col("__va"), expr("__na * __nb"))
        .otherwise(0L).cast("decimal(38,0)")).as("__lt"),
      sum(when(col("__vb") === col("__va"), expr("__na * __nb"))
        .otherwise(0L).cast("decimal(38,0)")).as("__eq"))
    val na = base.where(col("__arm") === 0L)
      .agg(count(lit(1)).cast("bigint").as("__qa"))
    val nb = base.where(col("__arm") === 1L)
      .agg(count(lit(1)).cast("bigint").as("__qb"))
    pairs.crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .select(col("__qa").as("n_a"), col("__qb").as("n_b"),
        expr("""CASE WHEN __qa = 0 OR __qb = 0 THEN NULL
               |ELSE (cast(1000000 as decimal(38,0))
               |    * (2L * coalesce(__gt, cast(0 as decimal(38,0)))
               |       + coalesce(__eq, cast(0 as decimal(38,0)))))
               |  div (cast(2 as decimal(38,0)) * __qa * __qb) END""".stripMargin)
          .cast("bigint").as("p_hat_ppm"),
        expr("""CASE WHEN __qa = 0 OR __qb = 0 THEN NULL
               |WHEN coalesce(__gt, cast(0 as decimal(38,0)))
               |    >= coalesce(__lt, cast(0 as decimal(38,0)))
               |  THEN (cast(1000000 as decimal(38,0))
               |      * (coalesce(__gt, cast(0 as decimal(38,0)))
               |         - coalesce(__lt, cast(0 as decimal(38,0)))))
               |    div (cast(__qa as decimal(38,0)) * __qb)
               |ELSE -((cast(1000000 as decimal(38,0))
               |      * (coalesce(__lt, cast(0 as decimal(38,0)))
               |         - coalesce(__gt, cast(0 as decimal(38,0)))))
               |  div (cast(__qa as decimal(38,0)) * __qb)) END""".stripMargin)
          .cast("bigint").as("cliffs_delta_ppm"))
  }

  /** Two-sample DISTRIBUTION-DRIFT distances over integer values —
    * the "did this source's length/score distribution move between
    * snapshots?" metrics, both EXACT:
    *  - `w1_x_ppm` — 1-D Wasserstein-1 (earth-mover) distance in
    *    VALUE UNITS × ppm: `W1 = Σᵢ |F_A(vᵢ)−F_B(vᵢ)|·(vᵢ₊₁−vᵢ)`
    *    over the sorted support, computed as the single floored div
    *    `(10⁶·Σ|c_A·n_b − c_B·n_a|·gap) div (n_a·n_b)`. Ordered —
    *    a +1 shift of every value costs exactly 10⁶, unlike TV;
    *  - `tv_ppm` — total variation `½Σ|p_A−p_B|` as
    *    `(10⁶·Σ|h_A·n_b − h_B·n_a|) div (2·n_a·n_b)` (the ordering-
    *    blind companion; the value-distribution complement of
    *    [[TextOps.tokenDrift]]'s vocabulary TV).
    * One row: `(n_a, n_b, n_values, w1_x_ppm, tv_ppm)`; an empty arm
    * yields NULL distances. Cross products ride on DECIMAL(38,0)
    * (c·n reaches n_a·n_b and the 10⁶ scaling would wrap int64 past
    * ~2M-row arms — the round-8 relativeEffect lesson).
    *
    * Scale shape (100 TB): rows collapse to one histogram on the
    * value cells; the cumulative window runs ON THE HISTOGRAM
    * (distinct-value bounded, the [[ansariBradley]] convention),
    * then one scalar aggregate. Rows never sort globally. */
  def distributionDrift(df: DataFrame, armBCond: org.apache.spark.sql.Column,
                        valueCol: String): DataFrame = {
    val base = df.select(when(armBCond, 1L).otherwise(0L).as("__arm"),
        col(valueCol).cast("bigint").as("__v"))
      .where(col("__v").isNotNull)
    val cells = base.groupBy(col("__v")).agg(
      sum(when(col("__arm") === 0L, 1L).otherwise(0L)).cast("bigint").as("__ha"),
      sum(when(col("__arm") === 1L, 1L).otherwise(0L)).cast("bigint").as("__hb"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wl = Window.orderBy(col("__v"))
    val steps = cells
      .withColumn("__ca", sum(col("__ha")).over(w))
      .withColumn("__cb", sum(col("__hb")).over(w))
      .withColumn("__gap", lead(col("__v"), 1).over(wl) - col("__v"))
    val tot = cells.agg(sum(col("__ha")).cast("bigint").as("__na"),
      sum(col("__hb")).cast("bigint").as("__nb"))
    steps.crossJoin(broadcast(tot))
      .agg(max(col("__na")).as("__na"), max(col("__nb")).as("__nb"),
        count(lit(1)).cast("bigint").as("n_values"),
        sum(expr("abs(cast(__ca as decimal(38,0)) * __nb " +
          "- cast(__cb as decimal(38,0)) * __na) * coalesce(__gap, 0L)"))
          .as("__w1n"),
        sum(expr("abs(cast(__ha as decimal(38,0)) * __nb " +
          "- cast(__hb as decimal(38,0)) * __na)")).as("__tvn"))
      .select(col("__na").as("n_a"), col("__nb").as("n_b"), col("n_values"),
        expr("""CASE WHEN __na = 0 OR __nb = 0 THEN NULL
               |ELSE (cast(1000000 as decimal(38,0)) * __w1n)
               |  div (cast(__na as decimal(38,0)) * __nb) END""".stripMargin)
          .cast("bigint").as("w1_x_ppm"),
        expr("""CASE WHEN __na = 0 OR __nb = 0 THEN NULL
               |ELSE (cast(1000000 as decimal(38,0)) * __tvn)
               |  div (cast(2 as decimal(38,0)) * __na * __nb) END""".stripMargin)
          .cast("bigint").as("tv_ppm"))
  }

  /** Ansari–Bradley two-sample SCALE test — "do the two arms have
    * the same spread around a common center?" (the dispersion
    * complement of the Mann–Whitney location test): pooled positions
    * score `min(i, N+1−i)` from both ends, so extreme values score
    * low and a wider-spread arm collects a SMALLER sum. Tie groups
    * get the exact midscore via closed-form arithmetic-series sums
    * over their position range; each tied value contributes
    * `(10⁶·a_v·S_v) div t_v` — one floor per distinct value
    * (documented ppm quantization), everything else exact. z uses
    * the standard no-tie null moments (even/odd N branches; heavy
    * ties make it conservative):
    * `z_ppm = sign(d)·isqrt((d_ppm²·varDen) div varNum)` with the
    * variance `varNum/varDen` in exact integers on DECIMAL(38,0).
    * One row: `(n_a, n_b, w_ppm, mean_ppm, z_ppm)`; a degenerate
    * pool (var ≤ 0) yields NULL z.
    *
    * Scale shape (100 TB): one value-histogram aggregation with a
    * cumulative window ON THE HISTOGRAM (distinct-value-bounded),
    * then scalar algebra. Rows never sort globally. */
  def ansariBradley(df: DataFrame, armBCond: org.apache.spark.sql.Column,
                    valueCol: String): DataFrame = {
    val base = df.select(when(armBCond, 1L).otherwise(0L).as("__arm"),
      col(valueCol).cast("bigint").as("__v"))
      // NULL values carry no rank information; filtering here keeps
      // the pooled row set identical to [[wilcoxonRankSum]]'s so
      // compositions like [[lepage]] score both ends over ONE pool
      .where(col("__v").isNotNull)
    val wv = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val hist = base.groupBy(col("__v"))
      .agg(count(lit(1)).cast("bigint").as("__t"),
        sum(col("__arm")).cast("bigint").as("__a"))
      .withColumn("__before", coalesce(sum(col("__t")).over(wv), lit(0L)))
    val tot = hist.agg(sum(col("__t")).cast("bigint").as("__N"),
      sum(col("__a")).cast("bigint").as("__n2x"))
    // S_v = Σ_{i=lo..hi} min(i, N+1−i): ascending half up to
    // h = (N+1) div 2 scores i, the mirror half scores N+1−i —
    // two arithmetic series, split at h
    val sSum =
      """(CASE WHEN least(__hi, __h) >= __lo
        |  THEN ((__lo + least(__hi, __h)) * (least(__hi, __h) - __lo + 1L)) div 2L
        |  ELSE 0L END) +
        |(CASE WHEN __hi >= greatest(__lo, __h + 1L)
        |  THEN (((__N + 1L - greatest(__lo, __h + 1L)) + (__N + 1L - __hi))
        |        * (__hi - greatest(__lo, __h + 1L) + 1L)) div 2L
        |  ELSE 0L END)""".stripMargin
    val contrib = hist.crossJoin(broadcast(tot))
      // pooled-scale budget guard: W and the mean reach ~10⁶·N²/4 and
      // z² needs d²·varDen ≈ 10¹²·N⁴/16 inside DECIMAL(38,0) — exact
      // through N ≈ 4M pooled rows; beyond that raise loudly (pre-
      // aggregate or subsample arms first), never wrap
      .withColumn("__N", expr(
        "CASE WHEN __N < 4000000 THEN __N ELSE raise_error(" +
          "'ansariBradley: > 4M pooled rows — the exact ppm budget " +
          "(10^12 * N^4 in DECIMAL(38,0)) is exhausted; subsample arms') END"))
      .withColumn("__lo", expr("__before + 1L"))
      .withColumn("__hi", expr("__before + __t"))
      .withColumn("__h", expr("(__N + 1L) div 2L"))
      .withColumn("__S", expr(sSum))
      // per-cell 10⁶·a·S reaches ~10⁶·t²·N — DECIMAL(38,0), since a
      // hot tie cell would wrap int64 long before the N guard trips
      .agg(max(col("__N")).as("__N"), max(col("__n2x")).as("__nb"),
        sum(expr("(cast(1000000 as decimal(38,0)) * __a * __S) div __t"))
          .cast("bigint").as("__W"))
      .withColumn("__na", expr("__N - __nb"))
    contrib
      .withColumn("__mean", expr(
        """CASE WHEN __N % 2L = 0L
          |  THEN (cast(1000000 as decimal(38,0)) * __nb * (__N + 2L)) div 4L
          |  ELSE (cast(1000000 as decimal(38,0)) * __nb * (__N + 1L)
          |        * (__N + 1L)) div (4L * __N)
          |END""".stripMargin))
      .withColumn("__varNum", expr(
        """CASE WHEN __N % 2L = 0L
          |  THEN cast(__na as decimal(38,0)) * __nb * (__N + 2L) * (__N - 2L)
          |  ELSE cast(__na as decimal(38,0)) * __nb * (__N + 1L)
          |       * (3L + __N * __N)
          |END""".stripMargin))
      .withColumn("__varDen", expr(
        """CASE WHEN __N % 2L = 0L THEN 48L * (__N - 1L)
          |ELSE 48L * __N * __N END""".stripMargin))
      .withColumn("__d", expr("__W - __mean"))
      .withColumn("__q", expr(
        """CASE WHEN __varNum > 0 THEN
          |  (cast(__d as decimal(38,0)) * __d * __varDen) div __varNum
          |ELSE cast(0 as decimal(38,0)) END""".stripMargin))
      .transform(graft.util.ExactMath.withIsqrt(_, "__q", "__z"))
      .select(col("__na").cast("bigint").as("n_a"),
        col("__nb").cast("bigint").as("n_b"),
        col("__W").as("w_ppm"), col("__mean").cast("bigint").as("mean_ppm"),
        expr("CASE WHEN __varNum <= 0 THEN NULL " +
          "WHEN __d >= 0 THEN cast(__z as bigint) " +
          "ELSE -cast(__z as bigint) END").cast("bigint").as("z_ppm"))
  }

  /** Goodman–Kruskal gamma and Somers' D on top of [[kendallTau]]'s
    * exact pair counts — the ordinal-association pair every eval
    * dashboard wants next to τ: `gamma = (C−D)/(C+D)` ignores all
    * ties (how aligned are the pairs that actually order?), and
    * `somers_d_yx = (C−D)/(C+D+T_y)` penalizes ties on the DEPENDENT
    * y (the asymmetric "does x predict y's order?"). Both emitted as
    * sign-split floored ppm; degenerate groups (no orderable pairs)
    * yield NULL. Output: the [[kendallTau]] columns plus
    * `gamma_ppm`, `somers_d_ppm`.
    *
    * Scale shape: identical to [[kendallTau]] — pair sums on the
    * (group × value-cell) frame, never row-quadratic. */
  def ordinalAssociation(df: DataFrame, xCol: String, yCol: String,
                         groupCols: Seq[String]): DataFrame = {
    def sdiv(num: String, den: String) =
      s"CASE WHEN ($num) >= 0 THEN ($num) div ($den) " +
        s"ELSE -((-($num)) div ($den)) END"
    // C−D reaches n(n−1)/2 pairs, so the 10⁶-scaled numerators ride on
    // DECIMAL(38,0) — int64 would wrap past ~4.3M rows per group
    kendallTau(df, xCol, yCol, groupCols)
      .withColumn("gamma_ppm", expr(
        "CASE WHEN concordant + discordant <= 0 THEN NULL ELSE " +
          sdiv("cast(1000000 as decimal(38,0)) * (concordant - discordant)",
            "concordant + discordant") + " END").cast("bigint"))
      .withColumn("somers_d_ppm", expr(
        "CASE WHEN concordant + discordant + tie_y <= 0 THEN NULL ELSE " +
          sdiv("cast(1000000 as decimal(38,0)) * (concordant - discordant)",
            "concordant + discordant + tie_y") + " END").cast("bigint"))
      // tau-b: tie-corrected on BOTH margins — the geometric-mean
      // denominator pinned by the exact isqrt on DECIMAL products.
      // kendallTau's pair enumeration excludes both-tied pairs
      // entirely (same-cell pairs never join), so tie_x = x-tied-
      // y-different and tie_y = y-tied-x-different — exactly the
      // textbook legs: (n0−n_xtied) = C+D+tie_y and (n0−n_ytied) =
      // C+D+tie_x.
      .withColumn("__tb_q", expr(
        "cast(concordant + discordant + tie_y as decimal(38,0)) * " +
          "(concordant + discordant + tie_x)"))
      .transform(graft.util.ExactMath.withIsqrt(_, "__tb_q", "__tb_rt"))
      .withColumn("tau_b_ppm", expr(
        "CASE WHEN __tb_rt <= 0 THEN NULL ELSE " +
          "CASE WHEN concordant - discordant >= 0 " +
          "THEN cast((1000000 * cast(concordant - discordant as decimal(38,0))) div __tb_rt as bigint) " +
          "ELSE -cast((1000000 * cast(discordant - concordant as decimal(38,0))) div __tb_rt as bigint) END " +
          "END").cast("bigint"))
      .drop("__tb_q", "__tb_rt", "__tb_rt__s0", "__tb_rt__s1", "__tb_rt__s2",
        "__tb_rt__s3")
  }

  /** Grouped nearest-rank percentile bands: for each group, the exact
    * order statistics at the requested quantiles (nearest-rank
    * `ceil(q·n)` — integer-exact, no interpolation to disagree on),
    * one output row per group with one column per band
    * (`p50`, `p90`, …). The reporting staple ("weekly p50/p90
    * latency") built on in-group ranking.
    *
    * Scale shape: ONE shuffle on the group key; the rank window and
    * the per-group count share its sort; the band pick is a
    * conditional aggregation (no second pass, no percentile UDAF).
    * Group histories must be entity-bounded (the sessionize
    * contract); unbounded groups go through
    * [[Profile.equidepthHistogram]]-style decompositions instead. */
  def percentileBands(df: DataFrame, groupCols: Seq[String],
                      valueCol: String, idCol: String,
                      quantilesPermille: Seq[Int]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(quantilesPermille.nonEmpty &&
      quantilesPermille.forall(q => q >= 1 && q <= 1000),
      "quantiles are permille values in [1, 1000]")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(valueCol), col(idCol))
    val wg = Window.partitionBy(groupCols.map(col): _*)
    val ranked = df
      .withColumn("__r", row_number().over(w).cast("bigint"))
      .withColumn("__n", count(lit(1)).over(wg).cast("bigint"))
    val bands = quantilesPermille.map { q =>
      // nearest-rank: ceil(q/1000 · n) = (q·n + 999) div 1000
      max(when(col("__r") === expr(s"greatest(1L, ($q * __n + 999L) div 1000L)"),
        col(valueCol))).as(s"p$q")
    }
    val aggs = count(lit(1)).cast("bigint").as("n") +: bands
    ranked.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** ECDF scoring against a reference distribution: each row of `df`
    * gets `out` = the empirical-CDF position of its `valueCol` within
    * `ref`'s values, as `ecdf_ppm = (1e6 · #{ref ≤ x}) div N` —
    * "where would this new document sit in the reference corpus's
    * length/quality distribution?", the drift-scoring primitive for
    * admission gates (flag a batch whose median lands in the
    * reference's tail).
    *
    * Scale shape: the reference collapses to DISTINCT-value counts
    * with a cumulative sum — a value-DOMAIN-sized frame (integer
    * scores; for unbounded continuous values, quantize to a grid
    * first, the usual ECDF-sketch move), whose tiny window is
    * dimension-bounded like [[Mixing.groupGini]]'s rank; scoring is
    * then one broadcast-friendly equi-join on the value. Rows with a
    * value below every reference value score 0; above, 1e6.
    */
  def ecdfScore(df: DataFrame, ref: DataFrame, valueCol: String,
                out: String = "ecdf_ppm"): DataFrame = {
    val reserved = Set("__v", "__c", "__cum", "__N", out)
    val collisions = df.columns.toSet.intersect(reserved)
    require(collisions.isEmpty,
      s"ecdfScore reserves column names ${reserved.mkString(", ")}; " +
        s"rename the colliding input columns: ${collisions.mkString(", ")}")
    val counts = ref.groupBy(col(valueCol).cast("bigint").as("__v"))
      .agg(count(lit(1)).cast("bigint").as("__c"))
    // values seen in df but absent from ref enter the CDF with count
    // 0, so the cumulative carry-forward lands them between their
    // reference neighbors (a plain equi-join would miss them).
    val unseen = df.select(col(valueCol).cast("bigint").as("__v")).distinct()
      .join(counts.select(col("__v")), Seq("__v"), "left_anti")
      .withColumn("__c", lit(0L))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cdf = counts.unionByName(unseen)
      .withColumn("__cum", sum(col("__c")).over(w))
      .select(col("__v"), col("__cum"))
    val tot = ref.agg(count(lit(1)).cast("bigint").as("__N"))
    df.join(cdf, col(valueCol).cast("bigint") === col("__v"), "left")
      .crossJoin(broadcast(tot))
      .withColumn(out, expr("(1000000L * coalesce(__cum, 0L)) div __N"))
      .drop("__v", "__cum", "__N")
  }

  /** Quantile normalization of an integer score across heterogeneous
    * groups: each row's value is replaced by the POOLED value at the
    * matching quantile position — row ranked `rs` of `ns` within its
    * group maps to pooled ordinal `1 + ((rs−1)(N−1)) div (ns−1)`
    * (endpoints map to pooled min/max; a singleton group maps to the
    * pooled median ordinal). After normalization every group has
    * samples drawn from the SAME (the pooled) distribution — the
    * genomics-standard quantile normalization, here for making
    * per-source quality scores comparable before a single global
    * threshold (the exact-integer big sibling of
    * [[withCalibratedRank]]'s [0,1] percent-rank).
    *
    * Determinism: ranks order by `(valueCol, idCol)` — total order,
    * engine-invariant; the ordinal arithmetic is integer floor
    * division.
    *
    * Scale shape: the pooled ordinal side rides
    * [[Sequencing.withGlobalOrdinals]] (quantile-bucket decomposition
    * — no single-reducer global window); the in-group rank is
    * TWO-PHASE the same way — global value-quantile buckets are
    * monotone in the sort key, so rank(g) = per-(g, bucket) rank +
    * the (g, bucket) prefix offset, and no task ever sorts a whole
    * group (a ~10-source group column would otherwise ride ~10% of
    * the corpus through one reducer); the mapping join is an
    * equi-join on the ordinal, both sides corpus-sized — the
    * unavoidable shape of an exact rank-to-rank mapping.
    *
    * Contract: `valueCol` must be NUMERIC (the bucket bounds come
    * from `approxQuantile`, which only accepts numeric columns) —
    * enforced with a loud require. Note the bounds pass runs EAGERLY
    * at DataFrame-construction time: one extra scan of `df` even if
    * the returned frame is never executed (the bucket boundaries
    * must be literals for the decomposition to stay monotone).
    */
  def quantileNormalize(df: DataFrame, valueCol: String, groupCol: String,
                        idCol: String, out: String = "qnorm"): DataFrame = {
    val reserved = Set("__rs", "__ns", "__N", "__tord", "ordinal", out,
      "__vbkt", "__gc", "__goff", "__ogrp", "__obkt")
    val collisions = df.columns.toSet.intersect(reserved)
    require(collisions.isEmpty,
      s"quantileNormalize reserves column names ${reserved.mkString(", ")}; " +
        s"rename the colliding input columns: ${collisions.mkString(", ")}")
    require(df.schema(valueCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"quantileNormalize requires a numeric $valueCol (bucket bounds " +
        s"come from approxQuantile); got ${df.schema(valueCol).dataType.sql}")
    val pooled = graft.operators.Sequencing.withGlobalOrdinals(
      df.select(col(valueCol), col(idCol)), valueCol, idCol)
      .select(col("ordinal").as("__tord"), col(valueCol).as(out))
    val tot = df.agg(count(lit(1)).cast("bigint").as("__N"))
    // global value buckets (same decomposition contract as
    // withGlobalOrdinals: monotone non-decreasing in value, ties
    // share a bucket) — (bucket, value, id) IS the (value, id) order
    val vBounds = df.stat.approxQuantile(valueCol,
      (1 until 32).map(_.toDouble / 32).toArray, 0.001).distinct.sorted
    val bktExpr = vBounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(valueCol) > lit(b), 1).otherwise(0)
    }
    val withB = df.withColumn("__vbkt", bktExpr)
    // per-(group, bucket) counts → exclusive prefix offsets + group
    // totals: a groups×buckets frame, window-sorted by bucket only
    val offs = withB.groupBy(col(groupCol), col("__vbkt"))
      .agg(count(lit(1)).as("__gc"))
      .withColumn("__goff",
        sum(col("__gc")).over(Window.partitionBy(col(groupCol))
          .orderBy(col("__vbkt"))) - col("__gc"))
      .withColumn("__ns",
        sum(col("__gc")).over(Window.partitionBy(col(groupCol)))
          .cast("bigint"))
      .select(col(groupCol).as("__ogrp"), col("__vbkt").as("__obkt"),
        col("__goff"), col("__ns"))
    val wg = Window.partitionBy(col(groupCol), col("__vbkt"))
      .orderBy(col(valueCol), col(idCol))
    // NULL-SAFE group join: a NULL group was a normal window partition
    // before the decomposition and must keep its rows
    withB.join(offs,
        col(groupCol) <=> col("__ogrp") && col("__vbkt") <=> col("__obkt"))
      .withColumn("__rs",
        (row_number().over(wg).cast("bigint") + col("__goff"))
          .cast("bigint"))
      .crossJoin(broadcast(tot))
      .withColumn("__tord", expr(
        "CASE WHEN __ns > 1 THEN 1L + ((__rs - 1L) * (__N - 1L)) div (__ns - 1L) " +
          "ELSE 1L + (__N - 1L) div 2L END"))
      .join(pooled, Seq("__tord"))
      .drop("__rs", "__ns", "__N", "__tord", "__vbkt", "__goff",
        "__ogrp", "__obkt")
  }

  /** 2-D Pareto skyline (maximize both axes): the distinct `(x, y)`
    * points not dominated by any other point (`x' ≥ x, y' ≥ y`, one
    * strict) — the quality-vs-length frontier of a corpus, the
    * cost-vs-accuracy frontier of an eval sweep. Classic sort-based
    * skyline: reduce to the per-x maximum y, then a point survives
    * iff its y strictly exceeds every y at strictly larger x — a
    * running max in descending-x order.
    *
    * Scale shape (100 TB): the corpus collapses FIRST to one row per
    * distinct x (map-side-combined groupBy); the running max over
    * that frame uses the same quantile-bucket decomposition as
    * [[graft.operators.Sequencing.withGlobalOrdinals]] — per-bucket
    * maxes to the driver (bucket-count-sized), suffix maxes broadcast
    * back, one bucket-partitioned window. No global single-reducer
    * window, no self-join. */
  def skyline2D(df: DataFrame, xCol: String, yCol: String,
                buckets: Int = 32): DataFrame = {
    require(buckets >= 1, "buckets must be positive")
    val perX = df
      .select(col(xCol).cast("bigint").as("x"), col(yCol).cast("bigint").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
      .groupBy(col("x")).agg(max(col("y")).as("y"))
    val bounds =
      if (buckets == 1) Array.empty[Double]
      else perX.stat.approxQuantile("x",
        (1 until buckets).map(_.toDouble / buckets).toArray, 0.001)
        .distinct.sorted
    val bktExpr = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col("x") > lit(b), 1).otherwise(0)
    }
    val withB = perX.withColumn("__bkt", bktExpr)
    val maxes = withB.groupBy(col("__bkt")).agg(max(col("y")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // suffix max over STRICTLY HIGHER buckets (higher bucket = larger x)
    val ids = 0 to bounds.length
    val suffix = ids.map { b =>
      val above = ids.filter(_ > b).flatMap(maxes.get)
      (b, if (above.isEmpty) null else java.lang.Long.valueOf(above.max))
    }
    val spark = df.sparkSession
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(suffix.toSeq.map {
        case (b, m) => org.apache.spark.sql.Row(b, m)
      }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__bkt",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("__suf",
          org.apache.spark.sql.types.LongType, nullable = true))))
    val w = Window.partitionBy(col("__bkt")).orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    withB.join(broadcast(offDf), Seq("__bkt"))
      .withColumn("__rm", greatest(max(col("y")).over(w), col("__suf")))
      .where(col("__rm").isNull || col("y") > col("__rm"))
      .select(col("x"), col("y"))
      .orderBy(col("x"))
  }

  /** Theil–Sen robust trend per entity: the MEDIAN of all pairwise
    * slopes `(y_j − y_i) / (x_j − x_i)` over an entity's
    * (bucket, value) series — the classic 29%-breakdown-point slope
    * estimator, immune to the outlier days that wreck per-group OLS
    * ([[graft.operators.Profile]]'s least-squares trend). Slopes are
    * emitted in ppm via sign-split truncated division (both engines
    * truncate toward zero only on non-negative operands — graft
    * division discipline), and the median is nearest-rank
    * (`ceil(n/2)`-th smallest), so every output is integer-exact.
    * Entities need ≥ 2 distinct buckets; others are dropped.
    *
    * Scale shape (100 TB): one (entity, bucket) pre-aggregation
    * collapses raw volume to at most `span` points per entity BEFORE
    * the pairwise stage, so the self-join is entity-keyed and its
    * fan-out is bounded by the CALENDAR (span² pairs, e.g. 30 days →
    * ≤ 435 pairs/entity) — independent of event volume. Both the
    * pair join and the median window shuffle once on entity id.
    * Entities scale out; no cross-entity traffic. */
  def theilSenSlope(df: DataFrame, entityCol: String, bucketCol: String,
                    valueCol: String): DataFrame = {
    val pts = df
      .select(col(entityCol).as("entity"), col(bucketCol).cast("bigint").as("__x"),
        col(valueCol).cast("bigint").as("__y"))
      .groupBy(col("entity"), col("__x")).agg(sum(col("__y")).as("__y"))
    val a = pts.select(col("entity"), col("__x").as("__x1"), col("__y").as("__y1"))
    val b = pts.select(col("entity"), col("__x").as("__x2"), col("__y").as("__y2"))
    val pairs = a.join(b, Seq("entity")).where(col("__x1") < col("__x2"))
      .withColumn("__slope_ppm", expr(
        """CASE WHEN __y2 >= __y1
          |  THEN ((__y2 - __y1) * 1000000L) div (__x2 - __x1)
          |  ELSE -(((__y1 - __y2) * 1000000L) div (__x2 - __x1)) END""".stripMargin))
    val w = Window.partitionBy(col("entity")).orderBy(col("__slope_ppm"))
    pairs
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("entity"))))
      .where(col("__rn") === expr("(__n + 1L) div 2L"))
      .select(col("entity"), col("__n").cast("bigint").as("n_pairs"),
        col("__slope_ppm").cast("bigint").as("sen_slope_ppm"))
  }

  /** Spearman rank correlation between two integer columns — Pearson
    * on midranks, the outlier-robust "do these two per-entity metrics
    * move together?" answer. Ranks are the DOUBLED midranks
    * `u = 2·cnt_less + cnt_eq + 1` (ties exact, the
    * [[graft.operators.EvalStats.friedmanRanks]] convention — the
    * factor 2 cancels in r), assigned via each column's VALUE
    * HISTOGRAM so no global per-row window exists; `rho_ppm` =
    * sign-split `(10⁶·num) div isqrt(vx·vy)` with num/vx/vy the exact
    * integer moment combinations and the [[graft.util.ExactMath]]
    * isqrt pinning the root — NULL when either column is constant.
    * One row: `(n, rho_ppm)`.
    *
    * Scale shape (100 TB): two value-histogram aggregations (bounded
    * by distinct values) with cumulative windows ON THE HISTOGRAM,
    * broadcast-joined back to rows; then one global moment
    * aggregation. Nothing row-level ever sorts globally. */
  def spearmanRho(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val base = df.select(col(xCol).cast("bigint").as("__x"),
      col(yCol).cast("bigint").as("__y"))
    def rankMap(c: String, out: String) = {
      val w = Window.orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, -1)
      base.groupBy(col(c).as("__v"))
        .agg(count(lit(1)).cast("bigint").as("__cnt"))
        .withColumn("__less", coalesce(sum(col("__cnt")).over(w), lit(0L)))
        .select(col("__v").as(c), expr("2L * __less + __cnt + 1L").as(out))
    }
    val ranked = base
      .join(broadcast(rankMap("__x", "__u")), Seq("__x"))
      .join(broadcast(rankMap("__y", "__w")), Seq("__y"))
    ranked.agg(
        count(lit(1)).cast("bigint").as("__n"),
        sum(col("__u")).cast("bigint").as("__su"),
        sum(col("__w")).cast("bigint").as("__sw"),
        sum(expr("__u * __u")).cast("bigint").as("__suu"),
        sum(expr("__w * __w")).cast("bigint").as("__sww"),
        sum(expr("__u * __w")).cast("bigint").as("__suw"))
      .withColumn("__num", expr(
        "cast(__n as decimal(38,0)) * __suw - cast(__su as decimal(38,0)) * __sw"))
      .withColumn("__vx", expr(
        "cast(__n as decimal(38,0)) * __suu - cast(__su as decimal(38,0)) * __su"))
      .withColumn("__vy", expr(
        "cast(__n as decimal(38,0)) * __sww - cast(__sw as decimal(38,0)) * __sw"))
      .withColumn("__p", expr("__vx * __vy"))
      .transform(graft.util.ExactMath.withIsqrt(_, "__p", "__rt"))
      .select(col("__n").as("n"),
        expr("CASE WHEN __vx <= 0 OR __vy <= 0 THEN NULL " +
          "WHEN __num >= 0 THEN cast((1000000 * __num) div __rt as bigint) " +
          "ELSE -cast((1000000 * -__num) div __rt as bigint) END")
          .cast("bigint").as("rho_ppm"))
  }

  /** Hodges–Lehmann shift estimate between two arms — the robust
    * EFFECT SIZE companion to the Mann–Whitney test: the weighted
    * lower median of all pairwise differences `b − a` (arm B minus
    * arm A), computed on (value, count) CELLS so the quadratic pair
    * space never materializes per row. The estimate is an exact
    * integer in the value's own units (lower median = smallest
    * difference whose cumulative pair weight reaches `(W+1) div 2`).
    * One row: `(n_a, n_b, n_pairs, hl_shift)`.
    *
    * Scale shape (100 TB): rows collapse to per-arm value histograms;
    * the difference frame is (distinct_a × distinct_b) — bounded by
    * value cardinality squared, not row count — and one global-window
    * cumulative on that bounded frame picks the median. The
    * [[relativeEffect]] cardinality guard applies: a near-continuous
    * metric re-inflates the cell product to row-quadratic, so above
    * `maxPairCells` raise and ask for pre-bucketing. */
  def hodgesLehmann(df: DataFrame, armBCond: org.apache.spark.sql.Column,
                    valueCol: String,
                    maxPairCells: Long = DefaultMaxPairCells): DataFrame = {
    // NULL metric rows dropped up front — a NULL difference cell would
    // ride the cumulative window NULLS FIRST and shift the median pick
    val base = df.select(when(armBCond, 1L).otherwise(0L).as("__arm"),
      col(valueCol).cast("bigint").as("__v"))
      .where(col("__v").isNotNull)
    guardPairCells(base, maxPairCells, "hodgesLehmann")
    val cells = base.groupBy(col("__arm"), col("__v"))
      .agg(count(lit(1)).cast("bigint").as("__n"))
      .localCheckpoint()
    val a = cells.where(col("__arm") === 0L)
      .select(col("__v").as("__va"), col("__n").as("__na"))
    val b = cells.where(col("__arm") === 1L)
      .select(col("__v").as("__vb"), col("__n").as("__nb"))
    val diffs = a.crossJoin(b)
      .groupBy((col("__vb") - col("__va")).as("__d"))
      .agg(sum(expr("__na * __nb")).cast("bigint").as("__w"))
    val w = Window.orderBy(col("__d"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = diffs.agg(sum(col("__w")).cast("bigint").as("__tw"))
    val na = base.where(col("__arm") === 0L)
      .agg(count(lit(1)).cast("bigint").as("__qa"))
    val nb = base.where(col("__arm") === 1L)
      .agg(count(lit(1)).cast("bigint").as("__qb"))
    diffs
      .withColumn("__cum", sum(col("__w")).over(w))
      .crossJoin(broadcast(tot))
      .where(col("__cum") >= expr("(__tw + 1L) div 2L"))
      .orderBy(col("__d"))
      .limit(1)
      .crossJoin(broadcast(na))
      .crossJoin(broadcast(nb))
      .select(col("__qa").as("n_a"), col("__qb").as("n_b"),
        col("__tw").as("n_pairs"), col("__d").cast("bigint").as("hl_shift"))
  }

  /** Kruskal–Wallis k-group rank test — "do these groups draw from
    * the same distribution?" (the unordered complement of
    * [[jonckheereTerpstra]]): global DOUBLED midranks assigned from
    * the value histogram, per-group rank sums, and
    * `H = 3·Σ_j R2_j²/n_j / (N(N+1)) − 3(N+1)` in ppm (one floored
    * DECIMAL division per group term), plus the tie-adjusted
    * `h_adj_ppm = h_ppm·(N³−N) div ((N³−N) − Σ(t³−t))` — every input
    * exact integers; an all-ties frame (adjustment denominator 0)
    * yields NULL. One row: `(n_total, k, h_ppm, h_adj_ppm)`. H is
    * non-negative up to the per-group floors (which can push a
    * near-zero H one ppm negative — sign-split divs keep engines
    * identical there).
    *
    * Scale shape (100 TB): one value-histogram aggregation with a
    * cumulative window ON THE HISTOGRAM (bounded by distinct
    * values), broadcast back; per-group sums map-side-combine. */
  def kruskalWallis(df: DataFrame, groupCol: String,
                    valueCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("__g"),
      col(valueCol).cast("bigint").as("__v"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val hist = base.groupBy(col("__v"))
      .agg(count(lit(1)).cast("bigint").as("__cnt"))
      .withColumn("__less", coalesce(sum(col("__cnt")).over(w), lit(0L)))
      .withColumn("__u", expr("2L * __less + __cnt + 1L"))
      .localCheckpoint()
    val ranked = base.join(broadcast(hist.select(col("__v"), col("__u"))),
      Seq("__v"))
    val perGroup = ranked.groupBy(col("__g"))
      .agg(count(lit(1)).cast("bigint").as("__nj"),
        sum(col("__u")).cast("bigint").as("__R2"))
    val tot = perGroup.agg(sum(col("__nj")).cast("bigint").as("__N"),
      count(lit(1)).cast("bigint").as("__k"))
    val ties = hist.agg(
      coalesce(sum(expr("__cnt * __cnt * __cnt - __cnt")), lit(0L))
        .cast("bigint").as("__tsum"))
    def sdiv(num: String, den: String) =
      s"CASE WHEN ($num) >= 0 THEN cast(($num) div ($den) as bigint) " +
        s"ELSE -cast((-($num)) div ($den) as bigint) END"
    perGroup.crossJoin(broadcast(tot))
      .withColumn("__term", expr(
        "cast((3000000 * cast(__R2 as decimal(38,0)) * __R2) div " +
          "(cast(__nj as decimal(38,0)) * __N * (__N + 1)) as bigint)"))
      .agg(max(col("__N")).as("__N"), max(col("__k")).as("__k"),
        sum(col("__term")).cast("bigint").as("__hraw"))
      .crossJoin(broadcast(ties))
      .withColumn("__h", expr("__hraw - 3000000L * (__N + 1L)"))
      .withColumn("__cden", expr("(__N * __N * __N - __N) - __tsum"))
      .select(col("__N").cast("bigint").as("n_total"),
        col("__k").cast("bigint").as("k"),
        col("__h").cast("bigint").as("h_ppm"),
        expr("CASE WHEN __cden <= 0 THEN NULL ELSE " +
          sdiv("cast(__h as decimal(38,0)) * (__N * cast(__N as decimal(38,0)) * __N - __N)",
            "cast(__cden as decimal(38,0))") + " END")
          .cast("bigint").as("h_adj_ppm"))
  }

  /** Page's L trend test — the ORDERED-treatment refinement of
    * [[graft.operators.EvalStats.friedmanRanks]]: within each block,
    * doubled midranks; `L2 = Σ_j (j+1)·R2_j` with `j` the 0-based
    * treatment ORDER (the alternative "values increase along the
    * given treatment order"); null mean `mean2 = n·k·(k+1)²/2` and
    * `z_ppm = sign(d)·isqrt((36·10¹²·d²) div (n·k²·(k+1)·(k²−1)))`,
    * `d = L2 − mean2` — exact integers throughout (ties make the
    * no-tie variance conservative, documented). Blocks must carry
    * all k treatments (loud raise otherwise). One row:
    * `(n_blocks, k, l_x2, mean_x2, z_ppm)`.
    *
    * Scale shape (100 TB): one window partitioned by block (k rows
    * each), one treatment-cardinality aggregation. */
  def pageTrend(df: DataFrame, blockCol: String, orderCol: String,
                valueCol: String): DataFrame = {
    val base = df.select(col(blockCol).as("__b"),
      col(orderCol).cast("bigint").as("__j"),
      col(valueCol).cast("bigint").as("__v"))
    val wB = Window.partitionBy(col("__b"))
    val ranked = base
      .withColumn("__r2",
        expr("2L").multiply(coalesce(count(lit(1)).over(
          wB.orderBy(col("__v")).rangeBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
          .plus(count(lit(1)).over(
            wB.orderBy(col("__v")).rangeBetween(0, 0)))
          .plus(lit(1L)))
    val perTreatment = ranked.groupBy(col("__j"))
      .agg(sum(col("__r2")).cast("bigint").as("__R2"),
        count(lit(1)).cast("bigint").as("__nb"))
    val k = perTreatment.agg(count(lit(1)).as("__k"),
      max(col("__nb")).as("__nmax"), min(col("__nb")).as("__nmin"))
    perTreatment.crossJoin(broadcast(k))
      .withColumn("__nmin", expr(
        "CASE WHEN __nmin = __nmax THEN __nmin ELSE raise_error(" +
          "'pageTrend: blocks are incomplete — build the full " +
          "block x treatment grid first') END"))
      .agg(max(col("__nmin")).cast("bigint").as("__n"),
        max(col("__k")).cast("bigint").as("__k"),
        sum(expr("(__j + 1L) * __R2")).cast("bigint").as("__L2"))
      .withColumn("__mean2", expr("(__n * __k * (__k + 1L) * (__k + 1L)) div 2L"))
      .withColumn("__d", expr("__L2 - __mean2"))
      .withColumn("__den", expr(
        "__n * __k * __k * (__k + 1L) * (__k * __k - 1L)"))
      .withColumn("__q", expr(
        "CASE WHEN __den > 0 THEN (cast(36000000000000 as decimal(38,0)) " +
          "* __d * __d) div __den ELSE cast(0 as decimal(38,0)) END"))
      .transform(graft.util.ExactMath.withIsqrt(_, "__q", "__z"))
      .select(col("__n").as("n_blocks"), col("__k").as("k"),
        col("__L2").as("l_x2"), col("__mean2").as("mean_x2"),
        expr("CASE WHEN __den <= 0 THEN NULL " +
          "WHEN __d >= 0 THEN cast(__z as bigint) " +
          "ELSE -cast(__z as bigint) END").cast("bigint").as("z_ppm"))
  }

  /** Jonckheere–Terpstra ordered-alternative test — "does the value
    * distribution shift UP as we walk the groups in their given
    * order?" (k ordered buckets vs Kruskal-type unordered): J = the
    * sum over ordered group pairs of Mann–Whitney counts, carried
    * DOUBLED (`j_x2 = 2·gt + eq`, ties exact); the null mean doubles
    * to `Σ_{a<b} n_a·n_b` and z uses the no-tie variance
    * `var_x72 = N²(2N+3) − Σ nᵢ²(2nᵢ+3)` (the standard form; heavy
    * ties make it conservative — documented, not hidden).
    * `z_ppm = sign(d) · isqrt((18·10¹²·d²) div var_x72)` with
    * `d = j_x2 − mean_x2` — one floored div, one exact isqrt. One
    * row: `(n_total, j_x2, mean_x2, var_x72, z_ppm)`.
    *
    * Scale shape (100 TB): rows collapse to (group, value) cells
    * first; the pair sums run on the cell frame (bounded by distinct
    * values × groups), never on rows. */
  def jonckheereTerpstra(df: DataFrame, groupCol: String,
                         valueCol: String): DataFrame = {
    val cells = df.select(col(groupCol).cast("bigint").as("__g"),
        col(valueCol).cast("bigint").as("__v"))
      .groupBy(col("__g"), col("__v"))
      .agg(count(lit(1)).cast("bigint").as("__n"))
      .localCheckpoint()
    val pairStats = cells.as("a").join(cells.as("b"),
        col("a.__g") < col("b.__g"))
      .agg(
        sum(expr("CASE WHEN b.__v > a.__v THEN a.__n * b.__n ELSE 0L END"))
          .cast("bigint").as("__gt"),
        sum(expr("CASE WHEN b.__v = a.__v THEN a.__n * b.__n ELSE 0L END"))
          .cast("bigint").as("__eq"),
        sum(expr("a.__n * b.__n")).cast("bigint").as("__mean2"))
    val sizes = cells.groupBy(col("__g"))
      .agg(sum(col("__n")).cast("bigint").as("__ni"))
      .agg(sum(col("__ni")).cast("bigint").as("__N"),
        sum(expr("__ni * __ni * (2L * __ni + 3L)")).cast("bigint").as("__corr"))
    pairStats.crossJoin(broadcast(sizes))
      .withColumn("__j2", expr("2L * __gt + __eq"))
      .withColumn("__var72", expr("__N * __N * (2L * __N + 3L) - __corr"))
      .withColumn("__d", expr("__j2 - __mean2"))
      .withColumn("__q", expr(
        "CASE WHEN __var72 > 0 THEN (cast(18000000000000 as decimal(38,0)) " +
          "* __d * __d) div __var72 ELSE cast(0 as decimal(38,0)) END"))
      .transform(graft.util.ExactMath.withIsqrt(_, "__q", "__z"))
      .select(col("__N").as("n_total"), col("__j2").as("j_x2"),
        col("__mean2").as("mean_x2"), col("__var72").as("var_x72"),
        expr("CASE WHEN __var72 <= 0 THEN NULL " +
          "WHEN __d >= 0 THEN cast(__z as bigint) " +
          "ELSE -cast(__z as bigint) END").cast("bigint").as("z_ppm"))
  }

  /** Wald–Wolfowitz runs test per key over a bucketed series — "are
    * the day-over-day ups and downs RANDOM, or does the stream
    * trend/oscillate?": signs of successive differences (ties
    * dropped, the standard treatment), `R` = number of maximal
    * same-sign runs, and the continuity-free z in ppm:
    * `z_ppm = sign(d) · isqrt((10¹²·d²·(N−1)) div
    * (2·n₁·n₂·(2·n₁·n₂ − N)))` with `d = R·N − N − 2·n₁·n₂`,
    * `N = n₁+n₂` — every value exact; degenerate streams
    * (`2·n₁·n₂ ≤ N`) yield NULL. One row per key:
    * `(key, n_up, n_down, n_runs, z_ppm)`.
    *
    * Scale shape (100 TB): one lag window per key on the horizon-
    * bounded bucket frame, then a keyed aggregation — keys scale
    * out, nothing global. */
  def runsTest(df: DataFrame, keyCol: String, bucketCol: String,
               valueCol: String): DataFrame = {
    val w = Window.partitionBy(col("__k")).orderBy(col("__b"))
    val signs = df.select(col(keyCol).as("__k"),
        col(bucketCol).cast("bigint").as("__b"),
        col(valueCol).cast("bigint").as("__y"))
      .withColumn("__prev", lag(col("__y"), 1).over(w))
      .where(col("__prev").isNotNull && col("__y") =!= col("__prev"))
      .withColumn("__s", when(col("__y") > col("__prev"), 1L).otherwise(-1L))
    val wr = Window.partitionBy(col("__k")).orderBy(col("__b"))
    val runs = signs
      .withColumn("__sprev", lag(col("__s"), 1).over(wr))
      .withColumn("__start",
        when(col("__sprev").isNull || col("__s") =!= col("__sprev"), 1L)
          .otherwise(0L))
      .groupBy(col("__k"))
      .agg(
        sum(when(col("__s") === 1L, 1L).otherwise(0L)).cast("bigint").as("__n1"),
        sum(when(col("__s") === -1L, 1L).otherwise(0L)).cast("bigint").as("__n2"),
        sum(col("__start")).cast("bigint").as("__r"))
    runs
      .withColumn("__N", expr("__n1 + __n2"))
      .withColumn("__den", expr("2L * __n1 * __n2 * (2L * __n1 * __n2 - __N)"))
      .withColumn("__d", expr("__r * __N - __N - 2L * __n1 * __n2"))
      .withColumn("__q", expr(
        "CASE WHEN __den > 0 AND __N > 1 THEN " +
          "(cast(1000000000000 as decimal(38,0)) * __d * __d * (__N - 1L)) " +
          "div __den ELSE cast(0 as decimal(38,0)) END"))
      .transform(graft.util.ExactMath.withIsqrt(_, "__q", "__z"))
      .select(col("__k").as("key"), col("__n1").as("n_up"),
        col("__n2").as("n_down"), col("__r").as("n_runs"),
        expr("CASE WHEN __den <= 0 OR __N <= 1 THEN NULL " +
          "WHEN __d >= 0 THEN cast(__z as bigint) " +
          "ELSE -cast(__z as bigint) END").cast("bigint").as("z_ppm"))
  }

  /** Mann–Kendall monotonic-trend test per key over a bucketed
    * series — "is this source's daily volume drifting, without
    * assuming linearity?": `S = Σ_{i<j} sign(y_j − y_i)` over
    * time-ordered buckets plus the tie-corrected variance and the
    * continuity-corrected z, all exact integers:
    * `var_x18 = n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5)` (18× the
    * variance) and `z_ppm` = sign-split
    * `(18·10⁶·(|S|−1)) div isqrt(18·var_x18)` (zero when |S| ≤ 1,
    * NULL when the series is constant). One row per key:
    * `(key, n_buckets, s_stat, var_x18, z_ppm)`.
    *
    * Scale shape (100 TB): buckets are horizon-bounded, so the
    * within-key pair join is bounded² per key and keys scale out;
    * the tie histogram is a per-(key, value) aggregation. Subject-
    * level data collapses to the bucket histogram first. */
  def mannKendall(df: DataFrame, keyCol: String, bucketCol: String,
                  valueCol: String): DataFrame = {
    val c = df.select(col(keyCol).as("__k"), col(bucketCol).cast("bigint").as("__b"),
        col(valueCol).cast("bigint").as("__y"))
      .groupBy(col("__k"), col("__b"))
      .agg(sum(col("__y")).cast("bigint").as("__y"))
      .localCheckpoint()
    val s = c.as("x").join(c.as("y"),
        col("x.__k") === col("y.__k") && col("x.__b") < col("y.__b"))
      .groupBy(col("x.__k").as("__k"))
      .agg(sum(expr("CASE WHEN y.__y > x.__y THEN 1 " +
        "WHEN y.__y < x.__y THEN -1 ELSE 0 END")).cast("bigint").as("__s"))
    val nk = c.groupBy(col("__k"))
      .agg(count(lit(1)).cast("bigint").as("__n"))
    val ties = c.groupBy(col("__k"), col("__y"))
      .agg(count(lit(1)).cast("bigint").as("__t"))
      .groupBy(col("__k"))
      .agg(sum(expr("__t * (__t - 1L) * (2L * __t + 5L)")).cast("bigint")
        .as("__tc"))
    s.join(nk, Seq("__k")).join(ties, Seq("__k"))
      .withColumn("__var18", expr(
        "__n * (__n - 1L) * (2L * __n + 5L) - __tc"))
      .withColumn("__p", expr("cast(18L * __var18 as decimal(38,0))"))
      .transform(graft.util.ExactMath.withIsqrt(_, "__p", "__rt"))
      .select(col("__k").as("key"), col("__n").as("n_buckets"),
        col("__s").as("s_stat"), col("__var18").cast("bigint").as("var_x18"),
        expr("CASE WHEN __var18 <= 0 THEN NULL " +
          "WHEN __s > 1 THEN cast((18000000 * cast(__s - 1L as decimal(38,0))) div __rt as bigint) " +
          "WHEN __s < -1 THEN -cast((18000000 * cast(-__s - 1L as decimal(38,0))) div __rt as bigint) " +
          "ELSE 0L END").cast("bigint").as("z_ppm"))
  }

  /** Two-sample Cramér–von Mises drift statistic — the SQUARED-ECDF
    * companion of [[distributionDrift]]'s W1/TV pair: `T = (n_a·n_b
    * / N²) · Σ_pooled (F_A(z)−F_B(z))²`, sensitive to distribution
    * differences everywhere on the support (where KS sees only the
    * max gap and TV ignores ordering). Tie-aware via value cells:
    * the pooled sum weights each cell by `h_a+h_b`.
    *
    * Quantization contract (documented, mirrored verbatim in the
    * oracle): per cell `d_ppm = (10⁶·|c_A·n_b − c_B·n_a|) div
    * (n_a·n_b)`, then `t_x_ppm = (n_a·n_b·(Σ(h_a+h_b)·d_ppm² div N))
    * div (10⁶·N)` — three floors total, each ≤ 1 ulp, so the result
    * sits within a few ppm of the real-valued T at ANY corpus size:
    * unlike a single-floor rendering (which would need a ~4M-row
    * guard, the [[ansariBradley]] budget), every intermediate stays
    * inside DECIMAL(38,0) for arms up to 10⁹ rows. `t_mean_x_ppm`
    * carries the null expectation `(N+1)/(6N)` for calibration.
    * One row: `(n_a, n_b, n_values, t_x_ppm, t_mean_x_ppm)`; an
    * empty arm yields NULL statistics.
    *
    * Scale shape (100 TB): identical to [[distributionDrift]] — one
    * histogram aggregation, a cumulative window ON THE HISTOGRAM
    * (distinct-value bounded), one scalar aggregate. Rows never
    * sort globally. */
  def cramerVonMises(df: DataFrame, armBCond: org.apache.spark.sql.Column,
                     valueCol: String): DataFrame = {
    val base = df.select(when(armBCond, 1L).otherwise(0L).as("__arm"),
        col(valueCol).cast("bigint").as("__v"))
      .where(col("__v").isNotNull)
    val cells = base.groupBy(col("__v")).agg(
      sum(when(col("__arm") === 0L, 1L).otherwise(0L)).cast("bigint").as("__ha"),
      sum(when(col("__arm") === 1L, 1L).otherwise(0L)).cast("bigint").as("__hb"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val steps = cells
      .withColumn("__ca", sum(col("__ha")).over(w))
      .withColumn("__cb", sum(col("__hb")).over(w))
    val tot = cells.agg(sum(col("__ha")).cast("bigint").as("__na"),
      sum(col("__hb")).cast("bigint").as("__nb"))
    steps.crossJoin(broadcast(tot))
      .withColumn("__dppm", expr(
        """CASE WHEN __na = 0 OR __nb = 0 THEN 0L
          |ELSE (cast(1000000 as decimal(38,0))
          |  * abs(cast(__ca as decimal(38,0)) * __nb
          |        - cast(__cb as decimal(38,0)) * __na))
          |  div (cast(__na as decimal(38,0)) * __nb) END""".stripMargin))
      .agg(max(col("__na")).as("__na"), max(col("__nb")).as("__nb"),
        count(lit(1)).cast("bigint").as("n_values"),
        sum(expr("(cast(__ha as decimal(38,0)) + __hb) * __dppm * __dppm"))
          .as("__num"))
      .select(col("__na").as("n_a"), col("__nb").as("n_b"), col("n_values"),
        expr("""CASE WHEN __na = 0 OR __nb = 0 THEN NULL
               |ELSE (cast(__na as decimal(38,0)) * __nb
               |    * (__num div cast(__na + __nb as decimal(38,0))))
               |  div (cast(1000000 as decimal(38,0)) * (__na + __nb)) END"""
          .stripMargin).cast("bigint").as("t_x_ppm"),
        expr("""CASE WHEN __na = 0 OR __nb = 0 THEN NULL
               |ELSE (cast(1000000 as decimal(38,0)) * (__na + __nb + 1L))
               |  div (cast(6 as decimal(38,0)) * (__na + __nb)) END"""
          .stripMargin).cast("bigint").as("t_mean_x_ppm"))
  }

  /** Two-sample Anderson–Darling drift statistic — the TAIL-weighted
    * member of the drift family ([[distributionDrift]] W1/TV,
    * [[cramerVonMises]], KS): the Scholz–Stephens tie-adjusted
    * midpoint form (their A²akN at k = 2), which divides each squared
    * ECDF gap by `H(1−H)` so discrepancies out in the tails count as
    * much as ones near the median — the right lens for "did the
    * extremes move?" (length caps, truncation, outlier injection).
    * Over value cells with pooled mass `h`, doubled midpoint cums
    * `B2 = 2c−h`, `M2ᵢ = 2cᵢ−hᵢ`:
    * `A² = (N−1)/N² · Σᵢ nᵢ · Σⱼ hⱼ·dᵢⱼ² · 4N²/denⱼ` with
    * `dᵢⱼ = (N·M2ᵢⱼ − nᵢ·B2ⱼ)/(2·N·nᵢ)` and
    * `denⱼ = B2ⱼ(2N−B2ⱼ) − N·hⱼ` (cells with den ≤ 0 — the
    * everything-in-one-cell degenerate — contribute zero, the
    * standard exclusion).
    *
    * Quantization contract (documented, mirrored verbatim in the
    * oracle): per cell `d_ppm = (10⁶·|N·M2 − nᵢ·B2|) div (2·N·nᵢ)`
    * and `w = (4·N²·10⁶) div den`, per arm `Sᵢ = Σ h·d_ppm²·w`, then
    * `a2_x_ppm = ((N−1)·(n_a·(S_a div N²) + n_b·(S_b div N²)))
    * div 10¹²` — every product stays inside DECIMAL(38,0) through
    * 10⁹-row arms (worst cell term h·d²·w ≲ 4·10³⁶ since den ≥ N−1
    * wherever positive), so no row guard. One row:
    * `(n_a, n_b, n_values, a2_x_ppm)`; an empty arm yields NULL.
    * Null calibration: E[A²] = 1 for any N.
    *
    * Scale shape (100 TB): identical to its siblings — one histogram
    * aggregation, a cumulative window ON THE HISTOGRAM (distinct-
    * value bounded), one scalar aggregate. Rows never sort
    * globally. */
  def andersonDarling(df: DataFrame, armBCond: org.apache.spark.sql.Column,
                      valueCol: String): DataFrame = {
    val base = df.select(when(armBCond, 1L).otherwise(0L).as("__arm"),
        col(valueCol).cast("bigint").as("__v"))
      .where(col("__v").isNotNull)
    val cells = base.groupBy(col("__v")).agg(
      sum(when(col("__arm") === 0L, 1L).otherwise(0L)).cast("bigint").as("__ha"),
      sum(when(col("__arm") === 1L, 1L).otherwise(0L)).cast("bigint").as("__hb"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val steps = cells
      .withColumn("__ca", sum(col("__ha")).over(w))
      .withColumn("__cb", sum(col("__hb")).over(w))
    val tot = cells.agg(sum(col("__ha")).cast("bigint").as("__na"),
      sum(col("__hb")).cast("bigint").as("__nb"))
    steps.crossJoin(broadcast(tot))
      .withColumn("__nt", expr("__na + __nb"))
      .withColumn("__h", expr("__ha + __hb"))
      .withColumn("__b2", expr("2L * (__ca + __cb) - __h"))
      .withColumn("__hden", expr(
        "cast(__b2 as decimal(38,0)) * (2L * __nt - __b2) " +
          "- cast(__nt as decimal(38,0)) * __h"))
      .withColumn("__da", expr(
        """CASE WHEN __na = 0 OR __nb = 0 THEN 0L
          |ELSE (cast(1000000 as decimal(38,0))
          |  * abs(cast(__nt as decimal(38,0)) * (2L * __ca - __ha)
          |        - cast(__na as decimal(38,0)) * __b2))
          |  div (cast(2 as decimal(38,0)) * __nt * __na) END""".stripMargin))
      .withColumn("__db", expr(
        """CASE WHEN __na = 0 OR __nb = 0 THEN 0L
          |ELSE (cast(1000000 as decimal(38,0))
          |  * abs(cast(__nt as decimal(38,0)) * (2L * __cb - __hb)
          |        - cast(__nb as decimal(38,0)) * __b2))
          |  div (cast(2 as decimal(38,0)) * __nt * __nb) END""".stripMargin))
      .withColumn("__wc", expr(
        """CASE WHEN __hden > 0
          |  THEN (cast(4000000 as decimal(38,0)) * __nt * __nt) div __hden
          |ELSE 0L END""".stripMargin))
      .agg(max(col("__na")).as("__na"), max(col("__nb")).as("__nb"),
        max(col("__nt")).as("__nt"),
        count(lit(1)).cast("bigint").as("n_values"),
        sum(expr("cast(__h as decimal(38,0)) * __da * __da * __wc"))
          .as("__sa"),
        sum(expr("cast(__h as decimal(38,0)) * __db * __db * __wc"))
          .as("__sb"))
      .select(col("__na").as("n_a"), col("__nb").as("n_b"), col("n_values"),
        expr("""CASE WHEN __na = 0 OR __nb = 0 THEN NULL
               |ELSE (cast(__nt - 1L as decimal(38,0))
               |  * (cast(__na as decimal(38,0))
               |       * (__sa div (cast(__nt as decimal(38,0)) * __nt))
               |     + cast(__nb as decimal(38,0))
               |       * (__sb div (cast(__nt as decimal(38,0)) * __nt))))
               |  div cast(1000000000000 as decimal(38,0)) END""".stripMargin)
          .cast("bigint").as("a2_x_ppm"))
  }

  /** Two-sample ENERGY DISTANCE (Székely–Rizzo, V-statistic form) —
    * the metric member of the drift family: `E = 2·E|X−Y| − E|X−X'|
    * − E|Y−Y'|`, zero iff the distributions coincide, metrically
    * comparable across column pairs (value units, like
    * [[distributionDrift]]'s W1 and unlike the unitless CvM/AD). The
    * pairwise-absolute-difference sums come from ONE pass over the
    * value histogram via the sorted-cumulative identity
    * `Σ_{pairs} |x−y| = Σ_cells h·(v·C_< − S_<)` (C_</S_< =
    * strictly-before cumulative count/value-mass), so no pair ever
    * materializes. Each expectation takes exactly ONE floored div —
    * `cross_x2_ppm = (2·10⁶·S_xy) div (n_a·n_b)`, within-arm
    * likewise over n², `e_x_ppm` is their signed difference (within
    * ±2 ulp of the real E, mirrored verbatim in the oracle; products
    * stay inside DECIMAL(38,0) for 10⁹-row arms × values to ~10⁹).
    * One row: `(n_a, n_b, n_values, e_x_ppm, cross_x2_ppm,
    * within_a_x2_ppm, within_b_x2_ppm)`; an empty arm yields NULL.
    *
    * Scale shape (100 TB): one histogram aggregation, strictly-
    * before cumulative windows ON THE HISTOGRAM (distinct-value
    * bounded), one scalar aggregate — rows never sort globally,
    * pairs never exist. */
  def energyDistance(df: DataFrame, armBCond: org.apache.spark.sql.Column,
                     valueCol: String): DataFrame = {
    val base = df.select(when(armBCond, 1L).otherwise(0L).as("__arm"),
        col(valueCol).cast("bigint").as("__v"))
      .where(col("__v").isNotNull)
    val cells = base.groupBy(col("__v")).agg(
      sum(when(col("__arm") === 0L, 1L).otherwise(0L)).cast("bigint").as("__ha"),
      sum(when(col("__arm") === 1L, 1L).otherwise(0L)).cast("bigint").as("__hb"))
    val wb = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val steps = cells
      .withColumn("__cal", coalesce(sum(col("__ha")).over(wb), lit(0L)))
      .withColumn("__cbl", coalesce(sum(col("__hb")).over(wb), lit(0L)))
      .withColumn("__sal", coalesce(sum(expr(
        "cast(__v as decimal(38,0)) * __ha")).over(wb),
        expr("cast(0 as decimal(38,0))")))
      .withColumn("__sbl", coalesce(sum(expr(
        "cast(__v as decimal(38,0)) * __hb")).over(wb),
        expr("cast(0 as decimal(38,0))")))
    val tot = cells.agg(sum(col("__ha")).cast("bigint").as("__na"),
      sum(col("__hb")).cast("bigint").as("__nb"))
    steps.crossJoin(broadcast(tot))
      .agg(max(col("__na")).as("__na"), max(col("__nb")).as("__nb"),
        count(lit(1)).cast("bigint").as("n_values"),
        sum(expr("cast(__ha as decimal(38,0)) " +
          "* (cast(__v as decimal(38,0)) * __cbl - __sbl) " +
          "+ cast(__hb as decimal(38,0)) " +
          "* (cast(__v as decimal(38,0)) * __cal - __sal)")).as("__sxy"),
        sum(expr("cast(__ha as decimal(38,0)) " +
          "* (cast(__v as decimal(38,0)) * __cal - __sal)")).as("__sxx"),
        sum(expr("cast(__hb as decimal(38,0)) " +
          "* (cast(__v as decimal(38,0)) * __cbl - __sbl)")).as("__syy"))
      .withColumn("__a", expr(
        """CASE WHEN __na = 0 OR __nb = 0 THEN NULL
          |ELSE (cast(2000000 as decimal(38,0)) * __sxy)
          |  div (cast(__na as decimal(38,0)) * __nb) END""".stripMargin))
      .withColumn("__b", expr(
        """CASE WHEN __na = 0 THEN NULL
          |ELSE (cast(2000000 as decimal(38,0)) * __sxx)
          |  div (cast(__na as decimal(38,0)) * __na) END""".stripMargin))
      .withColumn("__c", expr(
        """CASE WHEN __nb = 0 THEN NULL
          |ELSE (cast(2000000 as decimal(38,0)) * __syy)
          |  div (cast(__nb as decimal(38,0)) * __nb) END""".stripMargin))
      .select(col("__na").as("n_a"), col("__nb").as("n_b"), col("n_values"),
        expr("__a - __b - __c").cast("bigint").as("e_x_ppm"),
        col("__a").cast("bigint").as("cross_x2_ppm"),
        col("__b").cast("bigint").as("within_a_x2_ppm"),
        col("__c").cast("bigint").as("within_b_x2_ppm"))
  }

  /** Two-sample Kuiper drift statistic — the CYCLIC-safe member of
    * the drift family ([[distributionDrift]] W1/TV,
    * [[cramerVonMises]], [[andersonDarling]], KS): `V = D⁺ + D⁻`
    * with `D⁺ = max_v (F_A−F_B)` and `D⁻ = max_v (F_B−F_A)`, both
    * clamped at 0 (the ECDF gap is 0 at ±∞). Where KS sees only the
    * single largest gap, V catches the A-above-then-below crossing
    * pattern of a median-preserving spread change, and is invariant
    * under cyclic shifts of the support — the right lens for
    * hour-of-day / day-of-week distributions.
    *
    * Exactness: per cell the signed gap numerator `c_A·n_b − c_B·n_a`
    * is exact on DECIMAL(38,0); the two maxima are order-insensitive;
    * ONE floor each at the end — `d_plus_ppm = (10⁶·D⁺ₙ) div
    * (n_a·n_b)`, same for minus — and `v_ppm` floors the SUM of the
    * exact numerators (not the sum of floors), so all three render
    * within 1 ulp at any N. An empty arm yields NULL statistics.
    * One row: `(n_a, n_b, n_values, d_plus_ppm, d_minus_ppm, v_ppm)`.
    *
    * Scale shape (100 TB): identical to [[distributionDrift]] — one
    * histogram aggregation, a cumulative window ON THE HISTOGRAM
    * (distinct-value bounded), one scalar aggregate. Rows never
    * sort globally. */
  def kuiperDrift(df: DataFrame, armBCond: org.apache.spark.sql.Column,
                  valueCol: String): DataFrame = {
    val base = df.select(when(armBCond, 1L).otherwise(0L).as("__arm"),
        col(valueCol).cast("bigint").as("__v"))
      .where(col("__v").isNotNull)
    val cells = base.groupBy(col("__v")).agg(
      sum(when(col("__arm") === 0L, 1L).otherwise(0L)).cast("bigint").as("__ha"),
      sum(when(col("__arm") === 1L, 1L).otherwise(0L)).cast("bigint").as("__hb"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val steps = cells
      .withColumn("__ca", sum(col("__ha")).over(w))
      .withColumn("__cb", sum(col("__hb")).over(w))
    val tot = cells.agg(sum(col("__ha")).cast("bigint").as("__na"),
      sum(col("__hb")).cast("bigint").as("__nb"))
    steps.crossJoin(broadcast(tot))
      .withColumn("__d", expr(
        "cast(__ca as decimal(38,0)) * __nb - cast(__cb as decimal(38,0)) * __na"))
      .agg(max(col("__na")).as("__na"), max(col("__nb")).as("__nb"),
        count(lit(1)).cast("bigint").as("n_values"),
        greatest(max(col("__d")), lit(0).cast("decimal(38,0)")).as("__dp"),
        greatest(expr("-min(__d)"), lit(0).cast("decimal(38,0)")).as("__dm"))
      .select(col("__na").as("n_a"), col("__nb").as("n_b"), col("n_values"),
        expr("""CASE WHEN __na = 0 OR __nb = 0 THEN NULL
               |ELSE (cast(1000000 as decimal(38,0)) * __dp)
               |  div (cast(__na as decimal(38,0)) * __nb) END""".stripMargin)
          .cast("bigint").as("d_plus_ppm"),
        expr("""CASE WHEN __na = 0 OR __nb = 0 THEN NULL
               |ELSE (cast(1000000 as decimal(38,0)) * __dm)
               |  div (cast(__na as decimal(38,0)) * __nb) END""".stripMargin)
          .cast("bigint").as("d_minus_ppm"),
        expr("""CASE WHEN __na = 0 OR __nb = 0 THEN NULL
               |ELSE (cast(1000000 as decimal(38,0)) * (__dp + __dm))
               |  div (cast(__na as decimal(38,0)) * __nb) END""".stripMargin)
          .cast("bigint").as("v_ppm"))
  }

  /** Wilcoxon SIGNED-RANK test over per-entity consecutive-bucket
    * changes — the magnitude-aware companion of
    * [[EvalStats.signTest]] (which sees only the direction of each
    * change) and the one-sample counterpart of the Mann–Whitney
    * rank-sum: pool the nonzero day-over-day deltas `d`, rank `|d|`
    * with midrank ties, and ask whether the positive deltas carry
    * more rank mass than the null's half share. All quantities are
    * EXACT integers in DOUBLED rank units (the q318 convention):
    * per |d| cell with `t` ties (`p` of them positive) and `c`
    * strictly-smaller pool, each positive delta carries double-rank
    * `2c + t + 1`, so `w2_plus = Σ p·(2c+t+1)` = 2·W⁺,
    * `w2_mean = n(n+1)/2` = 2·E[W⁺], `tie_term = Σ(t³−t)`, and the
    * doubled-stat variance is `var2_x12 = 2n(n+1)(2n+1) − tie_term`
    * (= 12·Var[2W⁺]). The z renders as sign-split
    * `z_ppm = (12·10⁶·|w2_plus − w2_mean|) div isqrt(12·var2_x12)`
    * — `isqrt(144·Var)` = 12·σ exactly, one documented floor, the
    * [[mannKendall]] convention (no continuity correction; ties make
    * it conservative). One row: `(n_pairs, w2_plus, w2_mean,
    * tie_term, z_ppm)`; no changes or zero variance yields NULL z.
    *
    * Scale shape (100 TB): the lag window is PER-ENTITY (entity-
    * bounded, scales out); deltas collapse to the |d| histogram;
    * the midrank cumulative runs ON THE HISTOGRAM (distinct-|d|
    * bounded); one scalar aggregate. Products stay inside
    * DECIMAL(38,0) through 10⁹ pooled deltas. */
  def wilcoxonSignedRank(df: DataFrame, entityCol: String,
                         bucketCol: String, valueCol: String): DataFrame = {
    val y = df.select(col(entityCol).as("__e"),
        col(bucketCol).cast("bigint").as("__b"),
        col(valueCol).cast("bigint").as("__y"))
      .groupBy(col("__e"), col("__b"))
      .agg(sum(col("__y")).cast("bigint").as("__y"))
    val we = Window.partitionBy(col("__e")).orderBy(col("__b"))
    val dd = y.withColumn("__prev", lag(col("__y"), 1).over(we))
      .where(col("__prev").isNotNull && col("__y") =!= col("__prev"))
      .select((col("__y") - col("__prev")).as("__d"))
    val cells = dd.groupBy(abs(col("__d")).as("__a"))
      .agg(count(lit(1)).cast("bigint").as("__t"),
        sum(when(col("__d") > 0L, 1L).otherwise(0L)).cast("bigint").as("__p"))
    val wb = Window.orderBy(col("__a"))
      .rowsBetween(Window.unboundedPreceding, -1)
    cells.withColumn("__cb", coalesce(sum(col("__t")).over(wb), lit(0L)))
      .agg(sum(col("__t")).cast("bigint").as("__n"),
        sum(expr("cast(__p as decimal(38,0)) * (2L * __cb + __t + 1L)"))
          .as("__w2p"),
        sum(expr("cast(__t as decimal(38,0)) * __t * __t - __t")).as("__tie"))
      .withColumn("__mean2", expr(
        "(cast(__n as decimal(38,0)) * (__n + 1L)) div 2"))
      .withColumn("__v12", expr(
        "cast(2 as decimal(38,0)) * __n * (__n + 1L) * (2L * __n + 1L) - __tie"))
      .withColumn("__x", expr("cast(12 as decimal(38,0)) * __v12"))
      .transform(graft.util.ExactMath.withIsqrt(_, "__x", "__rt"))
      .select(coalesce(col("__n"), lit(0L)).cast("bigint").as("n_pairs"),
        col("__w2p").cast("bigint").as("w2_plus"),
        col("__mean2").cast("bigint").as("w2_mean"),
        col("__tie").cast("bigint").as("tie_term"),
        expr("""CASE WHEN __n IS NULL OR __n = 0 OR __v12 <= 0 THEN NULL
               |WHEN __w2p >= __mean2
               |  THEN cast((cast(12000000 as decimal(38,0))
               |    * (__w2p - __mean2)) div __rt as bigint)
               |ELSE -cast((cast(12000000 as decimal(38,0))
               |    * (__mean2 - __w2p)) div __rt as bigint) END""".stripMargin)
          .cast("bigint").as("z_ppm"))
  }

  /** Cochran–Armitage TREND test — "does the success rate move
    * MONOTONICALLY with an ordered score?" (dose-response across
    * quality buckets, priority tiers, temporal cohorts): the score
    * test for a linear trend in binomial proportions,
    * `z² = N·(N·Σwr − R·Σwn)² / (R·(N−R)·(N·Σw²n − (Σwn)²))`
    * over per-score cells `(w, n, r)` with `N = Σn`, `R = Σr`.
    *
    * Quantization contract (documented, mirrored verbatim in the
    * oracle): the trend numerator and variance pieces normalize by N
    * first — `ā_ppm = sign-split (10⁶·A) div N` (A = N·Σwr − R·Σwn),
    * `b̄_ppm = (10⁶·B) div N` (B = N·Σw²n − (Σwn)²), success rates at
    * ppb `r̄ = (10⁹·R) div N`, `r̄ᶜ = (10⁹·(N−R)) div N` — then
    * `z_ppm = sign(ā)·((10¹²·|ā_ppm|) div isqrt(r̄·r̄ᶜ·b̄_ppm))` with
    * the exact [[graft.util.ExactMath]] isqrt. Four ≤1-ulp floors, so
    * z sits within a few ppm of the real value at ANY N — no row
    * guard needed (every product stays inside DECIMAL(38,0) through
    * 10⁹ rows × scores to ~10³). Degenerate inputs (one score, all
    * or no successes, an arm rarer than 1-in-10⁹) yield NULL z.
    * One row: `(n_total, n_success, trend_ppm, z_ppm)` where
    * `trend_ppm = ā_ppm` is the N-normalized score–outcome
    * covariance (sign = direction of the trend).
    *
    * Scale shape (100 TB): rows collapse to score cells (score-
    * cardinality bounded), then one scalar aggregate — no window,
    * no sort, nothing global. */
  def cochranArmitage(df: DataFrame, successCond: org.apache.spark.sql.Column,
                      scoreCol: String): DataFrame = {
    val g = df.select(col(scoreCol).cast("bigint").as("__w"),
        when(successCond, 1L).otherwise(0L).as("__s"))
      .where(col("__w").isNotNull)
      .groupBy(col("__w"))
      .agg(count(lit(1)).cast("bigint").as("__n"),
        sum(col("__s")).cast("bigint").as("__r"))
    g.agg(sum(col("__n")).cast("bigint").as("__N"),
        sum(col("__r")).cast("bigint").as("__R"),
        sum(expr("__w * __n")).cast("bigint").as("__swn"),
        sum(expr("__w * __r")).cast("bigint").as("__swr"),
        sum(expr("__w * __w * __n")).cast("bigint").as("__sw2n"))
      .withColumn("__a", expr(
        "cast(__N as decimal(38,0)) * __swr - cast(__R as decimal(38,0)) * __swn"))
      .withColumn("__b", expr(
        "cast(__N as decimal(38,0)) * __sw2n - cast(__swn as decimal(38,0)) * __swn"))
      .withColumn("__abar", expr(
        """CASE WHEN __a >= 0
          |  THEN (cast(1000000 as decimal(38,0)) * __a) div __N
          |ELSE -((cast(1000000 as decimal(38,0)) * (-__a)) div __N) END"""
          .stripMargin))
      .withColumn("__bbar", expr(
        "(cast(1000000 as decimal(38,0)) * __b) div __N"))
      .withColumn("__rbar", expr(
        "(cast(1000000000 as decimal(38,0)) * __R) div __N"))
      .withColumn("__rcbar", expr(
        "(cast(1000000000 as decimal(38,0)) * (__N - __R)) div __N"))
      .withColumn("__prod", expr(
        "cast(__rbar as decimal(38,0)) * __rcbar * __bbar"))
      .transform(graft.util.ExactMath.withIsqrt(_, "__prod", "__rt"))
      .select(col("__N").as("n_total"), col("__R").as("n_success"),
        col("__abar").cast("bigint").as("trend_ppm"),
        expr("""CASE WHEN __b <= 0 OR __R <= 0 OR __R >= __N OR __rt <= 0
               |  THEN NULL
               |WHEN __abar >= 0
               |  THEN (cast(1000000000000 as decimal(38,0)) * __abar) div __rt
               |ELSE -((cast(1000000000000 as decimal(38,0)) * (-__abar))
               |       div __rt) END""".stripMargin)
          .cast("bigint").as("z_ppm"))
  }

  /** Watson's U² two-sample statistic — the ROTATION-INVARIANT
    * companion of the Cramér–von Mises drift (q382) for CIRCULAR
    * values (hour-of-day, day-of-week, angle buckets): where CvM
    * integrates the squared ECDF gap `d(x) = F_m(x) − G_n(x)`
    * directly (and so depends on where the circle is cut), Watson
    * first subtracts the MEAN gap, making the statistic identical
    * for every rotation of the origin:
    *
    *   U² = (mn/N²) · Σ_pooled (d_j − d̄)²
    *      = (N·Σ_k h_k e_k² − (Σ_k h_k e_k)²) / (m·n·N³),
    *
    * where per distinct value cell k: `h_k` = pooled count,
    * `e_k = ca_k·n − cb_k·m` the integer-scaled ECDF gap (cumulative
    * arm counts × opposite arm size), so everything is EXACT
    * integers and the single floor is the final ppm division. One
    * output row: `(n_a, n_b, n_values, u2_ppm)`; either arm empty
    * yields NULL.
    *
    * Scale shape (100 TB): the pooled rows collapse to the distinct-
    * value histogram; the inclusive cumulatives ride the bucket-
    * decomposed [[Sequencing.runningTotalsBefore]] (never a single-
    * reducer window); one scalar aggregate ends the plan. The ppm
    * product 10⁶·N·Σhe² stays inside DECIMAL(38,0) through N ≈ 3·10⁵
    * pooled rows — a loud raise past 300k (pre-bucket or subsample
    * arms first), never a silent wrap. */
  def watsonU2Drift(df: DataFrame, armBCond: org.apache.spark.sql.Column,
                    valueCol: String, buckets: Int = 32): DataFrame = {
    val hist = df.select(col(valueCol).cast("bigint").as("__v"),
        when(armBCond, 1L).otherwise(0L).as("__arm"))
      .where(col("__v").isNotNull)
      .groupBy(col("__v"))
      .agg(count(lit(1)).cast("bigint").as("__t"),
        sum(col("__arm")).cast("bigint").as("__hb"))
      .withColumn("__ha", col("__t") - col("__hb"))
    val (cum, totals) = Sequencing.runningTotalsBefore(
      hist, "__v", "__v", Seq("__ha", "__hb"), buckets, "watsonU2Drift")
    val (m, n) = (totals("__ha"), totals("__hb"))
    val bigN = m + n
    if (bigN >= 300000L)
      throw new IllegalArgumentException(
        "watsonU2Drift: > 300k pooled rows — the exact ppm budget " +
          "(10^6 * N * sum(h*e^2) in DECIMAL(38,0)) is exhausted; " +
          "pre-bucket the values or subsample arms")
    cum
      .withColumn("__e", expr(
        s"cast(__cum___ha + __ha as decimal(38,0)) * ${n}L " +
          s"- cast(__cum___hb + __hb as decimal(38,0)) * ${m}L"))
      .agg(sum(expr("cast(__t as decimal(38,0)) * __e")).as("__s1"),
        sum(expr("cast(__t as decimal(38,0)) * __e * __e")).as("__s2"),
        count(lit(1)).cast("bigint").as("n_values"))
      .select(lit(m).cast("bigint").as("n_a"), lit(n).cast("bigint").as("n_b"),
        col("n_values"),
        expr(s"""CASE WHEN ${m}L = 0 OR ${n}L = 0 THEN NULL
               |ELSE (cast(1000000 as decimal(38,0))
               |  * (${bigN}L * __s2 - __s1 * __s1))
               |  div (cast(${m}L as decimal(38,0)) * ${n}L
               |       * ${bigN}L * ${bigN}L * ${bigN}L) END""".stripMargin)
          .cast("bigint").as("u2_ppm"))
  }

  /** Cucconi's C — the JOINT location-AND-scale two-sample test
    * (Cucconi 1968; Marozzi 2009): squared-rank statistics from both
    * ends of the pooled ordering,
    *
    *   U = (6·ΣR² − n(N+1)(2N+1)) / √(mn(N+1)(2N+1)(8N+11)/5),
    *   V = the same on the CONTRA-ranks N+1−R,
    *   C = (U² + V² − 2ρUV) / (2(1−ρ²)),
    *   ρ = −(14N²+30N+19) / ((2N+1)(8N+11)),
    *
    * detecting shift and spread changes in ONE statistic (vs running
    * Wilcoxon + Ansari–Bradley separately — see [[lepage]] for that
    * composition). Ties take DOUBLED midranks (the q318 convention:
    * `s = 2·before + t + 1` per cell, so `R = s/2` and
    * `2U·√(...) = 3Σs² − 2n(N+1)(2N+1)` stays integer). Rendering:
    * U², V², UV land as micro-scaled integers over their COMMON
    * exact denominator 4K/5 (K = mn(N+1)(2N+1)(8N+11)), then C
    * composes them with ρ's exact rational — five documented micro-
    * floors (≤ 1e-6 each), bitwise-mirrored by the oracle. Output
    * row: `(n_a, n_b, u2_micro, v2_micro, uv_micro, c_micro)`;
    * degenerate pools (either arm empty or N < 3) yield NULLs.
    *
    * Scale shape (100 TB): distinct-value histogram + bucket-
    * decomposed cumulative + one scalar aggregate — identical to
    * [[ansariBradley]]. The micro budget 5·10⁶·(3Σs²)² needs
    * DECIMAL(38,0) through N ≈ 6·10⁴ pooled rows; loud raise beyond. */
  def cucconi(df: DataFrame, armBCond: org.apache.spark.sql.Column,
              valueCol: String, buckets: Int = 32): DataFrame = {
    val hist = df.select(col(valueCol).cast("bigint").as("__v"),
        when(armBCond, 1L).otherwise(0L).as("__arm"))
      .where(col("__v").isNotNull)
      .groupBy(col("__v"))
      .agg(count(lit(1)).cast("bigint").as("__t"),
        sum(col("__arm")).cast("bigint").as("__b"))
    val (cum, totals) = Sequencing.runningTotalsBefore(
      hist, "__v", "__v", Seq("__t"), buckets, "cucconi")
    val bigN = totals("__t")
    if (bigN >= 60000L)
      throw new IllegalArgumentException(
        "cucconi: > 60k pooled rows — the exact micro budget " +
          "(5e6 * (3*sum(b*s^2))^2 in DECIMAL(38,0)) is exhausted; " +
          "pre-bucket the values or subsample arms")
    // doubled midrank s = 2*before + t + 1 for every member of a cell;
    // arm-B sums of s² and of (2N+2−s)² feed the two ends
    val ag = cum
      .withColumn("__s", expr("2L * __cum___t + __t + 1L"))
      .agg(sum(col("__b")).cast("bigint").as("__nb"),
        sum(expr("cast(__b as decimal(38,0)) * __s * __s")).as("__t2"),
        sum(expr(s"cast(__b as decimal(38,0)) * (${2 * bigN + 2}L - __s) " +
          s"* (${2 * bigN + 2}L - __s)")).as("__t2c"))
    val nN = s"${bigN}L"
    ag
      .withColumn("__na", expr(s"$nN - __nb"))
      // Nu2 = 2U·D, Nv2 = 2V·D with D = √(K/5): exact integers
      .withColumn("__nu2", expr(
        s"cast(3 as decimal(38,0)) * __t2 " +
          s"- cast(2 as decimal(38,0)) * __nb * ($nN + 1L) * (2L * $nN + 1L)"))
      .withColumn("__nv2", expr(
        s"cast(3 as decimal(38,0)) * __t2c " +
          s"- cast(2 as decimal(38,0)) * __nb * ($nN + 1L) * (2L * $nN + 1L)"))
      .withColumn("__k4", expr(
        s"cast(4 as decimal(38,0)) * __na * __nb * ($nN + 1L) " +
          s"* (2L * $nN + 1L) * (8L * $nN + 11L)"))
      // micro-scaled U², V², |UV| over the common denominator 4K/5
      .withColumn("__u2u", expr(
        "CASE WHEN __k4 > 0 THEN (cast(5000000 as decimal(38,0)) " +
          "* __nu2 * __nu2) div __k4 ELSE NULL END"))
      .withColumn("__v2u", expr(
        "CASE WHEN __k4 > 0 THEN (cast(5000000 as decimal(38,0)) " +
          "* __nv2 * __nv2) div __k4 ELSE NULL END"))
      .withColumn("__uvu", expr(
        "CASE WHEN __k4 <= 0 THEN NULL " +
          "WHEN __nu2 * __nv2 >= 0 THEN (cast(5000000 as decimal(38,0)) " +
          "* __nu2 * __nv2) div __k4 " +
          "ELSE -((cast(5000000 as decimal(38,0)) * (-(__nu2 * __nv2))) " +
          "div __k4) END"))
      // ρ = −p̃/q; C = (U² + V² + 2(p̃/q)UV) · q² / (120(N−2)(N+2)(N+1)²)
      .withColumn("__q", expr(s"(2L * $nN + 1L) * (8L * $nN + 11L)"))
      .withColumn("__p", expr(s"14L * $nN * $nN + 30L * $nN + 19L"))
      .withColumn("__rterm", expr(
        "CASE WHEN __uvu IS NULL THEN NULL " +
          "WHEN __uvu >= 0 THEN (cast(2 as decimal(38,0)) * __p * __uvu) " +
          "div __q " +
          "ELSE -((cast(2 as decimal(38,0)) * __p * (-__uvu)) div __q) END"))
      .withColumn("__cnum", expr(
        "cast(__u2u + __v2u + __rterm as decimal(38,0)) * __q * __q"))
      .withColumn("__cden", expr(
        s"cast(120 as decimal(38,0)) * ($nN - 2L) * ($nN + 2L) " +
          s"* ($nN + 1L) * ($nN + 1L)"))
      .select(col("__na").cast("bigint").as("n_a"),
        col("__nb").cast("bigint").as("n_b"),
        col("__u2u").cast("bigint").as("u2_micro"),
        col("__v2u").cast("bigint").as("v2_micro"),
        col("__uvu").cast("bigint").as("uv_micro"),
        expr(s"""CASE WHEN __na <= 0 OR __nb <= 0 OR $nN < 3 OR __cden <= 0
               |  THEN NULL
               |WHEN __cnum >= 0 THEN __cnum div __cden
               |ELSE -((-__cnum) div __cden) END""".stripMargin)
          .cast("bigint").as("c_micro"))
  }

  /** Two-sample Wilcoxon RANK-SUM z — the normal-approximation test
    * companion of [[EvalStats.mannWhitneyU]] (which emits the exact
    * U counts and Cliff's delta but no standardized statistic):
    * doubled midranks `s = 2·before + t + 1` (the q318 convention),
    * `W2 = Σ_B s` (= 2·rank-sum of arm B), `E2 = n(N+1)`, and the
    * tie-corrected variance of W2 is `mn·X/(3N(N−1))` with
    * `X = N(N²−1) − Σ(t³−t)`. The fraction clears by moving the
    * factor INSIDE the root (the q389 trick): with `k = 3N(N−1)`,
    *
    *   z_ppm = sign(d) · (10⁶·k·|d|) div isqrt(k·mn·X),  d = W2 − E2
    *
    * — ONE documented floor via the [[graft.util.ExactMath]] ladder.
    * Output row: `(n_a, n_b, w2, mean2, tie_term, z_ppm)`; empty arm
    * or zero variance yields NULL z.
    *
    * Scale shape (100 TB): distinct-value histogram, bucket-
    * decomposed cumulative, one scalar aggregate. The root product
    * k·mn·X ≈ 0.75·N⁷ exhausts DECIMAL(38,0) near N ≈ 2·10⁵ pooled
    * rows — loud raise beyond (subsample arms; the test's power is
    * saturated long before that anyway). */
  def wilcoxonRankSum(df: DataFrame, armBCond: org.apache.spark.sql.Column,
                      valueCol: String, buckets: Int = 32): DataFrame = {
    val hist = df.select(col(valueCol).cast("bigint").as("__v"),
        when(armBCond, 1L).otherwise(0L).as("__arm"))
      .where(col("__v").isNotNull)
      .groupBy(col("__v"))
      .agg(count(lit(1)).cast("bigint").as("__t"),
        sum(col("__arm")).cast("bigint").as("__b"))
    val (cum, totals) = Sequencing.runningTotalsBefore(
      hist, "__v", "__v", Seq("__t"), buckets, "wilcoxonRankSum")
    val bigN = totals("__t")
    if (bigN >= 200000L)
      throw new IllegalArgumentException(
        "wilcoxonRankSum: > 200k pooled rows — the exact root budget " +
          "(3N(N-1)*m*n*X in DECIMAL(38,0)) is exhausted; subsample arms")
    val nN = s"${bigN}L"
    cum
      .withColumn("__s", expr("2L * __cum___t + __t + 1L"))
      .agg(sum(col("__b")).cast("bigint").as("__nb"),
        sum(expr("cast(__b as decimal(38,0)) * __s")).as("__w2"),
        sum(expr("cast(__t as decimal(38,0)) * __t * __t - __t")).as("__tie"))
      .withColumn("__na", expr(s"$nN - __nb"))
      .withColumn("__mean2", expr(s"cast(__nb as decimal(38,0)) * ($nN + 1L)"))
      .withColumn("__d", expr("__w2 - __mean2"))
      .withColumn("__k", expr(s"cast(3 as decimal(38,0)) * $nN * ($nN - 1L)"))
      .withColumn("__x", expr(
        s"cast($nN as decimal(38,0)) * ($nN * $nN - 1L) - __tie"))
      .withColumn("__rootq", expr(
        "CASE WHEN __na > 0 AND __nb > 0 AND __x > 0 " +
          "THEN __k * __na * __nb * __x ELSE cast(0 as decimal(38,0)) END"))
      .transform(graft.util.ExactMath.withIsqrt(_, "__rootq", "__rt"))
      .select(col("__na").cast("bigint").as("n_a"),
        col("__nb").cast("bigint").as("n_b"),
        col("__w2").cast("bigint").as("w2"),
        col("__mean2").cast("bigint").as("mean2"),
        col("__tie").cast("bigint").as("tie_term"),
        expr("""CASE WHEN __rt <= 0 THEN NULL
               |WHEN __d >= 0
               |  THEN (cast(1000000 as decimal(38,0)) * __k * __d) div __rt
               |ELSE -((cast(1000000 as decimal(38,0)) * __k * (-__d))
               |       div __rt) END""".stripMargin)
          .cast("bigint").as("z_ppm"))
  }

  /** Brunner–Munzel test — the two-sample rank test that does NOT
    * assume equal variances or shapes (the Behrens–Fisher analogue of
    * Wilcoxon, today's recommended default): estimates
    * `p̂ = P(X<Y) + ½P(X=Y)` from placements and studentizes with
    * PER-ARM placement variances. Doubled placements off the value
    * histogram (`u_x(v) = 2·cumB(<v) + t_B(v)`, mirrored for Y) make
    * everything exact: with `d = Σu_y − mn`,
    * `V_x = mΣu_x² − (Σu_x)²` (ditto V_y) and
    * `K = V_x(n−1) + V_y(m−1)`,
    *
    *   t = d · √((m−1)(n−1)/K),  rendered
    *   t_ppm = sign(d) · isqrt((10¹²·d²·(m−1)(n−1)) div K)
    *
    * — one floored div inside the exact-isqrt ladder (the q360
    * convention). One row: `(n_a, n_b, p_hat_ppm, t_ppm)` with
    * `p_hat_ppm = (10⁶·Σu_y) div (2mn)`; complete separation or
    * sub-2 arms (K ≤ 0) yields NULL t.
    *
    * Scale shape (100 TB): distinct-value histogram, bucket-
    * decomposed cumulatives, one scalar aggregate — identical to
    * [[watsonU2Drift]]. Budget: 10¹²·d²·mn ≈ 10¹²·N⁶/16 exhausts
    * DECIMAL(38,0) near N ≈ 3·10⁴ pooled rows — loud raise past
    * 30000 (pre-bucket values or subsample arms). */
  def brunnerMunzel(df: DataFrame, armBCond: org.apache.spark.sql.Column,
                    valueCol: String, buckets: Int = 32): DataFrame = {
    val hist = df.select(col(valueCol).cast("bigint").as("__v"),
        when(armBCond, 1L).otherwise(0L).as("__arm"))
      .where(col("__v").isNotNull)
      .groupBy(col("__v"))
      .agg(count(lit(1)).cast("bigint").as("__t"),
        sum(col("__arm")).cast("bigint").as("__tb"))
      .withColumn("__ta", col("__t") - col("__tb"))
    val (cum, totals) = Sequencing.runningTotalsBefore(
      hist, "__v", "__v", Seq("__ta", "__tb"), buckets, "brunnerMunzel")
    val (m, n) = (totals("__ta"), totals("__tb"))
    if (m + n >= 30000L)
      throw new IllegalArgumentException(
        "brunnerMunzel: > 30k pooled rows — the exact ppm budget " +
          "(10^12 * d^2 * m * n in DECIMAL(38,0)) is exhausted; " +
          "pre-bucket values or subsample arms")
    val ag = cum
      .withColumn("__ux", expr("2L * __cum___tb + __tb"))
      .withColumn("__uy", expr("2L * __cum___ta + __ta"))
      .agg(
        sum(expr("cast(__ta as decimal(38,0)) * __ux")).as("__sux"),
        sum(expr("cast(__ta as decimal(38,0)) * __ux * __ux")).as("__sux2"),
        sum(expr("cast(__tb as decimal(38,0)) * __uy")).as("__suy"),
        sum(expr("cast(__tb as decimal(38,0)) * __uy * __uy")).as("__suy2"))
    ag
      .withColumn("__vx", expr(s"${m}L * __sux2 - __sux * __sux"))
      .withColumn("__vy", expr(s"${n}L * __suy2 - __suy * __suy"))
      .withColumn("__k", expr(
        s"__vx * ${n - 1}L + __vy * ${m - 1}L"))
      .withColumn("__d", expr(s"__suy - ${m * n}L"))
      .withColumn("__q", expr(
        s"""CASE WHEN __k > 0 THEN (cast(1000000000000 as decimal(38,0))
           |  * __d * __d * ${(m - 1) * (n - 1)}L) div __k
           |ELSE cast(0 as decimal(38,0)) END""".stripMargin))
      .transform(graft.util.ExactMath.withIsqrt(_, "__q", "__rt"))
      .select(lit(m).cast("bigint").as("n_a"), lit(n).cast("bigint").as("n_b"),
        expr(s"""CASE WHEN ${m}L = 0 OR ${n}L = 0 THEN NULL
               |ELSE cast((cast(1000000 as decimal(38,0)) * __suy)
               |  div ${2 * m * n}L as bigint) END""".stripMargin)
          .cast("bigint").as("p_hat_ppm"),
        expr("""CASE WHEN __k <= 0 THEN NULL
               |WHEN __d >= 0 THEN cast(__rt as bigint)
               |ELSE -cast(__rt as bigint) END""".stripMargin)
          .cast("bigint").as("t_ppm"))
  }

  /** Quade test — the block-weighted refinement of
    * [[graft.operators.EvalStats.friedmanRanks]]: blocks with a WIDE
    * value range carry proportionally more evidence about treatment
    * order than near-flat blocks, so each block's within-block ranks
    * are weighted by the rank of its range. Doubled midranks
    * everywhere (the q375 convention) make every intermediate an
    * exact integer in ×4 units: `S4_ij = Q2_i·(r2_ij − (k+1))` with
    * `r2` the within-block and `Q2` the across-block (range) doubled
    * midranks; with `A16 = Σ S4²` and `B16 = Σ_j (Σ_i S4_ij)²`,
    *
    *   F = (b−1)·B16 / (b·A16 − B16)
    *
    * (the ×16 scaling cancels; Cauchy–Schwarz keeps the denominator
    * ≥ 0). One documented ppm floor. Blocks must be complete (loud
    * raise). One row: `(n_blocks, k, a_x16, b_x16, f_ppm)`; an
    * all-tied pool (A16 = B16 = 0) yields NULL.
    *
    * Scale shape (100 TB): within-block ranks ride k-row block
    * windows; the across-block range ranking rides the
    * bucket-decomposed [[Sequencing.runningTotalsBefore]] on the
    * RANGE HISTOGRAM (never a single-reducer sort of b blocks); two
    * keyed aggregations end the plan. Budget: 10⁶·b⁵k³ inside
    * DECIMAL(38,0) → loud raise past b = 3·10⁵ blocks. */
  def quadeTest(df: DataFrame, blockCol: String, treatmentCol: String,
                valueCol: String, buckets: Int = 32): DataFrame = {
    val base = df.select(col(blockCol).as("__b"), col(treatmentCol).as("__tr"),
      col(valueCol).cast("bigint").as("__v"))
    val wB = Window.partitionBy(col("__b"))
    val ranked = base
      .withColumn("__r2",
        expr("2L").multiply(coalesce(count(lit(1)).over(
          wB.orderBy(col("__v")).rangeBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
          .plus(count(lit(1)).over(
            wB.orderBy(col("__v")).rangeBetween(0, 0)))
          .plus(lit(1L)))
      .localCheckpoint() // feeds the range ranking AND the S4 frame
    val ranges = ranked.groupBy(col("__b"))
      .agg((max(col("__v")) - min(col("__v"))).cast("bigint").as("__rg"),
        count(lit(1)).cast("bigint").as("__kb"),
        // per-block DISTINCT treatment count: a block with one
        // treatment duplicated and another missing keeps __kb at k,
        // so equal block sizes alone cannot prove completeness
        countDistinct(col("__tr")).cast("bigint").as("__kd"))
    val rhist = ranges.groupBy(col("__rg"))
      .agg(count(lit(1)).cast("bigint").as("__t"))
    val (cum, totals) = Sequencing.runningTotalsBefore(
      rhist, "__rg", "__rg", Seq("__t"), buckets, "quadeTest")
    val b = totals("__t")
    if (b >= 300000L)
      throw new IllegalArgumentException(
        "quadeTest: > 300k blocks — the exact ppm budget (10^6 * b^5 * " +
          "k^3 in DECIMAL(38,0)) is exhausted; pre-aggregate blocks")
    val q2 = cum.withColumn("__q2", expr("2L * __cum___t + __t + 1L"))
      .select(col("__rg"), col("__q2"))
    val s4 = ranked
      .join(ranges.join(q2, Seq("__rg"))
        .select(col("__b"), col("__q2"), col("__kb"), col("__kd")), Seq("__b"))
      .withColumn("__s4", expr("__q2 * (__r2 - (__kb + 1L))"))
    val perT = s4.groupBy(col("__tr"))
      .agg(sum(expr("cast(__s4 as decimal(38,0))")).as("__s4j"),
        count(lit(1)).cast("bigint").as("__nb"))
    val scal = s4.agg(
      sum(expr("cast(__s4 as decimal(38,0)) * __s4")).as("__a16"),
      min(col("__kb")).cast("bigint").as("__kmin"),
      max(col("__kb")).cast("bigint").as("__kmax"),
      // completeness needs all three: equal block sizes, every block's
      // treatments DISTINCT (kd = kb), and one shared treatment set
      // (global distinct = block size — {A,B,C}/{A,B,D} fails here)
      min(when(col("__kd") === col("__kb"), 1L).otherwise(0L)).as("__bok"),
      countDistinct(col("__tr")).cast("bigint").as("__kg"))
    perT.crossJoin(broadcast(scal))
      // the guarded column IS the emitted k, so the incompleteness
      // raise can never be pruned out of the plan
      .withColumn("__kmin", expr(
        "CASE WHEN __kmin = __kmax AND __bok = 1 AND __kg = __kmin " +
          "THEN __kmin ELSE raise_error(" +
          "'quadeTest: blocks are incomplete — build the full " +
          "block x treatment grid first') END"))
      .agg(max(col("__kmin")).cast("bigint").as("k"),
        max(col("__a16")).as("__a16"),
        sum(expr("__s4j * __s4j")).as("__b16"))
      .select(lit(b).cast("bigint").as("n_blocks"), col("k"),
        col("__a16").cast("bigint").as("a_x16"),
        col("__b16").cast("bigint").as("b_x16"),
        expr(s"""CASE WHEN ${b}L * __a16 - __b16 <= 0 THEN NULL
               |ELSE cast((cast(1000000 as decimal(38,0)) * ${b - 1}L
               |  * __b16) div (${b}L * __a16 - __b16) as bigint)
               |END""".stripMargin).cast("bigint").as("f_ppm"))
  }

  /** Mood's median test — the k-sample location test that survives
    * ANY distributional shape: split every value at the pooled GRAND
    * median (lower weighted median, the q333/q367 convention) and
    * χ²-test the k×2 above/at-or-below table. Blunter than
    * Kruskal–Wallis but immune to outliers and unequal spreads — the
    * robustness cross-check. Exact rendering: with `A = Σ above`,
    * `B = N − A`, per-group contribution
    * `c_g = (10⁶·(N·a_g − n_g·A)²) div (A·B·n_g)` (k documented
    * floors, DECIMAL(38,0) products) and `chi2_ppm = Σ c_g`. One
    * row: `(k, n_total, median, n_above, chi2_ppm)`; a pool whose
    * median pins everything to one side (A = 0 or A = N) yields
    * NULL χ².
    *
    * Scale shape (100 TB): rows collapse to (group, value) cells;
    * the grand-median scan is a cumulative window ON THE VALUE
    * HISTOGRAM (distinct-value bounded, the [[ansariBradley]]
    * convention); the k-row group frame finishes with scalar
    * algebra. Budget: 10⁶·N⁴ inside DECIMAL(38,0) → loud raise past
    * N = 3·10⁷ pooled rows (pre-bucket values or subsample). */
  def moodMedianTest(df: DataFrame, groupCol: String,
                     valueCol: String): DataFrame = {
    val cells = df
      .select(col(groupCol).as("__g"), col(valueCol).cast("bigint").as("__v"))
      .where(col("__v").isNotNull)
      .groupBy(col("__g"), col("__v"))
      .agg(count(lit(1)).cast("bigint").as("__t"))
      .localCheckpoint() // feeds the pooled histogram AND group counts
    val hist = cells.groupBy(col("__v"))
      .agg(sum(col("__t")).cast("bigint").as("__h"))
    val wv = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = hist.agg(sum(col("__h")).cast("bigint").as("__N"))
      .withColumn("__N", expr(
        "CASE WHEN __N < 30000000 THEN __N ELSE raise_error(" +
          "'moodMedianTest: > 3e7 pooled rows — the exact ppm budget " +
          "(10^6 * N^4 in DECIMAL(38,0)) is exhausted; pre-bucket " +
          "values or subsample') END"))
    val med = hist.withColumn("__cum", sum(col("__h")).over(wv))
      .crossJoin(broadcast(tot))
      .where(col("__cum") >= expr("(__N + 1L) div 2L"))
      .agg(min(col("__v")).cast("bigint").as("__med"))
    val grp = cells.crossJoin(broadcast(med))
      .groupBy(col("__g"))
      .agg(sum(when(col("__v") > col("__med"), col("__t")).otherwise(0L))
          .cast("bigint").as("__a"),
        sum(col("__t")).cast("bigint").as("__ng"))
    val ab = grp.agg(sum(col("__a")).cast("bigint").as("__ta"),
      sum(col("__ng")).cast("bigint").as("__N2"),
      count(lit(1)).cast("bigint").as("__k"))
    grp.crossJoin(broadcast(ab))
      .withColumn("__term", expr(
        """CASE WHEN __ta <= 0 OR __ta >= __N2 THEN NULL
          |ELSE (cast(1000000 as decimal(38,0))
          |  * (cast(__N2 as decimal(38,0)) * __a
          |     - cast(__ng as decimal(38,0)) * __ta)
          |  * (cast(__N2 as decimal(38,0)) * __a
          |     - cast(__ng as decimal(38,0)) * __ta))
          |  div (cast(__ta as decimal(38,0)) * (__N2 - __ta) * __ng)
          |END""".stripMargin))
      .crossJoin(broadcast(med))
      .agg(max(col("__k")).as("k"), max(col("__N2")).as("n_total"),
        max(col("__med")).as("median"), max(col("__ta")).as("n_above"),
        sum(col("__term")).as("__chi2"))
      .select(col("k").cast("bigint"), col("n_total").cast("bigint"),
        col("median").cast("bigint"), col("n_above").cast("bigint"),
        col("__chi2").cast("bigint").as("chi2_ppm"))
  }

  /** Lepage's L — the classical LOCATION-plus-SCALE omnibus test:
    * `L = z_W² + z_AB²`, the squared standardized Wilcoxon rank-sum
    * ([[wilcoxonRankSum]], location) plus the squared standardized
    * Ansari–Bradley ([[ansariBradley]], scale), χ²₂ under H0. Where
    * [[cucconi]] couples its two ends through a correlation, Lepage
    * simply sums the two orthogonal-under-H0 pieces — the standard
    * cross-check pair. Rendered as the documented COMPOSITION of the
    * two already-pinned ppm z-scores:
    * `l_micro = (z_W² + z_AB²) div 10⁶` — deterministic and bitwise-
    * mirrored by the oracle (each component carries its own single
    * documented floor). Output: `(n_a, n_b, zw_ppm, zab_ppm,
    * l_micro)`; a NULL component nulls L.
    *
    * Scale shape (100 TB): both components are histogram + bucket-
    * decomposed cumulative + scalar aggregate; the two single-row
    * outputs cross-join for free. Guards inherit from the
    * components (200k / 4M pooled rows). */
  def lepage(df: DataFrame, armBCond: org.apache.spark.sql.Column,
             valueCol: String, buckets: Int = 32): DataFrame = {
    val zw = wilcoxonRankSum(df, armBCond, valueCol, buckets)
      .select(col("n_a"), col("n_b"), col("z_ppm").as("zw_ppm"))
    val zab = ansariBradley(df, armBCond, valueCol)
      .select(col("z_ppm").as("zab_ppm"))
    zw.crossJoin(broadcast(zab))
      .withColumn("l_micro", expr(
        """CASE WHEN zw_ppm IS NULL OR zab_ppm IS NULL THEN NULL
          |ELSE (cast(zw_ppm as decimal(38,0)) * zw_ppm
          |      + cast(zab_ppm as decimal(38,0)) * zab_ppm)
          |     div 1000000L END""".stripMargin).cast("bigint"))
  }
}
