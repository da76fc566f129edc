package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass column profiling: per-column row/null/distinct counts
  * and lexicographic min/max (string-rendered, so one output schema
  * covers every input type).
  *
  * Not in the reference (polario exposes only schema inspection via
  * its CLI — main.py's `schema` verb); a data-quality extension every
  * curation pipeline needs before trusting a new drop of data.
  *
  * Scale shape: ONE aggregation pass over the table computes every
  * column's stats together (Spark plans the multi-distinct aggregate
  * via Expand — one shuffle whose row count is input × distinct-
  * column count). That beats per-column scans (n_cols full table
  * reads) up to the Expand blow-up; profiling MANY high-cardinality
  * columns at 100 TB should switch `exactDistinct = false`, which
  * swaps the Expand for mergeable HLL++ sketches (one shuffle, no
  * blow-up, ±rsd accuracy). min/max/null counts are plain partial
  * aggregates either way.
  */
object Profile {

  /** One row per profiled column, with the HLL++ sketch CHECKED
    * against the exact distinct count in the SAME single aggregation
    * pass: `(column_name, n_rows, n_nulls, n_distinct, min_value,
    * max_value, distinct_in_bounds)` where `distinct_in_bounds` =
    * |approx/exact − 1| ≤ `maxRelErr` (default 3·rsd for HLL++'s
    * default rsd 0.05). One scan, one Expand — NOT two profile
    * passes; this is the witness surface for the approx mode's error
    * contract. */
  def profileChecked(df: DataFrame, cols: Seq[String],
                     maxRelErr: Double = 0.15): DataFrame = {
    val base = profile(df, cols, exactDistinct = true, approxCheck = true)
    base
      .withColumn("distinct_in_bounds",
        abs(col("__nd_approx").cast("double") / col("n_distinct") - 1.0) <= maxRelErr)
      .drop("__nd_approx")
  }

  /** One row per profiled column:
    * `(column_name, n_rows, n_nulls, n_distinct, min_value,
    * max_value)`. `exactDistinct = false` uses
    * `approx_count_distinct` (HLL++, default rsd) — the 100 TB
    * setting; keep exact for oracle-verified runs. With
    * `approxCheck = true` (see [[profileChecked]]) an extra
    * `__nd_approx` column carries the HLL++ estimate alongside the
    * exact count, still in one pass. */
  def profile(df: DataFrame, cols: Seq[String],
              exactDistinct: Boolean = true,
              approxCheck: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in dataframe: ${missing.mkString(", ")}")
    // Names are spliced into the stack() melt — a quote/comma/backtick
    // would corrupt the expression, so restrict to safe identifiers.
    cols.foreach { c =>
      require(c.matches("[A-Za-z0-9_]+"),
        s"column name '$c' must match [A-Za-z0-9_]+ (it is spliced into the melt SQL)")
    }
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        (if (exactDistinct) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c).cast("string")).as(s"__mn_$c"),
        max(col(c).cast("string")).as(s"__mx_$c")) ++
        (if (approxCheck) Seq(approx_count_distinct(col(c)).as(s"__na_$c")) else Nil)
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // Melt the single stats row into one row per column.
    val outCols = "column_name, n_rows, n_nulls, n_distinct, min_value, max_value" +
      (if (approxCheck) ", __nd_approx" else "")
    one.select(expr(
      s"stack(${cols.size}, " +
        cols.map(c => s"'$c', __n, __nn_$c, __nd_$c, __mn_$c, __mx_$c" +
          (if (approxCheck) s", __na_$c" else "")).mkString(", ") +
        s") AS ($outCols)"))
  }

  /** Equi-width histogram of a numeric column over `[lo, hi)` with
    * `nb` buckets: `(bucket, lo_edge, hi_edge, n)`, one row per
    * NON-EMPTY bucket plus underflow (bucket 0) / overflow
    * (bucket nb+1) rows when values fall outside the range —
    * `width_bucket` semantics in both engines, so the distribution
    * shape is hash-checkable. One aggregation, bucket-count-bounded
    * output; null values are excluded (count them via [[profile]]).
    *
    * Edges are derived from the bucket index with one
    * multiply-and-add each (exact-rounded IEEE, same both engines);
    * under/overflow rows carry null edges. */
  def histogram(df: DataFrame, c: String, lo: Double, hi: Double,
                nb: Int): DataFrame = {
    require(nb >= 1, "need at least one bucket")
    require(lo < hi, "need lo < hi")
    val width = (hi - lo) / nb
    // explicit floor arithmetic, not the width_bucket built-in: the
    // identical expression is renderable in engines without the
    // function (DuckDB), and boundary rounding is pinned to ONE
    // formula in both (verified equal to Spark's width_bucket on the
    // witness data)
    df.where(col(c).isNotNull)
      .withColumn("bucket", expr(
        s"CASE WHEN CAST($c AS DOUBLE) < ${lo}D THEN 0 " +
          s"WHEN CAST($c AS DOUBLE) >= ${hi}D THEN ${nb + 1} " +
          s"ELSE CAST(floor((CAST($c AS DOUBLE) - ${lo}D) / ${width}D) + 1 AS INT) END"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("lo_edge",
        when(col("bucket") >= 1 && col("bucket") <= nb,
          lit(lo) + (col("bucket") - 1).cast("double") * lit(width)))
      .withColumn("hi_edge",
        when(col("bucket") >= 1 && col("bucket") <= nb,
          lit(lo) + col("bucket").cast("double") * lit(width)))
      .select(col("bucket"), col("lo_edge"), col("hi_edge"), col("n"))
      .orderBy("bucket")
  }

  /** Joint (2-D) equi-width histogram of two numeric columns — the
    * length-vs-quality / size-vs-score heat map every curation
    * dashboard starts from, and the joint-distribution input drift
    * monitors compare across corpus versions. Same boundary-pinned
    * floor arithmetic as [[histogram]] on each axis independently
    * (bucket 0 = underflow, `nb + 1` = overflow), so both engines
    * bin identically. Rows where either column is NULL are dropped
    * (they have no cell).
    *
    * Output: `(x_bucket, y_bucket, n)` for NON-EMPTY cells only,
    * ordered — the output is data-sparse, never the dense
    * `(xnb+2)·(ynb+2)` grid. One groupBy on the bounded cell id;
    * map-side combined; no windows. */
  def histogram2d(df: DataFrame, xc: String, xlo: Double, xhi: Double, xnb: Int,
                  yc: String, ylo: Double, yhi: Double, ynb: Int): DataFrame = {
    require(xnb >= 1 && ynb >= 1, "need at least one bucket per axis")
    require(xlo < xhi && ylo < yhi, "need lo < hi on both axes")
    def bucketExpr(c: String, lo: Double, hi: Double, nb: Int): String = {
      val width = (hi - lo) / nb
      s"CASE WHEN CAST($c AS DOUBLE) < ${lo}D THEN 0 " +
        s"WHEN CAST($c AS DOUBLE) >= ${hi}D THEN ${nb + 1} " +
        s"ELSE CAST(floor((CAST($c AS DOUBLE) - ${lo}D) / ${width}D) + 1 AS INT) END"
    }
    df.where(col(xc).isNotNull && col(yc).isNotNull)
      .withColumn("x_bucket", expr(bucketExpr(xc, xlo, xhi, xnb)))
      .withColumn("y_bucket", expr(bucketExpr(yc, ylo, yhi, ynb)))
      .groupBy(col("x_bucket"), col("y_bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("x_bucket", "y_bucket")
  }

  /** Population-stability-index drift between two slices of a numeric
    * column — the monitoring score risk teams put beside the KS
    * statistic ([[graft.operators.TextOps.distributionDistance]]'s
    * scalar cousin for BINNED distributions): per bin,
    * `PSI_i = (p_i − q_i) · ln(p_i / q_i)`, always ≥ 0, large when a
    * bin's mass moved.
    *
    * Cross-engine exactness (graft oracle rules — no libm): with
    * add-1 smoothed cross-multiplied masses
    * `x = (n_a+1)·(tot_b+K)` and `y = (n_b+1)·(tot_a+K)` (K = nb + 2,
    * the bucket count incl. under/overflow), the bin score is the
    * integer surrogate `(x − y) · (L(x) − L(y))` with `L` the
    * bit-length log2 (`length(bin(·))`). Both factors are monotone in
    * `x − y`, so every bin contribution keeps PSI's ≥ 0 sign
    * guarantee; factor-of-2 log resolution. Bins nobody occupies are
    * ABSENT (inner groupBy semantics, repo-wide), and an EMPTY slice
    * raises — "no data" is not "no drift" (both slices empty returns
    * the empty frame: there are no bin rows for the guard to ride).
    *
    * Buckets use [[histogram]]'s pinned floor formula (0 underflow,
    * `nb+1` overflow). Output: `(bucket, n_a, n_b, contrib)` ordered
    * by bucket; `Σ contrib` is the drift scalar.
    *
    * Scale shape: one bucket-keyed aggregation with map-side combine
    * (≤ nb+2 groups) + a broadcast totals row — nothing else touches
    * the fact table. BIGINT products hold to ~10¹² rows per slice;
    * beyond that lift x/y to DECIMAL(38,0) (documented switch). */
  def psiDrift(df: DataFrame, c: String, groupCol: String,
               groupA: String, groupB: String,
               lo: Double, hi: Double, nb: Int): DataFrame = {
    require(groupA != groupB, "slices must differ")
    require(nb >= 1, "need at least one bucket")
    require(lo < hi, "need lo < hi")
    val width = (hi - lo) / nb
    val k = nb + 2
    val counts = df
      .where(col(groupCol).isin(groupA, groupB) && col(c).isNotNull)
      .withColumn("bucket", expr(
        s"CASE WHEN CAST($c AS DOUBLE) < ${lo}D THEN 0 " +
          s"WHEN CAST($c AS DOUBLE) >= ${hi}D THEN ${nb + 1} " +
          s"ELSE CAST(floor((CAST($c AS DOUBLE) - ${lo}D) / ${width}D) + 1 AS INT) END"))
      .groupBy(col("bucket"))
      .agg(
        sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).cast("bigint").as("n_a"),
        sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).cast("bigint").as("n_b"))
    val totals = counts.agg(
      sum(col("n_a")).cast("bigint").as("__tot_a"),
      sum(col("n_b")).cast("bigint").as("__tot_b"))
    counts.crossJoin(broadcast(totals))
      // The guard wraps a USED column (repo pattern: an asserted side
      // column would be optimizer-pruned).
      .withColumn("__tot_a", expr(
        "CASE WHEN __tot_a IS NULL OR __tot_a = 0 OR __tot_b = 0 THEN " +
          s"raise_error('psiDrift: empty slice; no data is not no drift') " +
          "ELSE __tot_a END"))
      .withColumn("__x", (col("n_a") + 1) * (col("__tot_b") + k))
      .withColumn("__y", (col("n_b") + 1) * (col("__tot_a") + k))
      .withColumn("contrib", expr(
        "CAST((__x - __y) * (length(bin(__x)) - length(bin(__y))) AS BIGINT)"))
      .select(col("bucket"), col("n_a"), col("n_b"), col("contrib"))
      .orderBy("bucket")
  }

  /** Equi-depth (equal-count) histogram over a numeric column —
    * `(bucket, lo_value, hi_value, n)`, buckets 1..`nb` — the
    * partner of [[histogram]]'s fixed-width buckets for skewed
    * distributions where fixed widths put 99% of rows in one bar.
    *
    * `exact = true` ranks with `ntile` over the total order
    * `(c, idCol)` — an unpartitioned window, i.e. a single-partition
    * sort: the ORACLE path, correct at witness scale only.
    * `exact = false` is the 100 TB path: bucket boundaries come from
    * one `approx_percentile` pass (a broadcast scalar), assignment is
    * a map-side comparison against the boundary array, and the
    * per-bucket aggregate shuffles `nb` groups — no global sort
    * anywhere. Values equal to a boundary land in the lower bucket
    * (strict `<` count, pinned); bucket depths are then approximate
    * within the sketch's rank error (spec-pinned ±20% at accuracy
    * 10k). */
  def equidepthHistogram(df: DataFrame, c: String, idCol: String, nb: Int,
                         exact: Boolean = true,
                         accuracy: Int = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nb >= 1, "need at least one bucket")
    val vals = df.where(col(c).isNotNull)
    val bucketed =
      if (exact)
        vals.withColumn("bucket", ntile(nb).over(Window.orderBy(col(c), col(idCol))))
      else {
        val ps = (1 until nb).map(i => i.toDouble / nb)
        if (ps.isEmpty) vals.withColumn("bucket", lit(1))
        else {
          val bounds = vals.agg(
            expr(s"approx_percentile($c, array(${ps.mkString(", ")}), $accuracy)")
              .as("__bnds"))
          vals.crossJoin(broadcast(bounds))
            .withColumn("bucket",
              (lit(1) + expr(s"size(filter(__bnds, b -> b < $c))")).cast("int"))
        }
      }
    bucketed
      .groupBy(col("bucket"))
      .agg(min(col(c)).as("lo_value"), max(col(c)).as("hi_value"),
        count(lit(1)).as("n"))
      .orderBy("bucket")
  }

  /** Per-group ALGEBRAIC stats tuple over a numeric column —
    * `(group_value, n_rows, n_nulls, n_vals, sum_value, sum_sq,
    * min_value, max_value)` — every field a commutative monoid, so
    * stats frames merge by re-aggregation ([[mergeStats]]) without
    * touching the underlying data.
    *
    * This is how corpus statistics stay current at 100 TB: profile
    * each incoming drop once, persist the few-KB stats frame, and
    * fold it into the running totals — never re-scan history. The
    * q121 witness proves merge(old, delta) is bitwise-equal to a
    * full recompute (integer sums are exact; see [[finalizeStats]]
    * for the derived floats). */
  def numericStats(df: DataFrame, valueCol: String, groupCol: String): DataFrame =
    df.groupBy(col(groupCol).cast("string").as("group_value"))
      .agg(
        count(lit(1)).cast("bigint").as("n_rows"),
        (count(lit(1)) - count(col(valueCol))).cast("bigint").as("n_nulls"),
        count(col(valueCol)).cast("bigint").as("n_vals"),
        sum(col(valueCol)).cast("bigint").as("sum_value"),
        sum(col(valueCol).cast("bigint") * col(valueCol).cast("bigint"))
          .cast("bigint").as("sum_sq"),
        min(col(valueCol)).cast("bigint").as("min_value"),
        max(col(valueCol)).cast("bigint").as("max_value"))

  /** Fold any number of [[numericStats]] frames into one: counts and
    * sums add, min/max take extrema — a tiny stats-frame union +
    * groupBy, no data pass. Groups missing from one part merge
    * naturally through the union. */
  def mergeStats(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "need at least one stats frame")
    parts.reduce(_ unionByName _)
      .groupBy(col("group_value"))
      .agg(
        sum(col("n_rows")).cast("bigint").as("n_rows"),
        sum(col("n_nulls")).cast("bigint").as("n_nulls"),
        sum(col("n_vals")).cast("bigint").as("n_vals"),
        sum(col("sum_value")).cast("bigint").as("sum_value"),
        sum(col("sum_sq")).cast("bigint").as("sum_sq"),
        min(col("min_value")).as("min_value"),
        max(col("max_value")).as("max_value"))
  }

  /** Derive `mean_value` and `var_value` (population) from an
    * algebraic stats frame. The expression trees are pinned —
    * `sum/n` and `sum_sq/n − (sum/n)·(sum/n)` — so each derived
    * float is the same short chain of correctly-rounded IEEE ops in
    * any engine rendering the same formula (oracle-parity rule:
    * fixed tree, no libm). */
  def finalizeStats(stats: DataFrame): DataFrame = {
    val n = col("n_vals").cast("double")
    val mean = col("sum_value").cast("double") / n
    stats
      .withColumn("mean_value", mean)
      .withColumn("var_value", col("sum_sq").cast("double") / n - mean * mean)
  }

  /** Benford shares in exact integer ppm, driver-computed once —
    * shared with the independent-engine oracle so both sides carry
    * identical constants. */
  val benfordPpm: Map[Int, Long] = (1 to 9).map(d =>
    d -> math.floor(1e6 * math.log10(1.0 + 1.0 / d)).toLong).toMap

  /** Benford first-digit audit of an integer-magnitude column — the
    * classic fabricated-/synthetic-data smell test (Newcomb 1881,
    * Benford 1938; naturally-occurring multi-scale magnitudes put
    * digit d first with probability log10(1+1/d), and invented or
    * truncated numbers usually don't). Reports, per leading digit
    * 1..9: the observed count, observed share, the Benford share,
    * and the signed deviation — all in exact integer ppm. The
    * Benford shares are DRIVER-computed constants injected as
    * literals (the repo's no-runtime-libm rule), and the leading
    * digit comes from the decimal STRING rendering of
    * `floor(abs(value))` — floor before the integer cast because
    * engines disagree on double→int cast rounding, and string-derive
    * because runtime log10 would race libm. Null values and
    * `|v| < 1` are excluded (no integer leading digit).
    *
    * This is an AUDIT, not a gate: columns with narrow ranges (unit
    * prices, bounded quantities) legitimately deviate — read
    * `delta_ppm` against the column's generative story.
    *
    * Scale shape: one digit-keyed aggregation (9 groups, map-side
    * combined) + a broadcast total; per-row work is a cast and a
    * substring inside codegen. */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val bexpr = (1 to 9).map(d => s"WHEN digit = $d THEN ${benfordPpm(d)}L")
      .mkString("CASE ", " ", " END")
    // floor(abs(v)) BEFORE the integer cast: engines disagree on
    // double→int cast rounding (truncate vs round-to-nearest), floor
    // is unambiguous. |v| < 1 rows are excluded — no integer leading
    // digit.
    val counts = df
      .where(col(valueCol).isNotNull && expr(s"floor(abs($valueCol)) >= 1"))
      .withColumn("digit",
        expr(s"CAST(substring(CAST(CAST(floor(abs($valueCol)) AS BIGINT) AS STRING), 1, 1) AS INT)"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).cast("bigint").as("n"))
    val total = counts.agg(sum(col("n")).cast("bigint").as("__tot"))
    counts.crossJoin(broadcast(total))
      .withColumn("share_ppm", expr("1000000L * n div __tot"))
      .withColumn("benford_ppm", expr(bexpr))
      .withColumn("delta_ppm", col("share_ppm") - col("benford_ppm"))
      .select(col("digit"), col("n"), col("share_ppm"),
        col("benford_ppm"), col("delta_ppm"))
      .orderBy("digit")
  }

  /** Per-group least-squares TREND of integer-quantized observations:
    * the OLS slope `(n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)` as the exact
    * scaled integer `slope_micro = sign · (1e6·|num| div den)` —
    * integer/DECIMAL(38,0) end to end, no float sums (the graft
    * ratio discipline), with the sign handled OUTSIDE the integral
    * divide because engines disagree on negative integer division
    * (floor vs truncate). `x` is centered per group on its min
    * before squaring, which keeps every product well inside
    * DECIMAL(38,0) without changing the slope. A constant-x group
    * has no slope → NULL.
    *
    * Callers pass integer-valued x/y columns (quantize floats first
    * — e.g. `floor(value·100 + 0.5)` cents, identical in any
    * engine). Output: `(groupCol, n, slope_micro)`.
    *
    * Scale shape: one broadcast min-join + one group-bounded
    * five-sum aggregate (map-side combined). */
  def groupTrend(df: DataFrame, groupCol: String, xCol: String,
                 yCol: String): DataFrame = {
    val mins = df.groupBy(col(groupCol)).agg(min(col(xCol)).as("__x0"))
    val c = df.join(broadcast(mins), Seq(groupCol))
      .withColumn("__x", (col(xCol) - col("__x0")).cast("decimal(38,0)"))
      .withColumn("__y", col(yCol).cast("decimal(38,0)"))
    c.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
      .withColumn("__num", col("n") * col("__sxy") - col("__sx") * col("__sy"))
      .withColumn("__den", col("n") * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("slope_micro", expr(
        "CASE WHEN __den = 0 THEN NULL ELSE " +
          "CASE WHEN __num < 0 THEN -1L ELSE 1L END * " +
          "CAST((CAST(1000000 AS DECIMAL(38,0)) * abs(__num)) div __den AS BIGINT) END"))
      .select(col(groupCol), col("n"), col("slope_micro"))
      .orderBy(col(groupCol))
  }

  /** Gini-impurity information gain of a categorical feature for a
    * categorical label — the log-free (hence integer-exact)
    * feature-selection score a decision-tree split uses: parent
    * impurity `1 − Σ_c p_c²` minus the feature-value-weighted child
    * impurity. Kept cross-engine exact with fixed floor points:
    * parent purity `(1e6·Σ n_c²) div N²`, per-value purity share
    * `s_v = (1e6·Σ_c n_vc²) div n_v`, weighted child purity
    * `(Σ s_v) div N`; `gain_ppm = child_purity − parent_purity`
    * (≥ 0 up to the two floors). Output one row:
    * `(n, parent_gini_ppm, child_gini_ppm, gain_ppm)`.
    *
    * Scale shape: one (feature, label) contingency aggregation
    * (map-side combined, |feature|×|label|-bounded), folded twice
    * along each margin — nothing corpus-sized moves after the first
    * partial aggregation.
    */
  def giniGain(df: DataFrame, featureCol: String,
               labelCol: String): DataFrame = {
    val cells = df.groupBy(col(featureCol).as("__f"), col(labelCol).as("__l"))
      .agg(count(lit(1)).cast("bigint").as("__n"))
    val parent = cells.groupBy(col("__l"))
      .agg(sum(col("__n")).cast("bigint").as("__nc"))
      .agg(sum(col("__nc")).cast("bigint").as("n"),
        sum(expr("CAST(__nc AS DECIMAL(38,0)) * __nc")).as("__sq"))
      .withColumn("parent_gini_ppm", expr(
        "1000000L - CAST((CAST(1000000 AS DECIMAL(38,0)) * __sq) div " +
          "(CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"))
      .select(col("n"), col("parent_gini_ppm"))
    val children = cells.groupBy(col("__f"))
      .agg(sum(col("__n")).cast("bigint").as("__nv"),
        sum(expr("CAST(__n AS DECIMAL(38,0)) * __n")).as("__sqv"))
      .withColumn("__sv", expr(
        "CAST((CAST(1000000 AS DECIMAL(38,0)) * __sqv) div __nv AS BIGINT)"))
      .agg(sum(col("__sv")).cast("bigint").as("__ssum"))
    parent.crossJoin(broadcast(children))
      .withColumn("child_gini_ppm", expr("1000000L - (__ssum div n)"))
      .withColumn("gain_ppm",
        expr("(1000000L - child_gini_ppm) - (1000000L - parent_gini_ppm)"))
      .select(col("n"), col("parent_gini_ppm"), col("child_gini_ppm"),
        col("gain_ppm"))
  }

  /** Per-group h-index: the largest `h` such that the group has at
    * least `h` items with "citation" count ≥ `h` — the rank-robust
    * productivity/impact summary (users by high-value events, sources
    * by highly-cited documents). Equivalently `#{rank_i ≤ c_i}` with
    * ranks in descending citation order, which is tie-invariant: rows
    * tied on `c` occupy a fixed rank interval, so the count does not
    * depend on their relative order. Negative citations are clamped
    * to 0 by the CALLER if needed — this operator takes them as-is.
    *
    * Scale shape: one per-group window (rank) + one keyed
    * aggregation; group size bounds the window partition, and groups
    * (users/sources) are many, so partitions parallelize. The sort is
    * bounded by ITEMS per group — feed per-item counts (one row per
    * (group, item), the natural input), not raw events; a single
    * group holding corpus-sized rows would ride one reducer's sort,
    * and since h ≤ √(Σc) only the top ~√n ranks matter, a bounded
    * `graft_bottom_k` prefilter is the escape hatch if one is ever
    * needed. */
  def hIndex(df: DataFrame, groupCol: String, citeCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__c").desc)
    df.select(col(groupCol), col(citeCol).cast("bigint").as("__c"))
      .withColumn("__rn", row_number().over(w).cast("bigint"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).cast("bigint").as("n"),
        sum(when(col("__rn") <= col("__c"), 1L).otherwise(0L))
          .cast("bigint").as("h_index"))
  }
}
