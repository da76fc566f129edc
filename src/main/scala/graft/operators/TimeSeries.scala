package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series shaping over event streams at rest. */
object TimeSeries {

  /** Zero-filled per-key bucket counts: every `(key, bucket)` cell of
    * the COMPLETE time spine appears, missing cells as 0 — the
    * gap-filling a rate chart or anomaly detector needs (a groupBy
    * alone silently omits empty buckets, and "no events" is exactly
    * the signal an alert cares about).
    *
    * Scale shape: counts aggregate first (map-side combine), so the
    * spine join touches only aggregated cells; the spine itself is
    * one `sequence` explode over the observed bucket range crossed
    * with the distinct keys — both dim-bounded (hours × key
    * cardinality), never event-volume. An empty input yields an
    * empty (not null-row) result.
    *
    * `tsNanosCol` is the driver layout's bigint nanoseconds; output
    * `bucket_epoch` is epoch seconds of the bucket start. */
  def fillGaps(events: DataFrame, tsNanosCol: String, keyCol: String,
               bucketSec: Long): DataFrame = {
    require(bucketSec >= 1, "bucketSec must be positive")
    val counts = events
      .withColumn("__h", expr(s"$tsNanosCol div (${bucketSec}L * 1000000000L)"))
      .groupBy(col(keyCol), col("__h"))
      .agg(count(lit(1)).cast("bigint").as("n"))
    val spine = counts.agg(min(col("__h")).as("__h0"), max(col("__h")).as("__h1"))
      .where(col("__h0").isNotNull)
      .select(explode(expr("sequence(__h0, __h1)")).as("__h"))
    val keys = counts.select(col(keyCol)).distinct()
    spine.crossJoin(keys)
      .join(counts, Seq(keyCol, "__h"), "left")
      .select(col(keyCol),
        (col("__h") * bucketSec).cast("bigint").as("bucket_epoch"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(keyCol, "bucket_epoch")
  }

  /** Flatten overlapping (or touching) intervals per key — the
    * classic interval-merge: spans sorted by `(startCol, endCol)`, a
    * span starts a new merged group iff its start exceeds the running
    * max end of every earlier span (strictly: touching intervals
    * merge). Output one row per merged span:
    * `(keyCol, ivl_start, ivl_end, n_merged)`.
    *
    * The calendar/coverage primitive behind span-coalescing jobs —
    * user activity spans, PII redaction span unions, retention
    * windows. Integer-typed bounds stay exact end to end (no
    * arithmetic beyond min/max/count).
    *
    * Scale shape (100 TB): two key-partitioned windows over the same
    * `(startCol, endCol)` sort — ONE shuffle, the sort reused — then
    * a groupBy on `(key, group)` that partial-aggregates. Per-key
    * history must be entity-bounded (the sessionize contract);
    * unbounded keys go through the streaming session-window path
    * instead. */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
                     endCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Seq(col(startCol), col(endCol))
    val wPrev = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__pmax", max(col(endCol)).over(wPrev))
      .withColumn("__new",
        when(col("__pmax").isNull || col(startCol) > col("__pmax"), 1L)
          .otherwise(0L))
      .withColumn("__gid", sum(col("__new")).over(wCum))
      .groupBy(col(keyCol), col("__gid"))
      .agg(
        min(col(startCol)).as("ivl_start"),
        max(col(endCol)).as("ivl_end"),
        count(lit(1)).cast("bigint").as("n_merged"))
      .select(col(keyCol), col("ivl_start"), col("ivl_end"), col("n_merged"))
  }

  /** Forward-fill (last observation carried forward): `out` = the
    * most recent non-null `valueCol` within the key's
    * `(tsCol, idCol)`-ordered timeline — the standard sensor/metric
    * imputation. Pure value SELECTION (never arithmetic), so filled
    * values are bitwise the originals. Leading nulls (no prior
    * observation) stay null.
    *
    * Scale shape: one key-partitioned window — the sessionize
    * shuffle; per-key history is entity-bounded. */
  def forwardFill(df: DataFrame, keyCol: String, tsCol: String,
                  idCol: String, valueCol: String,
                  out: String = "filled"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(!df.columns.contains(out), s"forwardFill reserves column name $out")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(out, last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** Rolling per-key aggregates over the trailing `nRows`+current
    * window: `roll_sum` (DECIMAL-exact — engines disagree on
    * float-sum association inside window frames, decimals don't) and
    * `roll_n`. The moving-average primitive: divide the two
    * downstream for an exact-numerator mean. */
  /** Exact rolling MEDIAN over the trailing `nRows` window (current
    * row inclusive) — the robust monitoring companion to
    * [[withRolling]]'s sums (a single spike moves a rolling mean,
    * not the rolling median). Values must be integral; the median of
    * an even window is the LOWER middle (exact integer, no float
    * averaging — pinned, portable). `roll_n` counts the actual
    * window rows so warmup rows are distinguishable.
    *
    * Per-row cost is O(w log w) from sorting the collected window —
    * right for the small monitoring windows this is for (w ≤ ~100);
    * the window list is bounded by `nRows`, never the key's history.
    * Same one-shuffle-per-key shape as every TimeSeries op. */
  def withRollingMedian(df: DataFrame, keyCol: String, tsCol: String,
                        idCol: String, valueCol: String,
                        nRows: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nRows >= 1 && nRows <= 1000, "nRows must be in [1, 1000]")
    val reserved = Set("__rw", "roll_median", "roll_n")
    val collisions = df.columns.toSet.intersect(reserved)
    require(collisions.isEmpty,
      s"withRollingMedian reserves column names ${reserved.mkString(", ")}; " +
        s"rename the colliding input columns: ${collisions.mkString(", ")}")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(-(nRows - 1), 0)
    df.withColumn("__rw", sort_array(collect_list(
        expr(s"CAST($valueCol AS BIGINT)")).over(w)))
      .withColumn("roll_n", size(col("__rw")).cast("bigint"))
      // lower middle: element (n+1) div 2 of the sorted window
      .withColumn("roll_median",
        expr("element_at(__rw, CAST((size(__rw) + 1) div 2 AS INT))"))
      .drop("__rw")
  }

  def withRolling(df: DataFrame, keyCol: String, tsCol: String,
                  idCol: String, valueCol: String, nRows: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nRows >= 1, "nRows must be positive")
    val reserved = Set("roll_sum", "roll_n")
    val collisions = df.columns.toSet.intersect(reserved)
    require(collisions.isEmpty,
      s"withRolling reserves column names ${reserved.mkString(", ")}; " +
        s"rename the colliding input columns: ${collisions.mkString(", ")}")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(-nRows, 0)
    df.withColumn("roll_sum",
        sum(col(valueCol).cast("decimal(18,2)")).over(w).cast("double"))
      .withColumn("roll_n", count(col(valueCol)).over(w).cast("bigint"))
  }

  /** Trailing z-score anomaly flag — is this value more than `k`
    * standard deviations from the mean of the `nRows` values strictly
    * before it (per key, `(tsCol, idCol)` order)? The alerting read
    * on a metric stream, and the "did this source's quality suddenly
    * shift?" gate on ingest.
    *
    * Exactness discipline: `valueCol` must be integral (callers scale
    * floats — the q201 `floor(v·100+0.5)` pattern) and the σ-compare
    * is cross-multiplied into one integer inequality,
    * `(w·x − S1)² > k²·(w·S2 − S1²)` with S1/S2 the trailing
    * sum/sum-of-squares — no float mean, no sqrt, bitwise identical
    * in any engine. Rows with fewer than `nRows` predecessors get
    * NULL (insufficient evidence, not "normal"); a zero-variance
    * window flags any deviation (lhs > 0 = rhs).
    *
    * Scale shape: one key-partitioned window (the sessionize shape)
    * computing three trailing aggregates over the same frame — one
    * shuffle, no collect. */
  def flagAnomalies(df: DataFrame, keyCol: String, tsCol: String,
                    idCol: String, valueCol: String, nRows: Int,
                    k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nRows >= 2, "nRows must be at least 2 (variance needs evidence)")
    require(k >= 1, "k must be positive")
    val reserved = Set("__x", "__s1", "__s2", "__w", "n_hist", "is_anomaly")
    val collisions = df.columns.toSet.intersect(reserved)
    require(collisions.isEmpty,
      s"flagAnomalies reserves column names ${reserved.mkString(", ")}; " +
        s"rename the colliding input columns: ${collisions.mkString(", ")}")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(-nRows, -1)
    df.withColumn("__x", expr(
        s"CASE WHEN $valueCol IS NULL " +
          s"THEN raise_error('flagAnomalies: null $valueCol') " +
          s"ELSE CAST($valueCol AS DECIMAL(38,0)) END"))
      .withColumn("__s1", sum(col("__x")).over(w))
      .withColumn("__s2", sum(expr("__x * __x").cast("decimal(38,0)")).over(w))
      .withColumn("__w", count(col("__x")).over(w).cast("decimal(38,0)"))
      .withColumn("n_hist", col("__w").cast("bigint"))
      .withColumn("is_anomaly", expr(
        s"CASE WHEN __w < $nRows THEN CAST(NULL AS BOOLEAN) ELSE " +
          "(__w * __x - __s1) * (__w * __x - __s1) > " +
          s"CAST(${k.toLong * k} AS DECIMAL(38,0)) * (__w * __s2 - __s1 * __s1) END"))
      .drop("__x", "__s1", "__s2", "__w")
  }

  /** Per-key one-sided CUSUM drift statistic WITHOUT reset (Page
    * 1954, the running-max form): with increments `x_i − target`,
    * the statistic `s_i = P_i − min_{j≤i} P_j` (prefix sum minus
    * running minimum) measures the largest sustained upward drift
    * ending at `i` — the standard changepoint score for "did this
    * user/feed's level shift?". The no-reset form is chosen
    * DELIBERATELY: it is exactly two windows (prefix sum + running
    * min) instead of a sequential keep-state fold, and an ALARM is
    * an UPCROSSING (`s_i ≥ h` where `s_{i−1} < h`), so repeated
    * alarms still register without per-row reset state.
    *
    * All arithmetic in BIGINT on the caller's integer-cast value —
    * exact, bitwise-portable (NULL values raise; quantize a double
    * with `floor()` first). Output: one row per key —
    * `(keyCol, n_points, max_s, n_alarms, first_alarm_ts)` (alarm
    * fields 0/NULL when the threshold is never crossed).
    *
    * Scale shape (100 TB): per-key windows over (ts, id) — the
    * sessionize shuffle shape, all three windows share ONE sort;
    * state is never driver-side and nothing is quadratic. */
  def cusumUpcrossings(df: DataFrame, keyCol: String, tsCol: String,
                       idCol: String, valueCol: String,
                       target: Long, threshold: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(threshold >= 1, "threshold must be positive")
    val reserved = Set("__x", "__p", "__m", "__s", "__up", "n_points",
      "max_s", "n_alarms", "first_alarm_ts")
    val collisions = df.columns.toSet.intersect(reserved)
    require(collisions.isEmpty,
      s"cusumUpcrossings reserves column names ${reserved.mkString(", ")}; " +
        s"rename the colliding input columns: ${collisions.mkString(", ")}")
    val wAll = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val scored = df
      .withColumn("__x", expr(
        s"CASE WHEN $valueCol IS NULL " +
          s"THEN raise_error('cusumUpcrossings: null $valueCol') " +
          s"ELSE CAST($valueCol AS BIGINT) - CAST($target AS BIGINT) END"))
      .withColumn("__p", sum(col("__x")).over(wAll))
      .withColumn("__m", min(least(col("__p"), lit(0L))).over(wAll))
      .withColumn("__s", col("__p") - col("__m"))
      .withColumn("__up",
        (col("__s") >= threshold) &&
          coalesce(lag(col("__s"), 1).over(wPrev), lit(0L)) < threshold)
    scored.groupBy(col(keyCol))
      .agg(count(lit(1)).cast("bigint").as("n_points"),
        max(col("__s")).as("max_s"),
        sum(when(col("__up"), 1L).otherwise(0L)).cast("bigint").as("n_alarms"),
        min(when(col("__up"), col(tsCol))).as("first_alarm_ts"))
      .orderBy(col(keyCol))
  }

  /** Per-key event debounce (throttle): how many events survive when
    * an event is kept only if at least `minGap` elapsed since
    * the previously KEPT one — burst collapse for alerting, rate
    * limiting, and interaction-log cleaning. A SEQUENTIAL recurrence
    * (each keep depends on the last keep, which a session window
    * cannot express: a 10-minute burst under a 60 s throttle keeps
    * ten events, a gap-sessionizer's first-of-session keeps one) —
    * computed with the [[emaPerKey]] list-fold discipline: sorted
    * per-key timestamps, one strict left-to-right fold. The
    * accumulator packs `(n_kept, last_kept_ts)` into ONE bigint
    * (`n·2⁵¹ + ts` — µs/ns epochs stay under 2⁵¹ until ~2041/2041·10³
    * respectively for µs; a SCALAR acc because DuckDB's list_reduce
    * mis-evaluates struct accumulators across multiple rows).
    * Bitwise in any engine folding the same order (`minGap` is in
    * `tsCol`'s unit; timestamps must be non-negative and < 2⁵¹);
    * per-key history must be entity-bounded (unbounded keys stream
    * via mapGroupsWithState instead).
    *
    * Output: `(userCol, n_events, n_kept)`. */
  def debounceCounts(events: DataFrame, userCol: String, tsCol: String,
                     minGap: Long): DataFrame = {
    require(minGap >= 1, "minGap must be positive")
    val S = 1L << 51
    events.groupBy(col(userCol))
      .agg(count(lit(1)).cast("bigint").as("n_events"),
        sort_array(collect_list(col(tsCol).cast("long"))).as("__ts"))
      .withColumn("n_kept", expr(
        s"aggregate(__ts, CAST(0 AS BIGINT), (acc, e) -> " +
          s"IF(acc div ${S}L = 0L OR e - acc % ${S}L >= ${minGap}L, " +
          s"(acc div ${S}L + 1L) * ${S}L + e, acc)) div ${S}L").cast("bigint"))
      .drop("__ts")
  }

  /** Per-key exponential moving average — a SEQUENTIAL recurrence
    * (`acc ← α·x + (1−α)·acc`) that windows can't express — computed
    * WITHOUT mapGroups: collect the key's values in `(tsCol, idCol)`
    * order and fold once with `aggregate` (strict left-to-right, a
    * fixed two-multiply-one-add IEEE tree per step — bitwise in any
    * engine folding the same order; the q51 list-fold discipline).
    * Seed is 0.0.
    *
    * Scale shape: ONE aggregation keyed on `keyCol`; per-key history
    * must be entity-bounded (the [[graft.streaming.UserTotalsProcessor]]
    * contract) — unbounded keys stream instead. `alpha` should be a
    * dyadic rational (1/4, 1/2) when cross-engine bitwise parity
    * matters; any alpha is deterministic within Spark. */
  def emaPerKey(df: DataFrame, keyCol: String, tsCol: String,
                idCol: String, valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    df.groupBy(col(keyCol))
      .agg(sort_array(collect_list(
        struct(col(tsCol).as("t"), col(idCol).as("i"),
          col(valueCol).cast("double").as("v")))).as("__s"))
      .withColumn("ema", expr(
        s"aggregate(transform(__s, r -> r.v), CAST(0 AS DOUBLE), " +
          s"(acc, x) -> CAST($alpha AS DOUBLE) * x + CAST(${1 - alpha} AS DOUBLE) * acc)"))
      .select(col(keyCol), col("ema"))
  }

  /** Autocorrelation function of the event-count series at the given
    * lags: bucket counts `x_t` (bucket = `ts div bucketSec`), then
    * `r_l = Σ (x_t − x̄)(x_{t+l} − x̄) / Σ (x_t − x̄)²` — kept
    * integer-exact by clearing the mean's denominator (centered value
    * `c_t = N·x_t − S`; numerator and denominator scale by the same
    * N², which cancels), with DECIMAL(38,0) products and micro-scaled
    * floor division. Pairs exist only where BOTH buckets were
    * observed (gap-aware; zero-fill first with [[fillGaps]] when "no
    * events" should count as x=0). Output: `(lag, n_pairs, acf_ppm)`.
    *
    * Scale shape: the raw stream collapses to bucket counts first
    * (map-side combine) — every later step runs on the bucket-grain
    * series, which is time-range-bounded, not event-bounded; the lag
    * pairing is an equi-join on the shifted bucket id; the two
    * scalar frames (mean, denominator) broadcast.
    */
  def acf(df: DataFrame, tsNanosCol: String, lags: Seq[Int],
          bucketSec: Long): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1), "lags must be >= 1")
    require(bucketSec >= 1, "bucketSec must be positive")
    val x = df
      .withColumn("__h", expr(s"$tsNanosCol div (${bucketSec}L * 1000000000L)"))
      .groupBy(col("__h"))
      .agg(count(lit(1)).cast("bigint").as("__x"))
    val tot = x.agg(count(lit(1)).cast("bigint").as("__N"),
      sum(col("__x")).cast("bigint").as("__S"))
    val c = x.crossJoin(broadcast(tot))
      .withColumn("__c", expr("__N * __x - __S"))
      .select(col("__h"), col("__c"))
    val den = c.agg(
      sum(expr("CAST(__c AS DECIMAL(38,0)) * __c")).as("__den"))
    val b = c.select(col("__h").as("__h2"), col("__c").as("__c2"))
    c.withColumn("lag",
        explode(expr(s"array(${lags.mkString("L,")}L)")))
      .join(b, col("__h2") === col("__h") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).cast("bigint").as("n_pairs"),
        sum(expr("CAST(__c AS DECIMAL(38,0)) * __c2")).as("__num"))
      .crossJoin(broadcast(den))
      .withColumn("acf_ppm", expr(
        "CAST(CASE WHEN __den = 0 THEN NULL ELSE " +
          "(CASE WHEN __num < 0 THEN -1 ELSE 1 END) * " +
          "((1000000 * abs(__num)) div __den) END AS BIGINT)"))
      .select(col("lag"), col("n_pairs"), col("acf_ppm"))
      .orderBy(col("lag"))
  }

  /** Build Slowly-Changing-Dimension TYPE 2 validity intervals from a
    * change history: per key ordered by `(tsCol, ordCol)`, runs of
    * consecutive EQUAL attribute values collapse into one row
    * `(key, attr, valid_from, valid_to)` — half-open intervals, the
    * current value carrying `valid_to = NULL`. This is the build side
    * of temporal dimension modeling; the query side (attach the
    * version valid at fact time) is [[graft.operators.AsofJoin]].
    * Null-safe attribute equality: a run of NULLs is one interval.
    *
    * Scale shape: one key-keyed shuffle whose sort is SHARED by the
    * lag (change detection), the run-id accumulation, and the lead
    * (interval close) — gaps-and-islands entirely within per-key
    * windows (entity-bounded history, the sessionize contract), no
    * joins, no global sort.
    */
  def scd2Intervals(df: DataFrame, keyCol: String, tsCol: String,
                    ordCol: String, attrCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(ordCol))
    val wAll = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val marked = df
      .withColumn("__chg",
        when(row_number().over(w) === 1, 1L)
          .when(!(lag(col(attrCol), 1).over(w) <=> col(attrCol)), 1L)
          .otherwise(0L))
      .withColumn("__run", sum(col("__chg")).over(wAll))
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("__run"))
    marked
      .groupBy(col(keyCol), col("__run"))
      .agg(first(col(attrCol)).as("attr"),
        min(col(tsCol)).cast("bigint").as("valid_from"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wRun))
      .select(col(keyCol), col("attr"), col("valid_from"), col("valid_to"))
  }

  /** Offline change-point detection: the bucket boundary that
    * maximizes the mean shift of the event-count series. For every
    * candidate split after bucket `t`, the left/right count sums
    * `(n_l, S_l)` / `(n_r, S_r)` give the exact integer shift score
    * `(1e6 · |S_l·n_r − S_r·n_l|) div (n_l · n_r)` = 1e6 ·
    * |mean_l − mean_r| — the argmax is where the level changed (the
    * offline partner of the sequential [[cusumUpcrossings]] /
    * streaming CUSUM alarms). Output one row: `(split_bucket,
    * n_left, n_right, mean_left_micro, mean_right_micro,
    * shift_micro)`; ties prefer the earliest split.
    *
    * Scale shape: the stream collapses to bucket counts first
    * (map-side combine); every later step — cumulative sums and the
    * argmax — runs on the time-range-bounded bucket series (the
    * dimension-frame window convention, cf. [[Mixing.groupGini]]),
    * with the argmax as a 1-row TakeOrdered.
    */
  def bestMeanShift(df: DataFrame, tsNanosCol: String,
                    bucketSec: Long): DataFrame = {
    require(bucketSec >= 1, "bucketSec must be positive")
    val x = df
      .withColumn("__h", expr(s"$tsNanosCol div (${bucketSec}L * 1000000000L)"))
      .groupBy(col("__h"))
      .agg(count(lit(1)).cast("bigint").as("__x"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__h"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = x.agg(count(lit(1)).cast("bigint").as("__n"),
      sum(col("__x")).cast("bigint").as("__S"))
    x.withColumn("__i", count(lit(1)).over(w).cast("bigint"))
      .withColumn("__cs", sum(col("__x")).over(w).cast("bigint"))
      .crossJoin(broadcast(tot))
      .where(col("__i") < col("__n")) // a split needs a non-empty right side
      .withColumn("n_left", col("__i"))
      .withColumn("n_right", expr("__n - __i"))
      .withColumn("shift_micro", expr(
        "CAST((CAST(1000000 AS DECIMAL(38,0)) * " +
          "abs(__cs * (__n - __i) - (__S - __cs) * __i)) div " +
          "(CAST(__i AS DECIMAL(38,0)) * (__n - __i)) AS BIGINT)"))
      .withColumn("mean_left_micro", expr("(1000000L * __cs) div __i"))
      .withColumn("mean_right_micro", expr("(1000000L * (__S - __cs)) div (__n - __i)"))
      .select(col("__h").as("split_bucket"), col("n_left"), col("n_right"),
        col("mean_left_micro"), col("mean_right_micro"), col("shift_micro"))
      .orderBy(col("shift_micro").desc, col("split_bucket"))
      .limit(1)
  }

  /** Additive seasonal decomposition (STL-lite, integer-exact): the
    * zero-filled bucket-count series splits into
    * trend (centered moving average over one full period) +
    * per-phase seasonal component (mean of the detrended series at
    * that phase) — emitted milli-scaled,
    * `seasonal_milli_p = trunc(Σ_p (1000·x_t − trend_milli_t) / n_p)`
    * with sign-split truncation so any engine reproduces it.
    * Output: `(phase, n_buckets, seasonal_milli)` — the classic
    * "Mondays run +12% of baseline" decomposition with an exact
    * cross-engine witness (float STL cannot promise that).
    *
    * Scale shape: the stream collapses to bucket counts first; the
    * spine fill, the centered-window trend, and the phase fold all
    * run on the time-range-bounded bucket series (dimension-frame
    * window convention, cf. [[acf]]).
    */
  def seasonalDecompose(df: DataFrame, tsNanosCol: String,
                        bucketSec: Long, period: Int): DataFrame = {
    require(bucketSec >= 1, "bucketSec must be positive")
    require(period >= 2 && period % 2 == 1,
      "period must be odd so the centered window is symmetric")
    val half = period / 2
    val counts = df
      .withColumn("__h", expr(s"$tsNanosCol div (${bucketSec}L * 1000000000L)"))
      .groupBy(col("__h"))
      .agg(count(lit(1)).cast("bigint").as("__x"))
    val spine = counts.agg(min(col("__h")).as("__h0"), max(col("__h")).as("__h1"))
      .where(col("__h0").isNotNull)
      .select(explode(expr("sequence(__h0, __h1)")).as("__h"))
    val filled = spine.join(counts, Seq("__h"), "left")
      .select(col("__h"), coalesce(col("__x"), lit(0L)).as("__x"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__h"))
      .rowsBetween(-half, half)
    filled
      .withColumn("__tsum", sum(col("__x")).over(w))
      .withColumn("__tcnt", count(lit(1)).over(w))
      .withColumn("__trend_milli", expr("(1000L * __tsum) div __tcnt"))
      .withColumn("__det", expr("1000L * __x - __trend_milli"))
      .withColumn("phase", col("__h") % period)
      .groupBy(col("phase"))
      .agg(count(lit(1)).cast("bigint").as("n_buckets"),
        sum(col("__det")).cast("bigint").as("__sdet"))
      .withColumn("seasonal_milli", expr(
        "CASE WHEN __sdet < 0 THEN -((-__sdet) div n_buckets) " +
          "ELSE __sdet div n_buckets END"))
      .select(col("phase"), col("n_buckets"), col("seasonal_milli"))
      .orderBy(col("phase"))
  }

  /** Phase-of-period seasonal profile: every event lands in phase
    * `(ts div unitSec) % period` (e.g. unit = day, period = 7 →
    * day-of-week with phase 0 anchored to the epoch day, Thursday —
    * pure integer arithmetic, no calendar library to disagree over),
    * and each phase reports its event count, traffic share, and
    * seasonal index `(1e6 · period · n_phase) div n_total` — 1e6
    * means "an average phase", 2e6 "double the average". Output:
    * `(phase, n, share_ppm, index_ppm)`.
    *
    * Scale shape: one map-side-combined count into `period` cells;
    * the total broadcasts. Nothing else moves.
    */
  def seasonalIndex(df: DataFrame, tsNanosCol: String, unitSec: Long,
                    period: Int): DataFrame = {
    require(unitSec >= 1, "unitSec must be positive")
    require(period >= 2, "period must be at least 2")
    val x = df
      .withColumn("phase", expr(
        s"($tsNanosCol div (${unitSec}L * 1000000000L)) % ${period}L"))
      .groupBy(col("phase"))
      .agg(count(lit(1)).cast("bigint").as("n"))
    val tot = x.agg(sum(col("n")).cast("bigint").as("__T"))
    x.crossJoin(broadcast(tot))
      .withColumn("share_ppm", expr("(1000000L * n) div __T"))
      .withColumn("index_ppm", expr(s"(1000000L * ${period}L * n) div __T"))
      .select(col("phase"), col("n"), col("share_ppm"), col("index_ppm"))
      .orderBy(col("phase"))
  }

  /** Rolling distinct actives (DAU/WAU-style): for every time bucket
    * in the observed range, the EXACT count of distinct entities seen
    * in the trailing `windowBuckets` buckets, alongside the bucket's
    * own distinct count and the stickiness ratio
    * (`1e6·n_bucket div n_window` — the DAU/WAU engagement metric).
    * Exact distinct-over-sliding-window is normally awkward at scale;
    * the trick is that per-bucket PRESENCE (distinct (bucket,
    * entity)) is small relative to the event stream, and each
    * presence row covers exactly `windowBuckets` target buckets — so
    * a bounded explode + keyed count-distinct replaces any windowed
    * distinct. Gap buckets inside the range still appear (n_bucket
    * 0); leading partial windows are inherent and kept.
    *
    * Scale shape (100 TB): the raw stream collapses FIRST to the
    * presence frame (map-side-combinable distinct keyed on (bucket,
    * entity)); the explode multiplies only that frame by
    * `windowBuckets` (7 for DAU/WAU); the final count-distinct is
    * keyed on the target bucket. No window functions at all. */
  def rollingActive(df: DataFrame, tsNanosCol: String, entityCol: String,
                    bucketSec: Long = 86400L,
                    windowBuckets: Int = 7): DataFrame = {
    require(bucketSec > 0, "bucketSec must be positive")
    require(windowBuckets >= 1, "windowBuckets must be positive")
    val bNanos = bucketSec * 1000000000L
    val presence = df
      .select(expr(s"$tsNanosCol div ${bNanos}L").as("__b"),
        col(entityCol).as("__e"))
      .distinct()
    val lim = presence.agg(min(col("__b")).as("__mn"), max(col("__b")).as("__mx"))
    val perBucket = presence.groupBy(col("__b").as("bucket"))
      .agg(count(lit(1)).cast("bigint").as("n_bucket"))
    val windowed = presence
      .withColumn("__t", explode(expr(
        s"sequence(__b, __b + ${windowBuckets - 1}L)")))
      .groupBy(col("__t").as("bucket"))
      .agg(countDistinct(col("__e")).cast("bigint").as("n_window"))
    windowed.join(perBucket, Seq("bucket"), "left")
      .crossJoin(broadcast(lim))
      .where(col("bucket").between(col("__mn"), col("__mx")))
      .select(
        col("bucket").cast("bigint").as("bucket"),
        coalesce(col("n_bucket"), lit(0L)).cast("bigint").as("n_bucket"),
        col("n_window"),
        expr("(1000000L * coalesce(n_bucket, 0L)) div nullif(n_window, 0L)")
          .cast("bigint").as("stickiness_ppm"))
      .orderBy(col("bucket"))
  }

  /** Per-entity burstiness: the Fano factor (index of dispersion,
    * variance/mean) of per-bucket event counts over the entity's own
    * calendar span — ≈1 for Poisson-like arrivals, ≫1 for bursty
    * ones (a crawler dumping a day's worth of events at once), ≈0
    * for metronomic entities. The span includes the entity's SILENT
    * buckets (count 0) — computed arithmetically from
    * `max−min+1` and the active-bucket moments, never materialized.
    *
    * Exact integers throughout: with `span` buckets, total `s` and
    * active-bucket sum-of-squares `q`, population variance/mean =
    * `(span·q − s²) / (span·s)`, and `span·q − s² ≥ 0` by
    * Cauchy–Schwarz, so `fano_milli = (1000·(span·q − s²)) div
    * (span·s)` needs no sign split.
    *
    * Scale shape: one groupBy on (entity, bucket) then one on entity
    * — both map-side combined; no windows, no explode. Products stay
    * in BIGINT for spans ≤ ~10⁶ buckets and per-entity totals ≤
    * ~3·10⁶ events (span·q ≲ 2⁶³); beyond that widen to
    * DECIMAL(38,0) at the marked casts.
    */
  def burstiness(df: DataFrame, tsNanosCol: String, entityCol: String,
                 bucketSec: Long = 86400L): DataFrame = {
    require(bucketSec > 0, "bucketSec must be positive")
    val bNanos = bucketSec * 1000000000L
    df.select(col(entityCol).as("entity"),
        expr(s"$tsNanosCol div ${bNanos}L").as("__b"))
      .groupBy(col("entity"), col("__b"))
      .agg(count(lit(1)).cast("bigint").as("__c"))
      .groupBy(col("entity"))
      .agg(
        (max(col("__b")) - min(col("__b")) + lit(1L)).as("span_buckets"),
        count(lit(1)).cast("bigint").as("active_buckets"),
        sum(col("__c")).cast("bigint").as("n_events"),
        sum(col("__c") * col("__c")).cast("bigint").as("__q"))
      .select(
        col("entity"),
        col("span_buckets").cast("bigint").as("span_buckets"),
        col("active_buckets"),
        col("n_events"),
        expr("(1000L * (span_buckets * __q - n_events * n_events)) " +
          "div (span_buckets * n_events)").cast("bigint").as("fano_milli"))
  }

  /** Local-peak detection with PROMINENCE on per-key bucket counts —
    * the monitoring primitive that separates "a real spike" from
    * ripples: a strict local maximum's prominence is its height
    * above the higher of the two valleys that separate it from
    * higher ground (the topographic definition; the highest peak's
    * valleys run to the series edges). Silent buckets enter as
    * arithmetic zeros over the global calendar span. Only peaks with
    * `prominence ≥ minProminence` are emitted:
    * `(key, bucket, y, prominence)`.
    *
    * Valley scans are LATCHED linear folds — min of counts outward
    * from the peak until the first strictly-higher bucket — with the
    * latch and the running min packed into ONE BIGINT
    * (`stopped·2⁶² + minv`, sentinel 2⁶¹), so the identical
    * single-level fold renders in DuckDB (deeper lambda nesting is a
    * known DuckDB vectorization hazard — see SURVEY §9.4).
    *
    * Scale shape (100 TB): one (key, bucket) count collapse, then
    * per-KEY dense arrays bounded by the calendar span (`O(span²)`
    * integer ops per key row); the span scalar broadcasts. Keys
    * scale out; no windows, no joins on data. */
  def detectPeaks(df: DataFrame, tsNanosCol: String, keyCol: String,
                  bucketSec: Long = 86400L,
                  minProminence: Long = 1L): DataFrame = {
    require(bucketSec > 0, "bucketSec must be positive")
    val bNanos = bucketSec * 1000000000L
    val STOP = 4611686018427387904L // 2^62
    val INF = 2305843009213693952L // 2^61 sentinel (> any count)
    val x = df.select(col(keyCol).as("key"),
      expr(s"$tsNanosCol div ${bNanos}L").as("__b"))
    val c = x.groupBy(col("key"), col("__b"))
      .agg(count(lit(1)).cast("bigint").as("__c"))
    val sp = x.agg(min(col("__b")).as("__bmin"), max(col("__b")).as("__bmax"))
    def at(i: String) = s"element_at(__ys, cast($i as int))"
    def scan(seq: String, idx: String) =
      s"aggregate($seq, ${INF}L, (acc, j) -> " +
        s"CASE WHEN acc >= ${STOP}L THEN acc " +
        s"WHEN ${at("j")} > ${at(idx)} THEN ${STOP}L + acc " +
        s"ELSE least(acc, ${at("j")}) END) % ${STOP}L"
    c.groupBy(col("key"))
      .agg(map_from_entries(collect_list(struct(col("__b"), col("__c"))))
        .as("__m"))
      .crossJoin(broadcast(sp))
      .withColumn("__span", col("__bmax") - col("__bmin") + lit(1L))
      .withColumn("__ys", expr(
        "transform(sequence(1L, __span), k -> " +
          "coalesce(element_at(__m, __bmin + k - 1L), 0L))"))
      // span < 3 has no interior bucket — and sequence(2, span-1)
      // would be a DESCENDING range (graft trap #5), so guard it
      .where(col("__span") >= 3)
      .withColumn("__pk", explode(expr(
        "filter(transform(sequence(2L, __span - 1L), i -> struct(" +
          s"i AS i, ${at("i")} AS y, " +
          s"CASE WHEN ${at("i")} > ${at("(i - 1)")} " +
          s"AND ${at("i")} > ${at("(i + 1)")} THEN " +
          s"${at("i")} - greatest(" +
          scan("sequence(i - 1L, 1L, -1L)", "i") + ", " +
          scan("sequence(i + 1L, __span)", "i") + ") " +
          "ELSE -1L END AS prom)), " +
          s"p -> p.prom >= ${minProminence}L)")))
      .select(col("key"), (col("__bmin") + col("__pk.i") - lit(1L)).as("bucket"),
        col("__pk.y").as("y"), col("__pk.prom").as("prominence"))
  }

  /** Pairwise Pearson correlation (ppm) between per-key activity
    * series at an optional lead `lag` — which keys co-move (lag 0),
    * and which LEAD which (lag L > 0 correlates x's bucket t with
    * y's bucket t+L; a high value means x foreshadows y). Series are
    * per-bucket event counts over the GLOBAL span with silent
    * buckets as implicit zeros — handled arithmetically (zero terms
    * drop out of every sum; `n` is the span), never by densifying.
    * `r = (nΣxy − ΣxΣy) / √((nΣx² − Σx²ᵗᵒᵗ)(nΣy² − Σy²ᵗᵒᵗ))`,
    * computed exactly: integer moment sums, the
    * [[graft.util.ExactMath]] isqrt of the variance product, and
    * sign-split floored division to ppm. Zero-variance sides yield
    * NULL. Lag 0 emits each unordered pair once (`key_a < key_b`);
    * lag > 0 emits both directions.
    *
    * Scale shape (100 TB): the raw volume collapses in ONE map-side-
    * combinable (key, bucket) count; every later frame is bounded by
    * keys × span buckets (a dimension table). The lag join is
    * bucket-keyed on that bounded frame; the global-extent scalar
    * broadcasts. Variance products stay inside DECIMAL(38,0) for
    * per-bucket counts up to ~10⁹ across ~10³ buckets. */
  def seriesCorrelation(df: DataFrame, tsNanosCol: String, keyCol: String,
                        bucketSec: Long = 86400L,
                        lag: Int = 0): DataFrame = {
    require(bucketSec > 0, "bucketSec must be positive")
    require(lag >= 0, "lag must be non-negative")
    val bNanos = bucketSec * 1000000000L
    val x = df.select(col(keyCol).as("__k"),
      expr(s"$tsNanosCol div ${bNanos}L").as("__b"))
    val c = x.groupBy(col("__k"), col("__b"))
      .agg(count(lit(1)).cast("bigint").as("__c"))
    val sp = x.agg(min(col("__b")).as("__bmin"), max(col("__b")).as("__bmax"))
    val st = c.crossJoin(broadcast(sp))
      .groupBy(col("__k"))
      .agg(
        sum(when(col("__b") <= col("__bmax") - lag, col("__c"))
          .otherwise(0L)).cast("bigint").as("__sx"),
        sum(when(col("__b") <= col("__bmax") - lag, col("__c") * col("__c"))
          .otherwise(0L)).cast("bigint").as("__sxx"),
        sum(when(col("__b") >= col("__bmin") + lag, col("__c"))
          .otherwise(0L)).cast("bigint").as("__sy"),
        sum(when(col("__b") >= col("__bmin") + lag, col("__c") * col("__c"))
          .otherwise(0L)).cast("bigint").as("__syy"))
    val ca = c.select(col("__k").as("__ka"), col("__b").as("__ba"),
      col("__c").as("__cxa"))
    val cb = c.select(col("__k").as("__kb"), col("__b").as("__bb"),
      col("__c").as("__cxb"))
    val xy = ca.join(cb,
        col("__ba") === col("__bb") - lag && col("__ka") =!= col("__kb"))
      .groupBy(col("__ka"), col("__kb"))
      .agg(sum(col("__cxa") * col("__cxb")).cast("bigint").as("__sxy"))
    val a = st.select(col("__k").as("__ka"), col("__sx"), col("__sxx"))
    val b = st.select(col("__k").as("__kb"), col("__sy"), col("__syy"))
    val pairFilter =
      if (lag == 0) col("__ka") < col("__kb") else col("__ka") =!= col("__kb")
    a.join(b, pairFilter)
      .join(xy, Seq("__ka", "__kb"), "left")
      .crossJoin(broadcast(sp))
      .withColumn("__n", col("__bmax") - col("__bmin") + lit(1L) - lit(lag.toLong))
      .withColumn("__num", expr(
        "__n * coalesce(__sxy, 0L) - __sx * __sy"))
      .withColumn("__vx", expr("__n * __sxx - __sx * __sx"))
      .withColumn("__vy", expr("__n * __syy - __sy * __sy"))
      .withColumn("__x", expr(
        "cast(__vx as decimal(38,0)) * cast(__vy as decimal(38,0))"))
      .transform(graft.util.ExactMath.withIsqrt(_, "__x", "__rt"))
      .select(col("__ka").as("key_a"), col("__kb").as("key_b"),
        col("__n").cast("bigint").as("n_buckets"),
        expr("CASE WHEN __vx <= 0 OR __vy <= 0 THEN NULL " +
          "WHEN __num >= 0 THEN (1000000L * __num) div __rt " +
          "ELSE -((1000000L * -__num) div __rt) END")
          .cast("bigint").as("r_ppm"))
  }

  /** Kaplan–Meier product-limit survival curve over per-subject
    * `(duration, censored)` observations — time-to-event analysis
    * (time to first failure, churn, conversion latency). A censored
    * subject was observed alive for `duration` buckets without the
    * event; it leaves the risk set at that time WITHOUT counting as
    * a death — the textbook right-censoring treatment. One output
    * row per duration with ≥ 1 death: `(t, n_at_risk, deaths,
    * surv_ppm)` where `S_k = (S_{k-1} · (n_k − d_k)) div n_k`,
    * `S_0 = 10^6` — each step floored to ppm, so every value is
    * integer-exact and oracle-verifiable (all operands non-negative:
    * floor = truncate on both engines).
    *
    * Scale shape (100 TB): everything operates on the DURATION
    * HISTOGRAM, whose cardinality is bounded by the observation
    * horizon (e.g. calendar days), not by subject count — the global
    * window and the prefix-product fold run on that bounded frame
    * only; the subject-level input is collapsed by one map-side-
    * combinable keyed aggregation. */
  def kaplanMeier(df: DataFrame, durationCol: String,
                  censoredCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lt = df.select(col(durationCol).cast("bigint").as("__t"),
        col(censoredCol).cast("boolean").as("__cen"))
      .where(col("__t").isNotNull && col("__t") >= 0)
    val h = lt.groupBy(col("__t"))
      .agg(count(lit(1)).cast("bigint").as("__m"),
        sum(when(col("__cen"), 0L).otherwise(1L)).cast("bigint").as("__d"))
    val tot = h.agg(sum(col("__m")).as("__total"))
    // global window over the lifetime HISTOGRAM — calendar-bounded
    val w = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val steps = h.crossJoin(broadcast(tot))
      .withColumn("__n",
        col("__total") - coalesce(sum(col("__m")).over(w), lit(0L)))
      .where(col("__d") > 0)
      .select(col("__t"), col("__d"), col("__n"))
    steps
      .agg(sort_array(collect_list(struct(col("__t").as("t"),
        col("__d").as("d"), col("__n").as("n")))).as("__st"))
      .select(explode(expr(
        "transform(__st, (x, i) -> struct(x.t AS t, x.n AS n_at_risk, " +
          "x.d AS deaths, aggregate(slice(__st, 1, i + 1), 1000000L, " +
          "(acc, e) -> (acc * (e.n - e.d)) div e.n) AS surv_ppm))")).as("__r"))
      .select(col("__r.t").as("t"), col("__r.n_at_risk").as("n_at_risk"),
        col("__r.deaths").as("deaths"), col("__r.surv_ppm").as("surv_ppm"))
  }

  /** Nelson–Aalen cumulative-hazard curve over the same per-subject
    * `(duration, censored)` frame as [[kaplanMeier]] — the additive
    * complement of the product-limit estimator (preferred when hazard
    * INCREMENTS are the quantity of interest, e.g. failure-intensity
    * monitoring). One row per duration with ≥ 1 death:
    * `(t, n_at_risk, deaths, hazard_ppm)` where each step contributes
    * `(10⁶ · d_k) div n_k` and `hazard_ppm` is the running integer
    * sum — every value integer-exact, quantization one floor per
    * step.
    *
    * Scale shape (100 TB): identical to [[kaplanMeier]] — one keyed
    * map-side-combinable aggregation collapses subjects to the
    * duration histogram (cardinality = observation horizon), and the
    * global window runs on that bounded frame only. */
  def nelsonAalen(df: DataFrame, durationCol: String,
                  censoredCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lt = df.select(col(durationCol).cast("bigint").as("__t"),
        col(censoredCol).cast("boolean").as("__cen"))
      .where(col("__t").isNotNull && col("__t") >= 0)
    val h = lt.groupBy(col("__t"))
      .agg(count(lit(1)).cast("bigint").as("__m"),
        sum(when(col("__cen"), 0L).otherwise(1L)).cast("bigint").as("__d"))
    val tot = h.agg(sum(col("__m")).as("__total"))
    val wPrev = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val steps = h.crossJoin(broadcast(tot))
      .withColumn("__n",
        col("__total") - coalesce(sum(col("__m")).over(wPrev), lit(0L)))
      .where(col("__d") > 0)
      .withColumn("__term", expr("(1000000L * __d) div __n"))
    val wCum = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    steps.select(col("__t").as("t"), col("__n").as("n_at_risk"),
      col("__d").as("deaths"),
      sum(col("__term")).over(wCum).cast("bigint").as("hazard_ppm"))
  }

  /** Two-group log-rank contributions over per-subject
    * `(duration, censored, group)` observations — the standard test
    * for "do these two cohorts churn/fail at the same rate?". One row
    * per duration with ≥ 1 death across the pooled sample:
    * `(t, n1, n2, d1, d2, oe_ppm, var_ppm)` where
    *   - `oe_ppm` = running Σ `10⁶·(d1·n − d·n1) div n` — the
    *     observed-minus-expected deaths in group 1 (hypergeometric
    *     mean), quantized one TRUNCATING div per step (sign-split so
    *     Spark `div` and DuckDB `//` agree on negatives);
    *   - `var_ppm` = running Σ `10⁶·d·n1·n2·(n−d) div (n²·(n−1))` —
    *     the hypergeometric variance (single-death steps contribute
    *     `10⁶·n1·n2 div n²`).
    * The z² statistic is `oe²/var` — left to the caller as one scalar
    * IEEE division so every materialized value stays integer.
    *
    * Scale shape (100 TB): subjects collapse to a per-(duration ×
    * group) histogram (horizon-bounded), pivoted to one row per
    * duration; windows run on that bounded frame. Both ppm product
    * terms run on DECIMAL(38,0): the variance numerator
    * `10⁶·d·n1·n2·(n−d)` reaches ~`10⁶·n⁴/16`, so 38 digits hold it up
    * to `n ≈ 10⁸` subjects at risk per time point — past that a loud
    * guard raises (never silent overflow; int64 alone would wrap at
    * n≈3400 worst-case, far below real cohorts). */
  def logRankCurve(df: DataFrame, durationCol: String, censoredCol: String,
                   groupCond: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lt = df.select(col(durationCol).cast("bigint").as("__t"),
        col(censoredCol).cast("boolean").as("__cen"),
        when(groupCond, 1L).otherwise(0L).as("__g"))
      .where(col("__t").isNotNull && col("__t") >= 0)
    val h = lt.groupBy(col("__t"))
      .agg(
        sum(col("__g")).cast("bigint").as("__m1"),
        sum(lit(1L) - col("__g")).cast("bigint").as("__m2"),
        sum(when(col("__cen"), 0L).otherwise(col("__g"))).cast("bigint").as("__d1"),
        sum(when(col("__cen"), 0L).otherwise(lit(1L) - col("__g")))
          .cast("bigint").as("__d2"))
    val tot = h.agg(sum(col("__m1")).as("__t1"), sum(col("__m2")).as("__t2"))
    val wPrev = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val steps = h.crossJoin(broadcast(tot))
      .withColumn("__n1",
        col("__t1") - coalesce(sum(col("__m1")).over(wPrev), lit(0L)))
      .withColumn("__n2",
        col("__t2") - coalesce(sum(col("__m2")).over(wPrev), lit(0L)))
      .withColumn("__d", col("__d1") + col("__d2"))
      .withColumn("__n", col("__n1") + col("__n2"))
      .where(col("__d") > 0)
      // DECIMAL(38,0) headroom guard: the variance numerator
      // 10⁶·d·n1·n2·(n−d) ≤ ~10⁶·n⁴/16 stays inside 38 digits for
      // n < 10⁸; fail loudly past that, never overflow silently
      .withColumn("__n", expr(
        "CASE WHEN __n < 100000000 THEN __n ELSE raise_error(" +
          "'logRankCurve: > 1e8 subjects at risk in one time bucket — " +
          "the DECIMAL(38,0) variance term would overflow') END"))
      // sign-split truncating div: numerator d1*n - d*n1 can go
      // negative; Spark div truncates, DuckDB // floors — make both
      // truncate toward zero explicitly. The 10⁶ scaling rides on
      // DECIMAL(38,0) (d1·n alone fits int64 under the n<1e8 guard,
      // but 10⁶× it would not); div on decimals still yields bigint.
      .withColumn("__oe_term", expr(
        """CASE WHEN __d1 * __n - __d * __n1 >= 0
          |  THEN (cast(1000000 as decimal(38,0)) * (__d1 * __n - __d * __n1)) div __n
          |  ELSE -((cast(1000000 as decimal(38,0)) * (__d * __n1 - __d1 * __n)) div __n)
          |END""".stripMargin))
      .withColumn("__var_term", expr(
        """CASE WHEN __n > 1
          |  THEN (cast(1000000 as decimal(38,0)) * __d * __n1 * __n2 * (__n - __d))
          |       div (cast(__n as decimal(38,0)) * __n * (__n - 1))
          |  ELSE 0L END""".stripMargin))
    val wCum = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    steps.select(col("__t").as("t"),
      col("__n1").as("n1"), col("__n2").as("n2"),
      col("__d1").as("d1"), col("__d2").as("d2"),
      sum(col("__oe_term")).over(wCum).cast("bigint").as("oe_ppm"),
      sum(col("__var_term")).over(wCum).cast("bigint").as("var_ppm"))
  }

  /** Sequential probability ratio test (Wald) monitors over ordered
    * Bernoulli streams — the always-on "is this source's quality rate
    * p₁ or has it degraded to p₀?" check a continuously-ingesting
    * pipeline wants, stopping each stream at the EARLIEST decisive
    * observation instead of a fixed-n test. The log-likelihood-ratio
    * walk uses integer MILLI-BIT weights (`round(1000·log₂(p₁/p₀))`
    * per success, `round(1000·log₂((1−p₁)/(1−p₀)))` per failure —
    * quantized once on the driver, the standard production-monitor
    * discretization), so the walk, the boundaries, and the stopping
    * index are all integer-exact.
    *
    * Output one row per group: `(group, n_obs, decision,
    * n_at_decision, llr_mbits)` where decision ∈ accept_h1 (walk ≥
    * +threshold first), accept_h0 (walk ≤ −threshold first), continue
    * (no boundary crossed; `n_at_decision` = `n_obs`, `llr_mbits` =
    * final walk). `orderCol` must be UNIQUE within each group (an
    * event id, not a timestamp with ties) — the walk's order, and
    * therefore the stopping index, is only deterministic under a
    * total order.
    *
    * Scale shape (100 TB): one window partitioned by group (the
    * running sum), one keyed aggregation — no shuffles beyond the
    * group key, no driver iteration; streams process independently so
    * group count scales out. */
  def sprtMonitor(df: DataFrame, groupCol: String, orderCol: String,
                  successCond: org.apache.spark.sql.Column,
                  p0: Double, p1: Double,
                  thresholdMbits: Long = 4000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p0 != p1,
      "p0, p1 must be distinct probabilities in (0, 1)")
    require(thresholdMbits > 0, "thresholdMbits must be positive")
    val ln2 = math.log(2.0)
    val wS = math.round(1000.0 * math.log(p1 / p0) / ln2)
    val wF = math.round(1000.0 * math.log((1 - p1) / (1 - p0)) / ln2)
    val w = Window.partitionBy(col("__grp"))
      .orderBy(col("__ord"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val walked = df.select(col(groupCol).as("__grp"),
        col(orderCol).cast("bigint").as("__ord"),
        when(successCond, lit(wS)).otherwise(lit(wF)).as("__w"))
      .withColumn("__llr", sum(col("__w")).over(w).cast("bigint"))
      .withColumn("__rn",
        row_number().over(Window.partitionBy(col("__grp"))
          .orderBy(col("__ord"))).cast("bigint"))
    val crossings = walked
      .where(col("__llr") >= thresholdMbits || col("__llr") <= -thresholdMbits)
      .groupBy(col("__grp"))
      .agg(min(struct(col("__rn"), col("__llr"))).as("__first"))
      .select(col("__grp"), col("__first.__rn").as("__stop_n"),
        col("__first.__llr").as("__stop_llr"))
    walked.groupBy(col("__grp"))
      .agg(count(lit(1)).cast("bigint").as("n_obs"),
        sum(col("__w")).cast("bigint").as("__final_llr"))
      .join(crossings, Seq("__grp"), "left")
      .select(col("__grp").as("group_id"), col("n_obs"),
        when(col("__stop_llr").isNull, lit("continue"))
          .when(col("__stop_llr") >= thresholdMbits, lit("accept_h1"))
          .otherwise(lit("accept_h0")).as("decision"),
        coalesce(col("__stop_n"), col("n_obs")).cast("bigint")
          .as("n_at_decision"),
        coalesce(col("__stop_llr"), col("__final_llr")).cast("bigint")
          .as("llr_mbits"))
  }

  /** The integer milli-bit SPRT weights [[sprtMonitor]] uses — public
    * so oracles can splice the identical constants. */
  def sprtWeights(p0: Double, p1: Double): (Long, Long) = {
    val ln2 = math.log(2.0)
    (math.round(1000.0 * math.log(p1 / p0) / ln2),
      math.round(1000.0 * math.log((1 - p1) / (1 - p0)) / ln2))
  }

  /** Aalen–Johansen cumulative incidence under two COMPETING risks —
    * "what fraction ends in cause 1 vs cause 2 when each subject can
    * only experience one?" (1 − KM on a single cause OVERSTATES
    * incidence when the other cause removes subjects; this is the
    * textbook-correct decomposition). Input: per-subject
    * `(duration, cause)` with cause 0 = censored, 1, or 2 (anything
    * else raises). One row per duration with ≥ 1 event:
    * `(t, n_at_risk, d1, d2, surv_ppm, cif1_ppm, cif2_ppm)` where
    * `surv` is the ALL-cause product-limit (the [[kaplanMeier]]
    * fold), and `CIF_k(tᵢ) = Σ_{j≤i} (S(t_{j−1})·d_kj) div n_j` in
    * ppm — S enters LAGGED one step (S before the deaths at t_j),
    * every value an exact floored integer; `surv + cif1 + cif2 ≈
    * 10⁶` up to the documented per-step floors.
    *
    * Scale shape (100 TB): identical to [[kaplanMeier]] — subjects
    * collapse to the horizon-bounded duration histogram; the fold,
    * lag, and running sums all run on that bounded frame. */
  def aalenJohansen(df: DataFrame, durationCol: String,
                    causeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val guard =
      s"""CASE WHEN CAST(`$causeCol` AS BIGINT) IN (0L, 1L, 2L)
         |     THEN CAST(`$causeCol` AS BIGINT)
         |     ELSE raise_error(concat('aalenJohansen: cause must be 0 ',
         |       '(censored), 1, or 2 — got ',
         |       coalesce(CAST(`$causeCol` AS STRING), 'NULL'))) END""".stripMargin
    val lt = df.select(col(durationCol).cast("bigint").as("__t"),
        expr(guard).as("__k"))
      .where(col("__t").isNotNull && col("__t") >= 0)
    val h = lt.groupBy(col("__t"))
      .agg(count(lit(1)).cast("bigint").as("__m"),
        sum(when(col("__k") === 1L, 1L).otherwise(0L)).cast("bigint").as("__d1"),
        sum(when(col("__k") === 2L, 1L).otherwise(0L)).cast("bigint").as("__d2"))
    val tot = h.agg(sum(col("__m")).as("__total"))
    val wPrev = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val steps = h.crossJoin(broadcast(tot))
      .withColumn("__n",
        col("__total") - coalesce(sum(col("__m")).over(wPrev), lit(0L)))
      .withColumn("__d", col("__d1") + col("__d2"))
      .where(col("__d") > 0)
      .select(col("__t"), col("__d1"), col("__d2"), col("__d"), col("__n"))
    // all-cause survival via the kaplanMeier fold, then LAG it one
    // step so each CIF term multiplies S from BEFORE its deaths
    val surv = steps
      .agg(sort_array(collect_list(struct(col("__t").as("t"),
        col("__d1").as("d1"), col("__d2").as("d2"),
        col("__d").as("d"), col("__n").as("n")))).as("__st"))
      .select(explode(expr(
        "transform(__st, (x, i) -> struct(x.t AS t, x.n AS n, " +
          "x.d1 AS d1, x.d2 AS d2, " +
          "aggregate(slice(__st, 1, i + 1), 1000000L, " +
          "(acc, e) -> (acc * (e.n - e.d)) div e.n) AS surv_ppm))")).as("__r"))
      .select(col("__r.t").as("__t"), col("__r.n").as("__n"),
        col("__r.d1").as("__d1"), col("__r.d2").as("__d2"),
        col("__r.surv_ppm").as("__surv"))
    val wOrd = Window.orderBy(col("__t"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, 0)
    surv
      .withColumn("__sprev", lag(col("__surv"), 1, 1000000L).over(wOrd))
      .withColumn("__t1", expr("(__sprev * __d1) div __n"))
      .withColumn("__t2", expr("(__sprev * __d2) div __n"))
      .select(col("__t").as("t"), col("__n").as("n_at_risk"),
        col("__d1").as("d1"), col("__d2").as("d2"),
        col("__surv").cast("bigint").as("surv_ppm"),
        sum(col("__t1")).over(wCum).cast("bigint").as("cif1_ppm"),
        sum(col("__t2")).over(wCum).cast("bigint").as("cif2_ppm"))
  }
}
