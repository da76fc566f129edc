package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics over per-entity timelines.
  *
  * Not in the reference (polario has no event model); the standard
  * behavioral companion to sessionization (q17): what users do NEXT —
  * the first-order Markov view of an event log.
  */
object Funnel {

  /** First-order transition counts `(from_type, to_type, n)` over
    * each user's time-ordered event sequence (`lead` of the type
    * within the `(tsCol, idCol)`-ordered user timeline; the last
    * event of a user has no successor and contributes nothing).
    *
    * Scale shape: ONE shuffle keyed on `userCol` with per-user
    * in-task sort — the sessionize shape: per-user event counts are
    * human-bounded, so the in-group sort never blows a task; the
    * final (from, to) aggregate is type²-bounded (dim-table sized).
    */
  def transitionCounts(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .where(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("from_type", "to_type")
  }

  /** First-touch / last-touch conversion attribution: each `convType`
    * event is credited to the first and the last `touchTypes` event
    * in its ATTRIBUTION SEGMENT — the stretch of the user's timeline
    * since their previous conversion (or the beginning). The
    * product-analytics verb behind "which channel gets credit"; a
    * conversion whose segment has no touches is a DIRECT conversion
    * (NULL touch columns).
    *
    * Determinism: timelines order by `(tsCol, idCol)`; first/last
    * touch are `min`/`max` over `struct(ts, id, type)` — plain
    * mergeable aggregates with a total order, no `first()`
    * nondeterminism.
    *
    * Output: one row per conversion — `(userCol, conv id/ts,
    * first_touch_type, first_touch_ts, last_touch_type,
    * last_touch_ts)`.
    *
    * Scale shape (100 TB): ONE user-keyed shuffle and ONE in-task
    * sort shared by every window below (identical partition/order
    * spec → a single Window physical node) — no join, no second
    * pass, the sessionize shape. Segment gating is done by struct
    * comparison against the previous conversion marker instead of a
    * per-segment aggregate: last-touch = latest prior touch IF it
    * postdates the previous conversion; first-touch = the latest
    * prior SEGMENT-OPENING touch (a touch with no touch between the
    * previous conversion and itself) under the same gate. */
  def attribution(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, idCol: String,
                  touchTypes: Seq[String], convType: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    require(!touchTypes.contains(convType),
      "convType cannot also be a touch type")
    val wPrev = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col(typeCol).isin(touchTypes: _*)
    val isConv = col(typeCol) === convType
    val marked = events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol))
      // previous conversion marker and latest prior touch, as ordered
      // (ts, id[, type]) structs — max() ignores the non-matching NULLs
      .withColumn("__lc",
        max(when(isConv, struct(col(tsCol), col(idCol)))).over(wPrev))
      .withColumn("__lt",
        max(when(isTouch, struct(col(tsCol), col(idCol), col(typeCol)))).over(wPrev))
    // a touch OPENS a segment when no touch sits between the previous
    // conversion and it (no prior touch at all, or the latest prior
    // touch predates the previous conversion)
    val flagged = marked.withColumn("__opens",
      isTouch && (col("__lt").isNull ||
        (col("__lc").isNotNull &&
          struct(col("__lt").getField(tsCol), col("__lt").getField(idCol)) <=
            col("__lc"))))
    val attributed = flagged
      .withColumn("__fs",
        max(when(col("__opens"), struct(col(tsCol), col(idCol), col(typeCol))))
          .over(wPrev))
      .where(isConv)
      // gate both picks to the CURRENT segment: valid only when they
      // postdate the previous conversion
      .withColumn("__ltv", when(col("__lt").isNotNull &&
        (col("__lc").isNull ||
          struct(col("__lt").getField(tsCol), col("__lt").getField(idCol)) >
            col("__lc")), col("__lt")))
      .withColumn("__ftv", when(col("__fs").isNotNull &&
        (col("__lc").isNull ||
          struct(col("__fs").getField(tsCol), col("__fs").getField(idCol)) >
            col("__lc")), col("__fs")))
    attributed.select(col(userCol), col(tsCol).as("conv_ts"),
      col(idCol).as("conv_id"),
      col("__ftv").getField(typeCol).as("first_touch_type"),
      col("__ftv").getField(tsCol).as("first_touch_ts"),
      col("__ltv").getField(typeCol).as("last_touch_type"),
      col("__ltv").getField(tsCol).as("last_touch_ts"))
  }

  /** Cohort retention matrix: users bucketed by FIRST-seen time
    * bucket (the cohort), counted in every later bucket they return
    * in — `(cohort_epoch, bucket_offset, n_users)`, the standard
    * product-analytics retention triangle. Pure integer bucket
    * arithmetic on the nanos timestamp.
    *
    * Scale shape: one user-keyed min-aggregate (cohort), one join
    * back on the user key (co-partitioned with the distinct that
    * follows — a single shuffle family), final cell aggregate is
    * (buckets × offsets)-bounded, calendar-sized not event-sized. */
  def retentionMatrix(events: DataFrame, userCol: String,
                      tsNanosCol: String, bucketSec: Long): DataFrame = {
    require(bucketSec >= 1, "bucketSec must be positive")
    val bucketNanos = bucketSec * 1000000000L
    val e = events.select(col(userCol).as("__u"),
      expr(s"$tsNanosCol div ${bucketNanos}L").as("__d"))
    val cohorts = e.groupBy(col("__u")).agg(min(col("__d")).as("__cohort"))
    e.join(cohorts, "__u")
      .select(col("__u"), col("__cohort"), (col("__d") - col("__cohort")).as("__off"))
      .distinct()
      .groupBy(
        (col("__cohort") * bucketSec).cast("bigint").as("cohort_epoch"),
        col("__off").cast("bigint").as("bucket_offset"))
      .agg(count(lit(1)).cast("bigint").as("n_users"))
      .orderBy("cohort_epoch", "bucket_offset")
  }

  /** Ordered funnel-step conversion: how many users complete each
    * PREFIX of `steps` with strictly increasing timestamps (the
    * classic "view → click → purchase" funnel; a later step only
    * counts after the user's earliest completion of the previous
    * prefix). Output: `(step, event_type, n_users)`, step 1-based.
    *
    * Scale shape: one user-keyed min-aggregate per step plus an
    * equi-join per step against the (user-bounded, shrinking)
    * reached-set — k small shuffles for a k-step funnel, each
    * co-keyed on the user; AQE broadcasts the reached-set once it
    * fits. Per-user state is one timestamp, never a timeline. */
  /** Corpus-wide ordered behavior motifs: each user's event-type
    * sequence (ordered by `(tsCol, idCol)`) slides a length-`len`
    * window, and every motif (`type1>type2>…`) is counted across all
    * users — sequence mining's frequent-contiguous-pattern pass, one
    * step past [[transitionCounts]]'s bigrams. Top-`k` by
    * `(n DESC, motif)`. Users with fewer than `len` events contribute
    * nothing.
    *
    * Scale shape: ONE user-keyed aggregation collects each user's
    * (entity-bounded — the sessionize contract) ordered sequence; the
    * window slide is a map-side `transform` + explode; motif counts
    * partial-aggregate to a pattern-vocabulary-sized table; top-k is
    * TakeOrderedAndProject. No window functions, no self-joins.
    */
  def motifCounts(events: DataFrame, userCol: String, tsCol: String,
                  idCol: String, typeCol: String, len: Int,
                  k: Int): DataFrame = {
    require(len >= 2 && len <= 5, "motif length must be in [2, 5]")
    require(k >= 1, "k must be positive")
    val parts = (0 until len)
      .map(j => s"element_at(__seq, i + $j)")
      .mkString("concat(", ", '>', ", ")")
    events
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(
        col(tsCol).as("t"), col(idCol).as("i"), col(typeCol).as("e"))))
        .as("__s"))
      .withColumn("__seq", expr("transform(__s, r -> r.e)"))
      .withColumn("motif", explode(expr(
        s"CASE WHEN size(__seq) >= $len THEN " +
          s"transform(sequence(1, size(__seq) - ${len - 1}), i -> $parts) " +
          "ELSE array() END")))
      .groupBy(col("motif"))
      .agg(count(lit(1)).cast("bigint").as("n"))
      .orderBy(col("n").desc, col("motif"))
      .limit(k)
  }

  def funnelSteps(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    require(steps.distinct.size == steps.size, "steps must be distinct")
    val e = events.select(col(userCol).as("__u"),
      col(tsCol).cast("long").as("__ts"), col(typeCol).as("__t"))
    def countOf(reached: DataFrame, step: Int, name: String): DataFrame =
      reached.agg(count(lit(1)).cast("bigint").as("n_users"))
        .select(lit(step).as("step"), lit(name).as("event_type"), col("n_users"))
    val first = e.where(col("__t") === steps.head)
      .groupBy(col("__u")).agg(min(col("__ts")).as("__reach"))
    val (frames, _) = steps.tail.zipWithIndex.foldLeft(
      (Seq(countOf(first, 1, steps.head)), first)) {
      case ((acc, prev), (st, i)) =>
        val cur = e.where(col("__t") === st)
          .join(prev, "__u")
          .where(col("__ts") > col("__reach"))
          .groupBy(col("__u")).agg(min(col("__ts")).as("__reach"))
        (acc :+ countOf(cur, i + 2, st), cur)
    }
    frames.reduce(_.union(_)).orderBy("step")
  }
}
