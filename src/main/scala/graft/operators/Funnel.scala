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
