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
}
