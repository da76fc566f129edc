package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversation/transcript assembly over an event log — the shaping
  * step that turns raw interaction events into per-session training
  * transcripts (chat corpora, agent trajectories, clickstream
  * "dialogues" rendered as text).
  */
object Dialogue {

  /** Split each user's timeline into gap-delimited sessions and render
    * one deterministic transcript per session: `type@offset_s` tokens
    * joined by single spaces, offsets whole seconds since the
    * session's first event. Output one row per session:
    * `(userCol, session_start_us, n_turns, duration_s, transcript)`,
    * ordered `(userCol, session_start_us)`.
    *
    * The render is fully order-pinned — events sort by
    * `(tsUsCol, ordCol)`, so runs are reproducible byte-for-byte, the
    * property a training-data materialization needs (re-running the
    * job must not reshuffle turn order inside a transcript).
    *
    * Scale shape (100 TB): ONE user-keyed shuffle. The gap flag, the
    * session index (running sum of flags), and the session-start
    * minimum are windows over the SAME `(user)` partitioning and
    * `(ts, ord)` sort — Spark computes that sort once and reuses it —
    * and the final `groupBy(user, session)` partial-aggregates
    * map-side on the already-clustered data. Per-user history must be
    * entity-bounded (the sessionize contract; unbounded keys belong
    * on the streaming session-window path in
    * [[graft.streaming.EventStream]]), and each transcript is bounded
    * by its session's length, so rows stay row-group sized. No UDFs:
    * the render is `concat_ws` over a `sort_array`'d struct collect,
    * inside whole-stage codegen.
    */
  def assembleSessions(events: DataFrame, userCol: String, tsUsCol: String,
                       typeCol: String, ordCol: String,
                       gapUs: Long): DataFrame = {
    require(gapUs >= 1, "gapUs must be positive")
    val reserved = Set("__prev", "__new", "__sess", "__start", "__line")
    require(events.columns.toSet.intersect(reserved).isEmpty,
      s"assembleSessions reserves columns ${reserved.mkString(", ")}")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsUsCol), col(ordCol))
    val sess = events
      .withColumn("__prev", lag(col(tsUsCol), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col(tsUsCol) - col("__prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("__sess",
        sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__start",
        min(col(tsUsCol)).over(
          Window.partitionBy(col(userCol), col("__sess"))))
      .withColumn("__line",
        concat(col(typeCol), lit("@"),
          expr(s"($tsUsCol - __start) div 1000000L")))
    sess.groupBy(col(userCol), col("__sess"))
      .agg(
        min(col(tsUsCol)).as("session_start_us"),
        count(lit(1)).as("n_turns"),
        expr(s"(max($tsUsCol) - min($tsUsCol)) div 1000000L").as("duration_s"),
        concat_ws(" ",
          transform(
            sort_array(collect_list(
              struct(col(tsUsCol), col(ordCol), col("__line")))),
            x => x.getField("__line"))).as("transcript"))
      .select(col(userCol), col("session_start_us"), col("n_turns"),
        col("duration_s"), col("transcript"))
      .orderBy(col(userCol), col("session_start_us"))
  }
}
