package graft.streaming

import graft.sources.{DeltaChanges, DeltaReader}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}

/** A VERSION-OFFSET Structured Streaming source over a Delta table's
  * change feed — the idiomatic face of the tail-follow: offsets ARE
  * commit versions, a micro-batch is exactly
  * `DeltaChanges.readChanges(from, to]`, and the engine's own offset
  * log does the bookkeeping the rate-tick shim used to delegate to a
  * hand-rolled watermark file. The reference delegates change reads
  * to the deltalake library (/root/reference/polario/delta_dataset
  * .py:41-62); this source makes them `readStream`-composable:
  *
  * {{{
  *   spark.readStream.format("graft-delta-cdf")
  *     .option("path", url).option("startingVersion", 0)
  *     .load()                      // table schema + _change_type
  *                                  // + _commit_version
  * }}}
  *
  * Contract:
  *  - an offset `v` means "every commit version <= v is delivered";
  *    `getOffset` surfaces the table head, so idle polls cost ONE log
  *    listing (the incremental-window floor) and no Spark job;
  *  - `getBatch(start, end)` is the lazy change frame of
  *    `(start, end]` — inserts, DV-masked deletes, RESTORE
  *    re-inserts, everything [[DeltaChanges]] attributes — bridged to
  *    the engine with `isStreaming = true` (StreamingBridge);
  *  - restart replays the last uncommitted window from the stream's
  *    checkpoint (the v1 at-least-once contract); sinks key side
  *    effects by `_commit_version` to upgrade to exactly-once, which
  *    is precisely what [[graft.sources.DeltaFollow.followStream]]
  *    does with per-version SetTransactions;
  *  - a window cleaned past its JSON commits raises loudly
  *    (attribution never guesses); a mid-stream schema evolution
  *    fails the query rather than silently widening — delta-spark's
  *    own CDF stream draws the same two lines.
  *
  * Scale shape (100 TB): the driver holds commit METADATA only
  * (actions of the window, file-count bounded); row work runs as the
  * distributed scans the change frame already plans. A 1000-executor
  * cluster consumes the feed with the same plans the batch reader
  * gets — no per-row driver path exists. */
final class DeltaChangeSource(spark: SparkSession, url: String,
                              startingVersion: Long,
                              maxVersionsPerBatch: Option[Long] = None)
    extends Source {

  override val schema: StructType = DeltaChangeSource.changeSchema(
    DeltaReader.snapshot(url)(spark).getOrElse(
      throw new IllegalArgumentException(
        s"graft-delta-cdf: no Delta table at $url")).schema)

  // admission control: the highest version already handed to the
  // engine (advanced by getBatch — including the restart replay —
  // and by commit), so a long catch-up is paced at
  // maxVersionsPerBatch windows instead of one giant first batch
  @volatile private var delivered: Long = startingVersion - 1L

  /** Head version (capped by the admission window) when at least
    * `startingVersion` exists — one log listing, no job; None parks
    * the trigger. */
  override def getOffset: Option[Offset] =
    DeltaReader.snapshot(url)(spark).map(_.version)
      .map(head => maxVersionsPerBatch
        .map(m => math.min(head, math.max(delivered, startingVersion - 1L) + m))
        .getOrElse(head))
      .filter(_ >= startingVersion).map(LongOffset(_))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(DeltaChangeSource.versionOf)
      .getOrElse(startingVersion - 1L)
    val to = DeltaChangeSource.versionOf(end)
    delivered = math.max(delivered, to)
    val changes = DeltaChanges.readChanges(url, from, Some(to))(spark)
      .getOrElse(throw new IllegalStateException(
        s"graft-delta-cdf: table at $url vanished mid-stream"))
    // names + types only: nullability/metadata legitimately drift
    // between the log's schemaString and an assembled frame
    def shape(st: StructType) = st.fields.map(f => (f.name, f.dataType)).toSeq
    require(shape(changes.schema) == shape(schema),
      s"graft-delta-cdf: schema of $url changed mid-stream (was " +
        s"${schema.simpleString}, now ${changes.schema.simpleString}) — " +
        "restart the query to pick up the evolved schema")
    org.apache.spark.sql.graft.StreamingBridge.streamingFrame(changes)
  }

  override def commit(end: Offset): Unit =
    delivered = math.max(delivered, DeltaChangeSource.versionOf(end))

  override def stop(): Unit = ()

  override def toString: String = s"DeltaChangeSource[$url]"
}

object DeltaChangeSource {
  /** Table schema + the CDF columns — [[DeltaChanges.readChanges]]'s
    * exact shape. */
  private[streaming] def changeSchema(table: StructType): StructType =
    StructType(table.fields ++ Seq(
      StructField("_change_type", StringType),
      StructField("_commit_version", LongType)))

  /** v1 offsets come back as [[LongOffset]] live and as a serialized
    * JSON blob after a restart — both carry one long. */
  private[streaming] def versionOf(o: Offset): Long = o match {
    case LongOffset(v) => v
    case other => other.json.trim.toLong
  }
}

/** `format("graft-delta-cdf")` registration (META-INF service) —
  * options: `path` (table url, required), `startingVersion` (first
  * version to deliver; default 0 = the table's creation),
  * `maxVersionsPerBatch` (admission control: cap each micro-batch at
  * N commit versions so catching up on a long log is paced instead
  * of one giant first window — the `maxFilesPerTrigger` analogue;
  * default unlimited). */
final class DeltaChangeSourceProvider
    extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-delta-cdf"

  private def opt(parameters: Map[String, String], key: String)
      : Option[String] =
    parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase(key) => v }

  private def urlOf(parameters: Map[String, String]): String =
    opt(parameters, "path").getOrElse(throw new IllegalArgumentException(
      """graft-delta-cdf: .option("path", <delta table url>) is required"""))
      .stripSuffix("/")

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) = {
    require(schema.isEmpty,
      "graft-delta-cdf: the schema comes from the table's log; " +
        "a user-supplied schema is not accepted")
    val url = urlOf(parameters)
    val snap = DeltaReader.snapshot(url)(sqlContext.sparkSession).getOrElse(
      throw new IllegalArgumentException(
        s"graft-delta-cdf: no Delta table at $url"))
    (shortName(), DeltaChangeSource.changeSchema(snap.schema))
  }

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source = {
    val starting = opt(parameters, "startingVersion").map(_.toLong)
      .getOrElse(0L)
    require(starting >= 0L,
      s"graft-delta-cdf: startingVersion $starting < 0")
    val maxPerBatch = opt(parameters, "maxVersionsPerBatch").map(_.toLong)
    maxPerBatch.foreach(m => require(m >= 1L,
      s"graft-delta-cdf: maxVersionsPerBatch $m < 1"))
    new DeltaChangeSource(sqlContext.sparkSession, urlOf(parameters),
      starting, maxPerBatch)
  }
}
