package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The TAIL-FOLLOW faces over a real Delta `_delta_log`: the
  * reference delegates change reads to the deltalake library
  * (/root/reference/polario/delta_dataset.py:41-62); here a consumer
  * picks either a PULL poll ([[followOnce]]/[[foreachVersion]] — a
  * persisted version watermark + [[DeltaChanges.readChanges]]
  * attribution) or a REAL Structured Streaming query
  * ([[followStream]] — the version-offset
  * [[graft.streaming.DeltaChangeSource]], engine-owned offsets and
  * restart). Both upgrade at-least-once delivery to exactly-once the
  * same way: SetTransaction keys per source version on the
  * destination table ([[DeltaWriter.write]] `txn`), so the two faces
  * are interchangeable mid-table.
  *
  * Delivery semantics, exactly like a foreachBatch sink:
  *  - the watermark is persisted AFTER the handler/mirror completes a
  *    version, so a crash mid-version re-delivers that version
  *    (at-least-once); handlers that key side effects by
  *    `(tableId, version)` — as [[followOnce]] does via
  *    SetTransaction — upgrade that to exactly-once;
  *  - the watermark file is advisory recovery state, NEVER the
  *    correctness line: [[followOnce]] stays exactly-once from ANY
  *    stale or deleted watermark because the destination table itself
  *    records the applied versions.
  *
  * Scale shape (100 TB): each poll is one incremental
  * [[DeltaChanges]] window read (O(new commits), not O(history));
  * watermark I/O is two tiny files. The follower holds no row data on
  * the driver.
  */
object DeltaFollow {

  /** Read the persisted watermark; −1 when never written (follow from
    * the table's creation). */
  def readWatermark(checkpointFile: String)
                   (implicit spark: SparkSession): Long = {
    val p = new Path(checkpointFile)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return -1L
    val in = fs.open(p)
    try {
      val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      in.readFully(0L, bytes)
      new String(bytes, "UTF-8").trim.toLong
    } finally in.close()
  }

  /** Persist the watermark atomically (write-temp + rename — the same
    * publish discipline as the commit files; a crash never leaves a
    * torn watermark, only a stale one, which replays harmlessly). */
  def writeWatermark(checkpointFile: String, version: Long)
                    (implicit spark: SparkSession): Unit = {
    val p = new Path(checkpointFile)
    val fs: FileSystem = p.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(p.getParent,
      s".${p.getName}.tmp-${java.util.UUID.randomUUID}")
    fs.mkdirs(p.getParent)
    val out = fs.create(tmp, false)
    try out.write(s"$version\n".getBytes("UTF-8")) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new IllegalStateException(
        s"DeltaFollow: could not publish watermark $version to $checkpointFile")
  }

  /** One poll of the append-mirror stream: read the watermark, apply
    * every new source version's inserts to `dstUrl` exactly-once
    * (SetTransaction-keyed per version — see
    * [[DeltaChanges.mirrorAppends]]), persist the new watermark, and
    * return it. Call in a loop (or from a scheduler) to follow the
    * table's tail; re-calling after ANY crash, duplicate schedule, or
    * watermark loss re-applies nothing. */
  def followOnce(srcUrl: String, dstUrl: String, checkpointFile: String)
                (implicit spark: SparkSession): Long = {
    val from = readWatermark(checkpointFile)
    val wm = DeltaChanges.mirrorAppends(srcUrl, dstUrl, from)
    if (wm != from) writeWatermark(checkpointFile, wm)
    wm
  }

  /** Run the tail-follow as a REAL Structured Streaming query over
    * the version-offset change-feed source
    * ([[graft.streaming.DeltaChangeSource]], `format("graft-delta-
    * cdf")`): the engine's offset log tracks commit versions, each
    * micro-batch is the `(from, to]` change window, and `foreachBatch`
    * appends the window's insert rows to `dstUrl` with one
    * SetTransaction PER SOURCE VERSION — the same `(appId, version)`
    * keys [[DeltaChanges.mirrorAppends]] writes, so [[followOnce]]
    * polls and this stream are interchangeable mid-table and
    * exactly-once holds across ANY batch boundary: a replayed or
    * re-windowed batch re-applies nothing, the destination table
    * itself records what landed. `checkpointDir` is the stream's
    * checkpoint location; LOSING it only re-reads the feed — no
    * duplicate row can land (the spec kills it and restarts with a
    * fresh one). Returns the running query; `stop()` it when done.
    *
    * Scale shape: an idle trigger costs ONE log listing inside
    * `getOffset` (no Spark job, the tail-follow floor); work only
    * happens when commits landed, as distributed scans of the new
    * files. */
  def followStream(srcUrl: String, dstUrl: String, checkpointDir: String,
                   intervalMs: Long = 1000L)
                  (implicit spark: SparkSession)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.functions.col
    val cleanSrc = srcUrl.stripSuffix("/")
    val srcSnap = DeltaReader.snapshot(cleanSrc).getOrElse(
      throw new IllegalArgumentException(
        s"DeltaFollow: no Delta table at $cleanSrc"))
    val appId = s"graft-mirror-${srcSnap.tableId}"
    spark.readStream.format("graft-delta-cdf")
      .option("path", cleanSrc)
      .option("startingVersion", "0")
      .load()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime(intervalMs))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // postimages ARE the insert stream on cdc-authoritative
        // versions (the derived path emits those rows as plain
        // "insert"), so both follow faces mirror the same rows
        val inserts = batch.where(col("_change_type")
          .isin("insert", "update_postimage"))
          .localCheckpoint()
        try {
          // per-version txn keys: exactly-once survives re-windowing
          // (a replayed batch spanning already-applied versions skips
          // them one by one), not just whole-batch replay
          val versions = inserts.select(col("_commit_version")).distinct()
            .collect().map(_.getLong(0)).sorted
          versions.foreach { v =>
            DeltaWriter.write(dstUrl,
              inserts.where(col("_commit_version") === v)
                .drop("_change_type", "_commit_version"),
              Seq.empty, overwrite = false, txn = Some((appId, v)))
          }
        } finally { inserts.unpersist(blocking = false); () }
      }
      .start()
  }

  /** One poll of the generic change stream: deliver the change frame
    * of each version in `(watermark, head]` to `handler(version,
    * changes)` IN ORDER — `changes` carries the table schema plus
    * `_change_type`/`_commit_version`, exactly the
    * [[DeltaChanges.readChanges]] shape — then persist the watermark
    * after EACH version so a crash re-delivers only the in-flight one.
    * At-least-once: handlers with external side effects must key them
    * by version to be exactly-once. Returns the new watermark.
    *
    * A long catch-up costs ONE incremental window pass (the frames
    * are lazy; each version's work runs when the handler consumes
    * it), never a log replay per version. */
  def foreachVersion(srcUrl: String, checkpointFile: String)
                    (handler: (Long, DataFrame) => Unit)
                    (implicit spark: SparkSession): Long = {
    val cleanSrc = srcUrl.stripSuffix("/")
    val head = DeltaReader.snapshot(cleanSrc).getOrElse(
      throw new IllegalArgumentException(
        s"DeltaFollow: no Delta table at $cleanSrc"))
    var wm = readWatermark(checkpointFile)
    if (wm >= head.version) return wm
    DeltaChanges.taggedChanges(cleanSrc, wm, head.version, head)
      .foreach { case (v, changes) =>
        handler(v, changes.getOrElse(DeltaChanges.emptyChangeFrame(head)))
        writeWatermark(checkpointFile, v)
        wm = v
      }
    wm
  }
}
