package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Change-data reconstruction over a real Delta `_delta_log` — the
  * batch version of `readChangeFeed`, derived purely from the PUBLIC
  * commit protocol (no CDC sidecar files needed): the tail-follow
  * face a streaming consumer polls with a version watermark.
  *
  * Per version `v` in the requested window, with `prev` = the live
  * file state at `v-1`, the commit's actions classify as:
  *
  *  - `add` with `dataChange=true` of a path NOT live in `prev` →
  *    a genuinely new data file: its rows (minus its add-time
  *    deletion vector) are **inserts** at `v`;
  *  - `add` of a path live in `prev` whose deletion vector CHANGED
  *    (the remove+re-add shape a DV DELETE commits) → the rows in
  *    the new mask but not the old one are **deletes** at `v`;
  *  - `remove` with `dataChange=true` of a live path with no re-add
  *    in the same commit (file-level DELETE / overwrite) → the
  *    file's surviving rows at `v-1` are **deletes** at `v`;
  *  - anything with `dataChange=false` (OPTIMIZE rewrites,
  *    checkpoint replays) → **no changes**, exactly the protocol's
  *    contract that rearrangement is not data.
  *
  * The change frame carries the table schema plus `_change_type`
  * (`insert` | `delete`) and `_commit_version` — the Delta CDF
  * column names.
  *
  * Scale shape (100 TB): per version the driver touches one small
  * commit JSON and file-count-sized state; row-level work (new-file
  * reads, DV-diff anti-joins, survivor scans) runs as distributed
  * scans batched per version. Cost is O(window × log-replay) — the
  * intended use is a short poll window riding a version watermark,
  * not a full-history replay (though that works too while the JSON
  * commits exist; a window vacuumed past its commits raises loudly
  * via the reader's contiguity check).
  */
object DeltaChanges {

  /** Changes in `(fromVersion, toVersion]` (default head). Pass
    * `fromVersion = -1` to start at the table's creation. The window
    * must be covered by JSON commits — change attribution needs the
    * per-version actions, so a vacuumed tail raises rather than
    * guessing. Returns None when no table exists at `url`. */
  def readChanges(url: String, fromVersion: Long,
                  toVersion: Option[Long] = None)
                 (implicit spark: SparkSession): Option[DataFrame] = {
    val cleanUrl = url.stripSuffix("/")
    val headSnap = DeltaReader.snapshot(cleanUrl).getOrElse(return None)
    val to = toVersion.getOrElse(headSnap.version)
    require(to <= headSnap.version,
      s"DeltaChanges: version $to requested but the log ends at " +
        s"${headSnap.version}")
    require(fromVersion <= to,
      s"DeltaChanges: empty window ($fromVersion, $to]")
    val schema = headSnap.schema
    def emptyChanges = {
      import org.apache.spark.sql.types._
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(schema.fields ++ Seq(
          StructField("_change_type", StringType),
          StructField("_commit_version", LongType))))
    }
    if (fromVersion == to) return Some(emptyChanges)

    val logDir = new Path(cleanUrl.stripSuffix("/"), "_delta_log")
    val fs = logDir.getFileSystem(spark.sessionState.newHadoopConf())
    def commitPath(v: Long) = new Path(logDir, f"$v%020d.json")

    // prev starts at the watermark snapshot (None before creation)
    var prev: Option[DeltaReader.DeltaSnapshot] =
      if (fromVersion < 0) None
      else DeltaReader.snapshotAt(cleanUrl, Some(fromVersion))
    val versionFrames = ((fromVersion + 1) to to).flatMap { v =>
      require(fs.exists(commitPath(v)),
        s"DeltaChanges: commit $v is vacuumed away — change attribution " +
          s"for ($fromVersion, $to] needs its JSON commit")
      val snapV = DeltaReader.snapshotAt(cleanUrl, Some(v)).get
      val prevByKey: Map[String, DeltaReader.DeltaFile] = prev
        .map(_.files.map(f => new Path(f.path).toUri.toString -> f).toMap)
        .getOrElse(Map.empty)
      val vByKey: Map[String, DeltaReader.DeltaFile] =
        snapV.files.map(f => new Path(f.path).toUri.toString -> f).toMap

      // the raw commit actions decide dataChange; file STATE (paths,
      // descriptors) comes from the replayed snapshots
      val actions = spark.read.schema(actionSchemaPublic)
        .json(commitPath(v).toString)
        .select(col("add.path").as("__ap"),
          col("add.dataChange").as("__adc"),
          col("remove.path").as("__rp"),
          col("remove.dataChange").as("__rdc"))
        .collect()
      def absKey(raw: String): String = {
        val uri = new java.net.URI(raw)
        val p = new Path(uri)
        val base = fs.makeQualified(new Path(cleanUrl))
        (if (uri.isAbsolute) p else new Path(base, p)).toUri.toString
      }
      val addKeys = actions.filter(r => !r.isNullAt(0))
        .map(r => absKey(r.getString(0)) ->
          (r.isNullAt(1) || r.getBoolean(1))).toMap
      val removeKeys = actions.filter(r => !r.isNullAt(2))
        .map(r => absKey(r.getString(2)) ->
          (r.isNullAt(3) || r.getBoolean(3))).toMap

      val insertFiles = addKeys.collect {
        case (k, true) if !prevByKey.contains(k) && vByKey.contains(k) =>
          vByKey(k)
      }.toSeq.sortBy(_.path)
      // a DV GROWING (or appearing) is a delete; a DV vanishing with
      // dataChange=true (row restoration) has no readChangeFeed
      // precedent and is ignored rather than guessed at
      val dvUpdated = addKeys.keys.toSeq.sorted.collect {
        case k if prevByKey.contains(k) && vByKey.contains(k) &&
          vByKey(k).deletionVector.isDefined &&
          vByKey(k).deletionVector != prevByKey(k).deletionVector =>
          (prevByKey(k), vByKey(k))
      }
      val droppedFiles = removeKeys.collect {
        case (k, true) if prevByKey.contains(k) && !vByKey.contains(k) =>
          prevByKey(k)
      }.toSeq.sortBy(_.path)

      val inserts =
        if (insertFiles.isEmpty) None
        else Some(DeltaReader.assembleSnapshot(
          snapV.copy(files = insertFiles)))
      // DV diff: rows newly masked at v = rows(newDV) minus
      // rows(oldDV), joined back to the file's content by row index
      val dvDeletes =
        if (dvUpdated.isEmpty) None
        else {
          val newMask = DeltaReader.deletedRowsFrame(
            snapV.copy(files = dvUpdated.map(_._2))).get
          val oldMask = DeltaReader.deletedRowsFrame(
            snapV.copy(files = dvUpdated.map(_._1).filter(
              _.deletionVector.isDefined)))
          val diff = oldMask.map(om => newMask.join(om,
            Seq("__dv_fp", "__dv_ri"), "left_anti")).getOrElse(newMask)
          val content = DeltaReader.scanWithRowIndex(
            snapV.copy(files = dvUpdated.map(_._2.copy(deletionVector = None))))
          Some(content.join(
            diff.select(col("__dv_fp").as("__fp"), col("__dv_ri").as("__ri")),
            Seq("__fp", "__ri"), "left_semi").drop("__fp", "__ri"))
        }
      // file-level removes: the file's surviving rows as of v-1
      val dropDeletes =
        if (droppedFiles.isEmpty) None
        else Some(DeltaReader.assembleSnapshot(
          prev.get.copy(files = droppedFiles)))

      val tagged =
        inserts.map(_.withColumn("_change_type", lit("insert"))).toSeq ++
        (dvDeletes.toSeq ++ dropDeletes.toSeq)
          .map(_.withColumn("_change_type", lit("delete")))
      prev = Some(snapV)
      tagged.map(_.withColumn("_commit_version", lit(v)))
    }
    Some(versionFrames.foldLeft(emptyChanges)(_ unionByName _))
  }

  // the reader's action schema is private; changes only need the
  // four dataChange-bearing fields
  private val actionSchemaPublic = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("dataChange", BooleanType)))),
      StructField("remove", StructType(Seq(
        StructField("path", StringType),
        StructField("dataChange", BooleanType))))))
  }

  /** Tail-follow composition with the exactly-once append primitive:
    * apply every INSERT batch in `(fromVersion, head]` of `srcUrl`
    * to the Delta table at `dstUrl`, one commit per source version,
    * each keyed by a SetTransaction on the source's table id — so a
    * crashed/replayed follower restarting from ANY stale watermark
    * re-applies nothing (versions already in the mirror's txn
    * watermark no-op before data lands). Returns the new watermark
    * to persist. Deletes and rewrites on the source do not retract
    * from the mirror — this is the append-stream face; a consumer
    * wanting full parity applies the `delete` rows itself. */
  def mirrorAppends(srcUrl: String, dstUrl: String, fromVersion: Long)
                   (implicit spark: SparkSession): Long = {
    val srcSnap = DeltaReader.snapshot(srcUrl).getOrElse(
      throw new IllegalArgumentException(
        s"DeltaChanges.mirrorAppends: no Delta table at $srcUrl"))
    val appId = s"graft-mirror-${srcSnap.tableId}"
    ((fromVersion + 1) to srcSnap.version).foreach { v =>
      val batch = readChanges(srcUrl, v - 1, Some(v)).get
        .where(col("_change_type") === "insert")
        .drop("_change_type", "_commit_version")
      if (!batch.isEmpty)
        DeltaWriter.write(dstUrl, batch, Seq.empty,
          overwrite = false, txn = Some((appId, v)))
    }
    srcSnap.version
  }
}
