package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Read-only reader for Delta Lake tables via the PUBLIC transaction-
  * log protocol (delta.io PROTOCOL.md) — no delta jars required.
  *
  * The reference's `DeltaDataset` reads real Delta tables
  * (/root/reference/polario/delta_dataset.py:41-62: `read_partition`
  * via partition filters, `scan` returning None for a missing table).
  * [[ManagedDataset]] reproduces that OBSERVABLE surface with its own
  * manifest protocol; this object closes the interop gap for tables
  * someone else already wrote with a real Delta writer: it replays
  * `_delta_log/` into a snapshot file list and hands the files to the
  * ordinary parquet reader.
  *
  * Protocol subset implemented (all public, from PROTOCOL.md):
  *  - commit files `_delta_log/<20-digit version>.json`, one action
  *    object per line: `add`, `remove`, `metaData`, `protocol` (other
  *    actions — txn/commitInfo/cdc/domainMetadata — carry no
  *    snapshot-file state and are ignored);
  *  - parquet checkpoints `<v>.checkpoint.parquet` and multi-part
  *    `<v>.checkpoint.<i>.<n>.parquet` (discovered by listing, so a
  *    missing/stale `_last_checkpoint` pointer never breaks replay),
  *    plus V2 checkpoints (`v2Checkpoint` reader feature): UUID-named
  *    `<v>.checkpoint.<id>.{json|parquet}` manifests whose file
  *    actions live inline or in parquet sidecars under
  *    `_delta_log/_sidecars/`, `checkpointMetadata.version` validated
  *    against the file name;
  *  - snapshot state: for each data-file path the action from the
  *    HIGHEST version wins (the protocol forbids add+remove of one
  *    path inside a single commit), survivors are the `add`s;
  *  - the latest `metaData` supplies the logical schema
  *    (`schemaString` is Spark's own StructType JSON — public spec)
  *    and the partition columns, whose values live ONLY in the log
  *    (injected as typed literal columns at read, like
  *    [[HiveDataset]] P4);
  *  - column mapping in `name` mode (reader protocol 2, or 3 with
  *    the `columnMapping` reader feature): the logical schema's
  *    `delta.columnMapping.physicalName` field metadata renames the
  *    parquet scan, and partition values are resolved under the
  *    PHYSICAL key (the protocol's writer requirement) with a
  *    logical-key fallback for writers that never renamed them; in
  *    `id` mode the `delta.columnMapping.id` field metadata rides
  *    into the scan as `parquet.field.id`, so columns resolve by
  *    parquet FIELD ID (Spark's native field-id matching) — stored
  *    parquet names carry no meaning, exactly the id-mode contract;
  *  - deletion vectors (the `deletionVectors` reader feature, on by
  *    default on Databricks-written tables): `add.deletionVector`
  *    descriptors in all three storage modes (`u` sidecar by Z85
  *    UUID, `p` absolute path, `i` inline) decode through
  *    [[DeletionVectors]] on EXECUTORS and anti-join the scan on
  *    `(_metadata.file_path, _metadata.row_index)` — deleted rows
  *    never reach the caller, and a corrupt bitmap raises (CRC)
  *    instead of resurrecting rows;
  *  - anything else the table declares it needs — any unrecognized
  *    mapping mode, reader feature or version — raises loudly rather
  *    than mis-reading.
  *
  * Scale shape (100 TB): the log replay is ONE distributed
  * `spark.read.json` over the commit files (+ one parquet read of the
  * newest checkpoint ≤ the requested version) and one path-keyed
  * max-version aggregation — a multi-year log with tens of thousands
  * of commits replays as a single shuffle on file-count-sized data.
  * Only the surviving file LIST collects to the driver (every Delta
  * reader materializes this to plan a scan — it is metadata, bounded
  * by file count, never row count). The data read itself is plain
  * parquet scans grouped by partition, so Catalyst pushdown/pruning
  * apply downstream untouched.
  */
object DeltaReader {

  /** A deletion-vector descriptor exactly as the log carries it
    * (PROTOCOL.md "Deletion Vector Descriptor Schema"): storage `u`
    * (relative file, Z85 UUID name), `p` (absolute path), or `i`
    * (inline Z85 payload). `offset` points at the frame's size word
    * inside the DV file; `sizeInBytes` is the serialized bitmap
    * length; `cardinality` the deleted-row count. */
  final case class DvDescriptor(
      storageType: String,
      pathOrInlineDv: String,
      offset: Option[Int],
      sizeInBytes: Int,
      cardinality: Long)

  /** One surviving data file: absolute path + its partition values
    * (string-encoded, as the log stores them; null = null value).
    * `size`/`modificationTime` ride along for checkpoint writing;
    * a present `deletionVector` masks row indexes at scan time;
    * `stats` is the add action's per-file statistics JSON
    * (`numRecords`/`minValues`/`maxValues`/`nullCount`) verbatim —
    * the data-skipping input [[scanPruned]] consumes. */
  final case class DeltaFile(path: String, partitionValues: Map[String, String],
      size: Long = 0L, modificationTime: Long = 0L,
      deletionVector: Option[DvDescriptor] = None,
      stats: Option[String] = None,
      baseRowId: Option[Long] = None,
      defaultRowCommitVersion: Option[Long] = None)

  /** The newest protocol action's content (defaults = a pre-features
    * protocol-1 table). Carried so checkpoint writers reproduce the
    * declared feature sets verbatim. */
  final case class DeltaProtocol(minReaderVersion: Int, minWriterVersion: Int,
      readerFeatures: Option[Seq[String]] = None,
      writerFeatures: Option[Seq[String]] = None)

  /** Reconstructed table state at one version. `physicalSchema` is
    * defined only under column mapping: the same shape as `schema`
    * field-for-field, with every name replaced by its
    * `delta.columnMapping.physicalName` (parquet files store THESE
    * names; `schema` stays the user-facing truth). `tableId` /
    * `configuration` / `createdTime` / `protocol` / `tombstones`
    * (latest-action-is-remove paths with their deletionTimestamp)
    * carry the full state a checkpoint must reproduce. */
  final case class DeltaSnapshot(
      version: Long,
      schema: StructType,
      partitionColumns: Seq[String],
      files: Seq[DeltaFile],
      physicalSchema: Option[StructType] = None,
      tableId: String = "",
      configuration: Map[String, String] = Map.empty,
      createdTime: Option[Long] = None,
      protocol: DeltaProtocol = DeltaProtocol(1, 2),
      tombstones: Seq[(String, Long)] = Seq.empty,
      root: String = "",
      txns: Map[String, Long] = Map.empty,
      domainMetadata: Map[String, String] = Map.empty)

  /** `dt` with nullability relaxed at every level, field metadata
    * kept — the cast target shape for physical→logical renames (scan
    * output is always nullable; a NOT NULL inner field would make the
    * cast refuse) AND the writer's evolved-column normalization
    * ([[DeltaWriter.relaxNullability]] delegates here so the two
    * can never diverge). */
  private[sources] def relaxNullability(dt: DataType): DataType = dt match {
    case st: StructType => StructType(st.fields.map(f =>
      f.copy(dataType = relaxNullability(f.dataType), nullable = true)))
    case ArrayType(et, _) => ArrayType(relaxNullability(et), containsNull = true)
    case MapType(k, v, _) =>
      MapType(relaxNullability(k), relaxNullability(v),
        valueContainsNull = true)
    case other => other
  }

  private def physicalFieldName(f: StructField): String =
    if (f.metadata.contains("delta.columnMapping.physicalName"))
      f.metadata.getString("delta.columnMapping.physicalName")
    else f.name

  /** Recursively rename a logical type to its physical shape. */
  private def toPhysical(dt: DataType): DataType = dt match {
    case st: StructType => StructType(st.fields.map(f =>
      StructField(physicalFieldName(f), toPhysical(f.dataType), f.nullable)))
    case ArrayType(et, n) => ArrayType(toPhysical(et), n)
    case MapType(k, v, n) => MapType(toPhysical(k), toPhysical(v), n)
    case other => other
  }

  /** Physical shape for `id` mapping mode: names from physicalName
    * like name mode, but every field additionally tagged with
    * `parquet.field.id` (= its `delta.columnMapping.id`) so Spark's
    * parquet reader resolves columns by FIELD ID — the id-mode
    * contract: the parquet files' stored names carry no meaning, the
    * ids are authoritative. A field without an id is a malformed
    * id-mode table and raises. */
  private def toPhysicalIds(dt: DataType): DataType = dt match {
    case st: StructType => StructType(st.fields.map { f =>
      if (!f.metadata.contains("delta.columnMapping.id"))
        throw new IllegalStateException(
          s"DeltaReader: id-mode table field '${f.name}' lacks " +
            "delta.columnMapping.id — malformed column-mapping metadata")
      val md = new MetadataBuilder()
        .putLong("parquet.field.id",
          f.metadata.getLong("delta.columnMapping.id"))
        .build()
      StructField(physicalFieldName(f), toPhysicalIds(f.dataType),
        f.nullable, md)
    })
    case ArrayType(et, n) => ArrayType(toPhysicalIds(et), n)
    case MapType(k, v, n) => MapType(toPhysicalIds(k), toPhysicalIds(v), n)
    case other => other
  }

  /** The physical read schema a table's column-mapping mode implies —
    * None for mode=none, renamed for `name`, renamed + field-id-tagged
    * for `id` (shared by [[snapshotAt]] and [[DeltaChanges]]'s
    * incremental replay, so both derive identical scan shapes). */
  private[sources] def physicalSchemaFor(schema: StructType,
      tableConf: Map[String, String])
      (implicit spark: SparkSession): Option[StructType] =
    tableConf.getOrElse("delta.columnMapping.mode", "none") match {
      case "none" => None
      case "name" => Some(toPhysical(schema).asInstanceOf[StructType])
      case "id" =>
        // Spark matches parquet columns by field id only when this
        // conf is on AND the requested schema carries
        // parquet.field.id — safe to leave on session-wide
        // (id-less read schemas still match by name)
        spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
        Some(toPhysicalIds(schema).asInstanceOf[StructType])
      case other => throw new UnsupportedOperationException(
        s"DeltaReader: column mapping mode '$other' unsupported " +
          "(none/name/id only)")
    }

  private[sources] val CommitName = """(\d{20})\.json""".r
  private[sources] val CheckpointName =
    """(\d{20})\.checkpoint(\.\d{10}\.\d{10})?\.parquet""".r
  // v2 checkpoints (the `v2Checkpoint` reader feature): one
  // UUID-named manifest per attempt. The single `[A-Za-z0-9_-]+`
  // segment cannot collide with classic multi-part names — those
  // carry TWO dot-separated numeric parts before `.parquet`.
  private[sources] val V2CheckpointName =
    """(\d{20})\.checkpoint\.([A-Za-z0-9_-]+)\.(json|parquet)""".r

  /** Actions parsed from commit JSON — explicit schema: inference
    * over a long log would cost a pre-pass and could widen types. */
  private val dvSchema = StructType(Seq(
    StructField("storageType", StringType),
    StructField("pathOrInlineDv", StringType),
    StructField("offset", IntegerType),
    StructField("sizeInBytes", IntegerType),
    StructField("cardinality", LongType)))

  private val actionSchema = StructType(Seq(
    StructField("txn", StructType(Seq(
      StructField("appId", StringType),
      StructField("version", LongType)))),
    StructField("add", StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("deletionVector", dvSchema),
      StructField("stats", StringType),
      StructField("baseRowId", LongType),
      StructField("defaultRowCommitVersion", LongType)))),
    StructField("remove", StructType(Seq(
      StructField("path", StringType),
      StructField("deletionTimestamp", LongType),
      StructField("dataChange", BooleanType)))),
    StructField("domainMetadata", StructType(Seq(
      StructField("domain", StringType),
      StructField("configuration", StringType),
      StructField("removed", BooleanType)))),
    StructField("metaData", StructType(Seq(
      StructField("id", StringType),
      StructField("format", StructType(Seq(
        StructField("provider", StringType)))),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType)),
      StructField("createdTime", LongType)))),
    StructField("protocol", StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType),
      StructField("readerFeatures", ArrayType(StringType)),
      StructField("writerFeatures", ArrayType(StringType)))))))

  /** The one normalized projection both log sources (JSON commits and
    * parquet checkpoints) flatten into before replay. */
  private def normalizeActions(df: DataFrame): DataFrame = df.select(
    col("txn.appId").as("__txn_app"),
    col("txn.version").as("__txn_v"),
    col("add.path").as("__add_path"),
    col("add.partitionValues").as("__add_pv"),
    col("add.size").as("__add_size"),
    col("add.modificationTime").as("__add_mt"),
    col("add.deletionVector").as("__add_dv"),
    col("add.stats").as("__add_stats"),
    col("add.baseRowId").as("__add_brid"),
    col("add.defaultRowCommitVersion").as("__add_drcv"),
    col("remove.path").as("__rm_path"),
    col("remove.deletionTimestamp").as("__rm_ts"),
    col("domainMetadata.domain").as("__dm_domain"),
    col("domainMetadata.configuration").as("__dm_conf"),
    col("domainMetadata.removed").as("__dm_removed"),
    col("metaData.id").as("__mid"),
    col("metaData.schemaString").as("__schema"),
    col("metaData.partitionColumns").as("__pcols"),
    col("metaData.format.provider").as("__provider"),
    col("metaData.configuration").as("__conf"),
    col("metaData.createdTime").as("__mct"),
    col("protocol.minReaderVersion").as("__min_reader"),
    col("protocol.minWriterVersion").as("__min_writer"),
    col("protocol.readerFeatures").as("__feats"),
    col("protocol.writerFeatures").as("__wfeats"),
    col("__v"))

  /** Replay a v2 checkpoint (PROTOCOL.md "V2 Spec Checkpoints"): the
    * UUID-named manifest holds exactly one `checkpointMetadata`
    * action (whose version must equal the file-name version — a
    * mismatch means a corrupt or misplaced manifest), the non-file
    * actions (protocol / metaData / txn), and EITHER inline
    * add/remove actions or `sidecar` pointers to parquet files under
    * `_delta_log/_sidecars/` carrying them. Returns the checkpoint's
    * actions in [[normalizeActions]] shape, tagged `__v = v`.
    *
    * Scale shape: the manifest is one file (json or parquet); only
    * the SIDECAR PATH LIST collects to the driver (sidecar count —
    * metadata, like every planner's file list), and the sidecars
    * themselves are read as one distributed parquet scan. */
  private def readV2Checkpoint(logDir: Path, v: Long, name: String)
                              (implicit spark: SparkSession): DataFrame = {
    val v2Schema = StructType(actionSchema.fields ++ Seq(
      StructField("checkpointMetadata", StructType(Seq(
        StructField("version", LongType)))),
      StructField("sidecar", StructType(Seq(
        StructField("path", StringType),
        StructField("sizeInBytes", LongType))))))
    val manifestPath = new Path(logDir, name).toString
    val manifest =
      (if (name.endsWith(".json")) spark.read.schema(v2Schema).json(manifestPath)
       else spark.read.schema(v2Schema).parquet(manifestPath))
        .localCheckpoint() // read once, consulted three times below
    val cpMeta = manifest
      .where(col("checkpointMetadata").isNotNull)
      .select(col("checkpointMetadata.version")).collect()
    require(cpMeta.length == 1 && cpMeta.head.getLong(0) == v,
      s"DeltaReader: v2 checkpoint $name must carry exactly one " +
        s"checkpointMetadata action with version $v (found " +
        s"${cpMeta.map(_.getLong(0)).mkString("[", ",", "]")})")
    val sidecars = manifest.where(col("sidecar.path").isNotNull)
      .select(col("sidecar.path")).collect().map(_.getString(0)).sorted
    val sidecarDir = new Path(logDir, "_sidecars")
    val sidecarPaths = sidecars.map { p =>
      val uri = new java.net.URI(p)
      (if (uri.isAbsolute) new Path(uri) else new Path(sidecarDir, p)).toString
    }
    val manifestActions = normalizeActions(manifest.withColumn("__v", lit(v)))
    val sidecarActions =
      if (sidecarPaths.isEmpty) None
      else Some(normalizeActions(
        spark.read.schema(actionSchema).parquet(sidecarPaths.toSeq: _*)
          .withColumn("__v", lit(v))))
    (Seq(manifestActions) ++ sidecarActions).reduce(_ unionByName _)
  }

  /** Latest snapshot, or None when `url` holds no Delta table
    * (mirrors delta_dataset.py:56-62 scan() → None on
    * TableNotFoundError). */
  def snapshot(url: String)(implicit spark: SparkSession): Option[DeltaSnapshot] =
    snapshotAt(url, None)

  /** Per-path survivor state after replay, before snapshot assembly —
    * the ONE shape both replay paths (distributed and driver-side)
    * reduce to, so everything downstream (path resolution, DV
    * validation, tombstones) is shared code. */
  private final case class LatestPath(path: String, isAdd: Boolean,
      pv: Map[String, String], size: Long, mt: Long,
      dv: Option[DvDescriptor], rmTs: Long, stats: Option[String],
      baseRowId: Option[Long] = None, drcv: Option[Long] = None)

  private final case class MetaVals(schemaJson: String, pcols: Seq[String],
      provider: String, conf: Map[String, String], id: String,
      created: Option[Long])

  /** The protocol gate both replay paths run: v1 = base; v2 = column
    * mapping (handled); v3 = table features — readable only when
    * every declared reader feature is implemented (an ABSENT feature
    * list on a v3 table is malformed: raise, since what the table
    * needs is unknowable). */
  private def checkProtocolReadable(protocolInfo: DeltaProtocol): Unit = {
    val mr = protocolInfo.minReaderVersion
    val supported = Set("columnMapping", "deletionVectors", "v2Checkpoint",
      // features with no reader-visible data-path semantics: the
      // timestamp type and stats collection don't change replay
      "timestampNtz",
      // type widening: old files store the NARROWER type; the scan
      // requests the latest (widened) schema and Spark's parquet
      // reader applies the protocol's widening promotions
      // (int→long, int/float→double, decimal growth) natively —
      // spec-pinned in DeltaTypeWideningSpec. WRITES to such tables
      // stay refused (enforceWritable: not a supported writer
      // feature).
      "typeWidening", "typeWidening-preview")
    val unreadable = mr match {
      case v if v <= 2 => None
      case 3 => protocolInfo.readerFeatures.map(_.toSet) match {
        case Some(f) if (f -- supported).isEmpty => None
        case Some(f) => Some((f -- supported).toSeq.sorted.mkString(", "))
        case None => Some("an undeclared feature set")
      }
      case _ => Some("a protocol version past 3")
    }
    unreadable.foreach { why =>
      throw new UnsupportedOperationException(
        s"DeltaReader: table requires reader protocol $mr with $why — " +
          "this reader implements protocol 1/2 plus the columnMapping " +
          "(name mode), deletionVectors and v2Checkpoint features")
    }
  }

  /** Assemble the snapshot from the replay's reduced state — shared
    * by both paths so they cannot diverge past the reduction. */
  private def finishSnapshot(target: Long, logDir: Path,
      qualifiedBase: Path, protocolInfo: DeltaProtocol,
      metaOpt: Option[MetaVals], latest: Seq[LatestPath],
      txns: Map[String, Long],
      domains: Map[String, String] = Map.empty)
      (implicit spark: SparkSession): Option[DeltaSnapshot] = {
    checkProtocolReadable(protocolInfo)
    val meta = metaOpt.getOrElse(throw new IllegalStateException(
      s"DeltaReader: no metaData action found in $logDir — not a valid Delta log"))
    if (meta.provider != "parquet")
      throw new UnsupportedOperationException(
        s"DeltaReader: format provider '${meta.provider}' unsupported (parquet only)")
    val schema = DataType.fromJson(meta.schemaJson).asInstanceOf[StructType]
    val physSchema = physicalSchemaFor(schema, meta.conf)
    def absPath(raw: String): String = {
      // paths are RFC 2396 URL-encoded and usually relative to the
      // table root; absolute URIs are legal and used as-is
      val uri = new java.net.URI(raw)
      val p = new Path(uri)
      (if (uri.isAbsolute) p else new Path(qualifiedBase, p)).toString
    }
    val files = latest.filter(_.isAdd).map { l =>
      l.dv.foreach { d =>
        require(d.storageType != null && d.pathOrInlineDv != null,
          s"DeltaReader: malformed deletionVector descriptor on ${l.path}")
      }
      DeltaFile(absPath(l.path), l.pv, l.size, l.mt, l.dv, l.stats,
        l.baseRowId, l.drcv)
    }.sortBy(_.path)
    val tombstones = latest.filterNot(_.isAdd)
      .map(l => (absPath(l.path), l.rmTs)).sortBy(_._1)
    Some(DeltaSnapshot(target, schema, meta.pcols, files, physSchema,
      meta.id, meta.conf, meta.created, protocolInfo, tombstones,
      qualifiedBase.toString, txns, domains))
  }

  /** Total bytes under which a checkpoint-less JSON tail replays
    * DRIVER-SIDE (plain Jackson parse, zero Spark jobs) instead of
    * through the distributed reader. Every write/scan round trip on a
    * young table costs several snapshot resolutions; at this size the
    * log is far smaller than one task's scheduling overhead. The
    * distributed path remains the one a checkpoint-anchored or
    * multi-MiB log takes — and the parity spec pins the two paths
    * field-identical. */
  private[sources] val FastReplayMaxBytes: Long = 4L * 1024 * 1024

  /** Snapshot as of `version` (time travel); None when the table does
    * not exist, loud error when the requested version is unreachable
    * (past the log head, or its commits are vacuumed away). */
  def snapshotAt(url: String, asOfVersion: Option[Long])
                (implicit spark: SparkSession): Option[DeltaSnapshot] =
    snapshotAtImpl(url, asOfVersion, forceDistributed = false)

  private[sources] def snapshotAtImpl(url: String, asOfVersion: Option[Long],
                                      forceDistributed: Boolean)
                (implicit spark: SparkSession): Option[DeltaSnapshot] = {
    val cleanUrl = url.stripSuffix("/")
    val logDir = new Path(cleanUrl, "_delta_log")
    val fs: FileSystem = logDir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(logDir)) return None
    val statuses = fs.listStatus(logDir)
    val entries = statuses.map(_.getPath.getName)
    val commits = entries.collect { case CommitName(v) => v.toLong }.sorted
    // only COMPLETE classic checkpoints anchor a replay: a multi-part
    // checkpoint is usable iff all N declared parts landed — a foreign
    // writer's partial landing (crash mid-upload) must be ignored, not
    // replayed as truncated state (delta-spark's checkpoint selection
    // does the same)
    val classicCps = entries.collect {
      case CheckpointName(v, suffix) =>
        v.toLong -> Option(suffix).map { s =>
          val p = s.stripPrefix(".").split("\\.")
          (p(0).toInt, p(1).toInt)
        }
    }.groupBy(_._1).collect {
      case (v, parts) if parts.exists(_._2.isEmpty) => v
      case (v, parts) if {
        val mp = parts.flatMap(_._2)
        mp.nonEmpty && mp.map(_._2).distinct.sizeIs == 1 &&
          mp.map(_._1).toSet == (1 to mp.head._2).toSet
      } => v
    }.toSeq.distinct.sorted
    // several v2 manifests may exist per version (one per writing
    // attempt — the spec makes them equivalent); pick the
    // lexicographically first for determinism
    val v2Cps: Map[Long, String] = entries.collect {
      case n @ V2CheckpointName(v, _, _) => (v.toLong, n)
    }.groupBy(_._1).map { case (v, ns) => v -> ns.map(_._2).min }
    val checkpoints = (classicCps ++ v2Cps.keys).distinct.sorted
    if (commits.isEmpty && checkpoints.isEmpty) return None
    val head = (commits ++ checkpoints).max
    val target = asOfVersion.getOrElse(head)
    if (target > head)
      throw new IllegalArgumentException(
        s"DeltaReader: version $target requested but the log ends at $head")
    // newest checkpoint at or before the target anchors the replay;
    // JSON commits (cp, target] complete it. Contiguity is checked —
    // a vacuumed gap must raise, not silently drop state.
    val cp = checkpoints.filter(_ <= target).lastOption
    val tail = commits.filter(v => v > cp.getOrElse(-1L) && v <= target)
    val expected = (cp.getOrElse(-1L) + 1) to target
    if (expected.toSet -- tail.toSet != Set.empty)
      throw new IllegalStateException(
        s"DeltaReader: commits ${(expected.toSet -- tail.toSet).toSeq.sorted
          .mkString(",")} missing from $logDir — log truncated past " +
          "the newest usable checkpoint")

    def commitPath(v: Long) = new Path(logDir, f"$v%020d.json").toString
    // SMALL-LOG FAST PATH: a checkpoint-less tail under
    // [[FastReplayMaxBytes]] replays driver-side — plain JSON parse,
    // zero Spark jobs. Every Delta write/scan resolves snapshots
    // several times; on a young table this is the difference between
    // milliseconds and a scheduler round trip per resolution.
    if (!forceDistributed && cp.isEmpty) {
      val tailSet = tail.map(v => f"$v%020d.json").toSet
      val tailBytes = statuses.filter(st => tailSet(st.getPath.getName))
        .map(_.getLen).sum
      if (tailBytes <= FastReplayMaxBytes)
        return fastReplay(fs, logDir, cleanUrl, tail, target)
    }
    val jsonActions =
      if (tail.isEmpty) None
      else Some(spark.read.schema(actionSchema).json(tail.map(commitPath): _*)
        .withColumn("__v", regexp_extract(input_file_name(),
          "(\\d{20})\\.json", 1).cast("long")))
    val cpActions = cp.map { v =>
      val allClassic = fs.listStatus(logDir).map(_.getPath).filter { p =>
        p.getName match {
          case CheckpointName(cv, _) => cv.toLong == v
          case _ => false
        }
      }
      // when a single-file checkpoint coexists with a (possibly
      // partial) multi-part landing at the same version, read ONLY
      // the single file — mixing in stray parts would duplicate rows
      val single = allClassic.filter(_.getName match {
        case CheckpointName(_, suffix) => suffix == null
        case _ => false
      })
      // classic wins only when COMPLETE at this version (the anchor
      // may owe its completeness to a v2 manifest while a partial
      // classic landing sits alongside — reading the stray parts
      // would replay truncated state)
      val parts =
        if (!classicCps.contains(v)) Array.empty[Path]
        else if (single.nonEmpty) single else allClassic
      // classic (single or multi-part) wins when both forms exist —
      // either is complete; v2 manifests anchor otherwise. The
      // explicit schema clips checkpoints' extra columns (txn,
      // stats structs, wider add/remove) AND null-fills fields absent
      // from older checkpoints (readerFeatures predates nothing a
      // v1-era checkpoint wrote)
      if (parts.nonEmpty)
        normalizeActions(
          spark.read.schema(actionSchema).parquet(parts.map(_.toString): _*)
            .withColumn("__v", lit(v)))
      else readV2Checkpoint(logDir, v, v2Cps(v))
    }
    val normalizedJson = jsonActions.map(normalizeActions)
    val actions = (cpActions.toSeq ++ normalizedJson.toSeq)
      .reduce(_ unionByName _)
      .localCheckpoint() // feeds three independent aggregations below

    // the newest protocol action governs readability (gate runs in
    // the shared finisher)
    val proto = actions.where(col("__min_reader").isNotNull)
      .orderBy(col("__v").desc)
      .select(col("__min_reader"), col("__min_writer"),
        col("__feats"), col("__wfeats")).head(1)
    val protocolInfo = proto.headOption.map { r =>
      DeltaProtocol(
        r.getInt(0),
        if (r.isNullAt(1)) 2 else r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getSeq[String](2).toSeq),
        if (r.isNullAt(3)) None else Some(r.getSeq[String](3).toSeq))
    }.getOrElse(DeltaProtocol(1, 2))
    // latest metaData wins (schema evolution / repartitioning)
    val meta = actions.where(col("__schema").isNotNull)
      .orderBy(col("__v").desc)
      .select(col("__schema"), col("__pcols"), col("__provider"),
        col("__conf"), col("__mid"), col("__mct")).head(1)
    val metaVals = meta.headOption.map { m =>
      MetaVals(m.getString(0),
        Option(m.getSeq[String](1)).getOrElse(Seq.empty[String]).toSeq,
        Option(m.getString(2)).getOrElse("parquet"),
        if (m.isNullAt(3)) Map.empty else m.getMap[String, String](3).toMap,
        Option(m.getString(4)).getOrElse(""),
        if (m.isNullAt(5)) None else Some(m.getLong(5)))
    }

    // file-state reconstruction: per path, the highest-version action
    // wins; survivors are adds, the rest are tombstones. Within ONE
    // version the add wins the tie — a deletion-vector update commits
    // remove(path, oldDV) + add(path, newDV) for the same path, and
    // the add is the surviving state.
    import org.apache.spark.sql.expressions.Window
    val perPath = actions
      .select(col("__v"),
        coalesce(col("__add_path"), col("__rm_path")).as("__path"),
        col("__add_path").isNotNull.as("__is_add"),
        col("__add_pv"), col("__add_size"), col("__add_mt"),
        col("__add_dv"), col("__rm_ts"), col("__add_stats"),
        col("__add_brid"), col("__add_drcv"))
      .where(col("__path").isNotNull)
    val w = Window.partitionBy(col("__path"))
      .orderBy(col("__v").desc, col("__is_add").desc)
    val latest = perPath
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("__path"), col("__is_add"), col("__add_pv"),
        col("__add_size"), col("__add_mt"), col("__add_dv"), col("__rm_ts"),
        col("__add_stats"), col("__add_brid"), col("__add_drcv"))
      .collect()

    val latestPaths: Seq[LatestPath] = latest.toSeq.map { r =>
      val pv: Map[String, String] =
        if (r.isNullAt(2)) Map.empty
        else r.getMap[String, String](2).toMap
      val dv = Option(r.getStruct(5)).map { d =>
        require(!d.isNullAt(0) && !d.isNullAt(1) && !d.isNullAt(3),
          s"DeltaReader: malformed deletionVector descriptor on " +
            s"${r.getString(0)}")
        DvDescriptor(d.getString(0), d.getString(1),
          if (d.isNullAt(2)) None else Some(d.getInt(2)),
          d.getInt(3), if (d.isNullAt(4)) 0L else d.getLong(4))
      }
      LatestPath(r.getString(0), r.getBoolean(1), pv,
        if (r.isNullAt(3)) 0L else r.getLong(3),
        if (r.isNullAt(4)) 0L else r.getLong(4), dv,
        if (r.isNullAt(6)) 0L else r.getLong(6),
        Option(r.getString(7)),
        if (r.isNullAt(8)) None else Some(r.getLong(8)),
        if (r.isNullAt(9)) None else Some(r.getLong(9)))
    }
    // domainMetadata: per domain the newest action wins; removed=true
    // drops the domain from the snapshot (PROTOCOL.md "Domain
    // Metadata") — domain-count bounded
    val domains: Map[String, String] = actions
      .where(col("__dm_domain").isNotNull)
      .groupBy(col("__dm_domain"))
      .agg(max(struct(col("__v"), col("__dm_removed").as("__r"),
        col("__dm_conf").as("__c"))).as("__m"))
      .select(col("__dm_domain"), col("__m.__r"), col("__m.__c"))
      .collect()
      .filterNot(r => !r.isNullAt(1) && r.getBoolean(1))
      .map(r => r.getString(0) ->
        (if (r.isNullAt(2)) "" else r.getString(2))).toMap
    // SetTransaction watermarks: per appId the version from the
    // NEWEST commit wins (idempotent-writer bookkeeping, PROTOCOL.md
    // "Transaction Identifiers") — one appId-keyed aggregation
    val txns: Map[String, Long] = actions
      .where(col("__txn_app").isNotNull)
      .groupBy(col("__txn_app"))
      .agg(max(struct(col("__v"), col("__txn_v"))).as("__m"))
      .select(col("__txn_app"), col("__m.__txn_v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    finishSnapshot(target, logDir, fs.makeQualified(new Path(cleanUrl)),
      protocolInfo, metaVals, latestPaths, txns, domains)
  }

  /** Driver-side replay of a small checkpoint-less JSON tail: the
    * same reduction the distributed path runs — newest protocol,
    * newest metaData, per-path latest action with the add winning a
    * same-version tie, per-appId newest SetTransaction — over
    * Jackson-parsed commit lines. [[finishSnapshot]] assembles both
    * paths' results, and `DeltaReaderSpec`'s parity case pins them
    * field-identical. */
  private def fastReplay(fs: FileSystem, logDir: Path, cleanUrl: String,
                         tail: Seq[Long], target: Long)
                        (implicit spark: SparkSession): Option[DeltaSnapshot] = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    def txt(n: com.fasterxml.jackson.databind.JsonNode, f: String): String =
      Option(n.get(f)).filterNot(_.isNull).map(_.asText).orNull
    def lng(n: com.fasterxml.jackson.databind.JsonNode, f: String,
            dflt: Long): Long =
      Option(n.get(f)).filterNot(_.isNull).map(_.asLong).getOrElse(dflt)
    // (version, lineIndex, action) in commit order
    val lines: Seq[(Long, com.fasterxml.jackson.databind.JsonNode)] =
      tail.sorted.flatMap { v =>
        val p = new Path(logDir, f"$v%020d.json")
        val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
        val in = fs.open(p)
        try in.readFully(0L, bytes) finally in.close()
        new String(bytes, "UTF-8").split("\n").iterator
          .map(_.trim).filter(_.nonEmpty)
          .map(l => v -> om.readTree(l)).toSeq
      }
    def newest(field: String) = lines.reverseIterator
      .map { case (v, n) => (v, Option(n.get(field)).filterNot(_.isNull)) }
      .collectFirst { case (v, Some(n)) => (v, n) }
    val protocolInfo = newest("protocol").map { case (_, p) =>
      def feats(f: String): Option[Seq[String]] =
        Option(p.get(f)).filterNot(_.isNull).map { arr =>
          (0 until arr.size).map(i => arr.get(i).asText)
        }
      DeltaProtocol(lng(p, "minReaderVersion", 1L).toInt,
        lng(p, "minWriterVersion", 2L).toInt,
        feats("readerFeatures"), feats("writerFeatures"))
    }.getOrElse(DeltaProtocol(1, 2))
    val metaVals = newest("metaData").map { case (_, m) =>
      val pcols = Option(m.get("partitionColumns")).filterNot(_.isNull)
        .map(arr => (0 until arr.size).map(i => arr.get(i).asText))
        .getOrElse(Seq.empty)
      val conf = Option(m.get("configuration")).filterNot(_.isNull)
        .map { c =>
          import scala.jdk.CollectionConverters._
          c.fields().asScala.map(e => e.getKey ->
            (if (e.getValue.isNull) null else e.getValue.asText)).toMap
        }.getOrElse(Map.empty[String, String])
      MetaVals(txt(m, "schemaString"), pcols.toSeq,
        Option(txt(m.path("format"), "provider")).getOrElse("parquet"),
        conf, Option(txt(m, "id")).getOrElse(""),
        Option(m.get("createdTime")).filterNot(_.isNull).map(_.asLong))
    }
    // per-path latest action; lexicographic (version, isAdd) — the add
    // wins a same-version tie, exactly the distributed window's order
    val latest = scala.collection.mutable.LinkedHashMap
      .empty[String, ((Long, Int), LatestPath)]
    def consider(path: String, v: Long, lp: LatestPath): Unit = {
      val key = (v, if (lp.isAdd) 1 else 0)
      latest.get(path) match {
        case Some((old, _)) if
          old._1 > key._1 || (old._1 == key._1 && old._2 > key._2) => ()
        case _ => latest.update(path, (key, lp))
      }
    }
    lines.foreach { case (v, n) =>
      Option(n.get("add")).filterNot(_.isNull).foreach { a =>
        val pv = Option(a.get("partitionValues")).filterNot(_.isNull)
          .map { m =>
            import scala.jdk.CollectionConverters._
            m.fields().asScala.map(e => e.getKey ->
              (if (e.getValue.isNull) null else e.getValue.asText)).toMap
          }.getOrElse(Map.empty[String, String])
        val dv = Option(a.get("deletionVector")).filterNot(_.isNull).map { d =>
          require(txt(d, "storageType") != null &&
            txt(d, "pathOrInlineDv") != null && d.get("sizeInBytes") != null,
            s"DeltaReader: malformed deletionVector descriptor on " +
              s"${txt(a, "path")}")
          DvDescriptor(txt(d, "storageType"), txt(d, "pathOrInlineDv"),
            Option(d.get("offset")).filterNot(_.isNull).map(_.asInt),
            lng(d, "sizeInBytes", 0L).toInt, lng(d, "cardinality", 0L))
        }
        consider(txt(a, "path"), v, LatestPath(txt(a, "path"), isAdd = true,
          pv, lng(a, "size", 0L), lng(a, "modificationTime", 0L), dv, 0L,
          Option(txt(a, "stats")),
          Option(a.get("baseRowId")).filterNot(_.isNull).map(_.asLong),
          Option(a.get("defaultRowCommitVersion")).filterNot(_.isNull)
            .map(_.asLong)))
      }
      Option(n.get("remove")).filterNot(_.isNull).foreach { r =>
        consider(txt(r, "path"), v, LatestPath(txt(r, "path"), isAdd = false,
          Map.empty, 0L, 0L, None, lng(r, "deletionTimestamp", 0L), None))
      }
    }
    // domainMetadata: newest action per domain; removed drops it
    val domainState =
      scala.collection.mutable.Map.empty[String, (Long, Boolean, String)]
    lines.foreach { case (v, n) =>
      Option(n.get("domainMetadata")).filterNot(_.isNull).foreach { d =>
        val dom = txt(d, "domain")
        if (dom != null && !domainState.get(dom).exists(_._1 > v))
          domainState.update(dom, (v,
            Option(d.get("removed")).filterNot(_.isNull).exists(_.asBoolean),
            Option(txt(d, "configuration")).getOrElse("")))
      }
    }
    val domains: Map[String, String] = domainState.toMap.collect {
      case (dom, (_, removed, conf)) if !removed => dom -> conf
    }
    // per-appId newest (version, txnVersion) — lexicographic like the
    // distributed max(struct(__v, __txn_v))
    val txns = scala.collection.mutable.Map.empty[String, (Long, Long)]
    lines.foreach { case (v, n) =>
      Option(n.get("txn")).filterNot(_.isNull).foreach { t =>
        val app = txt(t, "appId")
        if (app != null) {
          val cand = (v, lng(t, "version", 0L))
          if (!txns.get(app).exists(old =>
            old._1 > cand._1 || (old._1 == cand._1 && old._2 > cand._2)))
            txns.update(app, cand)
        }
      }
    }
    finishSnapshot(target, logDir, fs.makeQualified(new Path(cleanUrl)),
      protocolInfo, metaVals, latest.values.map(_._2).toSeq,
      txns.map { case (k, v) => k -> v._2 }.toMap, domains)
  }

  /** Snapshot as of a WALL-CLOCK timestamp: the newest version whose
    * commit timestamp is `<= timestampMillis` — the protocol's
    * timestamp time travel, resolved from the commit files'
    * modification times (the convention every engine uses absent the
    * inCommitTimestamp feature) with the standard monotonicity
    * adjustment (a commit's effective time is never before its
    * predecessor's, so clock skew between writers cannot reorder
    * history). Raises when the timestamp predates the earliest
    * RETAINED commit (a vacuumed tail cannot be resolved by time);
    * None when no table exists. */
  def snapshotAsOf(url: String, timestampMillis: Long)
                  (implicit spark: SparkSession): Option[DeltaSnapshot] = {
    val cleanUrl = url.stripSuffix("/")
    val logDir = new Path(cleanUrl, "_delta_log")
    val fs: FileSystem = logDir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(logDir)) return None
    val commits = fs.listStatus(logDir).flatMap { st =>
      st.getPath.getName match {
        case CommitName(v) => Some(v.toLong -> st.getModificationTime)
        case _ => None
      }
    }.sortBy(_._1)
    if (commits.isEmpty) return None
    // when the table writes in-commit timestamps, the LOG is the
    // clock: each commit's commitInfo.inCommitTimestamp overrides its
    // file mtime (pre-enablement commits keep mtimes — the standard
    // mixed-history rule)
    val ictOn = snapshot(cleanUrl).exists(
      _.configuration.get("delta.enableInCommitTimestamps").contains("true"))
    val stamped =
      if (!ictOn) commits
      else commits.map { case (v, mt) =>
        v -> DeltaWriter.readIct(fs, new Path(logDir, f"$v%020d.json"))
          .getOrElse(mt)
      }
    val effective = stamped.scanLeft((-1L, Long.MinValue)) {
      case ((_, prevTs), (v, t)) => (v, math.max(prevTs, t))
    }.drop(1)
    val chosen = effective.filter(_._2 <= timestampMillis).lastOption.getOrElse(
      throw new IllegalArgumentException(
        s"DeltaReader: timestamp $timestampMillis predates the earliest " +
          s"retained commit (${effective.head._2} at version " +
          s"${effective.head._1})"))
    snapshotAt(cleanUrl, Some(chosen._1))
  }

  /** DESCRIBE HISTORY: one row per RETAINED JSON commit, newest
    * first — `version`, `timestamp` (the commitInfo's monotonic
    * in-commit timestamp when the ICT feature recorded one, else its
    * wall-clock `timestamp`, else the commit file's mtime — ICT
    * first is the engine precedence: on ICT tables Delta surfaces
    * the monotonic clock, never the possibly-skewed wall clock),
    * `operation` (WRITE /
    * DELETE / OPTIMIZE / RESTORE as recorded; null for writers that
    * record none), and the commit's add/remove action counts.
    * Driver work is commit-count bounded (the log's own listing
    * class); None when no table exists. Commits a checkpoint-covered
    * cleanup reclaimed no longer appear — history is as deep as the
    * retained log, exactly delta-spark's contract. */
  def history(url: String)(implicit spark: SparkSession): Option[DataFrame] = {
    val cleanUrl = url.stripSuffix("/")
    val logDir = new Path(cleanUrl, "_delta_log")
    val fs: FileSystem = logDir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(logDir)) return None
    val commits = fs.listStatus(logDir).flatMap { st =>
      st.getPath.getName match {
        case CommitName(v) => Some((v.toLong, st))
        case _ => None
      }
    }.sortBy(-_._1)
    if (commits.isEmpty) return None
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val rows: Seq[org.apache.spark.sql.Row] = commits.toSeq.map { case (v, st) =>
      val bytes = new Array[Byte](st.getLen.toInt)
      val in = fs.open(st.getPath)
      try in.readFully(0L, bytes) finally in.close()
      val nodes = new String(bytes, "UTF-8").split("\n").iterator
        .map(_.trim).filter(_.nonEmpty).map(om.readTree).toSeq
      def opt(n: com.fasterxml.jackson.databind.JsonNode, f: String) =
        Option(n.get(f)).filterNot(_.isNull)
      val ci = nodes.flatMap(opt(_, "commitInfo")).headOption
      val ts = ci.flatMap(opt(_, "inCommitTimestamp").map(_.asLong))
        .orElse(ci.flatMap(opt(_, "timestamp").map(_.asLong)))
        .getOrElse(st.getModificationTime)
      val op = ci.flatMap(opt(_, "operation").map(_.asText)).orNull
      org.apache.spark.sql.Row(v, ts, op,
        nodes.count(opt(_, "add").isDefined).toLong,
        nodes.count(opt(_, "remove").isDefined).toLong)
    }
    import scala.jdk.CollectionConverters._
    Some(spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("timestamp", LongType, nullable = false),
      StructField("operation", StringType),
      StructField("n_adds", LongType, nullable = false),
      StructField("n_removes", LongType, nullable = false)))))
  }

  /** Timestamp time-travel scan (see [[snapshotAsOf]]). */
  def scanAsOf(url: String, timestampMillis: Long)
              (implicit spark: SparkSession): Option[DataFrame] =
    snapshotAsOf(url, timestampMillis).map(assemble)

  /** Full-table scan at the latest (or a time-travel) version: data
    * files read with the log's logical schema, partition columns
    * injected as typed literals, columns in schema order. None when
    * the table does not exist; an EMPTY table yields an empty frame
    * with the right schema (matching `pl.scan_delta` semantics). */
  def scan(url: String, asOfVersion: Option[Long] = None)
          (implicit spark: SparkSession): Option[DataFrame] =
    snapshotAt(url, asOfVersion).map(assemble)

  /** The snapshot with every data file DROPPED whose recorded bounds
    * prove no row can satisfy the conjunction of `ranges` (`(column,
    * lo, hi)` inclusive, string-typed like [[ManagedDataset
    * .scanPrunedRanges]]): bounds come from the add action's `stats`
    * JSON (`minValues`/`maxValues` — what [[DeltaWriter]] now records
    * from parquet footers, and every delta-spark writer records by
    * default), or for a PARTITION column from the file's literal
    * value (min = max = value; a null partition value never matches a
    * range). Files with no usable bound are conservatively kept, so
    * pruning is always sound; possibly-truncated string bounds from
    * other engines remain valid supersets. */
  /** The monotone base column of a GENERATED partition column's
    * expression, when the shape is one this reader can SOUNDLY derive
    * partition ranges through: `CAST(c AS DATE)` / `to_date(c)`,
    * `date_trunc('unit', c)`, `year(c)`, `substring(c, 1, n)`, and
    * `date_format(c, 'yyyy[-MM[-dd]]')` — every one is order
    * preserving, so a [lo, hi] constraint on the base maps to
    * [f(lo), f(hi)] on the partition value. Non-monotone shapes
    * (`month(c)`, `day(c)`, arithmetic) return None and derive
    * nothing — pruning must stay sound. */
  /** (base column, base-type gate) — the gate encodes WHERE the shape
    * is actually order preserving: date/time shapes are monotone over
    * DATE/TIMESTAMP bases but NOT over strings ('2024-1-01' <
    * '2024-10-5' lexicographically says nothing about the cast
    * dates, and invalid dates generate NULL); the prefix-substring
    * shape is monotone exactly over strings. */
  private[sources] def monotoneGenerationShape(genSql: String)
      (implicit spark: SparkSession): Option[(String, DataType => Boolean)] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal => CatLit}
    val parsed = try spark.sessionState.sqlParser.parseExpression(genSql)
      catch { case scala.util.control.NonFatal(_) => return None }
    val temporal: DataType => Boolean = {
      case DateType | TimestampType | TimestampNTZType => true
      case _ => false
    }
    val stringOnly: DataType => Boolean = _ == StringType
    def attr(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.name)
      case _ => None
    }
    parsed match {
      case Cast(a, DateType, _, _) => attr(a).map(_ -> temporal)
      case f: UnresolvedFunction =>
        (f.nameParts.last.toLowerCase, f.arguments) match {
          case ("to_date", Seq(a)) => attr(a).map(_ -> temporal)
          case ("date_trunc", Seq(_: CatLit, a)) => attr(a).map(_ -> temporal)
          case ("year", Seq(a)) => attr(a).map(_ -> temporal)
          case ("substring" | "substr", Seq(a, CatLit(one, _), _: CatLit))
            if one == 1 => attr(a).map(_ -> stringOnly)
          case ("date_format", Seq(a, CatLit(fmt, _)))
            if fmt != null && Set("yyyy", "yyyy-MM", "yyyy-MM-dd")
              .contains(fmt.toString) => attr(a).map(_ -> temporal)
          case _ => None
        }
      case _ => None
    }
  }

  /** The monotone base column name alone (shape-gate-free view, kept
    * for callers that only need the dependency edge). */
  private[sources] def monotoneGenerationBase(genSql: String)
      (implicit spark: SparkSession): Option[String] =
    monotoneGenerationShape(genSql).map(_._1)

  /** Partition-range predicates DERIVED from generated partition
    * columns: when partition column p is `GENERATED ALWAYS AS f(c)`
    * with f a monotone whitelisted shape and the caller constrained c
    * with [lo, hi], the partition constraint [f(lo), f(hi)] is sound
    * — so a query on the RAW column (an events timestamp, say) prunes
    * date partitions without naming them. f is evaluated by Spark
    * itself on a two-row literal frame: the derivation can never
    * drift from write-side computation semantics. */
  private[sources] def deriveGeneratedRanges(
      snap: DeltaSnapshot, ranges: Seq[(String, String, String)])
      (implicit spark: SparkSession): Seq[(String, String, String)] = {
    val byBase = ranges.groupBy(_._1)
    val genPcols = snap.schema.fields.filter(f =>
      snap.partitionColumns.contains(f.name) &&
        f.metadata.contains("delta.generationExpression"))
    genPcols.toSeq.flatMap { f =>
      val gen = f.metadata.getString("delta.generationExpression")
      for {
        (base, typeGate) <- monotoneGenerationShape(gen)
        if !byBase.contains(f.name) // caller's own constraint wins
        (_, lo, hi) <- byBase.getOrElse(base, Seq.empty).headOption
        baseType <- snap.schema.fields.find(_.name == base).map(_.dataType)
        // the shape must be order preserving over THIS base type —
        // a string-typed date cast is not (lexicographic order of
        // non-canonical renderings disagrees with date order, and
        // invalid dates generate NULL): derive nothing, stay sound
        if typeGate(baseType)
        bounds <- scala.util.Try {
          // f monotone + lo <= hi means f(lo) <= f(hi): keep the
          // evaluation order, don't re-sort rendered strings (a "9"
          // vs "10" year would sort backwards as text)
          spark.range(2).select(col("id"),
            when(col("id") === 0, lit(lo).cast(baseType))
              .otherwise(lit(hi).cast(baseType)).as(base))
            .selectExpr("id", s"cast(($gen) as string) as __v")
            .collect().sortBy(_.getLong(0)).map(_.getString(1))
        }.toOption
        if bounds.forall(_ != null)
      } yield (f.name, bounds(0), bounds(1))
    }
  }

  def prunedSnapshot(url: String, ranges: Seq[(String, String, String)],
                     asOfVersion: Option[Long] = None)
                    (implicit spark: SparkSession): Option[DeltaSnapshot] = {
    require(ranges.nonEmpty, "DeltaReader.prunedSnapshot: need >= 1 range")
    snapshotAt(url, asOfVersion).map { snap =>
      val derived = deriveGeneratedRanges(snap, ranges)
      val typed = (ranges ++ derived).map { case (c, lo, hi) =>
        val dt = snap.schema.find(_.name == c).map(_.dataType).getOrElse(
          throw new IllegalArgumentException(
            s"DeltaReader.prunedSnapshot: column '$c' not in the table schema"))
        (c, dt, lo, hi)
      }
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      def bound(node: com.fasterxml.jackson.databind.JsonNode,
                section: String, c: String): Option[String] =
        Option(node.get(section)).flatMap(s => Option(s.get(c)))
          .filterNot(_.isNull).map(_.asText)
      def longAt(node: com.fasterxml.jackson.databind.JsonNode,
                 path: String*): Option[Long] = {
        val n = path.foldLeft(Option(node))((acc, p) =>
          acc.flatMap(x => Option(x.get(p))))
        n.filter(_.isIntegralNumber).map(_.asLong)
      }
      val kept = snap.files.filter { f =>
        lazy val statsNode = f.stats.flatMap(s =>
          scala.util.Try(om.readTree(s)).toOption)
        // a zero-row file matches nothing (empty appends land these)
        statsNode.flatMap(longAt(_, "numRecords")).forall(_ > 0L) &&
        typed.forall { case (c, dt, lo, hi) =>
          if (snap.partitionColumns.contains(c)) {
            partitionValueOf(snap, f, c) match {
              case Some(null) | None => false // the null partition: no match
              case Some(v) => mayOverlapDelta(dt, Some(v), Some(v), lo, hi)
            }
          } else statsNode match {
            case None => true // no stats: unprunable, keep
            case Some(n) =>
              // an all-NULL column never satisfies a range predicate
              val allNull = (longAt(n, "nullCount", c), longAt(n, "numRecords"))
                match {
                  case (Some(nc), Some(nr)) => nr > 0L && nc == nr
                  case _ => false
                }
              !allNull && mayOverlapDelta(dt,
                bound(n, "minValues", c), bound(n, "maxValues", c), lo, hi)
          }
        }
      }
      snap.copy(files = kept)
    }
  }

  /** [[ManagedDataset.mayOverlap]] semantics plus DATE columns, whose
    * `yyyy-MM-dd` stats rendering compares correctly as strings. */
  private def mayOverlapDelta(dt: DataType, mn: Option[String],
                              mx: Option[String], lo: String,
                              hi: String): Boolean = dt match {
    case DateType => mn.forall(_ <= hi) && mx.forall(_ >= lo)
    case other => ManagedDataset.mayOverlap(other, mn, mx, lo, hi)
  }

  /** Range-predicate scan with file-level DATA SKIPPING over the add
    * actions' statistics — semantically exactly
    * `scan().filter(AND of col BETWEEN lo AND hi)` (the residual
    * filter still applies to the survivors), physically only the
    * possibly-overlapping files are ever listed or read. With data
    * range-clustered on the predicate columns at write time, a
    * selective range on a 100 TB table touches a handful of files:
    * the pruning is metadata-only, before any directory/file I/O. */
  def scanPruned(url: String, ranges: Seq[(String, String, String)],
                 asOfVersion: Option[Long] = None)
                (implicit spark: SparkSession): Option[DataFrame] =
    prunedSnapshot(url, ranges, asOfVersion).map { snap =>
      val fieldType = snap.schema.fields.map(f => f.name -> f.dataType).toMap
      ranges.foldLeft(assemble(snap)) { case (df, (c, lo, hi)) =>
        df.where(col(c) >= lit(lo).cast(fieldType(c)) &&
          col(c) <= lit(hi).cast(fieldType(c)))
      }
    }

  /** Targeted partition read, mirroring delta_dataset.py:41-54: the
    * key set must equal the table's partition columns (raise
    * otherwise); a missing partition yields an empty frame, not None
    * (a pyarrow partition filter returns zero rows, not an error). */
  def readPartition(url: String, values: Map[String, String])
                   (implicit spark: SparkSession): Option[DataFrame] =
    snapshot(url).map { snap =>
      require(values.keySet == snap.partitionColumns.toSet,
        s"Partition column value keys ${values.keySet} do not match " +
          s"partition columns ${snap.partitionColumns}")
      assemble(snap.copy(files = snap.files.filter(f =>
        values.forall { case (k, v) =>
          partitionValueOf(snap, f, k).contains(v) })))
    }

  /** A file's value for partition column `c` (a LOGICAL name). Under
    * column mapping the log keys `partitionValues` by the PHYSICAL
    * name (the protocol's writer requirement); the logical key is
    * accepted as a fallback for writers that never renamed them. */
  private[sources] def partitionValueOf(snap: DeltaSnapshot, f: DeltaFile,
                                        c: String): Option[String] = {
    val phys = snap.physicalSchema.flatMap { ps =>
      snap.schema.fieldNames.zip(ps.fieldNames).toMap.get(c)
    }
    phys.flatMap(f.partitionValues.get).orElse(f.partitionValues.get(c))
  }

  /** Build the snapshot DataFrame: one parquet read per distinct
    * partition-value tuple (bounded by partition count, each a plain
    * multi-file scan with pushdown intact), literals injected with
    * the SCHEMA's types, then one union. Files carrying a deletion
    * vector scan WITH `_metadata.row_index` and anti-join the decoded
    * masks; DV-free files keep the untouched plain scan. */
  private def assemble(snap: DeltaSnapshot)
                      (implicit spark: SparkSession): DataFrame =
    assembleInternal(snap, keepMeta = false)

  /** The snapshot frame PLUS `__fp` (= `_metadata.file_path`) and
    * `__ri` (= `_metadata.row_index`) provenance columns, existing
    * deletion vectors already applied — what a DV-writing DELETE
    * needs to turn a predicate into per-file row-index masks. */
  private[sources] def scanWithRowIndex(snap: DeltaSnapshot)
                                       (implicit spark: SparkSession): DataFrame =
    assembleInternal(snap, keepMeta = true)

  /** [[scanWithRowIndex]] PLUS `_row_id` / `_row_commit_version` —
    * what MERGE/UPDATE need on row-tracking-enabled tables: the mask
    * provenance and the identity the replacement rows must carry. */
  private[sources] def scanWithRowIndexAndIds(snap: DeltaSnapshot)
                                             (implicit spark: SparkSession): DataFrame =
    assembleInternal(snap, keepMeta = true, keepRowIds = true)

  /** Assemble an arbitrary (possibly file-filtered) snapshot — the
    * OPTIMIZE rewrite path reads just the heavily-masked files this
    * way, masks applied, partition literals injected. */
  private[sources] def assembleSnapshot(snap: DeltaSnapshot)
                                       (implicit spark: SparkSession): DataFrame =
    assembleInternal(snap, keepMeta = false)

  /** The snapshot frame PLUS a `_row_id` / `_row_commit_version`
    * column pair (the `rowTracking` writer feature's stable row
    * identity): per row, the MATERIALIZED columns the table's
    * configuration names when present (rewritten files carry the old
    * assignment there), else `add.baseRowId + row_index` /
    * `add.defaultRowCommitVersion`. Files without tracking metadata
    * yield NULLs — the mixed-history contract. */
  def scanWithRowIds(url: String, asOfVersion: Option[Long] = None)
                    (implicit spark: SparkSession): Option[DataFrame] =
    snapshotAt(url.stripSuffix("/"), asOfVersion)
      .filter(_.files.nonEmpty)
      .map(assembleInternal(_, keepMeta = false, keepRowIds = true))

  /** [[scanWithRowIds]] over an already-resolved (possibly
    * file-filtered) snapshot — the rewrite verbs' input when they
    * must carry row identity through to materialized columns. */
  private[sources] def assembleWithRowIds(snap: DeltaSnapshot)
                                         (implicit spark: SparkSession): DataFrame =
    assembleInternal(snap, keepMeta = false, keepRowIds = true)

  private def assembleInternal(snap: DeltaSnapshot, keepMeta: Boolean,
                               keepRowIds: Boolean = false)
                              (implicit spark: SparkSession): DataFrame = {
    val fieldType = snap.schema.fields.map(f => f.name -> f.dataType).toMap
    snap.partitionColumns.foreach { c =>
      if (!fieldType.contains(c))
        throw new IllegalStateException(
          s"DeltaReader: partition column '$c' missing from table schema")
    }
    // logical data fields zipped with the names parquet actually
    // stores them under (identical unless column mapping is on)
    val dataPairs = snap.physicalSchema
      .map(ps => snap.schema.fields.zip(ps.fields))
      .getOrElse(snap.schema.fields.map(f => (f, f)))
      .filterNot { case (lf, _) => snap.partitionColumns.contains(lf.name) }
      .toSeq
    // materialized row-tracking columns: physical-only (absent from
    // the logical schema), read through when row ids are requested
    val matIdName = snap.configuration
      .get("delta.rowTracking.materializedRowIdColumnName")
      .filter(_ => keepRowIds)
    val matRcvName = snap.configuration
      .get("delta.rowTracking.materializedRowCommitVersionColumnName")
      .filter(_ => keepRowIds)
    val matFields = (matIdName.toSeq ++ matRcvName.toSeq)
      .map(n => StructField(n, LongType))
    if (keepRowIds) {
      val reserved = Set("_row_id", "_row_commit_version") ++
        matIdName ++ matRcvName
      val collisions = snap.schema.fieldNames.toSet.intersect(reserved)
      require(collisions.isEmpty,
        s"DeltaReader.scanWithRowIds: table columns ${collisions
          .mkString(", ")} collide with the row-tracking output/" +
          "materialized column names — rename them or read without row ids")
    }
    val needMeta = keepMeta || keepRowIds
    val dataSchema = StructType(dataPairs.map(_._2) ++ matFields)
    val metaCols = if (needMeta) Seq(col("__fp"), col("__ri")) else Seq.empty
    val matCols = matFields.map(f => col(f.name))
    val ordered = snap.schema.fieldNames.map(col).toSeq ++ metaCols ++ matCols
    def empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(snap.schema.fields ++
        (if (keepMeta) Seq(StructField("__fp", StringType),
          StructField("__ri", LongType)) else Seq.empty) ++
        (if (keepRowIds) Seq(StructField("_row_id", LongType),
          StructField("_row_commit_version", LongType)) else Seq.empty)))
    if (snap.files.isEmpty) return empty
    val deleted = deletedRowsFrame(snap) // built once, shared by groups
    val groups = snap.files
      .groupBy(f => snap.partitionColumns.map(c =>
        partitionValueOf(snap, f, c).orNull))
      .toSeq.sortBy(_._1.mkString("/"))
    groups.map { case (pvals, fs) =>
      val (dvFiles, plainFiles) = fs.partition(_.deletionVector.isDefined)
      def readFiles(paths: Seq[String], withMask: Boolean): DataFrame = {
        val read = spark.read.schema(dataSchema).parquet(paths: _*)
        val masked =
          if (!withMask && !needMeta) read
          else {
            // _metadata.file_path IS Path.toUri.toString (spec-pinned
            // in DeletionVectorSpec), so the join key matches the
            // driver-side descriptor frame exactly — no normalization
            val withM = read
              .withColumn("__fp", col("_metadata.file_path"))
              .withColumn("__ri", col("_metadata.row_index"))
            val anti =
              if (!withMask) withM
              else withM.join(
                deleted.get.select(col("__dv_fp").as("__fp"),
                  col("__dv_ri").as("__ri")),
                Seq("__fp", "__ri"), "left_anti")
            if (needMeta) anti else anti.drop("__fp", "__ri")
          }
        // physical→logical rename; nested names ride a struct cast
        // (positional, so shape is preserved exactly). The cast
        // target is nullability-RELAXED: the parquet scan's output is
        // always nullable, and Spark refuses a nullable→non-nullable
        // container cast — a foreign mapped table declaring a NOT
        // NULL inner field would otherwise be unreadable.
        val dataSel = snap.physicalSchema match {
          case Some(_) => dataPairs.map { case (lf, pf) =>
            col(pf.name).cast(relaxNullability(lf.dataType)).as(lf.name) }
          case None => dataPairs.map(_._2.name).map(col)
        }
        masked.select(dataSel ++ metaCols ++ matCols: _*)
      }
      val parts =
        (if (plainFiles.nonEmpty)
          Seq(readFiles(plainFiles.map(_.path), withMask = false)) else Nil) ++
        (if (dvFiles.nonEmpty)
          Seq(readFiles(dvFiles.map(_.path), withMask = true)) else Nil)
      val base = parts.reduce(_ unionByName _)
      snap.partitionColumns.zip(pvals).foldLeft(base) { case (d, (c, v)) =>
        // log partition values are strings ("2024-01-02", "42", null);
        // ANSI cast raises on garbage — corrupt logs fail loudly
        d.withColumn(c, lit(v).cast(StringType).cast(fieldType(c)))
      }.select(ordered: _*)
    }.reduce(_ unionByName _) match {
      case assembled if !keepRowIds => assembled
      case assembled =>
        // resolve _row_id / _row_commit_version: one broadcast join
        // against the (file-count bounded) per-add assignment frame
        import spark.implicits._
        val bm = snap.files.map(f =>
          (new Path(f.path).toUri.toString,
            f.baseRowId.map(Long.box).map(_.toLong),
            f.defaultRowCommitVersion.map(Long.box).map(_.toLong)))
          .toDF("__bm_fp", "__bm_base", "__bm_rcv")
        val fromBase = (col("__bm_base") + col("__ri")).cast(LongType)
        val rid = matIdName.map(n => coalesce(col(n), fromBase))
          .getOrElse(fromBase)
        val rcv = matRcvName.map(n => coalesce(col(n), col("__bm_rcv")))
          .getOrElse(col("__bm_rcv"))
        assembled
          .join(broadcast(bm), col("__fp") === col("__bm_fp"), "left")
          .withColumn("_row_id", rid)
          .withColumn("_row_commit_version", rcv.cast(LongType))
          .drop((Seq("__bm_fp", "__bm_base", "__bm_rcv") ++
            matIdName.toSeq ++ matRcvName.toSeq ++
            (if (keepMeta) Seq.empty else Seq("__fp", "__ri"))): _*)
    }
  }

  /** Hadoop Configuration with Java serialization — lets the DV
    * decode task open the sidecar on the executor with the SESSION's
    * filesystem config (credentials, schemes), not a blank one. */
  private[sources] final class SerializableConf(
      @transient var value: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  /** The decoded deletion masks as a DataFrame of
    * `(__dv_fp = data-file Path.toUri.toString, __dv_ri = row index)`.
    * None when no file carries a DV.
    *
    * Scale shape (100 TB): the INPUT is one row per DV-carrying file
    * (metadata-sized); sidecars are opened and bitmaps decoded ON
    * EXECUTORS, so the driver never holds a bitmap (inline `i`
    * payloads are the exception — those bytes already live in the
    * log the driver replayed). The flatMap fan-out is
    * `cardinality`-bounded = total deleted rows, distributed. This is
    * a documented imperative seam (§2.9): a roaring bitmap has no
    * Catalyst rendering, and the per-FILE input frame means the seam
    * never touches row-count-sized data on the way in. */
  private[sources] def deletedRowsFrame(snap: DeltaSnapshot)
                              (implicit spark: SparkSession): Option[DataFrame] = {
    val dvFiles = snap.files.filter(_.deletionVector.isDefined)
    if (dvFiles.isEmpty) return None
    import spark.implicits._
    // (dataFileKey, inlineBytesOrNull, sidecarPathOrNull, offset, size)
    val work: Seq[(String, Array[Byte], String, Int, Int)] = dvFiles.map { f =>
      val d = f.deletionVector.get
      val key = new Path(f.path).toUri.toString
      d.storageType match {
        case "i" =>
          // Z85 works in 4-byte groups; the descriptor's sizeInBytes
          // is authoritative for the payload length under any padding
          val decoded = DeletionVectors.z85Decode(d.pathOrInlineDv)
          require(decoded.length >= d.sizeInBytes,
            s"DeltaReader: inline DV shorter than sizeInBytes on ${f.path}")
          (key, java.util.Arrays.copyOf(decoded, d.sizeInBytes), null, 0,
            d.sizeInBytes)
        case "u" =>
          // `<optional random prefix><20-char Z85 uuid>`, resolved at
          // the TABLE root: <root>/<prefix>/deletion_vector_<uuid>.bin
          require(d.pathOrInlineDv.length >= 20,
            s"DeltaReader: 'u' deletionVector id too short on ${f.path}")
          val prefix = d.pathOrInlineDv.dropRight(20)
          val uuid = DeletionVectors.decodeUUID(d.pathOrInlineDv.takeRight(20))
          val root = new Path(snap.root)
          val dir = if (prefix.isEmpty) root else new Path(root, prefix)
          (key, null, new Path(dir, s"deletion_vector_$uuid.bin").toString,
            d.offset.getOrElse(1), d.sizeInBytes)
        case "p" =>
          (key, null, d.pathOrInlineDv, d.offset.getOrElse(1), d.sizeInBytes)
        case other => throw new UnsupportedOperationException(
          s"DeltaReader: deletionVector storageType '$other' unknown " +
            "(u/i/p only)")
      }
    }
    val conf = spark.sparkContext.broadcast(
      new SerializableConf(spark.sessionState.newHadoopConf()))
    val df = spark.createDataset(work).flatMap { case (key, inline, side, off, size) =>
      val data =
        if (inline != null) inline
        else {
          val p = new Path(side)
          val fs = p.getFileSystem(conf.value.value)
          val st = fs.getFileStatus(p)
          val bytes = new Array[Byte](st.getLen.toInt)
          val in = fs.open(p)
          try in.readFully(0L, bytes) finally in.close()
          require(bytes.nonEmpty && bytes(0) == DeletionVectors.FileFormatVersion,
            s"DeltaReader: DV file $side has format version " +
              s"${if (bytes.isEmpty) "<empty>" else bytes(0)} (want 1)")
          DeletionVectors.unframe(bytes, off, size)
        }
      DeletionVectors.deserialize(data).iterator.map(ri => (key, ri))
    }.toDF("__dv_fp", "__dv_ri")
    Some(df)
  }
}
