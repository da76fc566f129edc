package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** UniForm-style ICEBERG METADATA EXPORT of a Delta table: the
  * current snapshot's file listing is re-published under
  * `<table>/metadata/` in Iceberg's table-metadata layout —
  * `v<N>.metadata.json` (format-version 2 table metadata: field-id'd
  * schema, identity partition spec, the snapshot chain), a manifest
  * list and a manifest enumerating every live data file with record
  * counts, plus the HadoopCatalog `version-hint.text` — so an
  * external engine (or [[readExported]]) can resolve the snapshot
  * without reading `_delta_log`. The DATA files are shared, never
  * copied or rewritten: this is metadata-only interop, exactly
  * Delta UniForm's shape (the reference has no interop surface;
  * north-star extension).
  *
  * The manifest and manifest list are REAL AVRO object-container
  * files with the Iceberg v2 `manifest_entry` / `manifest_file`
  * record schemas, `field-id` attributes on every field, and the
  * spec-required key-value metadata (`schema`, `partition-spec`,
  * `format-version`, `content`) — the layout an external Iceberg
  * reader parses. Pinned by the spec via [[readExported]] == Delta
  * scan plus a raw-Avro decode of both files.
  *
  * Re-exports ACCUMULATE history: each new `v<N>.metadata.json`
  * carries the prior export's snapshots forward plus the matching
  * `snapshot-log` / `metadata-log` entries, so an external engine
  * can time-travel the exported chain (by snapshot id from the head
  * metadata, or by older metadata file — every `v<N>.metadata.json`
  * stays self-contained). A same-version re-export REPLACES its own
  * snapshot (idempotent upgrade), never duplicates it. Documented
  * deviation: snapshots exported at older schema versions reference
  * the CURRENT schema-id (per-snapshot schema history is not
  * replayed).
  *
  * COLUMN-MAPPED tables (modes `name`/`id` — the IcebergCompat
  * default shape) export with LOGICAL field names and their
  * `delta.columnMapping.id`s as Iceberg field-ids, plus the
  * `schema.name-mapping.default` property mapping each field-id to
  * the PHYSICAL parquet column name — exactly real UniForm's shape,
  * so engines resolve columns in the shared (physically-named) data
  * files without rewrites. Flat schemas only (nested mapped fields
  * refuse via the type mapping, like every other nested schema).
  *
  * Deletion vectors REFUSE the export — a CONTRACT, not a gap (run
  * `optimize(0.0)` first to materialize masks): a plain manifest
  * cannot express row-level masks, and real UniForm/IcebergCompat
  * draws the same line — deletion vectors must be off for Iceberg
  * conversion. Spec-pinned (delete → refusal → optimize → export).
  *
  * Sequence numbers are `delta version + 1` (Iceberg reserves 0 for
  * pre-existing state; new snapshots start at 1).
  *
  * Scale shape: file-count-bounded driver work (one manifest row per
  * live file, record counts straight from the adds' stats); rows are
  * never read — except the one distributed count that backfills
  * stat-less foreign files, grouped per file in a single job. */
object IcebergExport {

  /** Export the current snapshot; returns the exported Delta version.
    * Re-export after new commits overwrites the hint and adds a new
    * `v<N>.metadata.json` (older ones remain, like Iceberg's own
    * metadata history). */
  def export(url: String)(implicit spark: SparkSession): Long = {
    val cleanUrl = url.stripSuffix("/")
    val snap = DeltaReader.snapshot(cleanUrl).getOrElse(
      throw new IllegalArgumentException(
        s"IcebergExport: no Delta table at $cleanUrl"))
    require(!snap.files.exists(_.deletionVector.exists(_.cardinality > 0)),
      "IcebergExport: table carries live deletion vectors — a plain " +
        "manifest cannot express row masks (IcebergCompat's own " +
        "constraint); run optimize(0.0) to materialize them first")
    // Iceberg field-ids: ordinal for unmapped tables, the table's own
    // delta.columnMapping.id for mapped ones (IcebergCompat's id
    // assignment — ids must survive renames, ordinals don't)
    val mapped = snap.physicalSchema.isDefined
    val fieldIds: Map[String, Int] =
      if (!mapped)
        snap.schema.fieldNames.zipWithIndex
          .map { case (n, i) => n -> (i + 1) }.toMap
      else snap.schema.fields.map { f =>
        require(f.metadata.contains("delta.columnMapping.id"),
          s"IcebergExport: column-mapped field '${f.name}' lacks " +
            "delta.columnMapping.id — malformed column-mapping metadata")
        f.name -> f.metadata.getLong("delta.columnMapping.id").toInt
      }.toMap
    val physByLogical: Map[String, String] = snap.physicalSchema
      .map(ps => snap.schema.fieldNames.zip(ps.fieldNames).toMap)
      .getOrElse(Map.empty)
    // under column mapping the log keys partitionValues by PHYSICAL
    // name (logical accepted as a fallback for sloppy writers) —
    // DeltaReader.partitionValueOf, reused so the keying contract
    // cannot drift between reader and exporter
    def rawPartValue(f: DeltaReader.DeltaFile, c: String): String =
      DeltaReader.partitionValueOf(snap, f, c).orNull
    val base = new Path(cleanUrl)
    val fs: FileSystem = base.getFileSystem(spark.sessionState.newHadoopConf())
    val qualifiedBase = fs.makeQualified(base)
    val metaDir = new Path(qualifiedBase, "metadata")
    fs.mkdirs(metaDir)

    // record counts: adds' stats where present; ONE distributed
    // footer-count job backfills stat-less foreign files
    val om = new ObjectMapper()
    val statCounts: Map[String, Long] = snap.files.flatMap { f =>
      f.stats.flatMap { s =>
        Option(om.readTree(s).get("numRecords")).filterNot(_.isNull)
          .map(n => f.path -> n.asLong)
      }
    }.toMap
    val statless = snap.files.map(_.path).filterNot(statCounts.contains)
    val counted: Map[String, Long] =
      if (statless.isEmpty) statCounts
      else {
        import org.apache.spark.sql.functions.{count => cnt, input_file_name}
        val extra = spark.read.parquet(statless: _*)
          .groupBy(input_file_name().as("__f")).agg(cnt(lit(1)).as("__n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        // input_file_name returns the qualified URI — match by suffix
        statCounts ++ statless.map { p =>
          val uri = new Path(p).toUri.toString
          p -> extra.collectFirst {
            case (k, n) if k == uri || k.endsWith(new Path(p).toUri.getPath) => n
          }.getOrElse(0L)
        }
      }

    val snapshotId = snap.version + 1L // Iceberg ids are arbitrary longs
    // sequence number 0 is RESERVED for pre-existing state; new
    // snapshots number from 1 (the spec's assignment convention)
    val seqNum = snap.version + 1L

    // Avro primitive for an IDENTITY-partition source column — the
    // typed partition record the manifest stores (Delta logs the
    // values as strings; they parse back by this type)
    def partAvroType(dt: DataType): String = dt match {
      case IntegerType | ShortType | ByteType => "\"int\""
      case LongType => "\"long\""
      case StringType => "\"string\""
      case BooleanType => "\"boolean\""
      case FloatType => "\"float\""
      case DoubleType => "\"double\""
      case DateType => """{"type":"int","logicalType":"date"}"""
      case _: TimestampType =>
        """{"type":"long","logicalType":"timestamp-micros",""" +
          """"adjust-to-utc":true}"""
      case TimestampNTZType =>
        """{"type":"long","logicalType":"timestamp-micros",""" +
          """"adjust-to-utc":false}"""
      case d: DecimalType =>
        s"""{"type":"fixed","name":"pdec_${d.precision}_${d.scale}",""" +
          s""""size":${decimalRequiredBytes(d.precision)},""" +
          s""""logicalType":"decimal","precision":${d.precision},""" +
          s""""scale":${d.scale}}"""
      case other => throw new UnsupportedOperationException(
        s"IcebergExport: identity partition on ${other.simpleString} " +
          "unsupported")
    }
    // partition record field names must be legal Avro names; the
    // Iceberg convention (AvroSchemaUtil) sanitizes and lets the
    // FIELD-ID carry identity — access is positional on both sides
    val partFieldsJson = snap.partitionColumns.zipWithIndex.map {
      case (c, i) =>
        s"""{"name":"${avroName(c, i)}","type":["null",${
          partAvroType(snap.schema(c).dataType)}],"default":null,""" +
          s""""field-id":${1000 + i}}"""
    }.mkString(",")

    // ---- manifest: one Avro manifest_entry per live data file -----
    // (Iceberg v2 required fields + field-ids; optional column stats
    // omitted — a missing bound is unprunable, always sound)
    val manifestSchema = new org.apache.avro.Schema.Parser().parse(
      s"""{"type":"record","name":"manifest_entry","fields":[
         |{"name":"status","type":"int","field-id":0},
         |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
         |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
         |{"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
         |{"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
         |{"name":"content","type":"int","field-id":134},
         |{"name":"file_path","type":"string","field-id":100},
         |{"name":"file_format","type":"string","field-id":101},
         |{"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[$partFieldsJson]}},
         |{"name":"record_count","type":"long","field-id":103},
         |{"name":"file_size_in_bytes","type":"long","field-id":104}
         |]}}]}""".stripMargin)
    def partValue(c: String, v: String,
                  fieldSchema: org.apache.avro.Schema): AnyRef =
      if (v == null) null
      else snap.schema(c).dataType match {
        case IntegerType | ShortType | ByteType => Int.box(v.toInt)
        case LongType => Long.box(v.toLong)
        case BooleanType => Boolean.box(v.toBoolean)
        case FloatType => Float.box(v.toFloat)
        case DoubleType => Double.box(v.toDouble)
        case DateType => Int.box(java.time.LocalDate.parse(v)
          .toEpochDay.toInt)
        case _: TimestampType =>
          // session-TZ wall-time rendering → instant
          Long.box(parseTimestampMicros(v, Some(sessionZone)))
        case TimestampNTZType =>
          Long.box(parseTimestampMicros(v, None))
        case d: DecimalType =>
          // unscaled big-endian two's-complement, sign-extended into
          // the fixed width (the Avro decimal-on-fixed contract)
          val fixed = fieldSchema.getTypes.asScala
            .find(_.getType == org.apache.avro.Schema.Type.FIXED).get
          val unscaled =
            try new java.math.BigDecimal(v).setScale(d.scale)
              .unscaledValue.toByteArray
            catch { case e: ArithmeticException =>
              throw new IllegalArgumentException(
                s"IcebergExport: partition value '$v' of column '$c' " +
                  s"does not fit ${d.simpleString} without rounding", e) }
          val size = fixed.getFixedSize
          require(unscaled.length <= size,
            s"IcebergExport: decimal partition value $v overflows " +
              s"the fixed($size) encoding")
          val padded = new Array[Byte](size)
          val fill: Byte = if (unscaled.headOption.exists(_ < 0)) -1 else 0
          java.util.Arrays.fill(padded, fill)
          System.arraycopy(unscaled, 0, padded,
            size - unscaled.length, unscaled.length)
          new org.apache.avro.generic.GenericData.Fixed(fixed, padded)
        case _ => v
      }
    val manifestPath = new Path(metaDir,
      f"manifest-${snap.version}%020d.avro")
    val dfSchema = manifestSchema.getField("data_file").schema()
    val partSchema = dfSchema.getField("partition").schema()
    writeAvro(fs, manifestPath, manifestSchema,
      Map(
        "format-version" -> "2", "content" -> "data",
        "partition-spec-id" -> "0",
        "partition-spec" -> icebergSpecJson(snap, fieldIds),
        "schema" -> icebergSchemaJson(snap, fieldIds)),
      snap.files.sortBy(_.path).map { f =>
        val part = new org.apache.avro.generic.GenericData.Record(partSchema)
        snap.partitionColumns.zipWithIndex.foreach { case (c, i) =>
          part.put(i, partValue(c, rawPartValue(f, c),
            partSchema.getFields.get(i).schema())) }
        val dataFile = new org.apache.avro.generic.GenericData.Record(dfSchema)
        dataFile.put("content", Int.box(0))
        dataFile.put("file_path", f.path)
        dataFile.put("file_format", "PARQUET")
        dataFile.put("partition", part)
        dataFile.put("record_count", Long.box(counted.getOrElse(f.path, 0L)))
        dataFile.put("file_size_in_bytes", Long.box(f.size))
        val entry = new org.apache.avro.generic.GenericData.Record(manifestSchema)
        entry.put("status", Int.box(1)) // ADDED
        entry.put("snapshot_id", Long.box(snapshotId))
        entry.put("data_file", dataFile)
        entry
      })

    // ---- manifest list: one Avro manifest_file record --------------
    val listSchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        |{"name":"manifest_path","type":"string","field-id":500},
        |{"name":"manifest_length","type":"long","field-id":501},
        |{"name":"partition_spec_id","type":"int","field-id":502},
        |{"name":"content","type":"int","field-id":517},
        |{"name":"sequence_number","type":"long","field-id":515},
        |{"name":"min_sequence_number","type":"long","field-id":516},
        |{"name":"added_snapshot_id","type":"long","field-id":503},
        |{"name":"added_files_count","type":"int","field-id":504},
        |{"name":"existing_files_count","type":"int","field-id":505},
        |{"name":"deleted_files_count","type":"int","field-id":506},
        |{"name":"added_rows_count","type":"long","field-id":512},
        |{"name":"existing_rows_count","type":"long","field-id":513},
        |{"name":"deleted_rows_count","type":"long","field-id":514}
        |]}""".stripMargin)
    val listPath = new Path(metaDir,
      f"snap-${snap.version}%020d.manifest-list.avro")
    val totalRows = snap.files.map(f => counted.getOrElse(f.path, 0L)).sum
    val mf = new org.apache.avro.generic.GenericData.Record(listSchema)
    mf.put("manifest_path", manifestPath.toUri.toString)
    mf.put("manifest_length", Long.box(fs.getFileStatus(manifestPath).getLen))
    mf.put("partition_spec_id", Int.box(0))
    mf.put("content", Int.box(0)) // data
    mf.put("sequence_number", Long.box(seqNum))
    mf.put("min_sequence_number", Long.box(seqNum))
    mf.put("added_snapshot_id", Long.box(snapshotId))
    mf.put("added_files_count", Int.box(snap.files.size))
    mf.put("existing_files_count", Int.box(0))
    mf.put("deleted_files_count", Int.box(0))
    mf.put("added_rows_count", Long.box(totalRows))
    mf.put("existing_rows_count", Long.box(0L))
    mf.put("deleted_rows_count", Long.box(0L))
    writeAvro(fs, listPath, listSchema,
      Map("format-version" -> "2",
        "snapshot-id" -> snapshotId.toString,
        "sequence-number" -> seqNum.toString),
      Seq(mf))

    // ---- prior export chain: accumulate snapshots + logs ----------
    // (every v<N>.metadata.json stays self-contained; the head one
    // additionally lets an external engine resolve OLDER snapshots —
    // their manifest lists/manifests are never overwritten)
    val hintPath = new Path(metaDir, "version-hint.text")
    // a MISSING prior metadata file (crash between metadata write and
    // hint update) self-heals to a history-less export; a PRESENT but
    // unparseable one is a corrupt export dir and fails LOUDLY rather
    // than silently resetting the chain
    val priorMeta: Option[(Long, com.fasterxml.jackson.databind.JsonNode)] = {
      if (!fs.exists(hintPath)) None
      else {
        val pv = readFile(fs, hintPath).trim.toLong
        val pPath = new Path(metaDir, s"v$pv.metadata.json")
        if (!fs.exists(pPath)) None
        else try Some((pv, om.readTree(readFile(fs, pPath))))
        catch { case e: Exception =>
          throw new IllegalStateException(
            s"IcebergExport: prior metadata $pPath is unreadable — " +
              "repair or remove the export directory before " +
              "re-exporting (refusing to silently drop its history)", e)
        }
      }
    }
    def jsonArr(n: com.fasterxml.jackson.databind.JsonNode,
                field: String): Seq[com.fasterxml.jackson.databind.JsonNode] =
      Option(n.get(field)).map(_.elements().asScala.toSeq).getOrElse(Nil)
    // a same-version re-export REPLACES its own snapshot (idempotent)
    val priorSnapshots = priorMeta.toSeq
      .flatMap { case (_, n) => jsonArr(n, "snapshots") }
      .filter(_.get("snapshot-id").asLong != snapshotId)
      .map(om.writeValueAsString)
    val priorSnapLog = priorMeta.toSeq
      .flatMap { case (_, n) => jsonArr(n, "snapshot-log") }
      .filter(_.get("snapshot-id").asLong != snapshotId)
      .map(om.writeValueAsString)
    val metaLog = priorMeta match {
      case Some((pv, pn)) if pv != snap.version =>
        jsonArr(pn, "metadata-log").map(om.writeValueAsString) :+
          (s"""{"timestamp-ms":${Option(pn.get("last-updated-ms"))
            .map(_.asLong).getOrElse(0L)},""" +
            s""""metadata-file":"${escJ(new Path(metaDir,
              s"v$pv.metadata.json").toUri.toString)}"}""")
      case Some((_, pn)) =>
        jsonArr(pn, "metadata-log").map(om.writeValueAsString)
      case None => Nil
    }
    val priorLastSeq = priorMeta.flatMap { case (_, n) =>
      Option(n.get("last-sequence-number")).map(_.asLong) }.getOrElse(0L)

    // ---- table metadata -------------------------------------------
    val now = System.currentTimeMillis
    val metadataPath = new Path(metaDir, s"v${snap.version}.metadata.json")
    // UniForm's column-mapping interop: field-id → PHYSICAL parquet
    // name, so engines resolve the shared data files without rewrites
    val nameMappingProp =
      if (!mapped) None
      else Some(snap.schema.fields.map { f =>
        s"""{"field-id":${fieldIds(f.name)},""" +
          s""""names":["${escJ(physByLogical(f.name))}"]}"""
      }.mkString("[", ",", "]"))
    val propsJson = (Seq(
      s""""graft.delta.version":"${snap.version}"""") ++
      nameMappingProp.map(nm =>
        s""""schema.name-mapping.default":"${escJ(nm)}"""" ))
      .mkString("{", ",", "}")
    val newSnapshotJson =
      s"""{"snapshot-id":$snapshotId,"sequence-number":$seqNum,""" +
        s""""timestamp-ms":$now,"schema-id":0,""" +
        s""""manifest-list":"${escJ(listPath.toUri.toString)}",""" +
        s""""summary":{"operation":"append"}}"""
    writeFile(fs, metadataPath, body =
      s"""{"format-version":2,"table-uuid":"${escJ(snap.tableId)}",""" +
        s""""location":"${escJ(qualifiedBase.toUri.toString)}",""" +
        s""""last-sequence-number":${Math.max(seqNum, priorLastSeq)},""" +
        s""""last-updated-ms":$now,""" +
        s""""last-column-id":${fieldIds.values.max},""" +
        s""""current-schema-id":0,"schemas":[${
          icebergSchemaJson(snap, fieldIds)}],""" +
        s""""default-spec-id":0,"partition-specs":[{"spec-id":0,""" +
        s""""fields":${icebergSpecJson(snap, fieldIds)}}],""" +
        s""""last-partition-id":${999 + snap.partitionColumns.size},""" +
        s""""default-sort-order-id":0,"sort-orders":[{"order-id":0,""" +
        s""""fields":[]}],"properties":$propsJson,""" +
        s""""current-snapshot-id":$snapshotId,"snapshots":${
          (priorSnapshots :+ newSnapshotJson).mkString("[", ",", "]")},""" +
        s""""snapshot-log":${(priorSnapLog :+
          s"""{"timestamp-ms":$now,"snapshot-id":$snapshotId}""")
          .mkString("[", ",", "]")},""" +
        s""""metadata-log":${metaLog.mkString("[", ",", "]")}}""" + "\n")
    // HadoopCatalog discovery convention
    writeFile(fs, new Path(metaDir, "version-hint.text"),
      s"${snap.version}\n")
    snap.version
  }

  /** Resolve the exported snapshot WITHOUT `_delta_log` — delegates
    * to [[IcebergReader.read]], the general HadoopCatalog v2 reader
    * (this exporter's output is one of its inputs). `asOfVersion`
    * pins an older exported `v<N>.metadata.json` (each is
    * self-contained — metadata-file time travel). None when no
    * export exists. */
  def readExported(url: String, asOfVersion: Option[Long] = None)
                  (implicit spark: SparkSession): Option[DataFrame] =
    IcebergReader.read(url, asOfVersion)

  private def escJ(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** Legal Avro field name for partition column `c` — the Iceberg
    * convention (AvroSchemaUtil.makeCompatibleName): identity rides
    * the FIELD-ID, so illegal characters sanitize to `_` and the
    * index suffix guarantees uniqueness. A legal name passes through
    * with only the suffix. */
  private def avroName(c: String, i: Int): String = {
    val cleaned = c.map(ch =>
      if (ch.isLetterOrDigit && ch < 128 || ch == '_') ch else '_')
    val headed = if (cleaned.isEmpty || cleaned.head.isDigit) s"_$cleaned"
                 else cleaned
    s"${headed}_$i"
  }

  /** Delta partition-value timestamp rendering → epoch micros.
    * TimestampType renderings are SESSION-TIMEZONE wall times (that
    * is how `cast(ts as string)` writes them), so the zone must come
    * in to recover the instant; TimestampNTZ passes None (wall time
    * IS the value). Parsing is SPARK'S OWN `stringToTimestamp`, so
    * DST-gap/overlap resolution is cast-identical by construction. */
  private def parseTimestampMicros(v: String,
                                   zone: Option[java.time.ZoneId]): Long = {
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    import org.apache.spark.unsafe.types.UTF8String
    val parsed: Option[Long] = zone match {
      case Some(z) =>
        DateTimeUtils.stringToTimestamp(UTF8String.fromString(v), z)
      case None =>
        DateTimeUtils.stringToTimestampWithoutTimeZone(
          UTF8String.fromString(v))
    }
    parsed.getOrElse(throw new IllegalArgumentException(
      s"IcebergExport: unparseable timestamp partition value '$v'"))
  }

  /** The session timezone as a ZoneId, via Spark's own resolver —
    * `ZoneId.of` rejects short ids ("PST") and single-digit offsets
    * Spark itself accepts. */
  private[sources] def sessionZone(implicit spark: SparkSession): java.time.ZoneId =
    org.apache.spark.sql.catalyst.util.DateTimeUtils.getZoneId(
      spark.sessionState.conf.sessionLocalTimeZone)

  /** Iceberg's minimum byte count for a decimal-on-fixed of the
    * given precision (TypeUtil.decimalRequiredBytes): the signed
    * two's-complement width of 10^p − 1. */
  private def decimalRequiredBytes(precision: Int): Int =
    (java.math.BigInteger.TEN.pow(precision)
      .subtract(java.math.BigInteger.ONE).bitLength() + 1 + 7) / 8

  /** The identity partition-spec fields JSON — ONE rendering shared
    * by the table metadata and the manifest's `partition-spec`
    * key-value metadata (the spec requires them to agree). Source
    * ids come from the caller's field-id assignment (ordinal, or
    * the column-mapping ids for mapped tables). */
  private def icebergSpecJson(snap: DeltaReader.DeltaSnapshot,
                              fieldIds: Map[String, Int]): String =
    snap.partitionColumns.zipWithIndex.map { case (c, i) =>
      s"""{"name":"${escJ(c)}","transform":"identity",""" +
        s""""source-id":${fieldIds(c)},"field-id":${1000 + i}}"""
    }.mkString("[", ",", "]")

  private def icebergType(dt: DataType): String = dt match {
    case LongType => "long"
    case IntegerType | ShortType | ByteType => "int"
    case DoubleType => "double"
    case FloatType => "float"
    case StringType => "string"
    case BooleanType => "boolean"
    case DateType => "date"
    case BinaryType => "binary"
    case _: TimestampType => "timestamptz"
    case TimestampNTZType => "timestamp"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case other => throw new UnsupportedOperationException(
      s"IcebergExport: no Iceberg mapping for ${other.simpleString} " +
        "(nested types need real UniForm)")
  }

  /** The Iceberg schema JSON object (field-id'd struct) — embedded in
    * the table metadata's `schemas` array AND the manifest's `schema`
    * key-value metadata (the spec requires both). Names are LOGICAL
    * (mapped tables publish the physical names via the name-mapping
    * property instead). */
  private def icebergSchemaJson(snap: DeltaReader.DeltaSnapshot,
                                fieldIds: Map[String, Int]): String = {
    val fields = snap.schema.fields.map { f =>
      s"""{"id":${fieldIds(f.name)},"name":"${escJ(f.name)}",""" +
        s""""required":false,"type":"${icebergType(f.dataType)}"}"""
    }.mkString(",")
    s"""{"type":"struct","schema-id":0,"fields":[$fields]}"""
  }

  /** One Avro object-container file: schema + key-value metadata +
    * records, written through the Hadoop FileSystem (same scheme
    * pluggability as every other artifact). */
  private[sources] def writeAvro(fs: FileSystem, p: Path,
                        schema: org.apache.avro.Schema,
                        meta: Map[String, String],
                        records: Seq[org.apache.avro.generic.GenericRecord])
      : Unit = {
    val writer = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema))
    meta.foreach { case (k, v) => writer.setMeta(k, v) }
    // temp + rename: a re-export at the SAME Delta version is
    // idempotent (upgrading a pre-Avro export in place), and a
    // mid-write failure never truncates a previously good artifact
    val tmp = new Path(p.getParent,
      s".${p.getName}.tmp-${java.util.UUID.randomUUID}")
    val out = fs.create(tmp, false)
    var created = false
    try {
      try {
        writer.create(schema, out)
        created = true
        records.foreach(writer.append)
        writer.flush()
      } finally {
        // DataFileWriter.close() is a no-op before create() succeeds —
        // close the raw stream ourselves or it leaks on a create fail
        if (created) writer.close() else out.close()
      }
    } catch { case t: Throwable =>
      try fs.delete(tmp, false) catch { case _: Throwable => () }
      throw t
    }
    publishOver(fs, tmp, p)
  }

  /** Every record of an Avro object-container file (reader-schema =
    * writer-schema — the generic round-trip). A pre-Avro (round-13
    * JSON) artifact raises with the upgrade instruction. */
  private[sources] def readAvro(fs: FileSystem, p: Path)
      : Seq[org.apache.avro.generic.GenericRecord] = {
    if (p.getName.endsWith(".json"))
      throw new UnsupportedOperationException(
        s"IcebergExport: $p is a pre-Avro (JSON) manifest artifact — " +
          "re-run IcebergExport.export to upgrade the export in place")
    val in = new org.apache.avro.mapred.FsInput(p, fs.getConf)
    val reader =
      try org.apache.avro.file.DataFileReader.openReader(in,
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      catch { case t: Throwable => in.close(); throw t }
    try {
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.avro.generic.GenericRecord]
      while (reader.hasNext) buf += reader.next()
      buf.toSeq
    } finally reader.close()
  }

  /** Atomically publish `tmp` over `p` (FileContext OVERWRITE rename
    * — no delete-then-rename window destroying the good artifact);
    * deletes `tmp` on failure so failed exports leave no orphans. */
  private def publishOver(fs: FileSystem, tmp: Path, p: Path): Unit =
    try org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, fs.getConf)
      .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    catch { case t: Throwable =>
      try fs.delete(tmp, false) catch { case _: Throwable => () }
      throw t
    }

  private[sources] def writeFile(fs: FileSystem, p: Path, body: String): Unit = {
    // temp + overwrite-rename: a mid-write failure never truncates a
    // previously good artifact and leaves no tmp orphan behind
    val tmp = new Path(p.getParent,
      s".${p.getName}.tmp-${java.util.UUID.randomUUID}")
    try {
      val out = fs.create(tmp, false)
      try out.write(body.getBytes("UTF-8")) finally out.close()
    } catch { case t: Throwable =>
      try fs.delete(tmp, false) catch { case _: Throwable => () }
      throw t
    }
    publishOver(fs, tmp, p)
  }

  private[sources] def readFile(fs: FileSystem, p: Path): String = {
    val st = fs.getFileStatus(p)
    val bytes = new Array[Byte](st.getLen.toInt)
    val in = fs.open(p)
    try in.readFully(0L, bytes) finally in.close()
    new String(bytes, "UTF-8")
  }
}
