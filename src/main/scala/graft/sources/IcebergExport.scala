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
  * schema, identity partition spec, one snapshot), a manifest list
  * and a manifest enumerating every live data file with record
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
  * reader parses. Documented deviation: each export publishes ONE
  * snapshot (the current Delta version) rather than replaying
  * history. Pinned by the spec via [[readExported]] == Delta scan
  * plus a raw-Avro decode of both files.
  *
  * Deletion vectors REFUSE the export (run `optimize(0.0)` first to
  * materialize masks): a plain manifest cannot express row-level
  * masks, and real UniForm/IcebergCompat draws the same line —
  * deletion vectors must be off for Iceberg conversion.
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
    require(snap.physicalSchema.isEmpty,
      "IcebergExport: column-mapped tables unsupported")
    require(!snap.files.exists(_.deletionVector.exists(_.cardinality > 0)),
      "IcebergExport: table carries live deletion vectors — a plain " +
        "manifest cannot express row masks (IcebergCompat's own " +
        "constraint); run optimize(0.0) to materialize them first")
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
        "partition-spec" -> icebergSpecJson(snap),
        "schema" -> icebergSchemaJson(snap)),
      snap.files.sortBy(_.path).map { f =>
        val part = new org.apache.avro.generic.GenericData.Record(partSchema)
        snap.partitionColumns.zipWithIndex.foreach { case (c, i) =>
          part.put(i, partValue(c, f.partitionValues.getOrElse(c, null),
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
    mf.put("sequence_number", Long.box(snap.version))
    mf.put("min_sequence_number", Long.box(snap.version))
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
        "sequence-number" -> snap.version.toString),
      Seq(mf))

    // ---- table metadata -------------------------------------------
    val now = System.currentTimeMillis
    val metadataPath = new Path(metaDir, s"v${snap.version}.metadata.json")
    writeFile(fs, metadataPath, body =
      s"""{"format-version":2,"table-uuid":"${escJ(snap.tableId)}",""" +
        s""""location":"${escJ(qualifiedBase.toUri.toString)}",""" +
        s""""last-sequence-number":${snap.version},"last-updated-ms":$now,""" +
        s""""last-column-id":${snap.schema.fields.length},""" +
        s""""current-schema-id":0,"schemas":[${icebergSchemaJson(snap)}],""" +
        s""""default-spec-id":0,"partition-specs":[{"spec-id":0,""" +
        s""""fields":${icebergSpecJson(snap)}}],""" +
        s""""last-partition-id":${999 + snap.partitionColumns.size},""" +
        s""""default-sort-order-id":0,"sort-orders":[{"order-id":0,""" +
        s""""fields":[]}],"properties":{"graft.delta.version":"${snap.version}"},""" +
        s""""current-snapshot-id":$snapshotId,"snapshots":[{""" +
        s""""snapshot-id":$snapshotId,"sequence-number":${snap.version},""" +
        s""""timestamp-ms":$now,"schema-id":0,""" +
        s""""manifest-list":"${escJ(listPath.toUri.toString)}",""" +
        s""""summary":{"operation":"append"}}],""" +
        s""""snapshot-log":[],"metadata-log":[]}""" + "\n")
    // HadoopCatalog discovery convention
    writeFile(fs, new Path(metaDir, "version-hint.text"),
      s"${snap.version}\n")
    snap.version
  }

  /** Resolve the exported snapshot WITHOUT `_delta_log`: version
    * hint → metadata → manifest list → manifest → data files with
    * typed partition literals, columns in schema order — what an
    * external Iceberg reader computes. None when no export exists. */
  def readExported(url: String)
                  (implicit spark: SparkSession): Option[DataFrame] = {
    val cleanUrl = url.stripSuffix("/")
    val metaDir = new Path(cleanUrl, "metadata")
    val fs: FileSystem = metaDir.getFileSystem(spark.sessionState.newHadoopConf())
    val hint = new Path(metaDir, "version-hint.text")
    if (!fs.exists(hint)) return None
    val om = new ObjectMapper()
    val version = readFile(fs, hint).trim.toLong
    val meta = om.readTree(readFile(fs,
      new Path(metaDir, s"v$version.metadata.json")))
    val schema = StructType(meta.get("schemas").get(0).get("fields")
      .elements().asScala.map { f =>
        StructField(f.get("name").asText, f.get("type").asText match {
          case "long" => LongType
          case "int" => IntegerType
          case "double" => DoubleType
          case "float" => FloatType
          case "string" => StringType
          case "boolean" => BooleanType
          case "date" => DateType
          case "binary" => BinaryType
          case "timestamptz" => TimestampType
          case "timestamp" => TimestampNTZType
          case d if d.startsWith("decimal") =>
            val Array(p, s) = d.stripPrefix("decimal(").stripSuffix(")")
              .split(",").map(_.trim.toInt)
            DecimalType(p, s)
          case other => throw new UnsupportedOperationException(
            s"IcebergExport.readExported: type $other")
        })
      }.toSeq)
    val partCols = meta.get("partition-specs").get(0).get("fields")
      .elements().asScala.map(_.get("name").asText).toSeq
    val snapNode = meta.get("snapshots").elements().asScala.find(
      _.get("snapshot-id").asLong == meta.get("current-snapshot-id").asLong)
      .getOrElse(throw new IllegalStateException(
        "IcebergExport.readExported: current snapshot missing"))
    // manifest list + manifest are Avro object-container files (the
    // Iceberg v2 layout) — decode generically, statuses 1/0 are live
    val listRecs = readAvro(fs,
      new Path(new java.net.URI(snapNode.get("manifest-list").asText)))
    require(listRecs.nonEmpty,
      "IcebergExport.readExported: empty manifest list")
    val manifestRecs = listRecs.flatMap { mf =>
      readAvro(fs,
        new Path(new java.net.URI(mf.get("manifest_path").toString)))
    }
    def partString(c: String, v: AnyRef): String =
      if (v == null) null
      else schema(c).dataType match {
        // Avro stores a date as epoch days; the literal cast below
        // re-parses the ISO rendering
        case DateType => java.time.LocalDate
          .ofEpochDay(v.asInstanceOf[Int].toLong).toString
        case dt @ (_: TimestampType | TimestampNTZType) =>
          // render the instant in the zone the literal cast below
          // will parse it with: SESSION TZ for timestamptz (the
          // inverse of export's parse), wall-time for NTZ
          val micros = v.asInstanceOf[Long]
          val zone =
            if (dt == TimestampNTZType) java.time.ZoneOffset.UTC
            else sessionZone
          java.time.LocalDateTime.ofInstant(
            java.time.Instant.ofEpochSecond(
              Math.floorDiv(micros, 1000000L),
              Math.floorMod(micros, 1000000L) * 1000L),
            zone).toString.replace('T', ' ')
        case d: DecimalType =>
          new java.math.BigDecimal(new java.math.BigInteger(
            v.asInstanceOf[org.apache.avro.generic.GenericFixed].bytes()),
            d.scale).toPlainString
        case _ => v.toString
      }
    // partition record field NAMES are Avro-sanitized; the SPEC order
    // is authoritative — access by position
    val entries: Seq[(String, Map[String, String])] = manifestRecs
      .filter(_.get("status").asInstanceOf[Int] != 2) // 2 = DELETED
      .map { e =>
        val df = e.get("data_file")
          .asInstanceOf[org.apache.avro.generic.GenericRecord]
        val part = df.get("partition")
          .asInstanceOf[org.apache.avro.generic.GenericRecord]
        val pv = partCols.zipWithIndex.map { case (c, i) =>
          c -> partString(c, part.get(i)) }.toMap
        (df.get("file_path").toString, pv)
      }
    val dataSchema = StructType(schema.filterNot(f => partCols.contains(f.name)))
    if (entries.isEmpty)
      return Some(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
    // group by partition tuple: one scan per partition value set,
    // typed literals injected, then a union in schema order
    val groups = entries.groupBy(_._2).toSeq
      .sortBy(_._1.toSeq.sortBy(_._1).mkString("/"))
    val frames = groups.map { case (pv, fsOfGroup) =>
      val base = spark.read.schema(dataSchema)
        .parquet(fsOfGroup.map(_._1): _*)
      partCols.foldLeft(base) { (df, c) =>
        val dt = schema(c).dataType
        df.withColumn(c,
          if (pv(c) == null) lit(null).cast(dt) else lit(pv(c)).cast(dt))
      }
    }
    Some(frames.reduce(_ unionByName _)
      .select(schema.fieldNames.map(col).toSeq: _*))
  }

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
  private def sessionZone(implicit spark: SparkSession): java.time.ZoneId =
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
    * key-value metadata (the spec requires them to agree). */
  private def icebergSpecJson(snap: DeltaReader.DeltaSnapshot): String = {
    val fieldId: Map[String, Int] =
      snap.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> (i + 1) }.toMap
    snap.partitionColumns.zipWithIndex.map { case (c, i) =>
      s"""{"name":"${escJ(c)}","transform":"identity",""" +
        s""""source-id":${fieldId(c)},"field-id":${1000 + i}}"""
    }.mkString("[", ",", "]")
  }

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
    * key-value metadata (the spec requires both). */
  private def icebergSchemaJson(snap: DeltaReader.DeltaSnapshot): String = {
    val fields = snap.schema.fields.zipWithIndex.map { case (f, i) =>
      s"""{"id":${i + 1},"name":"${escJ(f.name)}",""" +
        s""""required":false,"type":"${icebergType(f.dataType)}"}"""
    }.mkString(",")
    s"""{"type":"struct","schema-id":0,"fields":[$fields]}"""
  }

  /** One Avro object-container file: schema + key-value metadata +
    * records, written through the Hadoop FileSystem (same scheme
    * pluggability as every other artifact). */
  private def writeAvro(fs: FileSystem, p: Path,
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
  private def readAvro(fs: FileSystem, p: Path)
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

  private def writeFile(fs: FileSystem, p: Path, body: String): Unit = {
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

  private def readFile(fs: FileSystem, p: Path): String = {
    val st = fs.getFileStatus(p)
    val bytes = new Array[Byte](st.getLen.toInt)
    val in = fs.open(p)
    try in.readFully(0L, bytes) finally in.close()
    new String(bytes, "UTF-8")
  }
}
