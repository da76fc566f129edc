package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** General HadoopCatalog reader for Iceberg FORMAT-VERSION 2 tables:
  * `v<N>.metadata.json` (+ `version-hint.text`) → manifest list →
  * manifests → data files with typed identity-partition literals —
  * the inverse interop surface to [[IcebergExport]], generalized the
  * way [[DeltaReader]] generalizes beyond graft's own Delta writes:
  * arbitrary v2 metadata trees decode, not just this exporter's.
  * (The reference has no interop surface; north-star extension.)
  *
  * Supported: flat primitive schemas (selected by
  * `current-schema-id`), identity partition transforms, multiple
  * manifests per manifest list, multiple historical snapshots
  * (`asOfVersion` pins an older `v<N>.metadata.json` — metadata-file
  * time travel), Avro-sanitized partition record names (spec order
  * is authoritative — positional access), and the
  * `schema.name-mapping.default` property for tables whose parquet
  * files store different (physical) column names than the Iceberg
  * schema — the UniForm/IcebergCompat column-mapping shape.
  *
  * Refused LOUDLY (never silently wrong): format versions ≠ 2,
  * nested field types, non-identity transforms (`bucket[N]`, `day`,
  * …), delete manifests (`content=1` in the manifest list),
  * row-level delete files (`data_file.content ≠ 0`), non-parquet
  * file formats, and partition-spec evolution beyond the default
  * spec's column set.
  *
  * Scale shape: metadata decode is manifest-bounded driver work; the
  * data read is one pruned parquet scan per distinct partition tuple
  * (pushdown intact) + a union — identical to [[DeltaReader]]'s
  * assemble shape. Identity-partition columns are injected as typed
  * literals from the manifest tuple (Delta-exported files do not
  * store them; for native Iceberg files that do, the stored values
  * are definitionally equal to the tuple). */
object IcebergReader {

  /** Scan the table at `url`. `asOfVersion` selects a specific
    * `v<N>.metadata.json` (each is self-contained); default = the
    * HadoopCatalog `version-hint.text`, falling back to the highest
    * `v<N>` present for hintless layouts. None when no Iceberg
    * metadata exists at all. */
  def read(url: String, asOfVersion: Option[Long] = None)
          (implicit spark: SparkSession): Option[DataFrame] = {
    val cleanUrl = url.stripSuffix("/")
    val metaDir = new Path(cleanUrl, "metadata")
    val fs: FileSystem =
      metaDir.getFileSystem(spark.sessionState.newHadoopConf())
    val MetaName = """v(\d+)\.metadata\.json""".r
    val version: Option[Long] = asOfVersion.orElse {
      val hint = new Path(metaDir, "version-hint.text")
      if (fs.exists(hint)) Some(IcebergExport.readFile(fs, hint).trim.toLong)
      else if (!fs.exists(metaDir)) None
      else fs.listStatus(metaDir).toSeq.map(_.getPath.getName)
        .collect { case MetaName(v) => v.toLong }
        .sorted.lastOption
    }
    version.map { v =>
      val p = new Path(metaDir, s"v$v.metadata.json")
      require(fs.exists(p),
        s"IcebergReader: no metadata file $p for requested version $v")
      readAt(fs, p)
    }
  }

  private case class IField(id: Int, name: String, dt: DataType)

  private def readAt(fs: FileSystem, metadataPath: Path)
                    (implicit spark: SparkSession): DataFrame = {
    val om = new ObjectMapper()
    val meta = om.readTree(IcebergExport.readFile(fs, metadataPath))
    val fv = Option(meta.get("format-version")).map(_.asInt).getOrElse(0)
    require(fv == 2,
      s"IcebergReader: format-version $fv unsupported (v2 only)")

    // ---- schema: select by current-schema-id; flat primitives only
    val curSchemaId =
      Option(meta.get("current-schema-id")).map(_.asInt).getOrElse(0)
    val schemaNode = Option(meta.get("schemas"))
      .flatMap(_.elements().asScala.find(s =>
        Option(s.get("schema-id")).forall(_.asInt == curSchemaId)))
      .getOrElse(throw new UnsupportedOperationException(
        s"IcebergReader: no schema with schema-id $curSchemaId in " +
          "'schemas' (v1 single-'schema' layouts unsupported)"))
    val ifields: Seq[IField] = schemaNode.get("fields").elements().asScala
      .map { f =>
        val t = f.get("type")
        if (!t.isTextual) throw new UnsupportedOperationException(
          s"IcebergReader: nested type on field '${f.get("name").asText}' " +
            "unsupported (flat primitive schemas only)")
        IField(f.get("id").asInt, f.get("name").asText, sparkType(t.asText))
      }.toSeq
    val schema = StructType(ifields.map(f => StructField(f.name, f.dt)))
    val byId: Map[Int, IField] = ifields.map(f => f.id -> f).toMap

    // ---- partition specs: identity transforms only; source-id is
    // authoritative for the column (names may be sanitized/renamed)
    val specs: Map[Int, Seq[String]] = Option(meta.get("partition-specs"))
      .map(_.elements().asScala.map { s =>
        val id = s.get("spec-id").asInt
        val cols = s.get("fields").elements().asScala.map { pf =>
          val tr = pf.get("transform").asText
          require(tr == "identity",
            s"IcebergReader: partition transform '$tr' unsupported " +
              "(identity only)")
          Option(pf.get("source-id")).map(_.asInt).flatMap(byId.get)
            .map(_.name).getOrElse(pf.get("name").asText)
        }.toSeq
        id -> cols
      }.toMap).getOrElse(Map.empty)
    val defaultSpecId =
      Option(meta.get("default-spec-id")).map(_.asInt).getOrElse(0)
    val partCols: Seq[String] = specs.getOrElse(defaultSpecId, Seq.empty)

    // ---- current snapshot → manifest list → manifests -------------
    // current-snapshot-id -1 (or no snapshots at all) is a freshly
    // created table with no commits — a valid v2 tree that resolves
    // to an empty frame with the declared schema, not an error
    val curSnapId = Option(meta.get("current-snapshot-id")).map(_.asLong)
      .getOrElse(-1L)
    if (curSnapId == -1L)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val snapNode = Option(meta.get("snapshots"))
      .flatMap(_.elements().asScala.find(
        _.get("snapshot-id").asLong == curSnapId))
      .getOrElse(throw new IllegalStateException(
        s"IcebergReader: current snapshot $curSnapId missing from " +
          "'snapshots'"))
    val listRecs = IcebergExport.readAvro(fs,
      new Path(new java.net.URI(snapNode.get("manifest-list").asText)))
    val entries: Seq[(String, Map[String, String])] = listRecs.flatMap { mf =>
      Option(mf.get("content")).foreach { c =>
        require(c.asInstanceOf[Int] == 0,
          "IcebergReader: delete manifests (content=1) unsupported") }
      val specId = Option(mf.get("partition_spec_id"))
        .map(_.asInstanceOf[Int]).getOrElse(defaultSpecId)
      val cols = specs.getOrElse(specId, throw new IllegalStateException(
        s"IcebergReader: manifest references unknown partition-spec $specId"))
      require(cols.toSet.subsetOf(partCols.toSet),
        "IcebergReader: partition-spec evolution beyond the default " +
          s"spec's columns unsupported (spec $specId: $cols vs $partCols)")
      IcebergExport.readAvro(fs,
        new Path(new java.net.URI(mf.get("manifest_path").toString)))
        .filter(_.get("status").asInstanceOf[Int] != 2) // 2 = DELETED
        .map { e =>
          val df = e.get("data_file")
            .asInstanceOf[org.apache.avro.generic.GenericRecord]
          Option(df.get("content")).foreach { c =>
            require(c.asInstanceOf[Int] == 0,
              "IcebergReader: row-level delete files " +
                "(data_file.content != 0) unsupported") }
          val fmt = df.get("file_format").toString
          require(fmt.equalsIgnoreCase("parquet"),
            s"IcebergReader: file format $fmt unsupported (parquet only)")
          val part = df.get("partition")
            .asInstanceOf[org.apache.avro.generic.GenericRecord]
          // partition record field NAMES are Avro-sanitized; the
          // SPEC order is authoritative — positional access
          val pv = cols.zipWithIndex.map { case (c, i) =>
            c -> partString(schema(c).dataType, part.get(i)) }.toMap
          (df.get("file_path").toString, pv)
        }
    }

    // ---- data read: name-mapping-aware schema, partition literals -
    // schema.name-mapping.default maps field-id → the name parquet
    // files actually store (UniForm's column-mapping shape); files
    // are read under those names and renamed positionally back
    val nameMapping: Map[Int, String] = Option(meta.get("properties"))
      .flatMap(p => Option(p.get("schema.name-mapping.default")))
      .map { nm =>
        om.readTree(nm.asText).elements().asScala.map { m =>
          m.get("field-id").asInt -> m.get("names").get(0).asText
        }.toMap
      }.getOrElse(Map.empty)
    val dataFields = ifields.filterNot(f => partCols.contains(f.name))
    val readSchema = StructType(dataFields.map(f =>
      StructField(nameMapping.getOrElse(f.id, f.name), f.dt)))
    if (entries.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    // group by partition tuple: one scan per partition value set,
    // typed literals injected, then a union in schema order
    val groups = entries.groupBy(_._2).toSeq
      .sortBy(_._1.toSeq.sortBy(_._1).mkString("/"))
    val frames = groups.map { case (pv, fsOfGroup) =>
      val base = spark.read.schema(readSchema)
        .parquet(fsOfGroup.map(_._1): _*)
        .toDF(dataFields.map(_.name): _*) // positional physical→logical
      partCols.foldLeft(base) { (df, c) =>
        val dt = schema(c).dataType
        // a column absent from an entry's (older, subset) spec is a
        // file written before the field existed — null, per Iceberg
        val v = pv.getOrElse(c, null)
        df.withColumn(c,
          if (v == null) lit(null).cast(dt) else lit(v).cast(dt))
      }
    }
    frames.reduce(_ unionByName _)
      .select(schema.fieldNames.map(col).toSeq: _*)
  }

  private def sparkType(t: String): DataType = t match {
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
      s"IcebergReader: type $other unsupported")
  }

  /** Typed Avro partition value → the string literal the injection
    * cast below re-parses (the inverse of [[IcebergExport]]'s typed
    * encoding). */
  private def partString(dt: DataType, v: AnyRef)
                        (implicit spark: SparkSession): String =
    if (v == null) null
    else dt match {
      // Avro stores a date as epoch days; the literal cast below
      // re-parses the ISO rendering
      case DateType => java.time.LocalDate
        .ofEpochDay(longOf(v)).toString
      case tdt @ (_: TimestampType | TimestampNTZType) =>
        // render the instant in the zone the literal cast below
        // will parse it with: SESSION TZ for timestamptz (the
        // inverse of export's parse), wall-time for NTZ
        val micros = longOf(v)
        val zone =
          if (tdt == TimestampNTZType) java.time.ZoneOffset.UTC
          else IcebergExport.sessionZone
        java.time.LocalDateTime.ofInstant(
          java.time.Instant.ofEpochSecond(
            Math.floorDiv(micros, 1000000L),
            Math.floorMod(micros, 1000000L) * 1000L),
          zone).toString.replace('T', ' ')
      case d: DecimalType =>
        val bytes = v match {
          case gf: org.apache.avro.generic.GenericFixed => gf.bytes()
          case bb: java.nio.ByteBuffer =>
            val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
          case other => throw new UnsupportedOperationException(
            s"IcebergReader: decimal partition encoding ${other.getClass}")
        }
        new java.math.BigDecimal(new java.math.BigInteger(bytes), d.scale)
          .toPlainString
      case _ => v.toString
    }

  // Avro int/long both surface for date/timestamp depending on writer
  private def longOf(v: AnyRef): Long = v match {
    case i: java.lang.Integer => i.toLong
    case l: java.lang.Long => l
    case other => throw new UnsupportedOperationException(
      s"IcebergReader: numeric partition encoding ${other.getClass}")
  }
}
