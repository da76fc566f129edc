package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** UniForm-style Iceberg metadata export: exported metadata resolves
  * the snapshot WITHOUT `_delta_log` and reads identically to the
  * Delta scan; re-export follows the head; deletion vectors refuse
  * until optimized away (IcebergCompat's own constraint). */
class IcebergExportSpec extends SparkSpec {
  import spark.implicits._

  implicit private val s: org.apache.spark.sql.SparkSession = spark

  test("export → readExported == Delta scan; re-export follows the head") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val ds = new DeltaDataset(table, Seq("p"))
      ds.write(Seq((1L, "a", "A"), (2L, "b", "A"), (3L, "c", "B"))
        .toDF("v", "s", "p"))
      ds.append(Seq((4L, "d", "B"), (5L, "e", "C")).toDF("v", "s", "p"))
      assert(IcebergExport.export(table) == 1L)
      // layout: metadata.json + manifest list + manifest + hint
      val metaDir = Paths.get(table, "metadata")
      assert(Files.exists(metaDir.resolve("v1.metadata.json")))
      assert(Files.exists(metaDir.resolve("version-hint.text")))
      assert(Files.list(metaDir).filter { p =>
        val n = p.getFileName.toString
        n.contains("manifest") && !n.startsWith(".") // skip .crc shadows
      }.count() == 2L)
      // the exported snapshot reads back EXACTLY the Delta scan,
      // typed partition columns included, without touching _delta_log
      val exported = IcebergExport.readExported(table).get
      assert(exported.schema.fieldNames.toSeq == Seq("v", "s", "p"))
      assertSameData(exported, DeltaReader.scan(table).get)
      // the manifest is a REAL Avro object-container file (magic
      // "Obj\1") whose v2 manifest_entry records carry field-ids and
      // the adds' record counts
      val manifestFile = Files.list(metaDir)
        .filter { p =>
          val n = p.getFileName.toString
          n.startsWith("manifest-") && n.endsWith(".avro")
        }.findFirst().get()
      val magic = Files.readAllBytes(manifestFile).take(4)
      assert(magic.sameElements(Array[Byte]('O', 'b', 'j', 1)),
        "the manifest must be a real Avro object-container file")
      val reader = new org.apache.avro.file.DataFileReader(
        manifestFile.toFile,
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      val (entries, fmtVersion, filePathFieldId) = try {
        val buf = scala.collection.mutable.ArrayBuffer
          .empty[org.apache.avro.generic.GenericRecord]
        while (reader.hasNext) buf += reader.next()
        (buf.toSeq, new String(reader.getMeta("format-version"), "UTF-8"),
          reader.getSchema.getField("data_file").schema()
            .getField("file_path").getObjectProp("field-id"))
      } finally reader.close()
      assert(fmtVersion == "2")
      assert(filePathFieldId != null,
        "manifest_entry fields must carry Iceberg field-ids")
      val total = entries.map(_.get("data_file")
        .asInstanceOf[org.apache.avro.generic.GenericRecord]
        .get("record_count").asInstanceOf[Long]).sum
      assert(total == 5L)
      // the partition record is TYPED (string column → Avro string);
      // field names are Avro-sanitized, the spec ORDER is
      // authoritative — positional access
      assert(entries.forall { e =>
        val part = e.get("data_file")
          .asInstanceOf[org.apache.avro.generic.GenericRecord]
          .get("partition")
          .asInstanceOf[org.apache.avro.generic.GenericRecord]
        part.get(0) != null
      })
      // the manifest list is Avro too
      val listFile = Files.list(metaDir)
        .filter(_.getFileName.toString.endsWith(".manifest-list.avro"))
        .findFirst().get()
      assert(Files.readAllBytes(listFile).take(4)
        .sameElements(Array[Byte]('O', 'b', 'j', 1)))
      // new commits → re-export → the hint and snapshot follow
      ds.append(Seq((6L, "f", "C")).toDF("v", "s", "p"))
      assert(IcebergExport.export(table) == 2L)
      assert(new String(Files.readAllBytes(
        metaDir.resolve("version-hint.text")), "UTF-8").trim == "2")
      assert(IcebergExport.readExported(table).get.count() == 6L)
      // older metadata versions remain (Iceberg's own history shape)
      assert(Files.exists(metaDir.resolve("v1.metadata.json")))
    }
  }

  test("typed partitions round-trip: DATE values and digit-leading column names") {
    withTempDir { dir =>
      val table = s"$dir/t"
      // partition column "2p" forces the Avro name sanitizer (an
      // Avro field cannot start with a digit); DATE values exercise
      // the epoch-day encoding both directions
      val df = Seq((1L, "2024-01-02"), (2L, "2024-01-02"),
        (3L, "2024-03-05")).toDF("v", "2p")
        .selectExpr("v", "cast(`2p` as date) AS `2p`")
      val ds = new DeltaDataset(table, Seq("2p"))
      ds.write(df)
      IcebergExport.export(table)
      val exported = IcebergExport.readExported(table).get
      assertSameData(exported, DeltaReader.scan(table).get)
      assert(exported.schema("2p").dataType ==
        org.apache.spark.sql.types.DateType)
    }
  }

  test("timestamp and decimal partitions round-trip under a non-UTC session timezone") {
    val oldTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      // short id: ZoneId.of would reject it, Spark's resolver accepts
      // it — the export must use Spark's resolver
      spark.conf.set("spark.sql.session.timeZone", "PST")
      withTempDir { dir =>
        // FOREIGN fixture: timestamp partition values contain spaces/
        // colons our own writer path-refuses, but the log's
        // partitionValues strings are unconstrained
        val table = s"$dir/t"
        def seed(name: String, vs: Seq[Long]): Long = {
          val stage = s"$table/stage-$name"
          vs.toDF("v").coalesce(1).write.parquet(stage)
          val part = new java.io.File(stage).listFiles()
            .filter(_.getName.endsWith(".parquet")).head
          val dest = new java.io.File(s"$table/$name")
          assert(part.renameTo(dest)); dest.length
        }
        val l0 = seed("f0.parquet", Seq(1L, 2L))
        val l1 = seed("f1.parquet", Seq(3L))
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("ts",
            org.apache.spark.sql.types.TimestampType),
          org.apache.spark.sql.types.StructField("d",
            org.apache.spark.sql.types.DecimalType(9, 2))))
        def esc(x: String) =
          x.replace("\\", "\\\\").replace("\"", "\\\"")
        def add(p: String, len: Long, ts: String, d: String) =
          s"""{"add":{"path":"$p","partitionValues":{"ts":"$ts","d":"$d"},""" +
            s""""size":$len,"modificationTime":1700000000000,"dataChange":true}}"""
        val lines = Seq(
          """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
          s"""{"metaData":{"id":"tz","format":{"provider":"parquet","options":{}},""" +
            s""""schemaString":"${esc(schema.json)}",""" +
            s""""partitionColumns":["ts","d"],"configuration":{},""" +
            s""""createdTime":1700000000000}}""",
          add("f0.parquet", l0, "2024-01-02 03:04:05", "12.50"),
          add("f1.parquet", l1, "2024-07-09 20:30:00", "-7.25"))
        val logDir = java.nio.file.Paths.get(table, "_delta_log")
        java.nio.file.Files.createDirectories(logDir)
        java.nio.file.Files.write(logDir.resolve("%020d.json".format(0)),
          (lines.mkString("\n") + "\n").getBytes("UTF-8"))
        IcebergExport.export(table)
        val exported = IcebergExport.readExported(table).get
        assertSameData(exported, DeltaReader.scan(table).get)
        // the manifest's micros are the TRUE instant: the session-TZ
        // wall rendering shifted by the PST offset, not parsed as UTC
        val manifestFile = java.nio.file.Files.list(
          java.nio.file.Paths.get(table, "metadata"))
          .filter(_.getFileName.toString.matches("manifest-.*\\.avro"))
          .findFirst().get()
        val reader = new org.apache.avro.file.DataFileReader(
          manifestFile.toFile,
          new org.apache.avro.generic.GenericDatumReader[
            org.apache.avro.generic.GenericRecord]())
        val micros = try {
          val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
          while (reader.hasNext) {
            val part = reader.next().get("data_file")
              .asInstanceOf[org.apache.avro.generic.GenericRecord]
              .get("partition")
              .asInstanceOf[org.apache.avro.generic.GenericRecord]
            buf += part.get(0).asInstanceOf[Long]
          }
          buf.toSet
        } finally reader.close()
        // 2024-01-02 03:04:05 PST (-08:00) = 11:04:05Z;
        // 2024-07-09 20:30:00 PDT (-07:00) = 2024-07-10 03:30:00Z
        val expect = Set(
          java.time.Instant.parse("2024-01-02T11:04:05Z"),
          java.time.Instant.parse("2024-07-10T03:30:00Z"))
          .map(i => i.getEpochSecond * 1000000L)
        assert(micros == expect,
          s"manifest micros must be session-TZ-resolved instants: $micros")
      }
    } finally spark.conf.set("spark.sql.session.timeZone", oldTz)
  }

  test("deletion vectors refuse the export until optimize materializes them") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val ds = new DeltaDataset(table)
      ds.write(Seq(1L, 2L, 3L, 4L).toDF("v"))
      ds.delete($"v" === 2L) // DV mask
      val e = intercept[IllegalArgumentException](IcebergExport.export(table))
      assert(e.getMessage.contains("deletion vectors"))
      ds.optimize(0.0) // masks materialized away
      IcebergExport.export(table)
      assert(IcebergExport.readExported(table).get.collect()
        .map(_.getLong(0)).toSet == Set(1L, 3L, 4L))
    }
  }

  test("column-mapped tables export: logical names, mapping field-ids, name-mapping property") {
    withTempDir { dir =>
      val table = s"$dir/t"
      // name-mode mapped fixture with NON-ORDINAL column-mapping ids
      // (v→7, p→3): the export's field-ids must come from the
      // mapping metadata, never from field position
      import org.apache.spark.sql.types._
      def fm(id: Long, phys: String) = new MetadataBuilder()
        .putLong("delta.columnMapping.id", id)
        .putString("delta.columnMapping.physicalName", phys).build()
      val schema = StructType(Seq(
        StructField("v", LongType, nullable = true, fm(7, "col-aaa111")),
        StructField("p", StringType, nullable = true, fm(3, "col-ppp222"))))
      def esc(x: String) = x.replace("\\", "\\\\").replace("\"", "\\\"")
      Seq(1L, 2L).toDF("col-aaa111").coalesce(1).write.parquet(s"$table/st1")
      Seq(30L).toDF("col-aaa111").coalesce(1).write.parquet(s"$table/st2")
      def mv(stage: String, dest: String): Unit = {
        val part = new java.io.File(s"$table/$stage").listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val d = new java.io.File(s"$table/$dest")
        d.getParentFile.mkdirs(); assert(part.renameTo(d))
      }
      mv("st1", "col-ppp222=A/f1.parquet")
      mv("st2", "col-ppp222=B/f2.parquet")
      val lines = Seq(
        """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        s"""{"metaData":{"id":"fix","format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":"${esc(schema.json)}","partitionColumns":["p"],""" +
          s""""configuration":{"delta.columnMapping.mode":"name",""" +
          s""""delta.columnMapping.maxColumnId":"7"},"createdTime":1700000000000}}""",
        """{"add":{"path":"col-ppp222=A/f1.parquet","partitionValues":{"col-ppp222":"A"},"size":100,"modificationTime":1700000000000,"dataChange":true}}""",
        """{"add":{"path":"col-ppp222=B/f2.parquet","partitionValues":{"col-ppp222":"B"},"size":100,"modificationTime":1700000000000,"dataChange":true}}""")
      Files.createDirectories(Paths.get(s"$table/_delta_log"))
      Files.write(Paths.get(s"$table/_delta_log/%020d.json".format(0)),
        (lines.mkString("\n") + "\n").getBytes("UTF-8"))
      assert(IcebergExport.export(table) == 0L)
      // exported read == Delta scan, logical names throughout
      val exported = IcebergExport.readExported(table).get
      assert(exported.schema.fieldNames.toSeq == Seq("v", "p"))
      assertSameData(exported, DeltaReader.scan(table).get)
      // the metadata carries the mapping ids + the name-mapping
      // property (UniForm's column-mapping interop shape)
      val meta = new String(Files.readAllBytes(
        Paths.get(table, "metadata", "v0.metadata.json")), "UTF-8")
      assert(meta.contains(""""id":7,"name":"v""""), meta)
      assert(meta.contains(""""id":3,"name":"p""""), meta)
      assert(meta.contains("schema.name-mapping.default"), meta)
      assert(meta.contains("col-aaa111"), "physical name must ride the name mapping")
      assert(meta.contains(""""source-id":3"""), "spec source-id = mapping id")
      assert(meta.contains(""""last-column-id":7"""), meta)
    }
  }

  test("id-mode mapped tables export and read back through the graft writer's own files") {
    withTempDir { dir =>
      val table = s"$dir/t"
      import org.apache.spark.sql.types._
      def fm(id: Long, phys: String) = new MetadataBuilder()
        .putLong("delta.columnMapping.id", id)
        .putString("delta.columnMapping.physicalName", phys).build()
      val schema = StructType(Seq(
        StructField("v", LongType, nullable = true, fm(1, "col-aaa111")),
        StructField("p", StringType, nullable = true, fm(2, "col-ppp222"))))
      def esc(x: String) = x.replace("\\", "\\\\").replace("\"", "\\\"")
      // v0: EMPTY id-mode table; the graft writer lands id-stamped
      // physically-named files, export publishes the mapping
      val lines = Seq(
        """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        s"""{"metaData":{"id":"idm","format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":"${esc(schema.json)}","partitionColumns":["p"],""" +
          s""""configuration":{"delta.columnMapping.mode":"id",""" +
          s""""delta.columnMapping.maxColumnId":"2"},"createdTime":1700000000000}}""")
      Files.createDirectories(Paths.get(s"$table/_delta_log"))
      Files.write(Paths.get(s"$table/_delta_log/%020d.json".format(0)),
        (lines.mkString("\n") + "\n").getBytes("UTF-8"))
      val ds = new DeltaDataset(table, Seq("p"))
      ds.append(Seq((1L, "A"), (2L, "A"), (30L, "B")).toDF("v", "p"))
      assert(IcebergExport.export(table) == 1L)
      val exported = IcebergExport.readExported(table).get
      assert(exported.schema.fieldNames.toSeq == Seq("v", "p"))
      assertSameData(exported, DeltaReader.scan(table).get)
    }
  }

  test("re-export accumulates snapshot history; older versions stay resolvable; sequence numbers start at 1") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val ds = new DeltaDataset(table)
      ds.write(Seq(1L, 2L).toDF("v"))                          // delta v0
      assert(IcebergExport.export(table) == 0L)
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val m0 = om.readTree(Files.readAllBytes(
        Paths.get(table, "metadata", "v0.metadata.json")))
      // Iceberg reserves sequence-number 0 for pre-existing state
      assert(m0.get("last-sequence-number").asLong == 1L)
      assert(m0.get("snapshots").get(0).get("sequence-number").asLong == 1L)
      // idempotent same-version re-export: no duplicate snapshot
      assert(IcebergExport.export(table) == 0L)
      val m0b = om.readTree(Files.readAllBytes(
        Paths.get(table, "metadata", "v0.metadata.json")))
      assert(m0b.get("snapshots").size == 1)
      assert(m0b.get("snapshot-log").size == 1)
      assert(m0b.get("metadata-log").size == 0)
      ds.append(Seq(3L).toDF("v"))                             // delta v1
      assert(IcebergExport.export(table) == 1L)
      val m1 = om.readTree(Files.readAllBytes(
        Paths.get(table, "metadata", "v1.metadata.json")))
      // head metadata carries BOTH snapshots + the log trail
      assert(m1.get("snapshots").size == 2)
      assert(m1.get("snapshot-log").size == 2)
      assert(m1.get("metadata-log").size == 1)
      assert(m1.get("metadata-log").get(0).get("metadata-file").asText
        .endsWith("v0.metadata.json"))
      assert(m1.get("current-snapshot-id").asLong == 2L)
      assert(m1.get("last-sequence-number").asLong == 2L)
      // both versions resolve: the head via the hint, the older via
      // its own (self-contained) metadata file
      assert(IcebergExport.readExported(table).get.count() == 3L)
      val v0 = IcebergExport.readExported(table, asOfVersion = Some(0L)).get
      assert(v0.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    }
  }

  test("no export → None; unpartitioned tables round-trip") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val ds = new DeltaDataset(table)
      ds.write(Seq((1L, 1.5), (2L, 2.5)).toDF("k", "x"))
      assert(IcebergExport.readExported(table).isEmpty)
      IcebergExport.export(table)
      assertSameData(IcebergExport.readExported(table).get,
        DeltaReader.scan(table).get)
    }
  }
}
