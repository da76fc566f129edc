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
