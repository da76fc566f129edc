package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths, StandardOpenOption}

// checkpoint-row shapes (top-level so Spark can derive Encoders)
private[sources] case class CpAdd(path: String,
    partitionValues: Map[String, String], size: Long, dataChange: Boolean)
private[sources] case class CpRemove(path: String, deletionTimestamp: Long,
    dataChange: Boolean)
private[sources] case class CpFormat(provider: String)
private[sources] case class CpMeta(id: String, format: CpFormat,
    schemaString: String, partitionColumns: Seq[String],
    configuration: Map[String, String])
private[sources] case class CpProto(minReaderVersion: Int, minWriterVersion: Int)
private[sources] case class CpRow(add: Option[CpAdd], remove: Option[CpRemove],
    metaData: Option[CpMeta], protocol: Option[CpProto])
// v2-checkpoint manifest row shapes (PROTOCOL.md "V2 Spec Checkpoints")
private[sources] case class CpCheckpointMetadata(version: Long)
private[sources] case class CpSidecar(path: String, sizeInBytes: Long)
private[sources] case class CpRowV2(add: Option[CpAdd], remove: Option[CpRemove],
    metaData: Option[CpMeta], protocol: Option[CpProto],
    checkpointMetadata: Option[CpCheckpointMetadata],
    sidecar: Option[CpSidecar])

/** Read-only Delta protocol replay against hand-built `_delta_log`
  * fixtures (the public delta.io PROTOCOL.md format, authored here
  * byte-by-byte — no delta jars anywhere): two-commit add/remove
  * replay, URL-encoded paths, partition-literal injection, time
  * travel, checkpoint + vacuumed-tail replay, contiguity and
  * protocol-version guards. Reference surface:
  * /root/reference/polario/delta_dataset.py:41-62. */
class DeltaReaderSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("v", LongType), StructField("p", StringType)))

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def metaJson: String =
    s"""{"metaData":{"id":"fixture","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":"${esc(schema.json)}","partitionColumns":["p"],""" +
      s""""configuration":{},"createdTime":1700000000000}}"""

  private def protoJson(minReader: Int = 1): String =
    s"""{"protocol":{"minReaderVersion":$minReader,"minWriterVersion":2}}"""

  private def addJson(path: String, pv: (String, String)*): String =
    s"""{"add":{"path":"$path","partitionValues":{${pv.map { case (k, v) =>
      s""""$k":"$v"""" }.mkString(",")}},"size":100,""" +
      s""""modificationTime":1700000000000,"dataChange":true}}"""

  private def removeJson(path: String): String =
    s"""{"remove":{"path":"$path","deletionTimestamp":1700000001000,""" +
      s""""dataChange":true}}"""

  private def writeCommit(table: String, version: Long, lines: Seq[String]): Unit = {
    val dir = Paths.get(table, "_delta_log")
    Files.createDirectories(dir)
    Files.write(dir.resolve(f"$version%020d.json"),
      (lines.mkString("\n") + "\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  /** Land `df` as ONE parquet file at exactly `table/relPath`. */
  private def writeDataFile(df: DataFrame, table: String, relPath: String): Unit = {
    val tmp = Files.createTempDirectory("delta-frag")
    try {
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      val dest = Paths.get(table, relPath)
      Files.createDirectories(dest.getParent)
      Files.copy(part, dest)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
  }

  /** The standard two-commit fixture: v0 adds A(1,2)+B(10); v1 swaps
    * B's file for one holding (20,30). One A-side file name carries a
    * URL-encoded space. */
  private def buildTable(table: String): Unit = {
    writeDataFile(Seq(1L, 2L).toDF("v"), table, "p=A/f 1.parquet")
    writeDataFile(Seq(10L).toDF("v"), table, "p=B/f2.parquet")
    writeDataFile(Seq(20L, 30L).toDF("v"), table, "p=B/f3.parquet")
    writeCommit(table, 0L, Seq(protoJson(), metaJson,
      addJson("p=A/f%201.parquet", "p" -> "A"),
      addJson("p=B/f2.parquet", "p" -> "B")))
    writeCommit(table, 1L, Seq(
      removeJson("p=B/f2.parquet"),
      addJson("p=B/f3.parquet", "p" -> "B")))
  }

  test("two-commit replay: remove tombstones, latest adds win, encoded paths decode") {
    withTempDir { dir =>
      val table = s"$dir/t"
      buildTable(table)
      val snap = DeltaReader.snapshot(table).get
      assert(snap.version == 1L)
      assert(snap.partitionColumns == Seq("p"))
      assert(snap.schema == schema)
      assert(snap.files.map(f => f.path.split('/').last).sorted ==
        Seq("f 1.parquet", "f3.parquet"))
      assertSameData(DeltaReader.scan(table).get,
        Seq((1L, "A"), (2L, "A"), (20L, "B"), (30L, "B")).toDF("v", "p"))
    }
  }

  test("time travel reads the pre-swap state; future versions raise") {
    withTempDir { dir =>
      val table = s"$dir/t"
      buildTable(table)
      assertSameData(DeltaReader.scan(table, Some(0L)).get,
        Seq((1L, "A"), (2L, "A"), (10L, "B")).toDF("v", "p"))
      val e = intercept[IllegalArgumentException](
        DeltaReader.snapshotAt(table, Some(5L)))
      assert(e.getMessage.contains("log ends at 1"))
    }
  }

  test("readPartition mirrors the reference: key-set validation, empty partition = empty frame") {
    withTempDir { dir =>
      val table = s"$dir/t"
      buildTable(table)
      assertSameData(DeltaReader.readPartition(table, Map("p" -> "B")).get,
        Seq((20L, "B"), (30L, "B")).toDF("v", "p"))
      // absent partition: zero rows, right schema (pyarrow filter
      // semantics, delta_dataset.py:47-54)
      val empty = DeltaReader.readPartition(table, Map("p" -> "C")).get
      assert(empty.count() == 0 && empty.schema == schema)
      // wrong key set raises like the reference's ValueError
      val e = intercept[IllegalArgumentException](
        DeltaReader.readPartition(table, Map("q" -> "A")))
      assert(e.getMessage.contains("do not match partition columns"))
    }
  }

  test("missing table scans to None (TableNotFoundError contract)") {
    withTempDir { dir =>
      assert(DeltaReader.scan(s"$dir/nope").isEmpty)
      // a bare _delta_log with no commits is not a table either
      Files.createDirectories(Paths.get(s"$dir/empty/_delta_log"))
      assert(DeltaReader.scan(s"$dir/empty").isEmpty)
    }
  }

  test("checkpoint anchors replay after the JSON tail is vacuumed") {
    withTempDir { dir =>
      val table = s"$dir/t"
      buildTable(table)
      // hand-build the v1 checkpoint: protocol + metaData + live adds
      // + f2's tombstone, exactly what a writer checkpoints
      val rows = Seq(
        CpRow(None, None, None, Some(CpProto(1, 2))),
        CpRow(None, None, Some(CpMeta("fixture", CpFormat("parquet"),
          schema.json, Seq("p"), Map.empty)), None),
        CpRow(Some(CpAdd("p=A/f%201.parquet", Map("p" -> "A"), 100L, true)),
          None, None, None),
        CpRow(Some(CpAdd("p=B/f3.parquet", Map("p" -> "B"), 100L, true)),
          None, None, None),
        CpRow(None, Some(CpRemove("p=B/f2.parquet", 1700000001000L, true)),
          None, None))
      val tmp = Files.createTempDirectory("delta-cp")
      rows.toDS().toDF().coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      val logDir = Paths.get(table, "_delta_log")
      Files.copy(part, logDir.resolve(f"${1L}%020d.checkpoint.parquet"))
      org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
      // vacuum the JSON tail the checkpoint covers, then commit v2
      Files.delete(logDir.resolve(f"${0L}%020d.json"))
      Files.delete(logDir.resolve(f"${1L}%020d.json"))
      writeDataFile(Seq(5L).toDF("v"), table, "p=A/f4.parquet")
      writeCommit(table, 2L, Seq(addJson("p=A/f4.parquet", "p" -> "A")))
      assertSameData(DeltaReader.scan(table).get,
        Seq((1L, "A"), (2L, "A"), (5L, "A"), (20L, "B"), (30L, "B"))
          .toDF("v", "p"))
      // versions under the checkpoint are unreachable now — loud, not wrong
      val e = intercept[IllegalStateException](
        DeltaReader.snapshotAt(table, Some(0L)))
      assert(e.getMessage.contains("missing"))
    }
  }

  test("multi-part checkpoints replay as one snapshot") {
    withTempDir { dir =>
      val table = s"$dir/t"
      buildTable(table)
      // split the v1 checkpoint across TWO parts with the protocol's
      // <v>.checkpoint.<part>.<nparts>.parquet naming
      val part1 = Seq(
        CpRow(None, None, None, Some(CpProto(1, 2))),
        CpRow(None, None, Some(CpMeta("fixture", CpFormat("parquet"),
          schema.json, Seq("p"), Map.empty)), None),
        CpRow(Some(CpAdd("p=A/f%201.parquet", Map("p" -> "A"), 100L, true)),
          None, None, None))
      val part2 = Seq(
        CpRow(Some(CpAdd("p=B/f3.parquet", Map("p" -> "B"), 100L, true)),
          None, None, None),
        CpRow(None, Some(CpRemove("p=B/f2.parquet", 1700000001000L, true)),
          None, None))
      val logDir = Paths.get(table, "_delta_log")
      Seq((part1, 1), (part2, 2)).foreach { case (rows, i) =>
        val tmp = Files.createTempDirectory("delta-cpp")
        rows.toDS().toDF().coalesce(1).write.mode("overwrite")
          .parquet(tmp.toString)
        val part = Files.list(tmp)
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
        Files.copy(part, logDir.resolve(
          f"${1L}%020d.checkpoint.$i%010d.${2}%010d.parquet"))
        org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
      }
      Files.delete(logDir.resolve(f"${0L}%020d.json"))
      Files.delete(logDir.resolve(f"${1L}%020d.json"))
      writeDataFile(Seq(7L).toDF("v"), table, "p=A/f5.parquet")
      writeCommit(table, 2L, Seq(addJson("p=A/f5.parquet", "p" -> "A")))
      assertSameData(DeltaReader.scan(table).get,
        Seq((1L, "A"), (2L, "A"), (7L, "A"), (20L, "B"), (30L, "B"))
          .toDF("v", "p"))
    }
  }

  /** Land `df` as ONE parquet file at exactly `dest`. */
  private def writeOneParquet(df: DataFrame, dest: java.nio.file.Path): Unit = {
    val tmp = Files.createTempDirectory("delta-cp")
    try {
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp)
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.createDirectories(dest.getParent)
      Files.copy(part, dest)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
  }

  private val proto3v2cp: String =
    """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
      """"readerFeatures":["v2Checkpoint"],""" +
      """"writerFeatures":["v2Checkpoint"]}}"""

  test("v2 checkpoint: json manifest + two parquet sidecars anchor replay after vacuum") {
    withTempDir { dir =>
      val table = s"$dir/t"
      writeDataFile(Seq(1L, 2L).toDF("v"), table, "p=A/f 1.parquet")
      writeDataFile(Seq(10L).toDF("v"), table, "p=B/f2.parquet")
      writeDataFile(Seq(20L, 30L).toDF("v"), table, "p=B/f3.parquet")
      writeCommit(table, 0L, Seq(proto3v2cp, metaJson,
        addJson("p=A/f%201.parquet", "p" -> "A"),
        addJson("p=B/f2.parquet", "p" -> "B")))
      writeCommit(table, 1L, Seq(
        removeJson("p=B/f2.parquet"),
        addJson("p=B/f3.parquet", "p" -> "B")))
      val logDir = Paths.get(table, "_delta_log")
      // file actions split across TWO sidecars under _sidecars/
      writeOneParquet(Seq(
        CpRow(Some(CpAdd("p=A/f%201.parquet", Map("p" -> "A"), 100L, false)),
          None, None, None)).toDS().toDF(),
        logDir.resolve("_sidecars").resolve("sc-aaa.parquet"))
      writeOneParquet(Seq(
        CpRow(Some(CpAdd("p=B/f3.parquet", Map("p" -> "B"), 100L, false)),
          None, None, None),
        CpRow(None, Some(CpRemove("p=B/f2.parquet", 1700000001000L, false)),
          None, None)).toDS().toDF(),
        logDir.resolve("_sidecars").resolve("sc-bbb.parquet"))
      // UUID-named json manifest: checkpointMetadata + non-file
      // actions + the sidecar pointers
      Files.write(
        logDir.resolve(f"${1L}%020d.checkpoint.80a083e8-7026-4e79-81be-000000000001.json"),
        (Seq(
          """{"checkpointMetadata":{"version":1,"tags":{}}}""",
          proto3v2cp, metaJson,
          """{"sidecar":{"path":"sc-aaa.parquet","sizeInBytes":100,""" +
            """"modificationTime":1700000000000}}""",
          """{"sidecar":{"path":"sc-bbb.parquet","sizeInBytes":100,""" +
            """"modificationTime":1700000000000}}""")
          .mkString("\n") + "\n").getBytes("UTF-8"))
      // vacuum the covered tail: replay now NEEDS the v2 checkpoint
      Files.delete(logDir.resolve(f"${0L}%020d.json"))
      Files.delete(logDir.resolve(f"${1L}%020d.json"))
      writeDataFile(Seq(5L).toDF("v"), table, "p=A/f4.parquet")
      writeCommit(table, 2L, Seq(addJson("p=A/f4.parquet", "p" -> "A")))
      assertSameData(DeltaReader.scan(table).get,
        Seq((1L, "A"), (2L, "A"), (5L, "A"), (20L, "B"), (30L, "B"))
          .toDF("v", "p"))
      // time travel anchored at the checkpoint's own version
      assertSameData(DeltaReader.scan(table, Some(1L)).get,
        Seq((1L, "A"), (2L, "A"), (20L, "B"), (30L, "B")).toDF("v", "p"))
      // under the checkpoint: loud, never wrong
      val e = intercept[IllegalStateException](
        DeltaReader.snapshotAt(table, Some(0L)))
      assert(e.getMessage.contains("missing"))
    }
  }

  test("v2 parquet manifest with inline file actions (no sidecars) replays") {
    withTempDir { dir =>
      val table = s"$dir/t"
      buildTable(table)
      val logDir = Paths.get(table, "_delta_log")
      writeOneParquet(Seq(
        CpRowV2(None, None, None, None, Some(CpCheckpointMetadata(1L)), None),
        CpRowV2(None, None, None, Some(CpProto(1, 2)), None, None),
        CpRowV2(None, None, Some(CpMeta("fixture", CpFormat("parquet"),
          schema.json, Seq("p"), Map.empty)), None, None, None),
        CpRowV2(Some(CpAdd("p=A/f%201.parquet", Map("p" -> "A"), 100L, false)),
          None, None, None, None, None),
        CpRowV2(Some(CpAdd("p=B/f3.parquet", Map("p" -> "B"), 100L, false)),
          None, None, None, None, None),
        CpRowV2(None, Some(CpRemove("p=B/f2.parquet", 1700000001000L, false)),
          None, None, None, None)).toDS().toDF(),
        logDir.resolve(f"${1L}%020d.checkpoint.f1b2c3d4.parquet"))
      Files.delete(logDir.resolve(f"${0L}%020d.json"))
      Files.delete(logDir.resolve(f"${1L}%020d.json"))
      assertSameData(DeltaReader.scan(table).get,
        Seq((1L, "A"), (2L, "A"), (20L, "B"), (30L, "B")).toDF("v", "p"))
    }
  }

  test("a v2 manifest whose checkpointMetadata version mismatches its name raises") {
    withTempDir { dir =>
      val table = s"$dir/t"
      buildTable(table)
      val logDir = Paths.get(table, "_delta_log")
      Files.write(
        logDir.resolve(f"${1L}%020d.checkpoint.deadbeef.json"),
        (Seq("""{"checkpointMetadata":{"version":7,"tags":{}}}""",
          protoJson(), metaJson).mkString("\n") + "\n").getBytes("UTF-8"))
      Files.delete(logDir.resolve(f"${0L}%020d.json"))
      val e = intercept[IllegalArgumentException](DeltaReader.snapshot(table))
      assert(e.getMessage.contains("checkpointMetadata"))
    }
  }

  test("a v3 table with an undeclared feature set raises instead of mis-reading") {
    withTempDir { dir =>
      val table = s"$dir/t"
      writeDataFile(Seq(1L).toDF("v"), table, "p=A/f1.parquet")
      writeCommit(table, 0L, Seq(protoJson(minReader = 3), metaJson,
        addJson("p=A/f1.parquet", "p" -> "A")))
      val e = intercept[UnsupportedOperationException](
        DeltaReader.snapshot(table))
      assert(e.getMessage.contains("protocol 3"))
    }
  }

  // ---- column mapping (name mode) --------------------------------

  private def mappedSchema: StructType = {
    def m(id: Long, phys: String) = new MetadataBuilder()
      .putLong("delta.columnMapping.id", id)
      .putString("delta.columnMapping.physicalName", phys).build()
    StructType(Seq(
      StructField("v", LongType, nullable = true, m(1, "col-aaa111")),
      StructField("p", StringType, nullable = true, m(2, "col-ppp222"))))
  }

  private def mappedMetaJson: String =
    s"""{"metaData":{"id":"fixture","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":"${esc(mappedSchema.json)}","partitionColumns":["p"],""" +
      s""""configuration":{"delta.columnMapping.mode":"name",""" +
      s""""delta.columnMapping.maxColumnId":"2"},"createdTime":1700000000000}}"""

  private def buildMappedTable(table: String,
                               protoLine: String): Unit = {
    // parquet stores the PHYSICAL column name; partitionValues are
    // keyed by the partition column's physical name (the protocol's
    // writer requirement under column mapping)
    writeDataFile(Seq(1L, 2L).toDF("col-aaa111"), table, "pA/f1.parquet")
    writeDataFile(Seq(30L).toDF("col-aaa111"), table, "pB/f2.parquet")
    writeCommit(table, 0L, Seq(protoLine, mappedMetaJson,
      addJson("pA/f1.parquet", "col-ppp222" -> "A"),
      addJson("pB/f2.parquet", "col-ppp222" -> "B")))
  }

  test("column mapping name mode: physical parquet names read back logical") {
    withTempDir { dir =>
      val table = s"$dir/t"
      buildMappedTable(table, protoJson(minReader = 2))
      val out = DeltaReader.scan(table).get
      assert(out.columns.toSeq == Seq("v", "p"))
      assertSameData(out,
        Seq((1L, "A"), (2L, "A"), (30L, "B")).toDF("v", "p"))
      // targeted partition read takes LOGICAL keys
      assertSameData(DeltaReader.readPartition(table, Map("p" -> "B")).get,
        Seq((30L, "B")).toDF("v", "p"))
    }
  }

  test("reader v3 with only the columnMapping feature reads; others raise") {
    withTempDir { dir =>
      val table = s"$dir/t"
      buildMappedTable(table,
        """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
          """"readerFeatures":["columnMapping"],""" +
          """"writerFeatures":["columnMapping"]}}""")
      assert(DeltaReader.scan(table).get.count() == 3L)
    }
    withTempDir { dir =>
      val table = s"$dir/t"
      // deletionVectors is implemented now — declaring it (with no DV
      // on any file) must read fine alongside columnMapping
      buildMappedTable(table,
        """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
          """"readerFeatures":["columnMapping","deletionVectors"],""" +
          """"writerFeatures":["columnMapping","deletionVectors"]}}""")
      assert(DeltaReader.scan(table).get.count() == 3L)
    }
    withTempDir { dir =>
      val table = s"$dir/t"
      // v2Checkpoint is implemented now — declaring it (with no v2
      // checkpoint written yet) must read fine alongside columnMapping
      buildMappedTable(table,
        """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
          """"readerFeatures":["columnMapping","v2Checkpoint"],""" +
          """"writerFeatures":["columnMapping","v2Checkpoint"]}}""")
      assert(DeltaReader.scan(table).get.count() == 3L)
    }
    withTempDir { dir =>
      val table = s"$dir/t"
      buildMappedTable(table,
        """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
          """"readerFeatures":["columnMapping","futureMagicFeature"],""" +
          """"writerFeatures":["columnMapping","futureMagicFeature"]}}""")
      val e = intercept[UnsupportedOperationException](
        DeltaReader.snapshot(table))
      assert(e.getMessage.contains("futureMagicFeature"))
    }
  }

  test("column mapping id mode: parquet FIELD IDS resolve columns, stored names carry no meaning") {
    withTempDir { dir =>
      val table = s"$dir/t"
      // the data file's stored column name matches NEITHER the logical
      // nor the logged physical name — only its parquet field id (1)
      // points back at the schema. Name-based matching would fail;
      // id-mode matching must read the values.
      val fieldIdMd = new MetadataBuilder()
        .putLong("parquet.field.id", 1L).build()
      writeDataFile(
        Seq(1L, 2L).toDF("v")
          .select($"v".as("utterly-unrelated-name", fieldIdMd)),
        table, "pA/f1.parquet")
      writeDataFile(
        Seq(30L).toDF("v")
          .select($"v".as("another-alias", fieldIdMd)),
        table, "pB/f2.parquet")
      writeCommit(table, 0L, Seq(protoJson(minReader = 2),
        mappedMetaJson.replace("\"name\"", "\"id\""),
        addJson("pA/f1.parquet", "col-ppp222" -> "A"),
        addJson("pB/f2.parquet", "col-ppp222" -> "B")))
      val out = DeltaReader.scan(table).get
      assert(out.columns.toSeq == Seq("v", "p"))
      assertSameData(out,
        Seq((1L, "A"), (2L, "A"), (30L, "B")).toDF("v", "p"))
      // targeted partition read still takes LOGICAL keys
      assertSameData(DeltaReader.readPartition(table, Map("p" -> "B")).get,
        Seq((30L, "B")).toDF("v", "p"))
    }
  }

  test("id mode without delta.columnMapping.id metadata raises instead of mis-reading") {
    withTempDir { dir =>
      val table = s"$dir/t"
      // schema WITHOUT the per-field id metadata but mode=id
      val bare = StructType(Seq(
        StructField("v", LongType), StructField("p", StringType)))
      writeDataFile(Seq(1L).toDF("v"), table, "pA/f1.parquet")
      writeCommit(table, 0L, Seq(protoJson(minReader = 2),
        s"""{"metaData":{"id":"fixture","format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":"${esc(bare.json)}","partitionColumns":["p"],""" +
          s""""configuration":{"delta.columnMapping.mode":"id"},""" +
          s""""createdTime":1700000000000}}""",
        addJson("pA/f1.parquet", "p" -> "A")))
      val e = intercept[IllegalStateException](DeltaReader.snapshot(table))
      assert(e.getMessage.contains("delta.columnMapping.id"))
    }
  }

  test("partition literals take the SCHEMA's type (long partition column)") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val sch = StructType(Seq(
        StructField("v", LongType), StructField("k", LongType)))
      writeDataFile(Seq(7L).toDF("v"), table, "k=42/f1.parquet")
      writeCommit(table, 0L, Seq(protoJson(),
        s"""{"metaData":{"id":"fx","format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":"${esc(sch.json)}","partitionColumns":["k"],""" +
          s""""configuration":{},"createdTime":1700000000000}}""",
        addJson("k=42/f1.parquet", "k" -> "42")))
      val out = DeltaReader.scan(table).get
      assert(out.schema == sch)
      assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        Seq((7L, 42L)))
    }
  }

  test("small-log fast replay is field-identical to the distributed replay at every version") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val ds = new DeltaDataset(table, Seq("p"))
      // a history exercising every state field: partitioned writes
      // (stats + partition values), append, DV delete (descriptor +
      // protocol upgrade), overwrite (tombstones), restore (re-adds),
      // and a SetTransaction-keyed write (txns)
      ds.write((1L to 6L).map(i => (i, if (i <= 3) "A" else "B"))
        .toDF("v", "p").coalesce(1))                       // v0
      ds.append(Seq((7L, "A")).toDF("v", "p"))             // v1
      ds.delete($"v" % 2 === 0L)                           // v2
      ds.write(Seq((99L, "C")).toDF("v", "p"))             // v3
      ds.restore(2L)                                       // v4
      DeltaWriter.write(table, Seq((50L, "A")).toDF("v", "p"),
        Seq("p"), overwrite = false, txn = Some(("parity-app", 17L)))  // v5
      (0L to 5L).foreach { v =>
        val fast = DeltaReader.snapshotAt(table, Some(v)).get
        val dist = DeltaReader.snapshotAtImpl(table, Some(v),
          forceDistributed = true).get
        assert(fast == dist, s"fast vs distributed replay diverged at v$v:" +
          s"\nfast: $fast\ndist: $dist")
        assert(fast.files.nonEmpty || v > 10, s"v$v snapshot empty?")
      }
      // both paths scan to the same rows at the head
      assertSameData(
        DeltaReader.assembleSnapshot(DeltaReader.snapshotAt(table, None).get),
        DeltaReader.assembleSnapshot(DeltaReader.snapshotAtImpl(table, None,
          forceDistributed = true).get))
    }
  }
}
