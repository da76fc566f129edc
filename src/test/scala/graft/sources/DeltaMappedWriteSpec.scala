package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths, StandardOpenOption}

/** WRITES to column-mapped Delta tables (modes `name` and `id`):
  * landed parquet stores PHYSICAL column names (plus field ids in id
  * mode), partition directories and the log's `partitionValues` key
  * by physical name, logical reads round-trip every verb, and the
  * unsupported edges (nested fields, evolution) refuse loudly. */
class DeltaMappedWriteSpec extends SparkSpec {
  import spark.implicits._

  implicit private val s: org.apache.spark.sql.SparkSession = spark

  private def fieldMeta(id: Long, phys: String) = new MetadataBuilder()
    .putLong("delta.columnMapping.id", id)
    .putString("delta.columnMapping.physicalName", phys).build()

  private def mappedSchema: StructType = StructType(Seq(
    StructField("v", LongType, nullable = true, fieldMeta(1, "col-aaa111")),
    StructField("p", StringType, nullable = true, fieldMeta(2, "col-ppp222"))))

  private def esc(x: String): String =
    x.replace("\\", "\\\\").replace("\"", "\\\"")

  /** A name-mode mapped table with two physical-named files. */
  private def buildMapped(table: String, mode: String = "name"): Unit = {
    Seq(1L, 2L).toDF("col-aaa111").coalesce(1).write
      .parquet(s"$table/stage1")
    Seq(30L).toDF("col-aaa111").coalesce(1).write.parquet(s"$table/stage2")
    def moveOne(stage: String, dest: String): Unit = {
      val dir = new java.io.File(s"$table/$stage")
      val part = dir.listFiles().filter(_.getName.endsWith(".parquet")).head
      val d = new java.io.File(s"$table/$dest")
      d.getParentFile.mkdirs()
      assert(part.renameTo(d))
    }
    moveOne("stage1", "col-ppp222=A/f1.parquet")
    moveOne("stage2", "col-ppp222=B/f2.parquet")
    val meta =
      s"""{"metaData":{"id":"fixture","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"${esc(mappedSchema.json)}","partitionColumns":["p"],""" +
        s""""configuration":{"delta.columnMapping.mode":"$mode",""" +
        s""""delta.columnMapping.maxColumnId":"2"},"createdTime":1700000000000}}"""
    def add(p: String, pv: String): String =
      s"""{"add":{"path":"$p","partitionValues":{"col-ppp222":"$pv"},""" +
        """"size":100,"modificationTime":1700000000000,"dataChange":true}}"""
    // canonical path encoding (no %3D for '='): replay tombstones by
    // exact path string, the same contract delta-spark replays with
    val lines = Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      meta, add("col-ppp222=A/f1.parquet", "A"),
      add("col-ppp222=B/f2.parquet", "B"))
    Files.createDirectories(Paths.get(s"$table/_delta_log"))
    Files.write(Paths.get(s"$table/_delta_log/%020d.json".format(0)),
      (lines.mkString("\n") + "\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE_NEW)
  }

  private def physicalColumnsOf(file: String): Seq[String] =
    spark.read.parquet(file).columns.toSeq

  test("append to a name-mode table lands physical names and physical partitionValues") {
    withTempDir { dir =>
      val table = s"$dir/t"
      buildMapped(table)
      val ds = new DeltaDataset(table, Seq("p"))
      ds.append(Seq((40L, "B"), (50L, "C")).toDF("v", "p"))
      val snap = DeltaReader.snapshot(table).get
      val mine = snap.files.filterNot(_.path.matches(".*f[12]\\.parquet"))
      assert(mine.nonEmpty)
      mine.foreach { f =>
        assert(f.partitionValues.keySet == Set("col-ppp222"),
          s"partitionValues must key by physical name, got ${f.partitionValues}")
        assert(f.path.contains("col-ppp222="),
          s"directories must use the physical name, got ${f.path}")
        assert(physicalColumnsOf(f.path) == Seq("col-aaa111"),
          "the landed parquet must store the physical column name")
      }
      assertSameData(DeltaReader.scan(table).get,
        Seq((1L, "A"), (2L, "A"), (30L, "B"), (40L, "B"), (50L, "C"))
          .toDF("v", "p"))
    }
  }

  test("delete, update, merge and zorder round-trip on a mapped table") {
    withTempDir { dir =>
      val table = s"$dir/t"
      buildMapped(table)
      val ds = new DeltaDataset(table, Seq("p"))
      ds.delete(col("v") === 1L)
      assertSameData(DeltaReader.scan(table).get,
        Seq((2L, "A"), (30L, "B")).toDF("v", "p"))
      ds.update(col("v") === 2L, Map("v" -> lit(22L)))
      assertSameData(DeltaReader.scan(table).get,
        Seq((22L, "A"), (30L, "B")).toDF("v", "p"))
      ds.merge(Seq((30L, "B"), (77L, "C")).toDF("v", "p"), Seq("v"))
      assertSameData(DeltaReader.scan(table).get,
        Seq((22L, "A"), (30L, "B"), (77L, "C")).toDF("v", "p"))
      // the curve rewrite keeps logical rows and physical layout
      ds.zorder(Seq("v"), targetFileBytes = 8L * 1024)
      val snap = DeltaReader.snapshot(table).get
      assert(snap.files.forall(_.partitionValues.keySet == Set("col-ppp222")))
      snap.files.foreach(f =>
        assert(physicalColumnsOf(f.path) == Seq("col-aaa111")))
      assertSameData(DeltaReader.scan(table).get,
        Seq((22L, "A"), (30L, "B"), (77L, "C")).toDF("v", "p"))
    }
  }

  test("id-mode append stamps parquet field ids into the landed files") {
    withTempDir { dir =>
      val table = s"$dir/t"
      buildMapped(table, mode = "id")
      val ds = new DeltaDataset(table, Seq("p"))
      ds.append(Seq((60L, "D")).toDF("v", "p"))
      val mine = DeltaReader.snapshot(table).get.files
        .filterNot(_.path.matches(".*f[12]\\.parquet"))
      assert(mine.nonEmpty)
      val conf = spark.sessionState.newHadoopConf()
      mine.foreach { f =>
        val footer = org.apache.parquet.hadoop.ParquetFileReader
          .open(org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new Path(f.path), conf))
        try {
          val mt = footer.getFooter.getFileMetaData.getSchema
          val dataField = mt.getFields.get(0)
          assert(dataField.getName == "col-aaa111")
          assert(dataField.getId != null && dataField.getId.intValue == 1,
            s"id-mode files must carry the column-mapping id, got ${dataField.getId}")
        } finally footer.close()
      }
      assertSameData(DeltaReader.scan(table).get.where(col("p") === "D"),
        Seq((60L, "D")).toDF("v", "p"))
    }
  }

  test("nested fields under mapping write physical inner names and round-trip") {
    withTempDir { dir =>
      val table = s"$dir/t"
      // nested: a struct field with its own physical names
      val inner = StructType(Seq(
        StructField("x", LongType, nullable = true, fieldMeta(3, "col-xxx"))))
      val nested = StructType(Seq(
        StructField("v", LongType, nullable = true, fieldMeta(1, "col-aaa")),
        StructField("s", inner, nullable = true, fieldMeta(2, "col-sss"))))
      val meta =
        s"""{"metaData":{"id":"fixture","format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":"${esc(nested.json)}","partitionColumns":[],""" +
          s""""configuration":{"delta.columnMapping.mode":"name",""" +
          s""""delta.columnMapping.maxColumnId":"3"},"createdTime":1700000000000}}"""
      Files.createDirectories(Paths.get(s"$table/_delta_log"))
      Files.write(Paths.get(s"$table/_delta_log/%020d.json".format(0)),
        (Seq("""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
          meta).mkString("\n") + "\n").getBytes("UTF-8"),
        StandardOpenOption.CREATE_NEW)
      val ds = new DeltaDataset(table)
      ds.append(Seq((1L, 2L), (3L, 4L)).toDF("v", "x").select(col("v"),
        struct(col("x")).as("s")))                                    // v1
      // the landed parquet stores PHYSICAL names at BOTH levels
      val f = DeltaReader.snapshot(table).get.files.head.path
      val landed = spark.read.parquet(f)
      assert(landed.columns.toSeq == Seq("col-aaa", "col-sss"))
      assert(landed.schema("col-sss").dataType
        .asInstanceOf[StructType].fieldNames.toSeq == Seq("col-xxx"),
        "inner struct fields must store their physical names")
      // logical reads round-trip, including the inner field
      val out = DeltaReader.scan(table).get
        .select(col("v"), col("s.x").as("x")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out == Map(1L -> 2L, 3L -> 4L))
      // DV delete and UPDATE work on the nested mapped table too
      ds.delete(col("s.x") === 4L)                                    // v2
      assert(DeltaReader.scan(table).get.count() == 1L)
      ds.update(col("v") === 1L,
        Map("s" -> struct(lit(20L).as("x"))))                         // v3
      assert(DeltaReader.scan(table).get.select("s.x").head().getLong(0) == 20L)

      // adding a NESTED column by EVOLUTION allocates inner physical
      // names/ids recursively (the last mapped-evolution refusal,
      // removed round 14)
      val flat = s"$dir/flat"
      buildMapped(flat)
      val dsF = new DeltaDataset(flat, Seq("p"))
      dsF.append(
        Seq((90L, "A", 7L)).toDF("v", "p", "x")
          .select(col("v"), col("p"), struct(col("x")).as("extra")),
        mergeSchema = true)
      val snapF = DeltaReader.snapshot(flat).get
      val ef = snapF.schema("extra")
      assert(ef.metadata.getString("delta.columnMapping.physicalName")
        .startsWith("col-"),
        "evolved nested column must carry an allocated physical name")
      val innerX = ef.dataType.asInstanceOf[StructType]("x")
      assert(innerX.metadata.contains("delta.columnMapping.physicalName") &&
        innerX.metadata.getString("delta.columnMapping.physicalName")
          .startsWith("col-") &&
        innerX.metadata.contains("delta.columnMapping.id"),
        "INNER struct fields must be stamped with physical names + ids")
      // pre-order allocation above the old watermark: extra=3, x=4
      assert(ef.metadata.getLong("delta.columnMapping.id") == 3L &&
        innerX.metadata.getLong("delta.columnMapping.id") == 4L)
      assert(snapF.configuration("delta.columnMapping.maxColumnId") == "4",
        "maxColumnId must advance past every NESTED id too")
      // the landed parquet stores PHYSICAL names at BOTH levels
      val newF = snapF.files.filterNot(_.path.matches(".*f[12]\\.parquet"))
        .head.path
      val landedF = spark.read.parquet(newF)
      val physTop = ef.metadata.getString("delta.columnMapping.physicalName")
      assert(landedF.columns.contains(physTop))
      assert(landedF.schema(physTop).dataType.asInstanceOf[StructType]
        .fieldNames.toSeq == Seq(innerX.metadata
          .getString("delta.columnMapping.physicalName")),
        "inner fields must land under their physical names")
      // logical reads: the new row round-trips, old rows null-fill
      val outF = DeltaReader.scan(flat).get
        .select(col("v"), col("extra.x").as("x")).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(outF(90L).contains(7L))
      assert(outF(1L).isEmpty && outF(30L).isEmpty,
        "pre-evolution rows null-fill the nested column")
      // a FURTHER append with the evolved schema round-trips too
      dsF.append(Seq((91L, "B", 8L)).toDF("v", "p", "x")
        .select(col("v"), col("p"), struct(col("x")).as("extra")))
      assert(DeltaReader.scan(flat).get.where(col("v") === 91L)
        .select("extra.x").head().getLong(0) == 8L)
    }
  }

  test("schema evolution on a mapped table allocates physical names and ids") {
    withTempDir { dir =>
      val table = s"$dir/t"
      buildMapped(table)
      val ds = new DeltaDataset(table, Seq("p"))
      // add a top-level column: gets col-<uuid> + id 3, maxColumnId -> 3
      ds.append(Seq((40L, "B", 9L)).toDF("v", "p", "extra"),
        mergeSchema = true)
      val snap = DeltaReader.snapshot(table).get
      val f = snap.schema("extra")
      assert(f.metadata.contains("delta.columnMapping.physicalName") &&
        f.metadata.getString("delta.columnMapping.physicalName")
          .startsWith("col-"),
        "evolved column must carry an allocated physical name")
      assert(f.metadata.getLong("delta.columnMapping.id") == 3L)
      assert(snap.configuration("delta.columnMapping.maxColumnId") == "3")
      // the landed parquet stores the PHYSICAL name
      val phys = f.metadata.getString("delta.columnMapping.physicalName")
      val newFile = snap.files.filterNot(_.path.matches(".*f[12]\\.parquet"))
        .head.path
      assert(physicalColumnsOf(newFile).contains(phys),
        s"landed file must store '$phys', has ${physicalColumnsOf(newFile)}")
      // logical reads: old rows null-fill, the new row carries 9
      val out = DeltaReader.scan(table).get
        .select("v", "extra").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(out(40L).contains(9L))
      assert(out(1L).isEmpty && out(30L).isEmpty,
        "pre-evolution rows null-fill the added column")
      // a second evolution continues the id sequence
      ds.append(Seq((50L, "C", 1L, 2L)).toDF("v", "p", "extra", "more"),
        mergeSchema = true)
      val snap2 = DeltaReader.snapshot(table).get
      assert(snap2.schema("more").metadata
        .getLong("delta.columnMapping.id") == 4L)
      assert(snap2.configuration("delta.columnMapping.maxColumnId") == "4")
      assert(DeltaReader.scan(table).get.count() == 5L)
    }
  }
}
