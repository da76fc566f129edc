package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Row tracking (`rowTracking` writer feature + `delta.rowTracking`
  * domain metadata): fresh adds carry `baseRowId` /
  * `defaultRowCommitVersion` above the domain's high watermark, DV
  * re-adds preserve their file's assignment, and rewrites on ENABLED
  * tables carry every surviving row's id through the materialized
  * columns — so `_row_id` is a stable identity across append, delete,
  * compact and zorder. */
class DeltaRowTrackingSpec extends SparkSpec {
  import spark.implicits._

  implicit private val s: org.apache.spark.sql.SparkSession = spark

  private def esc(x: String): String =
    x.replace("\\", "\\\\").replace("\"", "\\\"")

  /** A foreign row-tracking table: one seed file of `n` rows with
    * baseRowId 0, watermark n-1, delta.enableRowTracking on. */
  private def buildTracked(table: String, n: Int,
                           extraConf: Map[String, String] = Map.empty): Unit = {
    val frag = Files.createTempDirectory("rt-frag")
    (0L until n.toLong).toDF("v").coalesce(1).write
      .mode("overwrite").parquet(frag.toString)
    val part = Files.list(frag)
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.createDirectories(Paths.get(table))
    Files.copy(part, Paths.get(table, "f0.parquet"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    val conf = (Map("delta.enableRowTracking" -> "true") ++ extraConf)
      .map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
    val lines = Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
        """"writerFeatures":["rowTracking","domainMetadata"]}}""",
      s"""{"metaData":{"id":"rt","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"${esc(schema.json)}","partitionColumns":[],""" +
        s""""configuration":{$conf},"createdTime":1700000000000}}""",
      s"""{"add":{"path":"f0.parquet","partitionValues":{},""" +
        s""""size":${Paths.get(table, "f0.parquet").toFile.length},""" +
        s""""modificationTime":1700000000000,"dataChange":true,""" +
        s""""baseRowId":0,"defaultRowCommitVersion":0}}""",
      s"""{"domainMetadata":{"domain":"delta.rowTracking",""" +
        s""""configuration":"{\\"rowIdHighWaterMark\\":${n - 1}}",""" +
        """"removed":false}}""")
    val logDir = Paths.get(table, "_delta_log")
    Files.createDirectories(logDir)
    Files.write(logDir.resolve("%020d.json".format(0)),
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
  }

  private def rowIds(table: String): Map[Long, Long] =
    DeltaReader.scanWithRowIds(table).get
      .select(col("v"), col("_row_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("appends allocate fresh base row ids above the domain watermark") {
    withTempDir { dir =>
      val table = s"$dir/t"
      buildTracked(table, 3) // ids 0..2, hwm 2
      val ds = new DeltaDataset(table)
      // a rowTracking table no longer refuses (the round-12 residual)
      ds.append(Seq(100L, 101L).toDF("v"))                            // v1
      val snap = DeltaReader.snapshot(table).get
      val mine = snap.files.filterNot(_.path.endsWith("f0.parquet"))
      assert(mine.nonEmpty && mine.forall(f => f.baseRowId.isDefined &&
        f.defaultRowCommitVersion.contains(1L)),
        "new adds must carry baseRowId + defaultRowCommitVersion")
      assert(mine.flatMap(_.baseRowId).min == 3L,
        "allocation starts above the recorded watermark")
      assert(DeltaWriter.rowIdHighWaterMark(snap) >= 4L,
        "the delta.rowTracking domain must advance with the commit")
      val ids = rowIds(table)
      assert(ids.size == 5 && ids.values.toSeq.distinct.size == 5,
        "row ids must be unique across seed and appended rows")
      assert(ids(0L) == 0L && ids(2L) == 2L,
        "seed rows read ids from baseRowId + row_index")
      // a second append keeps allocating above the new watermark
      ds.append(Seq(200L).toDF("v"))                                  // v2
      val ids2 = rowIds(table)
      assert(ids2.size == 6 && ids2.values.toSeq.distinct.size == 6)
      assert(ids2(200L) > ids.values.max)
    }
  }

  test("DV delete preserves surviving row ids; compact carries them via materialized columns") {
    withTempDir { dir =>
      val table = s"$dir/t"
      buildTracked(table, 4) // ids 0..3
      val ds = new DeltaDataset(table)
      ds.append(Seq(100L, 101L, 102L).toDF("v"))                      // v1
      val before = rowIds(table)
      ds.delete(col("v") === 1L || col("v") === 101L)                 // v2
      val after = rowIds(table)
      assert(after == before -- Seq(1L, 101L),
        "surviving rows keep their ids through a DV delete")
      // compact the small files: rows MOVE files, so preservation
      // must ride the materialized columns
      val vc = ds.compact(targetFileBytes = 1024L * 1024, minFiles = 2)
      assert(vc > 2L, "compact must commit")
      val snap = DeltaReader.snapshot(table).get
      val matId = snap.configuration
        .get("delta.rowTracking.materializedRowIdColumnName")
      assert(matId.isDefined,
        "the rewrite commit must record the materialized column names")
      val compacted = rowIds(table)
      assert(compacted == after,
        s"row ids must survive compaction: $compacted vs $after")
      // the landed parquet physically stores the materialized column
      val newFile = snap.files.filterNot(_.path.endsWith("f0.parquet")).head
      assert(spark.read.parquet(newFile.path).columns.contains(matId.get))
      // and the rewritten adds still carry fresh baseRowId metadata
      assert(snap.files.forall(_.baseRowId.isDefined))
      // zorder after compact: ids still stable
      ds.zorder(Seq("v"), nBuckets = 16)
      assert(rowIds(table) == after, "ids survive a zorder rewrite too")
    }
  }

  test("UPDATE and MERGE preserve row ids on enabled tables; RESTORE carries them") {
    withTempDir { dir =>
      val table = s"$dir/t"
      buildTracked(table, 4) // values 0..3, ids 0..3
      val ds = new DeltaDataset(table)
      val seed = rowIds(table)
      // UPDATE rewrites the row into a NEW file — identity must ride
      // the materialized column, not the new file's fresh baseRowId
      ds.update(col("v") === 2L, Map("v" -> lit(200L)))               // v1
      val afterUpd = rowIds(table)
      assert(afterUpd(200L) == seed(2L),
        "an UPDATEd row keeps its row id across the rewrite")
      assert(afterUpd - 200L == seed - 2L, "untouched rows keep theirs")
      // MERGE: matched key replaced (id preserved), new key inserted
      // (fresh id above the watermark)
      ds.merge(Seq(0L, 500L).toDF("v"), Seq("v"))                     // v2
      val afterMrg = rowIds(table)
      assert(afterMrg(0L) == seed(0L),
        "a MERGE-replaced row keeps its row id")
      assert(afterMrg(500L) > afterUpd.values.max,
        "a MERGE-inserted row allocates a fresh id above the watermark")
      assert(afterMrg.values.toSeq.distinct.size == afterMrg.size)
      // the merge commit recorded the materialized names it used
      assert(DeltaReader.snapshot(table).get.configuration
        .contains("delta.rowTracking.materializedRowIdColumnName"))
      // RESTORE re-adds files: the re-adds must carry the original
      // baseRowId/defaultRowCommitVersion, not drop them
      ds.restore(0L)                                                  // v3
      val snap = DeltaReader.snapshot(table).get
      assert(snap.files.forall(_.baseRowId.isDefined),
        "restored adds must keep their row-id assignment")
      assert(rowIds(table) == seed,
        "a restored version reads its original row ids")
    }
  }

  private def rowVersions(table: String): Map[Long, Long] =
    DeltaReader.scanWithRowIds(table).get
      .select(col("v"), col("_row_commit_version")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("MODIFIED rows take the new commit's row commit version; COPIED rows keep theirs") {
    withTempDir { dir =>
      val table = s"$dir/t"
      buildTracked(table, 4) // values 0..3 at commit version 0
      val ds = new DeltaDataset(table)
      // UPDATE is a modification: per the protocol the updated row's
      // commit version is the UPDATE commit itself (the materialized
      // column stays NULL; the new add's defaultRowCommitVersion
      // resolves it) — NOT the stale version it was last written at
      ds.update(col("v") === 2L, Map("v" -> lit(200L)))               // v1
      val afterUpd = rowVersions(table)
      assert(afterUpd(200L) == 1L,
        s"an UPDATEd row's commit version must be the UPDATE commit: $afterUpd")
      assert(Seq(0L, 1L, 3L).forall(afterUpd(_) == 0L),
        s"untouched rows keep their original commit version: $afterUpd")
      // MERGE-updated row: same rule; MERGE-inserted row: this commit
      ds.merge(Seq(0L, 500L).toDF("v"), Seq("v"))                     // v2
      val afterMrg = rowVersions(table)
      assert(afterMrg(0L) == 2L && afterMrg(500L) == 2L,
        s"MERGE-modified and -inserted rows carry the MERGE commit: $afterMrg")
      assert(afterMrg(200L) == 1L && afterMrg(1L) == 0L,
        s"rows the MERGE did not touch keep their versions: $afterMrg")
      // a dataChange=false rewrite COPIES rows: versions must survive
      // (this is the case the materialized column exists for)
      val vc = ds.compact(targetFileBytes = 1024L * 1024, minFiles = 2)
      assert(vc > 2L, "compact must commit")
      assert(rowVersions(table) == afterMrg,
        "copied rows keep their commit versions through a rewrite")
    }
  }

  test("row ids and the domain watermark survive checkpoint-anchored replay") {
    withTempDir { dir =>
      val table = s"$dir/t"
      buildTracked(table, 2,
        extraConf = Map("delta.checkpointInterval" -> "2"))
      val ds = new DeltaDataset(table)
      (0 until 5).foreach(i => ds.append(Seq(100L + i).toDF("v")))
      val logDir = Paths.get(table, "_delta_log")
      assert(Files.list(logDir).toArray.map(_.toString)
        .exists(_.endsWith(".checkpoint.parquet")),
        "fixture must actually cross a checkpoint")
      val snap = DeltaReader.snapshot(table).get
      assert(DeltaWriter.rowIdHighWaterMark(snap) >= 6L,
        "the domain watermark must survive the checkpoint")
      assert(snap.files.forall(_.baseRowId.isDefined),
        "add-level row-id metadata must survive the checkpoint")
      val ids = rowIds(table)
      assert(ids.size == 7 && ids.values.toSeq.distinct.size == 7)
    }
  }
}
