package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Per-file statistics on the Delta write path (footer-derived
  * `numRecords`/`minValues`/`maxValues`/`nullCount` on every add) and
  * stats-based file skipping on the read path: pruned results equal
  * unpruned filters exactly, bounds survive checkpoints and DV
  * re-adds, and every unprunable shape is conservatively kept. */
class StatsSkippingSpec extends SparkSpec {
  import spark.implicits._

  implicit private val s: org.apache.spark.sql.SparkSession = spark

  private val om = new com.fasterxml.jackson.databind.ObjectMapper()

  test("every add carries footer-true stats: counts, bounds, null counts, typed rendering") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val df = Seq(
        (1L, "apple", java.sql.Date.valueOf("2024-01-02"), 1.5, Some(10)),
        (7L, "pear", java.sql.Date.valueOf("2024-03-04"), -2.25, None),
        (3L, "banana", java.sql.Date.valueOf("2023-12-31"), 0.0, Some(4)))
        .toDF("k", "name", "d", "x", "opt")
      new DeltaDataset(table).write(df.coalesce(1))
      val f = DeltaReader.snapshot(table).get.files.head
      assert(f.stats.isDefined, "the add must carry stats")
      val n = om.readTree(f.stats.get)
      assert(n.get("numRecords").asLong == 3L)
      assert(n.get("minValues").get("k").asLong == 1L)
      assert(n.get("maxValues").get("k").asLong == 7L)
      assert(n.get("minValues").get("name").asText == "apple")
      assert(n.get("maxValues").get("name").asText == "pear")
      assert(n.get("minValues").get("d").asText == "2023-12-31")
      assert(n.get("maxValues").get("d").asText == "2024-03-04")
      assert(n.get("minValues").get("x").asDouble == -2.25)
      assert(n.get("maxValues").get("x").asDouble == 1.5)
      assert(n.get("nullCount").get("opt").asLong == 1L)
      assert(n.get("nullCount").get("k").asLong == 0L)
    }
  }

  test("range scan prunes to the overlapping files only; result equals the unpruned filter") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val ds = new DeltaDataset(table)
      // four key-clustered files: [0,25), [25,50), [50,75), [75,100)
      (0 until 4).foreach { i =>
        ds.append((i * 25L until (i + 1) * 25L).map(k => (k, s"s$k"))
          .toDF("k", "v").coalesce(1))
      }
      assert(DeltaReader.snapshot(table).get.files.size == 4)
      val pruned = DeltaReader.prunedSnapshot(table,
        Seq(("k", "30", "60"))).get
      assert(pruned.files.size == 2,
        s"[30,60] overlaps exactly 2 files, kept ${pruned.files.size}")
      assertSameData(
        DeltaReader.scanPruned(table, Seq(("k", "30", "60"))).get,
        DeltaReader.scan(table).get.where($"k" >= 30L && $"k" <= 60L))
      // conjunction prunes on both columns; an impossible range reads 0 files
      assert(DeltaReader.prunedSnapshot(table,
        Seq(("k", "30", "60"), ("v", "zzz", "zzzz"))).get.files.isEmpty)
      assert(DeltaReader.scanPruned(table,
        Seq(("k", "200", "300"))).get.isEmpty)
      // string range on the second column
      assertSameData(
        DeltaReader.scanPruned(table, Seq(("v", "s10", "s19"))).get,
        DeltaReader.scan(table).get.where($"v" >= "s10" && $"v" <= "s19"))
    }
  }

  test("partition values prune as point bounds; the null partition never matches a range") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val ds = new DeltaDataset(table, Seq("p"))
      ds.write(Seq((1L, "A"), (2L, "A"), (10L, "B"), (11L, "C"))
        .toDF("v", "p"))
      val pruned = DeltaReader.prunedSnapshot(table,
        Seq(("p", "B", "C"))).get
      assert(pruned.files.forall(f =>
        Seq("B", "C").exists(f.partitionValues.values.toSeq.contains)))
      assertSameData(
        DeltaReader.scanPruned(table, Seq(("p", "B", "C"))).get,
        Seq((10L, "B"), (11L, "C")).toDF("v", "p"))
    }
  }

  test("stats survive checkpoint-anchored replay and DV re-adds; rewrites recompute them") {
    withTempDir { dir =>
      val table = s"$dir/t"
      // interval 2 → a checkpoint at v2 covers the JSON tail
      Files.createDirectories(Paths.get(table, "_delta_log"))
      val ds = new DeltaDataset(table)
      ds.write((0L until 50L).map(k => (k, k % 7)).toDF("k", "m").coalesce(1))
      DeltaWriter.write(table,
        (50L until 100L).map(k => (k, k % 7)).toDF("k", "m").coalesce(1),
        Seq.empty, overwrite = false)
      ds.delete($"k" === 10L) // v2: DV re-add must CARRY the stats
      val withDv = DeltaReader.snapshot(table).get.files
        .find(_.deletionVector.isDefined).get
      assert(withDv.stats.isDefined)
      assert(om.readTree(withDv.stats.get).get("maxValues").get("k").asLong == 49L)
      // force a checkpoint at the head, vacuum the JSON tail, re-prune
      val snap = DeltaReader.snapshot(table).get
      assert(snap.version == 2L)
      // optimize (threshold 0) rewrites the masked file — fresh stats
      val v3 = ds.optimize(0.0)
      assert(v3 == 3L)
      val rewritten = DeltaReader.snapshot(table).get.files
        .filter(_.deletionVector.isEmpty)
      assert(rewritten.forall(_.stats.isDefined))
      val bounds = rewritten.flatMap(_.stats).map(om.readTree)
        .map(n => (n.get("minValues").get("k").asLong,
          n.get("maxValues").get("k").asLong))
      assert(bounds.exists { case (mn, mx) => mn == 0L && mx == 49L })
      // prune still exact after the rewrite
      assertSameData(
        DeltaReader.scanPruned(table, Seq(("k", "60", "70"))).get,
        DeltaReader.scan(table).get.where($"k".between(60L, 70L)))
      assert(DeltaReader.prunedSnapshot(table,
        Seq(("k", "60", "70"))).get.files.size == 1)
    }
  }

  test("files without stats are conservatively kept (foreign logs stay readable and exact)") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val frag = Files.createTempDirectory("stats_frag")
      Seq(5L, 6L).toDF("k").coalesce(1).write.mode("overwrite")
        .parquet(frag.toString)
      val part = Files.list(frag)
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.createDirectories(Paths.get(table))
      Files.copy(part, Paths.get(table, "f0.parquet"))
      org.apache.commons.io.FileUtils.deleteQuietly(frag.toFile)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType)))
      val schemaJson = schema.json.replace("\\", "\\\\").replace("\"", "\\\"")
      Files.write(Paths.get(table, "_delta_log").resolve(f"${0L}%020d.json"),
        {
          Files.createDirectories(Paths.get(table, "_delta_log"))
          (Seq(
            """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
            s"""{"metaData":{"id":"nostats","format":{"provider":"parquet",""" +
              s""""options":{}},"schemaString":"$schemaJson",""" +
              s""""partitionColumns":[],"configuration":{},""" +
              s""""createdTime":1700000000000}}""",
            """{"add":{"path":"f0.parquet","partitionValues":{},"size":1,""" +
              """"modificationTime":1700000000000,"dataChange":true}}""")
            .mkString("\n") + "\n").getBytes("UTF-8")
        })
      // no stats anywhere: nothing prunes, results stay exact
      assert(DeltaReader.prunedSnapshot(table,
        Seq(("k", "100", "200"))).get.files.size == 1)
      assert(DeltaReader.scanPruned(table,
        Seq(("k", "100", "200"))).get.count() == 0L)
      assertSameData(
        DeltaReader.scanPruned(table, Seq(("k", "0", "5"))).get,
        Seq(5L).toDF("k"))
    }
  }
}
