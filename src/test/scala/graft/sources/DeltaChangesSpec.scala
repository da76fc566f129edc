package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-feed reconstruction from the public `_delta_log` protocol:
  * per-version insert/delete attribution across appends, DV deletes,
  * OPTIMIZE rewrites and overwrites; the replay invariant
  * (start + inserts − deletes = end); and the exactly-once
  * append-mirror composition under duplicate/stale polls. */
class DeltaChangesSpec extends SparkSpec {
  import spark.implicits._

  implicit private val s: org.apache.spark.sql.SparkSession = spark

  private def rows(df: DataFrame): Seq[(Long, String)] =
    df.select("v", "p").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  private def changeSet(df: DataFrame): Set[(Long, String, String, Long)] =
    df.collect().map(r => (r.getLong(0), r.getString(1),
      r.getString(2), r.getLong(3))).toSet

  test("per-version attribution: appends insert, DV deletes delete, optimize is silent, overwrite retracts") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val ds = new DeltaDataset(table, Seq("p"))
      ds.write((1L to 6L).map(i => (i, "A")).toDF("v", "p").coalesce(1)) // v0
      ds.append(Seq((7L, "B"), (8L, "B")).toDF("v", "p"))                // v1
      ds.delete($"v" % 2 === 0L)                                         // v2
      ds.optimize(0.0)                                                   // v3
      ds.write(Seq((50L, "C")).toDF("v", "p"))                           // v4 overwrite
      val ch = DeltaChanges.readChanges(table, -1L).get
      assert(ch.columns.toSeq ==
        Seq("v", "p", "_change_type", "_commit_version"))
      val got = changeSet(ch)
      val expected =
        (1L to 6L).map(i => (i, "A", "insert", 0L)).toSet ++
        Set((7L, "B", "insert", 1L), (8L, "B", "insert", 1L)) ++
        Set((2L, "A", "delete", 2L), (4L, "A", "delete", 2L),
          (6L, "A", "delete", 2L), (8L, "B", "delete", 2L)) ++
        // v3 optimize: silent; v4 overwrite: survivors retract, C lands
        Set((1L, "A", "delete", 4L), (3L, "A", "delete", 4L),
          (5L, "A", "delete", 4L), (7L, "B", "delete", 4L),
          (50L, "C", "insert", 4L))
      assert(got == expected)
      // windowed read: only v4's changes
      assert(changeSet(DeltaChanges.readChanges(table, 3L).get) ==
        expected.filter(_._4 == 4L))
      // empty window at head
      assert(DeltaChanges.readChanges(table, 4L).get.count() == 0L)
    }
  }

  test("replay invariant: snapshot(from) + inserts − deletes = snapshot(to), from any watermark") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val ds = new DeltaDataset(table, Seq("p"))
      ds.write((1L to 9L).map(i => (i, if (i <= 5) "A" else "B"))
        .toDF("v", "p").coalesce(1))   // v0
      ds.delete($"v" % 3 === 0L)       // v1
      ds.append(Seq((20L, "A"), (21L, "B")).toDF("v", "p")) // v2
      ds.delete($"p" === "B")          // v3
      ds.optimize(0.5)                 // v4 (B files fully masked → rewritten away)
      (0L to 3L).foreach { from =>
        val start = rows(DeltaReader.scan(table, Some(from)).get)
          .groupBy(identity).view.mapValues(_.size).toMap
        val ch = DeltaChanges.readChanges(table, from).get.collect()
          .map(r => (r.getString(2), (r.getLong(0), r.getString(1))))
        val applied = ch.foldLeft(start) { case (acc, (t, row)) =>
          if (t == "insert") acc.updated(row, acc.getOrElse(row, 0) + 1)
          else acc.updated(row, acc.getOrElse(row, 0) - 1)
        }.filter(_._2 != 0)
        val end = rows(DeltaReader.scan(table).get)
          .groupBy(identity).view.mapValues(_.size).toMap
        assert(applied == end, s"replay from watermark $from diverged")
      }
    }
  }

  test("row restoration: a DV shrinking under RESTORE emits the restored rows as inserts") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val ds = new DeltaDataset(table)
      ds.write((1L to 8L).map(i => (i, s"d$i")).toDF("v", "s").coalesce(1)) // v0
      ds.delete($"v" % 2 === 0L)                                           // v1: DV masks 2,4,6,8
      ds.restore(0L)                                                       // v2: DV drops — rows come back
      val ch = DeltaChanges.readChanges(table, -1L).get
        .select("v", "_change_type", "_commit_version").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val expected =
        (1L to 8L).map(i => (i, "insert", 0L)).toSet ++
        Set(2L, 4L, 6L, 8L).map(i => (i, "delete", 1L)) ++
        // readChangeFeed semantics: un-deleted rows are INSERTS at the
        // restoring version — a mirror replaying the feed sees them
        Set(2L, 4L, 6L, 8L).map(i => (i, "insert", 2L))
      assert(ch == expected)
      // restore across an OVERWRITE: dropped files re-added are inserts,
      // the overwrite's files retract
      ds.write(Seq((100L, "x")).toDF("v", "s"))                            // v3 overwrite
      ds.restore(0L)                                                       // v4: back to 1..8
      val tail = DeltaChanges.readChanges(table, 3L).get
        .select("v", "_change_type").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(tail == (1L to 8L).map(i => (i, "insert")).toSet + ((100L, "delete")))
    }
  }

  test("wide window: 25-commit full-history replay stays exact (incremental, one snapshot)") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val ds = new DeltaDataset(table, Seq("p"))
      ds.write(Seq((0L, "A")).toDF("v", "p"))                    // v0
      (1L until 20L).foreach { i =>
        ds.append(Seq((i, if (i % 2 == 0) "A" else "B")).toDF("v", "p"))
      }                                                          // v1..v19
      ds.delete($"v" % 5 === 0L)                                 // v20
      ds.append(Seq((30L, "A")).toDF("v", "p"))                  // v21
      ds.delete($"p" === "B")                                    // v22
      ds.optimize(0.0)                                           // v23
      ds.append(Seq((31L, "B")).toDF("v", "p"))                  // v24
      // replay invariant from several watermarks across the wide window
      Seq(-1L, 0L, 7L, 19L, 21L).foreach { from =>
        val start: Map[(Long, String), Int] =
          if (from < 0) Map.empty
          else rows(DeltaReader.scan(table, Some(from)).get)
            .groupBy(identity).view.mapValues(_.size).toMap
        val ch = DeltaChanges.readChanges(table, from).get.collect()
          .map(r => (r.getString(2), (r.getLong(0), r.getString(1))))
        val applied = ch.foldLeft(start) { case (acc, (t, row)) =>
          if (t == "insert") acc.updated(row, acc.getOrElse(row, 0) + 1)
          else acc.updated(row, acc.getOrElse(row, 0) - 1)
        }.filter(_._2 != 0)
        val end = rows(DeltaReader.scan(table).get)
          .groupBy(identity).view.mapValues(_.size).toMap
        assert(applied == end, s"wide replay from watermark $from diverged")
      }
      // per-version count: one insert row per append version
      val counts = DeltaChanges.readChanges(table, -1L).get
        .where($"_change_type" === "insert")
        .groupBy("_commit_version").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert((0L until 20L).forall(v => counts(v) == 1L))
    }
  }

  test("driver-side and distributed window parsers reduce to identical commits") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val ds = new DeltaDataset(table, Seq("p"))
      ds.write((1L to 6L).map(i => (i, if (i <= 3) "A" else "B"))
        .toDF("v", "p").coalesce(1))                    // v0
      ds.append(Seq((7L, "B")).toDF("v", "p"))          // v1
      ds.delete($"v" % 2 === 0L)                        // v2 (DV descriptors)
      ds.write(Seq((50L, "C")).toDF("v", "p"))          // v3 (overwrite: removes)
      val logDir = new org.apache.hadoop.fs.Path(table, "_delta_log")
      val fs = logDir.getFileSystem(spark.sessionState.newHadoopConf())
      val qualifiedBase = fs.makeQualified(new org.apache.hadoop.fs.Path(table))
      def absPath(raw: String): org.apache.hadoop.fs.Path = {
        val uri = new java.net.URI(raw)
        val p = new org.apache.hadoop.fs.Path(uri)
        if (uri.isAbsolute) p else new org.apache.hadoop.fs.Path(qualifiedBase, p)
      }
      val paths = (0L to 3L).map(v =>
        v -> new org.apache.hadoop.fs.Path(logDir, f"$v%020d.json"))
      val fast = DeltaChanges.parseWindowDriver(fs, paths, absPath)
      val dist = DeltaChanges.parseWindowDistributed(paths, absPath)
      assert(fast.keySet == dist.keySet)
      fast.keySet.toSeq.sorted.foreach { v =>
        // adds may collect in any order distributed — compare as sets
        assert(fast(v).adds.toSet == dist(v).adds.toSet, s"adds diverged at v$v")
        assert(fast(v).removes == dist(v).removes, s"removes diverged at v$v")
        assert(fast(v).meta == dist(v).meta, s"meta diverged at v$v")
      }
    }
  }

  test("a vacuumed commit inside the window raises instead of guessing") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val ds = new DeltaDataset(table)
      ds.write(Seq(1L, 2L).toDF("v"))
      ds.append(Seq(3L).toDF("v"))
      ds.append(Seq(4L).toDF("v"))
      // vacuum a MIDDLE commit: the window (0, 2] can no longer be
      // attributed per version
      java.nio.file.Files.delete(java.nio.file.Paths.get(
        table, "_delta_log", f"${1L}%020d.json"))
      val e = intercept[Exception](
        DeltaChanges.readChanges(table, 0L).get.collect())
      assert(e.getMessage.contains("vacuumed") ||
        e.getMessage.contains("missing"))
    }
  }

  test("mirrorAppends: exactly-once under duplicate and stale-watermark polls") {
    withTempDir { dir =>
      val src = s"$dir/src"
      val dst = s"$dir/dst"
      val sds = new DeltaDataset(src)
      // interleaved appends and a delete; the mirror accumulates the
      // INSERT stream (deletes do not retract — the append-stream face)
      sds.write(Seq((1L, "x"), (2L, "y")).toDF("v", "s"))  // v0
      var wm = DeltaChanges.mirrorAppends(src, dst, -1L)
      assert(wm == 0L)
      sds.append(Seq((3L, "z")).toDF("v", "s"))            // v1
      wm = DeltaChanges.mirrorAppends(src, dst, wm)
      assert(wm == 1L)
      sds.delete($"v" === 2L)                              // v2 (DV delete)
      sds.append(Seq((4L, "w")).toDF("v", "s"))            // v3
      wm = DeltaChanges.mirrorAppends(src, dst, wm)
      assert(wm == 3L)
      val expected = Seq((1L, "x"), (2L, "y"), (3L, "z"), (4L, "w"))
        .toDF("v", "s")
      assertSameData(DeltaReader.scan(dst).get, expected)
      // duplicate poll at head and a FULL replay from a stale
      // watermark both no-op: the SetTransaction keys hold the line
      assert(DeltaChanges.mirrorAppends(src, dst, wm) == 3L)
      assert(DeltaChanges.mirrorAppends(src, dst, -1L) == 3L)
      assertSameData(DeltaReader.scan(dst).get, expected)
    }
  }

  test("mirrorAppends carries restored rows (the feed's inserts) into the mirror") {
    withTempDir { dir =>
      val src = s"$dir/src"
      val dst = s"$dir/dst"
      val sds = new DeltaDataset(src)
      sds.write(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("v", "s")) // v0
      sds.delete($"v" === 2L)                                        // v1
      sds.restore(0L)                                                // v2: 2L restored
      val wm = DeltaChanges.mirrorAppends(src, dst, -1L)
      assert(wm == 2L)
      // the append face replays the insert STREAM: 2L appears twice
      // (initial insert at v0, restoration insert at v2) — deletes do
      // not retract, exactly readChangeFeed + insert-only semantics
      val expected = Seq((1L, "a"), (2L, "b"), (3L, "c"), (2L, "b"))
        .toDF("v", "s")
      assertSameData(DeltaReader.scan(dst).get, expected)
      // replay from scratch: still exactly-once
      assert(DeltaChanges.mirrorAppends(src, dst, -1L) == 2L)
      assertSameData(DeltaReader.scan(dst).get, expected)
    }
  }
}
