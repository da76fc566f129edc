package graft

import graft.sources.ManagedDataset
import org.apache.spark.sql.DataFrame
import java.nio.file.{Files, Paths}

/** Transaction-log semantics for the Delta stand-in: versioned atomic
  * commits, snapshot (reader) isolation, time travel, concurrent
  * writers, vacuum/compact maintenance. Reference surface:
  * /root/reference/polario/delta_dataset.py:10-62 (the log itself is
  * the public Delta protocol re-expressed minimally — the reference
  * delegates it to delta-rs). */
class ManagedDatasetSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (String, Long)*): DataFrame = rows.toDF("p1", "v")

  test("every write/append lands a new version; versions ascend from 1") {
    withTempDir { dir =>
      val ds = ManagedDataset(s"$dir/ds", Seq("p1"))
      assert(ds.versions().isEmpty)
      ds.write(df("1" -> 1L))
      ds.append(df("1" -> 2L))
      ds.write(df("2" -> 3L))
      assert(ds.versions() == Seq(1L, 2L, 3L))
    }
  }

  test("readVersion time-travels: overwrite replaces, append accumulates") {
    withTempDir { dir =>
      val ds = ManagedDataset(s"$dir/ds", Seq("p1"))
      ds.write(df("1" -> 1L))                       // v1 = {1}
      ds.append(df("2" -> 2L))                      // v2 = {1,2}
      ds.write(df("3" -> 3L))                       // v3 = {3}  (full replace)
      assertSameData(ds.readVersion(1), df("1" -> 1L))
      assertSameData(ds.readVersion(2), df("1" -> 1L, "2" -> 2L))
      assertSameData(ds.readVersion(3), df("3" -> 3L))
      assertSameData(ds.scan().get, ds.readVersion(3))
      // overwrite is whole-table (Delta semantics): v1's partition is
      // gone from the latest snapshot even though v3 never wrote p1=1
      assert(ds.readPartition(Map("p1" -> "1")).isEmpty)
      intercept[IllegalArgumentException](ds.readVersion(99))
    }
  }

  test("a snapshot resolved before an overwrite keeps reading the OLD data") {
    withTempDir { dir =>
      val ds = ManagedDataset(s"$dir/ds", Seq("p1"))
      ds.write(df("1" -> 1L, "2" -> 2L))
      val pinned = ds.scan().get // lazy — resolves v1's file list now
      ds.write(df("1" -> 99L))   // v2 rewrites the table, p1=1 included
      // the pinned plan still reads v1's (immutable) files: old
      // snapshot, not the new one, and NEVER a mix
      assertSameData(pinned, df("1" -> 1L, "2" -> 2L))
      assertSameData(ds.scan().get, df("1" -> 99L))
    }
  }

  test("uncommitted data directories are invisible to readers") {
    withTempDir { dir =>
      val ds = ManagedDataset(s"$dir/ds", Seq("p1"))
      ds.write(df("1" -> 1L))
      // simulate a writer that crashed after its data landed but
      // before its manifest published: a commit-shaped directory with
      // real parquet in it
      val stray = Paths.get(dir, "ds", f"_c${2L}%020d-deadbeef", "p1=9")
      Files.createDirectories(stray)
      df("9" -> 9L).drop("p1").write.parquet(stray.toString + "/data.parquet")
      assertSameData(ds.scan().get, df("1" -> 1L))
      assert(ds.versions() == Seq(1L))
      assert(ds.readPartition(Map("p1" -> "9")).isEmpty)
    }
  }

  test("concurrent appends from racing writers all land; none are lost") {
    withTempDir { dir =>
      val url = s"$dir/ds"
      ManagedDataset(url, Seq("p1")).write(df("0" -> 0L))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        val futures = (1 to 8).map { i =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            // one independent writer instance per thread, as two JVMs
            // racing on shared storage would be
            def call(): Unit =
              ManagedDataset(url, Seq("p1")).append(df(i.toString -> i.toLong))
          })
        }
        futures.foreach(_.get())
      } finally pool.shutdown()
      val ds = ManagedDataset(url, Seq("p1"))
      // 9 committed versions (1 write + 8 appends), every row present:
      // losers of a manifest race re-based and retried, so no append
      // overwrote another's commit
      assert(ds.versions() == (1L to 9L))
      assertSameData(ds.scan().get, (0 to 8).map(i => (i.toString, i.toLong)).toDF("p1", "v"))
    }
  }

  test("vacuum drops old versions and their unreferenced data; latest survives") {
    withTempDir { dir =>
      val ds = ManagedDataset(s"$dir/ds", Seq("p1"))
      ds.write(df("1" -> 1L))   // v1 — its commit dir dies with vacuum
      ds.write(df("2" -> 2L))   // v2 — latest, survives
      def commitDirs: Seq[String] =
        Files.list(Paths.get(dir, "ds")).toArray.map(_.toString)
          .map(p => Paths.get(p).getFileName.toString).filter(_.startsWith("_c")).sorted.toSeq
      assert(commitDirs.size == 2)
      assert(ds.vacuum(retainVersions = 1) == 1)
      assert(commitDirs.size == 1)
      assert(ds.versions() == Seq(2L))
      assertSameData(ds.scan().get, df("2" -> 2L))
      intercept[IllegalArgumentException](ds.readVersion(1))
      // append commit dirs referenced by the retained manifest survive
      ds.append(df("3" -> 3L))
      assert(ds.vacuum(retainVersions = 1) == 0)
      assertSameData(ds.scan().get, df("2" -> 2L, "3" -> 3L))
      // an ORPHANED publish temp (hard-crashed writer) is swept once
      // stale; a fresh one — possibly a live writer mid-publish — is
      // left alone
      val log = Paths.get(dir, "ds", "_graft_log")
      val stale = log.resolve("_tmp-deadbeef.json")
      Files.write(stale, "{}".getBytes)
      Files.setLastModifiedTime(stale, java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 2L * 60 * 60 * 1000))
      val fresh = log.resolve("_tmp-cafebabe.json")
      Files.write(fresh, "{}".getBytes)
      ds.vacuum(retainVersions = 1)
      assert(!Files.exists(stale), "hour-old orphan temp must be swept")
      assert(Files.exists(fresh), "fresh temp (possible live writer) must survive")
      assertSameData(ds.scan().get, df("2" -> 2L, "3" -> 3L))
    }
  }

  test("compact collapses an append chain into one commit, same data") {
    withTempDir { dir =>
      val ds = ManagedDataset(s"$dir/ds", Seq("p1"))
      ds.write(df("1" -> 1L))
      (2 to 5).foreach(i => ds.append(df(i.toString -> i.toLong)))
      val expect = (1 to 5).map(i => (i.toString, i.toLong)).toDF("p1", "v")
      assert(ds.compact())
      assertSameData(ds.scan().get, expect)
      // compacted snapshot is a single commit dir; a second compact is
      // a no-op and vacuum can now drop the whole pre-compact history
      assert(!ds.compact())
      assert(ds.vacuum(retainVersions = 1) == 5)
      assertSameData(ds.scan().get, expect)
    }
  }

  test("append-time schema evolution null-fills across commits") {
    withTempDir { dir =>
      val ds = ManagedDataset(s"$dir/ds", Seq("p1"))
      ds.write(Seq(("1", 1L)).toDF("p1", "v"))
      ds.append(Seq(("2", 2L, "x")).toDF("p1", "v", "extra"))
      val got = ds.scan().get
      assert(got.columns.sorted.toSeq == Seq("extra", "p1", "v"))
      assert(got.where($"p1" === "1").select("extra").collect().head.isNullAt(0))
      assert(got.where($"p1" === "2").select("extra").collect().head.getString(0) == "x")
    }
  }

  test("appendBatch is exactly-once: redelivered batch ids are no-ops") {
    withTempDir { dir =>
      val ds = ManagedDataset(s"$dir/ds", Seq("p1"))
      assert(ds.lastCommittedBatch("ingest").isEmpty)
      assert(ds.appendBatch(df("1" -> 1L), "ingest", 0L))
      assert(ds.appendBatch(df("2" -> 2L), "ingest", 1L))
      // restart-style redelivery of batch 1: detected in the log, skipped
      assert(!ds.appendBatch(df("2" -> 2L), "ingest", 1L))
      // a LOWER id than the last committed is also stale
      assert(!ds.appendBatch(df("1" -> 1L), "ingest", 0L))
      assert(ds.lastCommittedBatch("ingest").contains(1L))
      assertSameData(ds.scan().get, df("1" -> 1L, "2" -> 2L))
      // ids are scoped per app: another query's batch 0 still lands,
      // and plain (untagged) appends never consume an id
      ds.append(df("9" -> 9L))
      assert(ds.appendBatch(df("3" -> 3L), "other", 0L))
      assert(ds.lastCommittedBatch("ingest").contains(1L))
      assertSameData(ds.scan().get,
        df("1" -> 1L, "2" -> 2L, "9" -> 9L, "3" -> 3L))
    }
  }

  test("concurrent deliveries of ONE batch commit it exactly once") {
    withTempDir { dir =>
      val url = s"$dir/ds"
      ManagedDataset(url, Seq("p1")).write(df("0" -> 0L))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
      try {
        val futures = (1 to 6).map { _ =>
          pool.submit(new java.util.concurrent.Callable[Boolean] {
            def call(): Boolean =
              ManagedDataset(url, Seq("p1")).appendBatch(df("7" -> 7L), "ingest", 7L)
          })
        }
        val landed = futures.map(_.get()).count(identity)
        assert(landed == 1, s"exactly one delivery must win, got $landed")
      } finally pool.shutdown()
      val ds = ManagedDataset(url, Seq("p1"))
      assertSameData(ds.scan().get, df("0" -> 0L, "7" -> 7L))
      assert(ds.lastCommittedBatch("ingest").contains(7L))
    }
  }

  test("empty-frame commit is a real version with schema, not table-absence") {
    withTempDir { dir =>
      val ds = ManagedDataset(s"$dir/ds", Seq("p1"))
      ds.write(df().limit(0))
      val got = ds.scan().getOrElse(fail("post-commit scan must be Some"))
      assert(got.count() == 0)
      assert(got.columns.sorted.toSeq == Seq("p1", "v"))
    }
  }
}
