package graft

import graft.sources.ManagedDataset
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, sum}
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

  // ---- manifest file-stats skip scan -----------------------------

  private def rangeTable(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    (1L to 400L).map(i => (i, s"row$i")).toDF("k", "payload")
      .repartitionByRange(4, org.apache.spark.sql.functions.col("k"))
  }

  /** Overwrite every parquet file under `root` whose recorded k-range
    * satisfies `pred` with garbage bytes — any later read of it fails. */
  private def corruptFilesWhere(url: String, pred: Long => Boolean): Int = {
    import scala.jdk.CollectionConverters._
    val root = Paths.get(url)
    val victims = Files.walk(root).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .filter { p =>
        // recover this file's range by reading it directly first
        val mn = spark.read.parquet(p.toString)
          .agg(org.apache.spark.sql.functions.min("k")).head.getLong(0)
        pred(mn)
      }.toList
    victims.foreach(p => Files.write(p, "not parquet".getBytes))
    victims.size
  }

  test("scanPruned == scan().filter, and PRUNED files are physically never read") {
    withTempDir { dir =>
      val url = s"$dir/ds"
      val ds = ManagedDataset(url, Nil, Seq("k"))
      ds.write(rangeTable(spark))
      // sanity: 4 range-clustered files, each with recorded bounds
      val expected = ds.scan().get
        .filter(col("k") >= 50L && col("k") <= 120L)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(expected == (50L to 120L))
      // corrupt every file whose data sits entirely ABOVE the probe
      // range — a reader that opens them dies, so a green result
      // proves the manifest pruned them before any IO
      val n = corruptFilesWhere(url, mn => mn > 200L)
      assert(n >= 1, "the 400-row range table must have a high file to corrupt")
      val got = ds.scanPruned("k", "50", "120").get
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == expected)
      // control: the corrupted files ARE in the unpruned path
      intercept[Exception](ds.scan().get.agg(sum(col("k"))).head)
    }
  }

  test("skip-scan stats survive append and keep pruning per commit") {
    withTempDir { dir =>
      val url = s"$dir/ds"
      val ds = ManagedDataset(url, Nil, Seq("k"))
      import spark.implicits._
      ds.write((1L to 100L).map(i => (i, s"a$i")).toDF("k", "payload")
        .repartitionByRange(2, col("k")))
      ds.append((101L to 200L).map(i => (i, s"b$i")).toDF("k", "payload")
        .repartitionByRange(2, col("k")))
      // probe inside the first commit only; corrupt the whole second
      // commit — append-carried stats must prune it entirely
      val n = corruptFilesWhere(url, mn => mn > 100L)
      assert(n >= 2)
      val got = ds.scanPruned("k", "10", "40").get
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == (10L to 40L))
    }
  }

  test("stats-free manifests degrade to keep-everything (correct, unpruned)") {
    withTempDir { dir =>
      val url = s"$dir/ds"
      ManagedDataset(url, Nil).write(rangeTable(spark)) // no statsColumns
      val ds = ManagedDataset(url, Nil, Seq("k"))
      val got = ds.scanPruned("k", "50", "120").get
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == (50L to 120L))
      intercept[IllegalArgumentException](ds.scanPruned("nope", "0", "1"))
    }
  }

  test("Hilbert-clustered layout prunes 2-D range scans a linear sort cannot") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    val grid = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y))
      .toDF("x", "y")
    val withH = graft.operators.Sequencing
      .withHilbertValue(grid, "x", "y", bits = 5)
    withTempDir { dir =>
      val linear = ManagedDataset(s"$dir/linear", Nil, Seq("x", "y"))
      linear.write(grid.repartitionByRange(16, col("x"), col("y")))
      val hilbert = ManagedDataset(s"$dir/hilbert", Nil, Seq("x", "y"))
      hilbert.write(withH.repartitionByRange(16, col("hval")).drop("hval"))
      // a thin y-band across the full x range: x-leading linear sort
      // keeps every file (its y bounds all span the grid); the
      // Hilbert layout keeps only the blobs the band crosses
      val ranges = Seq(("x", "0", "31"), ("y", "8", "11"))
      val nLin = linear.prunedFileCount(ranges).get
      val nHil = hilbert.prunedFileCount(ranges).get
      assert(nLin == 16L, s"x-sorted layout cannot prune a y-band (got $nLin)")
      assert(nHil < nLin / 2,
        s"Hilbert blobs must prune most files for a thin band (got $nHil of $nLin)")
      // both reads return exactly the band
      val expected = (0L until 32L).flatMap(x => (8L to 11L).map(x -> _)).toSet
      for (ds <- Seq(linear, hilbert)) {
        val got = ds.scanPrunedRanges(ranges).get
          .select("x", "y").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == expected)
      }
    }
  }

  test("compactClustered rewrites the layout so skip-scans prune; diffVersions reads the log") {
    import spark.implicits._
    val grid = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y))
      .toDF("x", "y")
    withTempDir { dir =>
      val ds = ManagedDataset(s"$dir/ds", Nil, Seq("x", "y"))
      // ingest in shuffled order: every file spans the whole grid
      ds.write(grid.orderBy(org.apache.spark.sql.functions.xxhash64(col("x"), col("y")))
        .repartition(16))
      val ranges = Seq(("x", "0", "31"), ("y", "8", "11"))
      val before = ds.prunedFileCount(ranges).get
      assert(before == 16L, s"shuffled ingest should defeat pruning (got $before)")
      // OPTIMIZE with a Hilbert clustering key
      val withH = graft.operators.Sequencing.withHilbertValue(
        ds.scan().get, "x", "y", bits = 5)
      // cluster on hval: recompute it inside via a staging write —
      // compactClustered clusters on an EXISTING column, so stage the
      // keyed frame as the new snapshot first
      ds.write(withH)
      assert(ds.compactClustered("hval", 16))
      val after = ManagedDataset(s"$dir/ds", Nil, Seq("x", "y"))
        .prunedFileCount(ranges).get
      assert(after < before / 2,
        s"clustered rewrite must restore pruning (got $after of $before)")
      // the data survived both rewrites
      val got = ds.scanPrunedRanges(ranges).get.select("x", "y")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == (0L until 32L).flatMap(x => (8L to 11L).map(x -> _)).toSet)
    }
  }

  test("diffVersions: added/removed/changed between log snapshots") {
    import spark.implicits._
    withTempDir { dir =>
      val ds = ManagedDataset(s"$dir/ds", Nil)
      ds.write(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "txt"))
      ds.write(Seq((2L, "b"), (3L, "C2"), (4L, "d")).toDF("id", "txt"))
      val d = ds.diffVersions(1L, 2L, "id", "txt")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(d == Map(1L -> "removed", 2L -> "unchanged",
        3L -> "changed", 4L -> "added"))
    }
  }

  test("statsColumns must be data columns, and string-typed stats prune lexically") {
    intercept[IllegalArgumentException](
      ManagedDataset("/tmp/never", Seq("p1"), Seq("p1")))
    withTempDir { dir =>
      val ds = ManagedDataset(s"$dir/ds", Nil, Seq("payload"))
      import spark.implicits._
      ds.write(Seq((1L, "alpha"), (2L, "beta"), (3L, "zeta"))
        .toDF("k", "payload").repartition(1))
      val got = ds.scanPruned("payload", "aaa", "bzz").get
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == Seq(1L, 2L))
    }
  }

  test("bloom equality skip: files not carrying the key are physically never read") {
    withTempDir { dir =>
      val url = s"$dir/ds"
      val ds = ManagedDataset(url, Nil, Seq("k"))
      import spark.implicits._
      // hash-distributed: every file's [min,max] spans the domain, so
      // min/max windows skip NOTHING — only the bloom can
      val data = (1L to 400L).map(i => (i % 20, s"p$i")).toDF("k", "payload")
      ds.write(data.repartition(8, col("k")))
      val expected = ds.scan().get.filter(col("k") === 7L).count()
      assert(expected == 20L)
      // corrupt every file that does NOT contain k=7 — a reader that
      // opens one dies, so a green result proves bloom-skipping
      import scala.jdk.CollectionConverters._
      val victims = Files.walk(Paths.get(url)).iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .filter { p =>
          spark.read.parquet(p.toString)
            .filter(col("k") === 7L).isEmpty
        }.toList
      assert(victims.nonEmpty, "hash distribution must leave k=7-free files")
      victims.foreach(p => Files.write(p, "not parquet".getBytes))
      assert(ds.scanPrunedEquality("k", "7").get.count() == expected)
      // control: the corrupted files ARE in the unpruned path
      intercept[Exception](ds.scan().get.agg(sum(col("k"))).head)
      // diagnostics agree: fewer files read than exist
      val kept = ds.prunedFileCountEquality("k", "7").get
      assert(kept >= 1 && kept < 8)
    }
  }

  test("bloom skip is exact under appends and range predicates stay unaffected") {
    withTempDir { dir =>
      val url = s"$dir/ds"
      val ds = ManagedDataset(url, Nil, Seq("k"))
      import spark.implicits._
      ds.write((1L to 100L).map(i => (i % 10, i)).toDF("k", "v")
        .repartition(4, col("k")))
      ds.append((100L to 200L).map(i => (i % 10 + 10, i)).toDF("k", "v")
        .repartition(4, col("k")))
      val got = ds.scanPrunedEquality("k", "13").get
        .select(col("v")).collect().map(_.getLong(0)).sorted.toSeq
      val want = ds.scan().get.filter(col("k") === 13L)
        .select(col("v")).collect().map(_.getLong(0)).sorted.toSeq
      assert(got == want && want.nonEmpty)
      // absent key: every file bloom-rejects -> empty, no error
      assert(ds.scanPrunedEquality("k", "999").get.count() == 0L)
      // unparseable key raises loudly (same outcome ANSI Spark gives
      // filter(col = CAST('x' AS BIGINT))) — never a silent skip
      val e = intercept[IllegalArgumentException](
        ds.scanPrunedEquality("k", "x"))
      assert(e.getMessage.contains("does not parse as"))
    }
  }

  test("bloom probe canonicalizes non-canonical but equal renderings") {
    withTempDir { dir =>
      val url = s"$dir/ds"
      val ds = ManagedDataset(url, Nil, Seq("d"))
      import spark.implicits._
      // double column: blooms hash CAST(d AS STRING) = "20000.0";
      // a caller probing the equal-but-different spelling "20000"
      // must still find the rows (round 6 advice: a raw-string probe
      // hashed "20000" and silently dropped the matching files)
      ds.write((1 to 50).map(i => (i.toDouble * 10000, i)).toDF("d", "v")
        .repartition(4, col("d")))
      val got = ds.scanPrunedEquality("d", "20000").get.count()
      assert(got == 1L)
      // the canonical spelling keeps working too
      assert(ds.scanPrunedEquality("d", "20000.0").get.count() == 1L)
      // and both agree on the diagnostics path
      assert(ds.prunedFileCountEquality("d", "20000").get ==
        ds.prunedFileCountEquality("d", "20000.0").get)
    }
  }

  test("restore rolls back as a new audited commit; row counts read from the log") {
    withTempDir { dir =>
      val ds = ManagedDataset(s"$dir/ds", Nil, Seq("k"))
      import spark.implicits._
      ds.write((1L to 10L).map(i => (i, s"v$i")).toDF("k", "p"))
      ds.append((11L to 15L).map(i => (i, s"v$i")).toDF("k", "p"))
      val restored = ds.restore(1L)
      assert(restored == 3L)
      // the restore is a real commit: history intact, snapshot = v1
      assert(ds.versions() == Seq(1L, 2L, 3L))
      assert(ds.scan().get.count() == 10L)
      assert(ds.readVersion(2L).count() == 15L) // audit trail preserved
      // manifest-derived row counts, no data IO needed
      assert(ds.versionRowCounts() == Seq(1L -> 10L, 2L -> 15L, 3L -> 10L))
      intercept[Exception](ds.restore(99L))
    }
  }

  test("merge: update replaces, delete drops, insert lands, untouched pass through") {
    withTempDir { dir =>
      val ds = ManagedDataset(s"$dir/ds", Nil, Seq("k"))
      import spark.implicits._
      ds.write(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "p"))
      val source = Seq((2L, "B2"), (3L, "whatever"), (4L, "d"), (5L, "gone"))
        .toDF("k", "p")
      val v = ds.merge(source, Seq("k"),
        deleteWhen = Some(col("p") === "whatever" || col("p") === "gone"))
      assert(v == 2L)
      val got = ds.scan().get.collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      // 1 untouched, 2 replaced, 3 deleted, 4 inserted, 5 delete-noop
      assert(got == Map(1L -> "a", 2L -> "B2", 4L -> "d"))
      // pre-merge state still readable (audit)
      assert(ds.readVersion(1L).count() == 3L)
    }
  }

  test("merge refuses ambiguous sources (duplicate keys)") {
    withTempDir { dir =>
      val ds = ManagedDataset(s"$dir/ds", Nil, Seq("k"))
      import spark.implicits._
      ds.write(Seq((1L, "a")).toDF("k", "p"))
      val dup = Seq((1L, "x"), (1L, "y")).toDF("k", "p")
      val e = intercept[IllegalArgumentException](ds.merge(dup, Seq("k")))
      assert(e.getMessage.contains("duplicate keys"))
    }
  }

  test("CHECK constraints reject a violating batch atomically") {
    withTempDir { dir =>
      val url = s"$dir/ds"
      val ds = ManagedDataset(url, Nil)
      import spark.implicits._
      ds.write(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
      ds.addConstraint("positive_v", "v > 0")
      assert(ds.constraints() == Map("positive_v" -> "v > 0"))
      val versionsBefore = ds.versions()
      val dirsBefore = Files.list(Paths.get(url)).count()
      val e = intercept[IllegalStateException](
        ds.append(Seq((3L, -5L), (4L, 40L)).toDF("k", "v")))
      assert(e.getMessage.contains("positive_v") &&
        e.getMessage.contains("1 row(s)"))
      // NOTHING landed: no new version, no stray data dir, same rows
      assert(ds.versions() == versionsBefore)
      assert(Files.list(Paths.get(url)).count() == dirsBefore)
      assert(ds.scan().get.count() == 2L)
      // a clean batch still flows
      ds.append(Seq((5L, 50L)).toDF("k", "v"))
      assert(ds.scan().get.count() == 3L)
    }
  }

  test("CHECK constraints: existing-data validation, null semantics, survival") {
    withTempDir { dir =>
      val url = s"$dir/ds"
      val ds = ManagedDataset(url, Nil)
      import spark.implicits._
      ds.write(Seq((1L, Some(10L)), (2L, None)).toDF("k", "v"))
      // current data already violates -> refused, not registered
      val e = intercept[IllegalStateException](
        ds.addConstraint("big", "v > 100"))
      assert(e.getMessage.contains("big"))
      assert(ds.constraints().isEmpty)
      // NULL passes plain CHECK (SQL semantics) ...
      ds.addConstraint("pos", "v > 0")
      ds.append(Seq((3L, Option.empty[Long])).toDF("k", "v"))
      // ... and the IS NOT NULL conjunct forbids it
      ds.dropConstraint("pos")
      val e2 = intercept[IllegalStateException] {
        ds.addConstraint("pos_nn", "v IS NOT NULL AND v > 0")
      }
      assert(e2.getMessage.contains("pos_nn"))
      // constraints are metadata: they survive overwrite AND a fresh
      // reader instance
      ds.addConstraint("k_pos", "k > 0")
      ds.write(Seq((9L, Some(90L))).toDF("k", "v"))
      val fresh = ManagedDataset(url, Nil)
      assert(fresh.constraints() == Map("k_pos" -> "k > 0"))
      val e3 = intercept[IllegalStateException](
        fresh.append(Seq((-1L, Some(1L))).toDF("k", "v")))
      assert(e3.getMessage.contains("k_pos"))
      // dropConstraint reopens the gate
      fresh.dropConstraint("k_pos")
      fresh.append(Seq((-1L, Some(1L))).toDF("k", "v"))
      assert(fresh.scan().get.count() == 2L)
    }
  }
}
