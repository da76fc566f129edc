package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Change-data-feed WRITER conformance (`delta.enableChangeDataFeed =
  * true`): DELETE/UPDATE/MERGE commits land their row-level change
  * set as `_change_data/` parquet + `cdc` actions — the protocol
  * obligation foreign CDF readers depend on, since a DV-masking
  * commit cannot be re-derived from add/remove actions alone — and
  * [[DeltaChanges.readChanges]] treats cdc versions as authoritative,
  * emitting the recorded precise types (update_preimage/postimage)
  * instead of deriving insert/delete. CDF-off tables are untouched. */
class DeltaCdcSpec extends SparkSpec {
  import spark.implicits._

  implicit private val s: org.apache.spark.sql.SparkSession = spark

  /** A CDF-enabled table: created plain, then the property committed
    * via a foreign-style metaData action (our writer creates tables
    * with empty configuration). */
  private def cdfTable(dir: String, rows: Seq[(Long, String)]): String = {
    val table = s"$dir/t"
    val ds = new DeltaDataset(table)
    ds.write(rows.toDF("k", "v"))
    val snap = DeltaReader.snapshot(table).get
    def esc(x: String) = x.replace("\\", "\\\\").replace("\"", "\\\"")
    val meta =
      s"""{"metaData":{"id":"${snap.tableId}","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"${esc(snap.schema.json)}","partitionColumns":[],""" +
        s""""configuration":{"delta.enableChangeDataFeed":"true"},""" +
        s""""createdTime":1700000000000}}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$table/_delta_log/" + "%020d.json".format(1)),
      (meta + "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW)
    table
  }

  test("DELETE on a CDF table writes _change_data + cdc action; feed reads it authoritatively") {
    withTempDir { dir =>
      val table = cdfTable(dir, (0L until 40L).map(i => (i, s"v$i")))
      val ds = new DeltaDataset(table)
      ds.delete(col("k") % 4 === 1)                                   // v2
      val snap = DeltaReader.snapshot(table).get
      // the log carries a cdc action and the files exist
      val commit = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$table/_delta_log/" +
          "%020d.json".format(2))), "UTF-8")
      assert(commit.contains("\"cdc\""), "the DELETE commit must log cdc actions")
      assert(new java.io.File(s"$table/_change_data").exists)
      // feed: version 2's changes come from the cdc files
      val feed = DeltaChanges.readChanges(table, 1L, Some(2L)).get
      val rows = feed.collect()
      assert(rows.forall(_.getAs[String]("_change_type") == "delete"))
      assert(rows.map(_.getAs[Long]("k")).toSet ==
        (0L until 40L).filter(_ % 4 == 1).toSet)
      // snapshot semantics untouched
      assert(DeltaReader.scan(table).get.count() == 30)
      assert(snap.version == 2L)
    }
  }

  test("UPDATE records precise pre/postimages; MERGE records all four types") {
    withTempDir { dir =>
      val table = cdfTable(dir, (0L until 20L).map(i => (i, s"v$i")))
      val ds = new DeltaDataset(table)
      ds.update(col("k") === 3L, Map("v" -> lit("X")))                // v2
      val upd = DeltaChanges.readChanges(table, 1L, Some(2L)).get.collect()
      assert(upd.map(r => (r.getAs[String]("_change_type"),
        r.getAs[String]("v"))).toSet ==
        Set(("update_preimage", "v3"), ("update_postimage", "X")))
      // merge: k=5 replaced, k=7 deleted (deleteWhen), k=100 inserted
      ds.merge(Seq((5L, "five"), (7L, "DROP"), (100L, "hundred"))
        .toDF("k", "v"), Seq("k"),
        deleteWhen = Some(col("v") === "DROP"))                       // v3
      val mrg = DeltaChanges.readChanges(table, 2L, Some(3L)).get.collect()
      val byType = mrg.groupBy(_.getAs[String]("_change_type"))
        .view.mapValues(_.map(_.getAs[Long]("k")).toSet).toMap
      assert(byType("update_preimage") == Set(5L))
      assert(byType("update_postimage") == Set(5L))
      assert(byType("delete") == Set(7L))
      assert(byType("insert") == Set(100L))
    }
  }

  test("MERGE CDC stays exact in the shuffled (non-broadcast) source regime") {
    withTempDir { dir =>
      val table = cdfTable(dir, (0L until 20L).map(i => (i, s"v$i")))
      val ds = new DeltaDataset(table)
      val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        // push every source above the broadcast gate: the mask and
        // all four CDC-type joins must run unhinted and still agree
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64")
        ds.merge(Seq((5L, "five"), (7L, "DROP"), (100L, "hundred"))
          .toDF("k", "v"), Seq("k"),
          deleteWhen = Some(col("v") === "DROP"))                     // v2
        val mrg = DeltaChanges.readChanges(table, 1L, Some(2L)).get.collect()
        val byType = mrg.groupBy(_.getAs[String]("_change_type"))
          .view.mapValues(_.map(_.getAs[Long]("k")).toSet).toMap
        assert(byType("update_preimage") == Set(5L))
        assert(byType("update_postimage") == Set(5L))
        assert(byType("delete") == Set(7L))
        assert(byType("insert") == Set(100L))
        assert(DeltaReader.scan(table).get.count() == 20L)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    }
  }

  test("CDF-off tables write no cdc actions and keep derived feeds bitwise") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val ds = new DeltaDataset(table)
      ds.write((0L until 20L).map(i => (i, s"v$i")).toDF("k", "v"))
      ds.delete(col("k") < 3)
      val commit = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$table/_delta_log/" +
          "%020d.json".format(1))), "UTF-8")
      assert(!commit.contains("\"cdc\""))
      assert(!new java.io.File(s"$table/_change_data").exists)
      val feed = DeltaChanges.readChanges(table, 0L, Some(1L)).get.collect()
      assert(feed.map(_.getAs[Long]("k")).toSet == Set(0L, 1L, 2L))
      assert(feed.forall(_.getAs[String]("_change_type") == "delete"))
    }
  }

  test("a NULL deleteWhen verdict is a DELETE in the feed, not an unpaired preimage") {
    withTempDir { dir =>
      val table = cdfTable(dir, Seq((1L, "a"), (2L, "b"), (3L, "c")))
      val ds = new DeltaDataset(table)
      // k=2's source row has v = null: deleteWhen(v === "DROP") is
      // NULL for it — excluded from the inserts, so the row IS
      // deleted, and the feed must say so
      ds.merge(Seq((2L, null.asInstanceOf[String]), (3L, "C"))
        .toDF("k", "v"), Seq("k"),
        deleteWhen = Some(col("v") === "DROP"))
      assert(DeltaReader.scan(table).get.collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet ==
        Set((1L, "a"), (3L, "C")))
      val feed = DeltaChanges.readChanges(table, 1L).get.collect()
      val byType = feed.groupBy(_.getAs[String]("_change_type"))
        .view.mapValues(_.map(_.getAs[Long]("k")).toSet).toMap
      assert(byType("delete") == Set(2L),
        s"the null-verdict row must be a feed delete, got $byType")
      assert(byType("update_preimage") == Set(3L))
      assert(byType("update_postimage") == Set(3L))
      assert(!byType.contains("insert"))
    }
  }

  test("mirrorAppends lands merge-inserted rows from cdc-authoritative versions") {
    withTempDir { dir =>
      val table = cdfTable(dir, Seq((1L, "a"), (2L, "b")))
      val ds = new DeltaDataset(table)
      ds.merge(Seq((2L, "B"), (50L, "new")).toDF("k", "v"), Seq("k")) // v2: cdc
      val mirror = s"$dir/mirror"
      val wm = DeltaChanges.mirrorAppends(table, mirror, -1L)
      assert(wm == 2L)
      val got = DeltaReader.scan(mirror).get.collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      // v0's rows + the cdc version's insert stream (postimage + insert)
      assert(got == Set((1L, "a"), (2L, "b"), (2L, "B"), (50L, "new")),
        s"cdc versions must feed the mirror, got $got")
    }
  }

  test("vacuum reclaims aged _change_data files; the vacuumed window then reads loudly") {
    withTempDir { dir =>
      val table = cdfTable(dir, (0L until 20L).map(i => (i, s"v$i")))
      val ds = new DeltaDataset(table)
      ds.delete(col("k") < 5)                                         // v2: cdc
      val cdcFiles = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(new java.io.File(s"$table/_change_data"))
          .filter(_.getName.endsWith(".parquet"))
      }
      assert(cdcFiles.nonEmpty)
      // age them past any retention and vacuum with retention 0:
      // cdc files are never head-referenced, so they age out exactly
      // like unreferenced data files — _change_data cannot grow
      // without bound under a vacuum regimen
      cdcFiles.foreach(f => assert(f.setLastModified(1000L)))
      ds.vacuum(retentionMillis = 0L)
      assert(cdcFiles.forall(!_.exists),
        "aged cdc files must be reclaimed by vacuum")
      // the snapshot is untouched; the vacuumed CDF window fails at
      // read (the same contract as vacuumed time travel)
      assert(DeltaReader.scan(table).get.count() == 15)
      intercept[Exception] {
        DeltaChanges.readChanges(table, 1L, Some(2L)).get.collect()
      }
    }
  }

  test("the feed on an id-mode column-mapped table refuses at write") {
    withTempDir { dir =>
      val table = s"$dir/t"
      // a foreign id-mode mapped table WITH the feed enabled
      def fm(id: Long, phys: String) =
        new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("delta.columnMapping.id", id)
          .putString("delta.columnMapping.physicalName", phys).build()
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType, nullable = true, fm(1, "pk"))))
      Seq(7L).toDF("pk")
        .withMetadata("pk", new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("parquet.field.id", 1L).build())
        .coalesce(1).write.parquet(s"$table/seed")
      val part = new java.io.File(s"$table/seed").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      assert(part.renameTo(new java.io.File(s"$table/f0.parquet")))
      def esc(x: String) = x.replace("\\", "\\\\").replace("\"", "\\\"")
      val lines = Seq(
        """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        s"""{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":"${esc(schema.json)}","partitionColumns":[],""" +
          s""""configuration":{"delta.columnMapping.mode":"id",""" +
          s""""delta.columnMapping.maxColumnId":"1",""" +
          s""""delta.enableChangeDataFeed":"true"},"createdTime":1700000000000}}""",
        """{"add":{"path":"f0.parquet","partitionValues":{},"size":100,""" +
          """"modificationTime":1700000000000,"dataChange":true}}""")
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$table/_delta_log"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$table/_delta_log/" + "%020d.json".format(0)),
        (lines.mkString("\n") + "\n").getBytes("UTF-8"))
      val e = intercept[IllegalArgumentException] {
        new DeltaDataset(table).delete(col("k") === 7L)
      }
      assert(e.getMessage.contains("id-mode"))
    }
  }

  test("a mixed window interleaves cdc-authoritative and derived versions correctly") {
    withTempDir { dir =>
      val table = cdfTable(dir, (0L until 10L).map(i => (i, s"v$i")))
      val ds = new DeltaDataset(table)
      ds.append(Seq((100L, "a")).toDF("k", "v"))     // v2: derived (plain add)
      ds.delete(col("k") === 100L)                    // v3: cdc
      ds.append(Seq((200L, "b")).toDF("k", "v"))     // v4: derived
      val feed = DeltaChanges.readChanges(table, 1L, Some(4L)).get
      val got = feed.select("k", "_change_type", "_commit_version")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == Set((100L, "insert", 2L), (100L, "delete", 3L),
        (200L, "insert", 4L)))
    }
  }
}
