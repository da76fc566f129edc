package graft.streaming

import graft.SparkSpec
import graft.sources.{DeltaChanges, DeltaDataset, DeltaReader}

/** The version-offset change-feed source (`format("graft-delta-cdf")`)
  * against its own batch reader: stream == batch over interleaved
  * appends, DV deletes and a RESTORE; checkpointed restart resumes at
  * the committed version without re-delivery; guards stay loud. */
class DeltaChangeSourceSpec extends SparkSpec {
  import spark.implicits._

  implicit private val s: org.apache.spark.sql.SparkSession = spark

  private def drain(url: String, sinkTable: String, ckDir: String,
                    startingVersion: Long = 0L): Unit = {
    val q = spark.readStream.format("graft-delta-cdf")
      .option("path", url)
      .option("startingVersion", startingVersion.toString)
      .load()
      .writeStream
      .format("memory")
      .queryName(sinkTable)
      .option("checkpointLocation", ckDir)
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  test("stream == batch across appends, DV deletes and a RESTORE") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val ds = new DeltaDataset(table)
      ds.write(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("v", "s")) // v0
      ds.append(Seq((4L, "d")).toDF("v", "s"))                      // v1
      ds.delete($"v" === 2L)                                        // v2 DV
      ds.append(Seq((5L, "e")).toDF("v", "s"))                      // v3
      ds.restore(1L)                                                // v4
      drain(table, "cdf_all", s"$dir/ck")
      val streamed = spark.table("cdf_all")
        .select("v", "s", "_change_type", "_commit_version").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSeq.sorted
      val batch = DeltaChanges.readChanges(table, -1L).get
        .select("v", "s", "_change_type", "_commit_version").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSeq.sorted
      assert(streamed == batch, "the stream must deliver exactly the " +
        "batch change feed")
      // spot-pin the RESTORE shape rode through: v4 re-inserts the
      // rows v2 deleted and deletes v3's insert
      assert(streamed.contains((2L, "b", "insert", 4L)))
      assert(streamed.contains((5L, "e", "delete", 4L)))
    }
  }

  test("checkpointed restart resumes at the committed version; no re-delivery") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val ck = s"$dir/ck"
      val ds = new DeltaDataset(table)
      // foreachBatch sink: the memory sink refuses checkpoint
      // recovery, and recovery is exactly what this test pins
      val seen = java.util.concurrent.ConcurrentHashMap
        .newKeySet[(Long, String, Long)]()
      def drainFb(): Unit = {
        val q = spark.readStream.format("graft-delta-cdf")
          .option("path", table).load()
          .writeStream
          .option("checkpointLocation", ck)
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.select("v", "_change_type", "_commit_version").collect()
              .foreach(r => seen.add(
                (r.getLong(0), r.getString(1), r.getLong(2)))); ()
          }
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      ds.write(Seq(1L, 2L).toDF("v"))   // v0
      ds.append(Seq(3L).toDF("v"))      // v1
      drainFb()
      assert(seen.size == 3)
      // new commits while the stream is DOWN...
      ds.delete($"v" === 1L)            // v2
      ds.append(Seq(4L).toDF("v"))      // v3
      // ...a resumed query (same checkpoint) delivers ONLY the new
      // window
      seen.clear()
      drainFb()
      val resumed = {
        import scala.jdk.CollectionConverters._
        seen.asScala.toSet
      }
      assert(resumed == Set((1L, "delete", 2L), (4L, "insert", 3L)),
        s"resume must start past the committed offset, got $resumed")
    }
  }

  test("maxVersionsPerBatch paces a long catch-up without losing a version") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val ds = new DeltaDataset(table)
      ds.write(Seq(0L).toDF("v"))                        // v0
      (1L to 6L).foreach(i => ds.append(Seq(i).toDF("v"))) // v1..v6
      val batches = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
      val q = spark.readStream.format("graft-delta-cdf")
        .option("path", table)
        .option("maxVersionsPerBatch", "2")
        .load()
        .writeStream
        .option("checkpointLocation", s"$dir/ck")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          batches.synchronized {
            batches += b.select("_commit_version").collect()
              .map(_.getLong(0)).toSet
          }; ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      val all = batches.synchronized(batches.toVector)
      // every version delivered exactly once, batches in order...
      assert(all.flatten.sorted == (0L to 6L) &&
        all.flatten.size == 7 &&
        all.sliding(2).forall {
          case Seq(a, b) => a.max < b.min
          case _ => true
        }, s"paced catch-up lost or reordered versions: $all")
      // ...and no window admitted more than 2 versions
      assert(all.forall(_.size <= 2),
        s"a batch exceeded the admission cap: $all")
      assert(all.size >= 4, s"7 versions at cap 2 need >= 4 batches: $all")
    }
  }

  test("startingVersion skips history; guards are loud") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val ds = new DeltaDataset(table)
      ds.write(Seq(1L).toDF("v"))       // v0
      ds.append(Seq(2L).toDF("v"))      // v1
      ds.append(Seq(3L).toDF("v"))      // v2
      drain(table, "cdf_sv", s"$dir/ck", startingVersion = 2L)
      assert(spark.table("cdf_sv").select("_commit_version").collect()
        .map(_.getLong(0)).toSet == Set(2L))
      // no table → loud at definition time
      val e = intercept[IllegalArgumentException] {
        spark.readStream.format("graft-delta-cdf")
          .option("path", s"$dir/nope").load()
      }
      assert(e.getMessage.contains("no Delta table"))
      // path required
      val e2 = intercept[IllegalArgumentException] {
        spark.readStream.format("graft-delta-cdf").load()
      }
      assert(e2.getMessage.contains("path"))
    }
  }
}
