package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The tail-follow stream face: persisted-watermark polling over
  * [[DeltaChanges]], stream==batch parity over interleaved appends and
  * deletes, and exactly-once survival of crashes, duplicate polls and
  * watermark loss. */
class DeltaFollowSpec extends SparkSpec {
  import spark.implicits._

  implicit private val s: org.apache.spark.sql.SparkSession = spark

  test("followOnce: stream of polls == one batch mirror; watermark persists progress") {
    withTempDir { dir =>
      val src = s"$dir/src"
      val streamDst = s"$dir/stream_dst"
      val batchDst = s"$dir/batch_dst"
      val wmFile = s"$dir/ckpt/watermark"
      val sds = new DeltaDataset(src)

      // poll 1 covers v0..v1
      sds.write(Seq((1L, "a"), (2L, "b")).toDF("v", "s"))   // v0
      sds.append(Seq((3L, "c")).toDF("v", "s"))             // v1
      assert(DeltaFollow.followOnce(src, streamDst, wmFile) == 1L)
      assert(DeltaFollow.readWatermark(wmFile) == 1L)
      // poll 2 covers v2..v4 (a DV delete interleaved with appends)
      sds.delete($"v" === 2L)                               // v2
      sds.append(Seq((4L, "d")).toDF("v", "s"))             // v3
      sds.append(Seq((5L, "e")).toDF("v", "s"))             // v4
      assert(DeltaFollow.followOnce(src, streamDst, wmFile) == 4L)
      // idle poll: watermark unchanged, no commit added
      val dstHead = DeltaReader.snapshot(streamDst).get.version
      assert(DeltaFollow.followOnce(src, streamDst, wmFile) == 4L)
      assert(DeltaReader.snapshot(streamDst).get.version == dstHead)

      // stream == batch: the incremental polls equal one whole-history
      // mirror into a fresh destination
      DeltaChanges.mirrorAppends(src, batchDst, -1L)
      assertSameData(DeltaReader.scan(streamDst).get,
        DeltaReader.scan(batchDst).get)
    }
  }

  test("crash recovery: a lost watermark replays with zero duplicate effects") {
    withTempDir { dir =>
      val src = s"$dir/src"
      val dst = s"$dir/dst"
      val wmFile = s"$dir/ckpt/wm"
      val sds = new DeltaDataset(src)
      sds.write(Seq((1L, "a")).toDF("v", "s"))
      sds.append(Seq((2L, "b")).toDF("v", "s"))
      DeltaFollow.followOnce(src, dst, wmFile)
      // simulate a crash that lost the checkpoint AFTER the mirror
      // committed: the follower restarts from -1 and the destination's
      // SetTransaction watermark holds the line
      java.nio.file.Files.delete(java.nio.file.Paths.get(wmFile))
      sds.append(Seq((3L, "c")).toDF("v", "s"))
      assert(DeltaFollow.followOnce(src, dst, wmFile) == 2L)
      assertSameData(DeltaReader.scan(dst).get,
        Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("v", "s"))
    }
  }

  test("followStream: a live readStream-driven follower mirrors appends; restart duplicates nothing") {
    withTempDir { dir =>
      val src = s"$dir/src"
      val dst = s"$dir/dst"
      val wmFile = s"$dir/wm"
      def await(label: String)(cond: => Boolean): Unit = {
        val end = System.currentTimeMillis + 60000L
        while (!cond && System.currentTimeMillis < end) Thread.sleep(100)
        assert(cond, s"timed out waiting for $label")
      }
      val sds = new DeltaDataset(src)
      sds.write(Seq((1L, "a"), (2L, "b")).toDF("v", "s"))
      val q = DeltaFollow.followStream(src, dst, s"$dir/ck1",
        intervalMs = 100L)
      try {
        await("initial mirror")(DeltaReader.scan(dst)
          .exists(_.count() == 2L))
        sds.delete($"v" === 1L)
        sds.append(Seq((3L, "c")).toDF("v", "s"))
        await("append after delete")(DeltaReader.scan(dst)
          .exists(_.count() == 3L))
      } finally q.stop()
      // kill-and-restart with the STREAM checkpoint GONE (a fresh
      // location): the feed replays from version 0, and the
      // destination's per-version SetTransaction keys alone must
      // carry exactly-once
      sds.append(Seq((4L, "d")).toDF("v", "s"))
      val q2 = DeltaFollow.followStream(src, dst, s"$dir/ck2",
        intervalMs = 100L)
      try {
        await("post-restart catch-up")(DeltaReader.scan(dst)
          .exists(_.count() == 4L))
      } finally q2.stop()
      // ...and a restart RESUMING its checkpoint is equally clean
      sds.append(Seq((5L, "e")).toDF("v", "s"))
      val q3 = DeltaFollow.followStream(src, dst, s"$dir/ck2",
        intervalMs = 100L)
      try {
        await("resume catch-up")(DeltaReader.scan(dst)
          .exists(_.count() == 5L))
      } finally q3.stop()
      // a followOnce POLL is interchangeable with the stream (same
      // SetTransaction keys): it must re-apply nothing
      assert(DeltaFollow.followOnce(src, dst, wmFile) >= 4L)
      Thread.sleep(300) // a straggler tick must not double-apply
      assertSameData(DeltaReader.scan(dst).get,
        Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
          .toDF("v", "s"))
    }
  }

  test("foreachVersion delivers ordered per-version change frames and advances per version") {
    withTempDir { dir =>
      val src = s"$dir/src"
      val wmFile = s"$dir/wm"
      val sds = new DeltaDataset(src)
      sds.write(Seq(1L, 2L).toDF("v"))  // v0
      sds.append(Seq(3L).toDF("v"))     // v1
      sds.delete($"v" === 1L)           // v2
      val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
      val wm = DeltaFollow.foreachVersion(src, wmFile) { (v, ch) =>
        ch.select("v", "_change_type").collect()
          .foreach(r => seen += ((v, r.getString(1), r.getLong(0))))
      }
      assert(wm == 2L)
      assert(seen.toSet == Set(
        (0L, "insert", 1L), (0L, "insert", 2L),
        (1L, "insert", 3L), (2L, "delete", 1L)))
      assert(seen.map(_._1).toSeq == seen.map(_._1).sorted.toSeq)
      // a handler crash mid-stream resumes at the failed version
      sds.append(Seq(4L).toDF("v"))     // v3
      sds.append(Seq(5L).toDF("v"))     // v4
      var calls = 0
      intercept[RuntimeException](DeltaFollow.foreachVersion(src, wmFile) {
        (v, ch) => ch.count(); calls += 1
        if (v == 4L) throw new RuntimeException("boom")
      })
      assert(DeltaFollow.readWatermark(wmFile) == 3L)
      val resumed = scala.collection.mutable.ArrayBuffer.empty[Long]
      assert(DeltaFollow.foreachVersion(src, wmFile) { (v, _) =>
        resumed += v } == 4L)
      assert(resumed.toSeq == Seq(4L))
    }
  }
}
