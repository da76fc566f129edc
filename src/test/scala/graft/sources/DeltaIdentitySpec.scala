package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IDENTITY columns on the Delta writer (`delta.identity.*`, the
  * `identityColumns` writer feature): lattice allocation above the
  * persisted high watermark, watermark advancement through appends
  * and explicit-insert merges, GENERATED ALWAYS vs BY DEFAULT gating,
  * and first-writer-wins collision safety under concurrent
  * allocation. */
class DeltaIdentitySpec extends SparkSpec {
  import spark.implicits._

  implicit private val s: org.apache.spark.sql.SparkSession = spark

  private def hwmOf(table: String, col0: String): Option[Long] =
    DeltaWriter.identitySpecs(DeltaReader.snapshot(table).get.schema)
      .find(_.name == col0).flatMap(_.highWaterMark)

  test("allocation: appends without the column get lattice values above the watermark") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val ds = new DeltaDataset(table)
      // creation: the declaring frame's values are the initial
      // population; watermark stamps from the landed stats
      ds.write(DeltaWriter.asIdentity(
        Seq((10L, "a"), (20L, "b")).toDF("id", "v"), "id", start = 10L,
        step = 10L))
      assert(hwmOf(table, "id").contains(20L))
      val snap0 = DeltaReader.snapshot(table).get
      assert(snap0.protocol.minWriterVersion >= 6,
        "an identity table must demand legacy writer version 6")
      // raw append: no id column — allocated above the watermark
      ds.append(Seq("c", "d", "e").toDF("v"))
      val out = DeltaReader.scan(table).get.collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out.size == 5, "allocated ids must be distinct")
      val allocated = out.keySet -- Set(10L, 20L)
      assert(allocated.forall(i => i > 20L && (i - 10L) % 10L == 0L),
        s"allocated ids $allocated must sit on the lattice above the watermark")
      assert(hwmOf(table, "id").contains(allocated.max))
      // a second raw append allocates past the NEW watermark
      ds.append(Seq("f").toDF("v"))
      val all = DeltaReader.scan(table).get.select("id").collect()
        .map(_.getLong(0)).toSet
      assert(all.size == 6, "no collision across allocation rounds")
    }
  }

  test("GENERATED ALWAYS refuses explicit values; BY DEFAULT accepts and advances the watermark") {
    withTempDir { dir =>
      val always = s"$dir/a"
      val ds = new DeltaDataset(always)
      ds.write(DeltaWriter.asIdentity(
        Seq((1L, "x")).toDF("id", "v"), "id"))
      val e = intercept[IllegalArgumentException] {
        ds.append(Seq((99L, "y")).toDF("id", "v"))
      }
      assert(e.getMessage.contains("IDENTITY"))

      val byDefault = s"$dir/b"
      val bd = new DeltaDataset(byDefault)
      bd.write(DeltaWriter.asIdentity(
        Seq((1L, "x")).toDF("id", "v"), "id", allowExplicitInsert = true))
      bd.append(Seq((99L, "y")).toDF("id", "v")) // explicit, allowed
      assert(hwmOf(byDefault, "id").contains(99L))
      bd.append(Seq("z").toDF("v"))              // allocated PAST 99
      val zid = DeltaReader.scan(byDefault).get
        .where(col("v") === "z").head().getLong(0)
      assert(zid > 99L, s"allocation must clear the explicit watermark, got $zid")
    }
  }

  test("negative step allocates downward; watermark tracks the minimum") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val ds = new DeltaDataset(table)
      ds.write(DeltaWriter.asIdentity(
        Seq((-5L, "a")).toDF("id", "v"), "id", start = -5L, step = -5L))
      assert(hwmOf(table, "id").contains(-5L))
      ds.append(Seq("b", "c").toDF("v"))
      val ids = DeltaReader.scan(table).get.select("id").collect()
        .map(_.getLong(0)).toSet
      assert(ids.size == 3)
      assert((ids - (-5L)).forall(i => i < -5L && i % 5L == 0L),
        s"downward lattice violated: $ids")
      assert(hwmOf(table, "id").contains(ids.min))
    }
  }

  test("merge on BY DEFAULT advances the watermark; on ALWAYS it refuses") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val ds = new DeltaDataset(table)
      ds.write(DeltaWriter.asIdentity(
        Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "id",
        allowExplicitInsert = true))
      ds.merge(Seq((2L, "B"), (500L, "new")).toDF("id", "v"), Seq("id"))
      assert(DeltaReader.scan(table).get.count() == 3)
      assert(hwmOf(table, "id").contains(500L),
        "merge-provided identity values must advance the watermark")
      ds.append(Seq("tail").toDF("v"))
      val tid = DeltaReader.scan(table).get
        .where(col("v") === "tail").head().getLong(0)
      assert(tid > 500L, s"post-merge allocation must clear 500, got $tid")

      val strict = s"$dir/s"
      val sd = new DeltaDataset(strict)
      sd.write(DeltaWriter.asIdentity(Seq((1L, "a")).toDF("id", "v"), "id"))
      val e = intercept[IllegalArgumentException] {
        sd.merge(Seq((9L, "x")).toDF("id", "v"), Seq("id"))
      }
      assert(e.getMessage.contains("IDENTITY"))
    }
  }

  test("identity rides checkpoints and survives UPDATE unchanged") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val ds = new DeltaDataset(table)
      ds.write(DeltaWriter.asIdentity(
        Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "id"))
      (0 until 12).foreach(i => ds.append(Seq(s"r$i").toDF("v")))
      // enough commits for a checkpoint; the watermark must survive
      // checkpoint-anchored replay
      val ids = DeltaReader.scan(table).get.select("id").collect()
        .map(_.getLong(0)).toSet
      assert(ids.size == 14, "allocation must stay collision-free across a checkpoint")
      assert(hwmOf(table, "id").contains(ids.max))
      // UPDATE keeps identity values; SET-ing one refuses
      ds.update(col("v") === "a", Map("v" -> lit("A")))
      assert(DeltaReader.scan(table).get.select("id").collect()
        .map(_.getLong(0)).toSet == ids)
      val e = intercept[IllegalArgumentException] {
        ds.update(col("v") === "A", Map("id" -> lit(77L)))
      }
      assert(e.getMessage.contains("IDENTITY"))
    }
  }

  test("enforced predicates over an ALLOCATED identity column see the landed values") {
    // allocation rides monotonically_increasing_id (nondeterministic
    // across jobs), so the write path pins the frame whenever an
    // enforced predicate references an allocated column — validation
    // and landFiles must observe the SAME values
    withTempDir { dir =>
      import spark.implicits._
      val table = s"$dir/t"
      val ds = new DeltaDataset(table)
      val meta = new org.apache.spark.sql.types.MetadataBuilder()
        .putLong("delta.identity.start", 1L)
        .putLong("delta.identity.step", 1L)
        .putBoolean("delta.identity.allowExplicitInsert", true)
        .putString("delta.invariants",
          """{"expression":{"expression":"id > 0"}}""")
        .build()
      ds.write(Seq((1L, "a")).toDF("id", "v").withMetadata("id", meta))
      // every allocated value sits above the watermark (> 0): passes
      ds.append(Seq("b", "c").toDF("v"))
      val rows = DeltaReader.scan(table).get.collect()
        .map(r => r.getLong(0) -> r.getString(1))
      assert(rows.length == 3 && rows.map(_._1).distinct.length == 3)
      assert(rows.forall(_._1 > 0L))
      // a bound the allocation MUST cross: the refusal proves the
      // invariant is evaluated against actual allocated values
      val table2 = s"$dir/t2"
      val ds2 = new DeltaDataset(table2)
      val meta2 = new org.apache.spark.sql.types.MetadataBuilder()
        .putLong("delta.identity.start", 1L)
        .putLong("delta.identity.step", 1L)
        .putBoolean("delta.identity.allowExplicitInsert", true)
        .putString("delta.invariants",
          """{"expression":{"expression":"id <= 1"}}""")
        .build()
      ds2.write(Seq((1L, "a")).toDF("id", "v").withMetadata("id", meta2))
      val e = intercept[IllegalArgumentException](
        ds2.append(Seq("b", "c").toDF("v")))
      assert(e.getMessage.contains("invariant"))
    }
  }
}
