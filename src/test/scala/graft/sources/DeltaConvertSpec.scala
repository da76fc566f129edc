package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CONVERT TO DELTA: an existing parquet tree (plain or Hive `c=v`
  * layout) gains a `_delta_log` referencing its files in place — zero
  * bytes rewritten — after which the full Delta verb set works on it.
  * Refusals: existing logs, non-Hive layouts, depth mismatches. */
class DeltaConvertSpec extends SparkSpec {
  import spark.implicits._

  implicit private val s: org.apache.spark.sql.SparkSession = spark

  test("a HiveDataset root converts in place; every Delta verb then works") {
    withTempDir { dir =>
      val root = s"$dir/ds"
      val df = (0L until 300L).map(i => (i, s"v$i", s"p${i % 3}"))
        .toDF("k", "v", "p")
      new HiveDataset(root, Seq("p")).write(df)
      assert(DeltaWriter.convertToDelta(root, Seq("p")) == 0L)
      val snap = DeltaReader.snapshot(root).get
      assert(snap.partitionColumns == Seq("p"))
      assert(snap.files.forall(_.stats.isDefined),
        "converted adds must carry footer stats for data skipping")
      assertSameData(DeltaReader.scan(root).get, df)
      // it is a REAL table now: append, DV delete, time travel
      val ds = new DeltaDataset(root, Seq("p"))
      ds.append(Seq((900L, "new", "p0")).toDF("k", "v", "p"))
      ds.delete(col("k") < 10L)
      assert(DeltaReader.scan(root).get.count() == 291L)
      assert(DeltaReader.scan(root, Some(0L)).get.count() == 300L,
        "version 0 must read the pre-conversion rows exactly")
      // partition pruning from the converted layout (p1 = k ≡ 1 mod 3,
      // minus the DV-deleted k ∈ {1, 4, 7})
      assert(DeltaReader.readPartition(root, Map("p" -> "p1")).get
        .count() == 97L)
    }
  }

  test("an unpartitioned parquet dump converts; history records CONVERT") {
    withTempDir { dir =>
      val root = s"$dir/dump"
      (0L until 50L).map(i => (i, i * 2)).toDF("a", "b")
        .repartition(3).write.parquet(root)
      assert(DeltaWriter.convertToDelta(root) == 0L)
      assert(DeltaReader.scan(root).get.count() == 50L)
      val op = new DeltaDataset(root).history().get
        .orderBy(col("version")).head().getString(2)
      assert(op == "CONVERT")
    }
  }

  test("refusals: existing log, undeclared partition level, depth mismatch") {
    withTempDir { dir =>
      // existing _delta_log: never clobber a real table
      val t1 = s"$dir/t1"
      new DeltaDataset(t1).write(Seq(1L).toDF("v"))
      assert(intercept[IllegalArgumentException] {
        DeltaWriter.convertToDelta(t1)
      }.getMessage.contains("_delta_log"))
      // partitioned layout converted WITHOUT declaring the level
      val t2 = s"$dir/t2"
      Seq((1L, "A")).toDF("v", "p").write.partitionBy("p").parquet(t2)
      assert(intercept[IllegalArgumentException] {
        DeltaWriter.convertToDelta(t2)
      }.getMessage.contains("depth"))
      // plain dump converted WITH a declared level it does not have
      val t3 = s"$dir/t3"
      Seq(1L).toDF("v").write.parquet(t3)
      assert(intercept[IllegalArgumentException] {
        DeltaWriter.convertToDelta(t3, Seq("p"))
      }.getMessage.contains("depth"))
    }
  }

  test("typed partition columns: declared types land in the schema, reads compare numerically") {
    withTempDir { dir =>
      import org.apache.spark.sql.types._
      val root = s"$dir/typed"
      // two-digit vs one-digit values: lexicographic order would put
      // "10" < "9"; a typed conversion must compare numerically
      val df = Seq((1L, 9L), (2L, 10L), (3L, 9L)).toDF("k", "d")
      new HiveDataset(root, Seq("d")).write(df.selectExpr("k", "cast(d as string) AS d"))
      assert(DeltaWriter.convertToDelta(root, Seq("d"),
        partitionTypes = Map("d" -> LongType)) == 0L)
      val snap = DeltaReader.snapshot(root).get
      assert(snap.schema("d").dataType == LongType)
      val out = DeltaReader.scan(root).get
      assert(out.schema("d").dataType == LongType)
      assert(out.where(col("d") > 9L).count() == 1L,
        "numeric partition predicate must see long semantics, not string")
      // non-canonical values refuse: int-typing "007" would orphan its
      // directory the first time a writer renders 7 back to a path
      val bad = s"$dir/bad"
      new HiveDataset(bad, Seq("d")).write(
        Seq((1L, "007")).toDF("k", "d"))
      assert(intercept[IllegalArgumentException] {
        DeltaWriter.convertToDelta(bad, Seq("d"),
          partitionTypes = Map("d" -> IntegerType))
      }.getMessage.contains("canonically"))
      // a type name outside the partition spec refuses too
      assert(intercept[IllegalArgumentException] {
        DeltaWriter.convertToDelta(bad, Seq("d"),
          partitionTypes = Map("x" -> IntegerType))
      }.getMessage.contains("not in the declared partition columns"))
    }
  }
}
