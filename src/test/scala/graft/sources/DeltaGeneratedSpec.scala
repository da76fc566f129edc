package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** GENERATED columns on the Delta writer (`delta.generationExpression`
  * — the `generatedColumns` writer feature): missing columns computed
  * on write/append/merge, provided values validated against the
  * derivation, UPDATE recomputes after assignments, and — the scale
  * payoff — a range on the RAW base column partition-prunes through a
  * monotone generation expression without the caller ever naming the
  * partition column. */
class DeltaGeneratedSpec extends SparkSpec {
  import spark.implicits._

  implicit private val s: org.apache.spark.sql.SparkSession = spark

  private def ts(d: Int, h: Int): Timestamp =
    Timestamp.valueOf(f"2024-03-$d%02d $h%02d:00:00")

  private def evts(n: Int) = (0 until n).map { i =>
    (i.toLong, ts(1 + i % 9, i % 24), s"e$i")
  }.toDF("id", "event_ts", "payload")

  private def declared(df: org.apache.spark.sql.DataFrame) =
    DeltaWriter.asGenerated(
      df.withColumn("event_date", expr("CAST(event_ts AS DATE)")),
      "event_date", "CAST(event_ts AS DATE)")

  test("creation declares the derivation; appends without the column compute it") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val ds = new DeltaDataset(table, Seq("event_date"))
      ds.write(declared(evts(40)))                       // v0: provided+validated
      val snap = DeltaReader.snapshot(table).get
      assert(snap.protocol.minWriterVersion >= 4,
        "a generated-column table must demand legacy writer version 4")
      assert(snap.schema("event_date").metadata
        .getString("delta.generationExpression") == "CAST(event_ts AS DATE)")
      ds.append(evts(80).where(col("id") >= 40))         // v1: raw, no event_date
      val out = DeltaReader.scan(table).get
      assert(out.count() == 80)
      assert(out.where(col("event_date") =!= expr("CAST(event_ts AS DATE)"))
        .isEmpty, "computed partition values must satisfy the derivation")
    }
  }

  test("provided values that contradict the derivation refuse loudly") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val ds = new DeltaDataset(table, Seq("event_date"))
      ds.write(declared(evts(10)))
      val bad = evts(10)
        .withColumn("event_date", expr("CAST(event_ts AS DATE) + 1"))
      val e = intercept[IllegalArgumentException] { ds.append(bad) }
      assert(e.getMessage.contains("GENERATED"))
    }
  }

  test("raw-column range prunes generated date partitions without naming them") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val ds = new DeltaDataset(table, Seq("event_date"))
      ds.write(declared(evts(200)))
      val snap = DeltaReader.snapshot(table).get
      val nParts = snap.files.map(_.partitionValues("event_date")).toSet.size
      assert(nParts >= 5, s"need a real partition spread, got $nParts")
      // constrain ONLY event_ts: the reader must derive the
      // event_date range through CAST(event_ts AS DATE)
      val ranges = Seq(("event_ts",
        "2024-03-02 00:00:00", "2024-03-03 23:59:59"))
      val kept = DeltaReader.prunedSnapshot(table, ranges).get.files
      val keptParts = kept.map(_.partitionValues("event_date")).toSet
      assert(keptParts.subsetOf(Set("2024-03-02", "2024-03-03")),
        s"derived pruning kept partitions $keptParts")
      assertSameData(
        DeltaReader.scanPruned(table, ranges).get,
        DeltaReader.scan(table).get
          .where(col("event_ts").between(ranges.head._2, ranges.head._3)))
    }
  }

  test("non-monotone shapes derive nothing; monotone whitelist shapes derive") {
    assert(DeltaReader.monotoneGenerationBase("CAST(ts AS DATE)").contains("ts"))
    assert(DeltaReader.monotoneGenerationBase("to_date(ts)").contains("ts"))
    assert(DeltaReader.monotoneGenerationBase("date_trunc('week', ts)").contains("ts"))
    assert(DeltaReader.monotoneGenerationBase("year(ts)").contains("ts"))
    assert(DeltaReader.monotoneGenerationBase("substring(name, 1, 3)").contains("name"))
    assert(DeltaReader.monotoneGenerationBase("date_format(ts, 'yyyy-MM')").contains("ts"))
    assert(DeltaReader.monotoneGenerationBase("month(ts)").isEmpty,
      "month is not monotone across years — deriving a range would be unsound")
    assert(DeltaReader.monotoneGenerationBase("day(ts)").isEmpty)
    assert(DeltaReader.monotoneGenerationBase("substring(name, 2, 3)").isEmpty,
      "a non-prefix substring is not order-preserving")
    assert(DeltaReader.monotoneGenerationBase("ts + INTERVAL 1 DAY").isEmpty)
  }

  test("a STRING-typed base derives nothing — lexicographic order is not date order") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val ds = new DeltaDataset(table, Seq("d"))
      // base column is a STRING: '2024-1-01' < '2024-10-5' < '2024-9-30'
      // lexicographically, which disagrees with the cast dates — a
      // derived [cast(lo), cast(hi)] range would silently drop rows
      val df = DeltaWriter.asGenerated(
        Seq("2024-01-05", "2024-1-07", "2024-10-15", "2024-9-20")
          .toDF("raw")
          .withColumn("d", expr("CAST(raw AS DATE)")),
        "d", "CAST(raw AS DATE)")
      ds.write(df)
      val ranges = Seq(("raw", "2024-1-01", "2024-9-30"))
      // '2024-10-15' is INSIDE the string range but its cast date is
      // past a derived hi of 2024-09-30 — an unsound derivation would
      // prune its partition; raw-column STATS pruning (string order,
      // matching filter semantics) may still drop other files
      val kept = DeltaReader.prunedSnapshot(table, ranges).get.files
        .flatMap(_.partitionValues.get("d")).toSet
      assert(kept.contains("2024-10-15"),
        s"the string-typed base must not derive date pruning, kept $kept")
      assertSameData(
        DeltaReader.scanPruned(table, ranges).get,
        DeltaReader.scan(table).get
          .where(col("raw").between("2024-1-01", "2024-9-30")))
    }
  }

  test("UPDATE refuses SET on the generated column and recomputes it when the base moves") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val ds = new DeltaDataset(table, Seq("event_date"))
      ds.write(declared(evts(30)))
      val e = intercept[IllegalArgumentException] {
        ds.update(col("id") === 1L,
          Map("event_date" -> lit(java.sql.Date.valueOf("2030-01-01"))))
      }
      assert(e.getMessage.contains("GENERATED"))
      // move a row's base timestamp: its partition value must follow
      ds.update(col("id") === 1L,
        Map("event_ts" -> lit(ts(9, 12))))
      val moved = DeltaReader.scan(table).get.where(col("id") === 1L)
        .select(col("event_date").cast("string")).head().getString(0)
      assert(moved == "2024-03-09", s"row moved to partition $moved")
      assert(DeltaReader.scan(table).get
        .where(col("event_date") =!= expr("CAST(event_ts AS DATE)")).isEmpty)
    }
  }

  test("MERGE computes the generated column on a raw source; evolution cannot add one") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val ds = new DeltaDataset(table, Seq("event_date"))
      ds.write(declared(evts(20)))
      // raw source (no event_date): upsert ids 10..24 with new payloads
      val src = (10 until 25).map { i =>
        (i.toLong, ts(1 + i % 9, i % 24), s"upd$i") }
        .toDF("id", "event_ts", "payload")
      ds.merge(src, Seq("id"))
      val out = DeltaReader.scan(table).get
      assert(out.count() == 25)
      assert(out.where(col("id") === 12L).select("payload")
        .head().getString(0) == "upd12")
      assert(out.where(col("event_date") =!= expr("CAST(event_ts AS DATE)"))
        .isEmpty)
      // evolving IN a generated column is refused
      val evolved = DeltaWriter.asGenerated(
        evts(5).withColumn("y", expr("year(event_ts)")), "y", "year(event_ts)")
      val e = intercept[IllegalArgumentException] {
        ds.append(evolved, mergeSchema = true)
      }
      assert(e.getMessage.contains("GENERATED"))
    }
  }
}
