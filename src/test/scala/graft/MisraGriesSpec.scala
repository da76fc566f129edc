package graft

import org.apache.spark.sql.functions._

/** Bounds and exact-regime checks for the native Misra–Gries
  * heavy-hitters aggregate (`graft_mg_topk`). */
class MisraGriesSpec extends SparkSpec {

  private def summarize(rows: Seq[String], capacity: Int): Map[String, Long] = {
    import spark.implicits._
    rows.toDF("item").repartition(8) // force partial summaries + merges
      .selectExpr(s"graft_mg_topk(item, $capacity) AS s")
      .selectExpr("explode(s) AS e")
      .select(col("e.item"), col("e.count_lo"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("exact regime: capacity >= distinct items reproduces exact counts under merging") {
    val rows = (0 until 1000).map(i => s"tok${i % 13}")
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(summarize(rows, capacity = 64) == exact)
  }

  test("approximate regime: under-estimates within n/(k+1); guaranteed heavy hitters present") {
    val cap = 4
    val rows = Seq.fill(2000)("h1") ++ Seq.fill(1200)("h2") ++
      (0 until 18).flatMap(j => Seq.fill(100)(s"l$j")) // n = 5000
    val n = rows.size
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = summarize(rows, cap)
    assert(got.size <= cap)
    got.foreach { case (item, c) =>
      assert(c <= exact(item), s"$item over-estimated: $c > ${exact(item)}")
      assert(exact(item) - c <= n / (cap + 1),
        s"$item under-estimated past the bound: $c vs ${exact(item)}")
    }
    // every item with true count > n/(cap+1) = 1000 must be present
    assert(got.contains("h1") && got.contains("h2"))
  }

  test("nulls ignored; output sorted by (count desc, item)") {
    import spark.implicits._
    val df = Seq(Some("b"), None, Some("a"), Some("b"), None).toDF("item")
    val arr = df.selectExpr("graft_mg_topk(item, 8) AS s")
      .selectExpr("explode(s) AS e")
      .select(col("e.item"), col("e.count_lo"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(arr == Seq(("b", 2L), ("a", 1L)))
  }

  test("streaming: state-store buffer merge across micro-batches equals batch (exact regime)") {
    // The same mergeable-summary rule that makes the aggregate safe
    // under any partial-aggregation plan must also make it safe under
    // Structured Streaming's state store, where each micro-batch's
    // partial summary merges into the persisted buffer. Witnessed in
    // the exact regime (capacity >= distinct items), where the result
    // is order-independent and must equal true counts over the full
    // replay regardless of how rows were split across batches.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val query = mem.toDF().toDF("item")
      .selectExpr("graft_mg_topk(item, 16) AS s")
      .writeStream.format("memory").queryName("mg_stream_out")
      .outputMode("complete").start()
    def streamed(): Map[String, Long] =
      spark.table("mg_stream_out")
        .selectExpr("explode(s) AS e")
        .select(col("e.item"), col("e.count_lo"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    try {
      val b1 = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")
      val b2 = Seq.fill(4)("b") ++ Seq.fill(2)("d") ++ Seq("a")
      mem.addData(b1: _*)
      query.processAllAvailable()
      assert(streamed() == Map("a" -> 5L, "b" -> 3L, "c" -> 1L))
      mem.addData(b2: _*)
      query.processAllAvailable()
      val exact = (b1 ++ b2).groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(streamed() == exact,
        "cross-batch state merge diverged from batch counts")
    } finally query.stop()
  }
}
