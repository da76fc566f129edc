package graft

/** Dev scratch main — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val dir = "/root/testdata/sf0.001"
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val q = graft.streaming.EventStream.runningUserTotals(stream)
      .writeStream.format("memory").queryName("totals").outputMode("update").start()
    q.processAllAvailable()
    val rows = spark.table("totals")
    println(s"[scratch] users with totals: ${rows.count()}")
    rows.orderBy(org.apache.spark.sql.functions.col("user_id")).show(5, false)
    q.stop()
    spark.stop()
  }
}
