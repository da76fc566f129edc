package graft

/** Dev scratch main — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val q15 = SparkEntry.queries("q15_json_extract")
    time("q15 run1")(q15(spark, dir).count())
    time("q15 run2")(q15(spark, dir).count())
    import org.apache.spark.sql.functions._
    val ev = spark.read.parquet(s"$dir/events.parquet")
    time("events count")(ev.count())
    time("get_json_object only")(
      ev.select(get_json_object(col("props"), "$.k").cast("int").as("k")).agg(sum("k")).count())
    time("regexp variant")(
      ev.select(regexp_extract(col("props"), "([0-9]+)", 1).cast("int").as("k")).agg(sum("k")).count())
    q15(spark, dir).explain("formatted")
    spark.stop()
  }
}
