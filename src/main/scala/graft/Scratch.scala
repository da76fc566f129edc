package graft

/** Dev scratch main — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val dir = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_ingest").toString
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val ds = graft.sources.HiveDataset(s"$tmp/data", Seq("event_type"))(spark)
    val q = graft.streaming.EventStream.appendTo(stream, ds, s"$tmp/ckpt")
    q.processAllAvailable(); q.stop()
    println(s"[scratch] ingested rows: ${ds.scan().get.count()}")
    println(s"[scratch] partitions: ${ds.partitionPaths().mkString(", ")}")
    spark.stop()
  }
}
