package graft

/** Dev scratch main — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"

    // Multimodal plumbing over real data: opaque binary payloads.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("payload", col("text").cast("binary"))
    val decoded = graft.operators.Multimodal.withMeta(docs, "doc_id", "payload")
    println("[scratch] decoded sample:")
    decoded.select("id", "meta.kind", "meta.width", "meta.height", "meta.durationMs")
      .orderBy("id").show(5, false)
    val frames = graft.operators.Multimodal.frameSample(decoded.limit(3), fps = 0.5)
    println(s"[scratch] frames from 3 payloads: ${frames.count()}")
    frames.show(5, false)
    val resized = graft.operators.Multimodal.resizeMeta(decoded, 128)
    resized.select("id", "meta.width", "meta.height", "out_width", "out_height").show(3, false)

    // Streaming transforms in batch mode over the real events table.
    val events = spark.read.parquet(s"$dir/events.parquet")
    println("[scratch] windowedCounts:")
    graft.streaming.EventStream.windowedCounts(events).orderBy("window_start", "event_type").show(5, false)
    println("[scratch] sessionCounts:")
    graft.streaming.EventStream.sessionCounts(events).orderBy("user_id", "session_start").show(5, false)
    spark.stop()
  }
}
