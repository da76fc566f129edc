package graft

/** Dev scratch main — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val dir = "/root/testdata/sf0.01"
    val names = Seq("q01_pricing_summary", "q02_filter_revenue", "q03_revenue_by_nation",
      "q05_top_orders", "q16_events_hourly", "q33_lsh_near_dup_pairs",
      "q35_blocked_jaccard", "q40_cosine_topk", "q43_embed_near_dup")
    val out = new java.io.PrintWriter("/tmp/explains.txt")
    names.foreach { n =>
      out.println(s"\n======== $n ========")
      val df = SparkEntry.queries(n)(spark, dir)
      out.println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    out.close()
    println("[scratch] wrote /tmp/explains.txt")
    spark.stop()
  }
}
