package graft

/** Dev scratch main — ad-hoc experiments only; not part of the
  * library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val dir = "/root/testdata/sf0.01"
    val names = Seq("q49_pivot_events", "q53_incremental_dedup", "q54_embed_normalize",
      "q19_asof_join", "q25_range_join", "q26_salted_agg")
    val out = new java.io.PrintWriter("/tmp/explains2.txt")
    names.foreach { n =>
      out.println(s"\n======== $n ========")
      out.println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    out.close()
    println("[scratch] wrote /tmp/explains2.txt")
    spark.stop()
  }
}
