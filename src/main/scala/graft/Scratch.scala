package graft

/** Dev scratch main — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      spark.sharedState.cacheManager.clearCache()
    }
    time("q35")(SparkEntry.queries("q35_blocked_jaccard")(spark, dir).count())
    time("q33")(SparkEntry.queries("q33_lsh_near_dup_pairs")(spark, dir).count())
    time("q35 again")(SparkEntry.queries("q35_blocked_jaccard")(spark, dir).count())
    time("q33 again")(SparkEntry.queries("q33_lsh_near_dup_pairs")(spark, dir).count())
    spark.stop()
  }
}
