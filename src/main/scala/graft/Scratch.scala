package graft

/** Dev scratch main — ad-hoc experiments only; not part of the
  * library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      spark.sharedState.cacheManager.clearCache()
    }
    time("q51 run1")(SparkEntry.queries("q51_minhash_estimate")(spark, dir).count())
    time("q51 run2")(SparkEntry.queries("q51_minhash_estimate")(spark, dir).count())
    time("q47 run1")(SparkEntry.queries("q47_curation_pipeline")(spark, dir).count())
    time("q47 run2")(SparkEntry.queries("q47_curation_pipeline")(spark, dir).count())
    time("q48 run1")(SparkEntry.queries("q48_top_tokens")(spark, dir).count())
    spark.stop()
  }
}
