package graft

import org.apache.spark.sql.SparkSession

/** Dev-only micro-bench: time the named queries 3× each at the gate
  * config (sf0.1, local[4], shuffle=4) — for chasing per-query
  * regressions without a full Bench sweep. Not part of the driver
  * contract. */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.configure(SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.catalyst.GraftFunctions.register(spark)
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val qs = SparkEntry.queries
    args.foreach { name =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        qs(name)(spark, sfDir).count()
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        println(f"$name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
