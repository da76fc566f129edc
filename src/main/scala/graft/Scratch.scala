package graft

import graft.functions.VectorSql
import org.apache.spark.sql.functions._

/** Dev scratch main — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("q", col("embedding"))
    val df = emb.select(expr(VectorSql.spark.dotHof("embedding", "q")).as("d"))
    println("[scratch] analyzed:\n" + df.queryExecution.analyzed.expressions.map(_.treeString).mkString("\n"))
    spark.stop()
  }
}
