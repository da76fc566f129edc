package graft

import graft.functions.TextHash
import org.apache.spark.sql.functions._

/** Dev scratch main — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = docs.select(expr(TextHash.spark.rollingHashHof("text")).as("h"))
    println("[scratch] analyzed:\n" + df.queryExecution.analyzed.expressions.head.treeString)
    spark.stop()
  }
}
