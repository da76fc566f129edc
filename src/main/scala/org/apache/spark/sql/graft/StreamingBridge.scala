package org.apache.spark.sql.graft

import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.{DataFrame, Row}

/** The one `private[sql]` doorway a DataSource-v1 streaming source
  * needs: `MicroBatchExecution` asserts that the frame `getBatch`
  * returns carries `isStreaming = true` in its logical plan, and the
  * only public-ish constructor for such a frame is
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)`.
  * This object lives under `org.apache.spark.sql` purely to reach it —
  * the standard extension-point shim every out-of-tree v1 source
  * carries; no Spark internals are modified or shadowed.
  *
  * The returned frame wraps the batch plan's `toRdd` LAZILY: no job
  * runs here, the micro-batch executes distributed exactly as the
  * batch plan would. */
object StreamingBridge {
  def streamingFrame(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[Dataset[Row]]
    val spark = ds.sparkSession.asInstanceOf[SparkSession]
    spark.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = true)
  }
}
