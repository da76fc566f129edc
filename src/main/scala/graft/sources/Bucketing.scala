package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table helpers: co-locate join/aggregation keys at WRITE
  * time so repeated joins on those keys run with NO shuffle.
  *
  * This is the storage-layout half of the 100 TB design: a fact table
  * bucketed (and sorted) by its join key turns every subsequent
  * sort-merge join against an identically-bucketed dimension into a
  * zero-exchange, zero-sort plan — the shuffle is paid once at ingest
  * instead of once per query. (The reference's layout story stops at
  * Hive partition directories — hive_dataset.py:130-132; bucketing is
  * the natural Spark extension for high-cardinality keys where one
  * directory per value is infeasible.)
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed table.
    *
    * The pre-write `repartition(buckets, key)` uses the same hash
    * function as the bucketing layer, so every bucket is written by
    * exactly one task → ONE file per bucket. That's what lets the
    * planner elide not just the Exchange but also the per-side Sort
    * on reads (with many files per bucket, only inter-file order is
    * unknown and Spark must re-sort). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write
      .mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two identically-bucketed tables on their bucket keys —
    * plans as a sort-merge join with no Exchange on either side. */
  def coLocatedJoin(spark: org.apache.spark.sql.SparkSession,
                    leftTable: String, rightTable: String,
                    leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).join(
      spark.table(rightTable),
      org.apache.spark.sql.functions.col(leftKey) ===
        org.apache.spark.sql.functions.col(rightKey))
}
