package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** One driver-checkable query: a Spark DataFrame builder over a
  * testdata directory plus (when SQL-expressible) the equivalent
  * DuckDB oracle SQL. Column names/aliases MUST match between the two
  * renderings — the driver's compare sorts columns by name before
  * hashing values.
  */
final case class Q(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

object Q {
  /** Read one driver testdata table.
    *
    * The `events.ts` column's physical type has varied across driver
    * testdata generations (TIMESTAMP(NANOS) read as bigint nanos under
    * `nanosAsLong`, vs TIMESTAMP_MICROS read as a timestamp). Every
    * query and operator in this repo is written against the bigint
    * epoch-nanos contract, and the DuckDB oracles use `epoch_us(ts)`
    * which is schema-agnostic on the DuckDB side — so normalize here,
    * at the single load point: a timestamp-typed `ts` becomes epoch
    * nanos (session TZ is UTC, so the NTZ→instant cast is identity).
    * A bigint `ts` passes through untouched.
    */
  /** Read one table with its row work DISTRIBUTED: the driver's
    * testdata packs each table into a single parquet row group, so a
    * plain scan is ONE task no matter how many cores the session has
    * — and any expensive per-row compute pipelined onto it
    * (tokenize/shingle/hash, vector math) serializes with it. Queries
    * whose plan shuffles the table anyway pay one tiny extra
    * exchange here to run that compute on every core instead.
    *
    * Use ONLY where heavy per-row work follows; plain `t` everywhere
    * else (operators that PROVE no-corpus-shuffle shapes — bloom
    * dedup, broadcast-probe ANN — must never route through this).
    * At 100 TB this helper is a no-op decision: real tables come in
    * many files/row groups and the scan parallelizes by itself. */
  def tp(s: SparkSession, dir: String, name: String,
         key: String): DataFrame =
    t(s, dir, name).repartition(col(key))

  /** Parquet schema per table path, inferred once per JVM — the
    * catalog's job, done by hand since these are bare paths. Every
    * `spark.read.parquet(path)` without an explicit schema runs a
    * footer-inference Spark job BEFORE the query's own jobs (one per
    * `t()` call — several hundred across a full sweep); passing the
    * known schema skips it. Metadata only — data is re-read by every
    * query — and keyed on the full path, so different testdata dirs
    * never cross. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path, p => s.read.parquet(p).schema)
    val df = s.read.schema(schema).parquet(path)
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampType) | Some(TimestampNTZType) =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case _ => df
    }
  }
}
