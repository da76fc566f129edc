package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  /** Read one driver testdata table. */
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")
}
