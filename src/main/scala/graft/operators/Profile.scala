package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass column profiling: per-column row/null/distinct counts
  * and lexicographic min/max (string-rendered, so one output schema
  * covers every input type).
  *
  * Not in the reference (polario exposes only schema inspection via
  * its CLI — main.py's `schema` verb); a data-quality extension every
  * curation pipeline needs before trusting a new drop of data.
  *
  * Scale shape: ONE aggregation pass over the table computes every
  * column's stats together (Spark plans the multi-distinct aggregate
  * via Expand — one shuffle whose row count is input × distinct-
  * column count). That beats per-column scans (n_cols full table
  * reads) up to the Expand blow-up; profiling MANY high-cardinality
  * columns at 100 TB should switch `exactDistinct = false`, which
  * swaps the Expand for mergeable HLL++ sketches (one shuffle, no
  * blow-up, ±rsd accuracy). min/max/null counts are plain partial
  * aggregates either way.
  */
object Profile {

  /** One row per profiled column:
    * `(column_name, n_rows, n_nulls, n_distinct, min_value,
    * max_value)`. `exactDistinct = false` uses
    * `approx_count_distinct` (HLL++, default rsd) — the 100 TB
    * setting; keep exact for oracle-verified runs. */
  def profile(df: DataFrame, cols: Seq[String],
              exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in dataframe: ${missing.mkString(", ")}")
    // Names are spliced into the stack() melt — a quote/comma/backtick
    // would corrupt the expression, so restrict to safe identifiers.
    cols.foreach { c =>
      require(c.matches("[A-Za-z0-9_]+"),
        s"column name '$c' must match [A-Za-z0-9_]+ (it is spliced into the melt SQL)")
    }
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        (if (exactDistinct) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c).cast("string")).as(s"__mn_$c"),
        max(col(c).cast("string")).as(s"__mx_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // Melt the single stats row into one row per column.
    one.select(expr(
      s"stack(${cols.size}, " +
        cols.map(c => s"'$c', __n, __nn_$c, __nd_$c, __mn_$c, __mx_$c").mkString(", ") +
        ") AS (column_name, n_rows, n_nulls, n_distinct, min_value, max_value)"))
  }
}
