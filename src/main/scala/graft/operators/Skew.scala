package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling primitives: salting for hot keys.
  *
  * AQE's skew-join splitting (enabled in GraftSession) handles most
  * runtime skew; salting is the explicit fallback for the cases AQE
  * can't fix — a skewed AGGREGATION (one reducer owns the hot key) or
  * a skewed join where the hot-key side must be split determinately.
  *
  * Two-phase aggregate: group on (key, salt) first (spreads the hot
  * key over `salts` reducers), then re-group on key to combine the
  * partials. Both phases are map-side-combinable, so total shuffled
  * bytes stay the same — only the per-reducer maximum drops.
  *
  * Salted join: the skewed (big) side gets a random-but-deterministic
  * salt in [0, salts); the small side is replicated once per salt
  * value; the join key becomes (key, salt). Replication factor =
  * `salts`, so pick the smallest value that flattens the hot key.
  */
object Skew {

  /** Deterministic salt from arbitrary columns (NOT rand(): re-runs
    * and retried tasks must salt identically or results change). */
  def saltCol(salts: Int, from: String): org.apache.spark.sql.Column =
    pmod(xxhash64(col(from)), lit(salts))

  /** Two-phase (salted) sum/count aggregation over one hot key space:
    * returns key -> (sum of `valueCol` as decimal-exact double, count).
    *
    * `decimalScale` is the scale values are rounded to BEFORE summing
    * (half-up): exact for fixed-point money columns at their native
    * scale (the decimal sum is order-independent, unlike sum(double)),
    * lossy for inputs with more fractional digits — raise the scale to
    * cover the input's precision in that case. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     salts: Int, saltFrom: String,
                     decimalScale: Int = 2): DataFrame = {
    val partial = df
      .withColumn("__salt", saltCol(salts, saltFrom))
      .groupBy(col(key), col("__salt"))
      .agg(
        sum(col(valueCol).cast(s"decimal(${18 min (decimalScale + 16)},$decimalScale)")).as("__psum"),
        count(lit(1)).as("__pcnt"))
    partial
      .groupBy(col(key))
      .agg(
        sum(col("__psum")).cast("double").as("sum_value"),
        sum(col("__pcnt")).as("n"))
  }

  /** Salted equi-join: `big` (skewed) x `small`. `small` is exploded
    * `salts`-fold; the shuffled key becomes (key, salt). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int, saltFrom: String): DataFrame = {
    val b = big.withColumn("__salt", saltCol(salts, saltFrom))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Pre-join EXPLOSION guard: the `topN` join keys by output
    * cardinality `n_left · n_right` — run it before any join whose
    * key might be low-selectivity (the classic incident: a "unique"
    * key that isn't, and a join that emits billions). Products ride
    * DECIMAL(38,0); the report is what you read before deciding to
    * dedup, salt, or aggregate first.
    *
    * Scale shape: one keyed count per side (map-side combined), one
    * key equi-join of two count tables, TakeOrdered top-N. */
  def joinBlowupReport(left: DataFrame, right: DataFrame, keyCol: String,
                       topN: Int): DataFrame = {
    require(topN >= 1, "topN must be positive")
    def counts(df: DataFrame, out: String) =
      df.groupBy(col(keyCol).cast("string").as("key_value"))
        .agg(count(lit(1)).cast("bigint").as(out))
    counts(left, "n_left").join(counts(right, "n_right"), "key_value")
      .withColumn("n_pairs",
        (col("n_left").cast("decimal(38,0)") * col("n_right")).cast("bigint"))
      .orderBy(col("n_pairs").desc, col("key_value"))
      .limit(topN)
  }

  /** Pre-join skew DIAGNOSIS (the report you read before reaching for
    * [[saltedJoin]]): the `topN` hottest key values with their share
    * of all rows and `ratio_to_avg_ppm` — how many millionths-of-×
    * the average key the hot key carries (`1e6·n·nkeys div total`,
    * exact integers; 1e6 = perfectly uniform). A ratio around
    * `salts × 1e6` is the signal to salt by that factor.
    *
    * Scale shape: one keyed count (map-side combined), top-N via
    * TakeOrdered (never a key-cardinality window), scalars broadcast.
    * The rank window runs over the N collected candidates only. */
  def keySkewReport(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topN >= 1, "topN must be positive")
    val c = df.groupBy(col(keyCol).cast("string").as("key_value"))
      .agg(count(lit(1)).cast("bigint").as("n"))
    val t = c.agg(sum(col("n")).cast("bigint").as("__tot"),
      count(lit(1)).cast("bigint").as("__nkeys"))
    val top = c.orderBy(col("n").desc, col("key_value")).limit(topN)
    val w = Window.orderBy(col("n").desc, col("key_value"))
    top.crossJoin(broadcast(t))
      .withColumn("rk", row_number().over(w).cast("int"))
      .withColumn("share", col("n").cast("double") / col("__tot").cast("double"))
      .withColumn("ratio_to_avg_ppm",
        expr("(CAST(1000000 AS DECIMAL(38,0)) * n * __nkeys) div __tot")
          .cast("bigint"))
      .select(col("rk"), col("key_value"), col("n"), col("share"),
        col("ratio_to_avg_ppm"))
      .orderBy("rk")
  }
}
