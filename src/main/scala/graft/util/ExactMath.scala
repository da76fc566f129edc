package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Exact integer math building blocks shared by the statistics
  * operators ([[graft.operators.EvalStats]] Wilson intervals,
  * [[graft.operators.TimeSeries]] series correlation).
  *
  * The centerpiece is the deterministic INTEGER SQUARE ROOT: IEEE-754
  * `sqrt` is correctly rounded, and so is the BIGINT/DECIMAL→double
  * conversion, so `floor(sqrt(double(x)))` is engine-independent and
  * lands within ±2 of the true `isqrt(x)` even once `x` exceeds 2⁵³
  * (the conversion's relative error ~2⁻⁵³ maps to an absolute sqrt
  * error ≪ 1 for x ≤ ~10³⁰). Two down- and two up-corrections
  * against EXACT DECIMAL(38,0) squaring then pin the result — the
  * identical ladder is rendered in the DuckDB oracles
  * ([[duckIsqrtLadder]]), so both engines agree bit-for-bit.
  */
object ExactMath {

  /** Append `outCol` = exact `isqrt(xCol)` (xCol non-negative,
    * DECIMAL(38,0)-compatible). Adds 4 internal `outCol__sN`
    * correction columns; drop them upstream if they bother you —
    * the final projection of every caller does. */
  def withIsqrt(df: DataFrame, xCol: String, outCol: String): DataFrame = {
    val s = (0 to 3).map(i => s"${outCol}__s$i")
    df.withColumn(s(0), expr(
        s"cast(floor(sqrt(cast($xCol as double))) as decimal(38,0))"))
      .withColumn(s(1), expr(
        s"${s(0)} - CASE WHEN ${s(0)} * ${s(0)} > $xCol THEN 1 ELSE 0 END"))
      .withColumn(s(2), expr(
        s"${s(1)} - CASE WHEN ${s(1)} * ${s(1)} > $xCol THEN 1 ELSE 0 END"))
      .withColumn(s(3), expr(
        s"${s(2)} + CASE WHEN (${s(2)} + 1) * (${s(2)} + 1) <= $xCol " +
          "THEN 1 ELSE 0 END"))
      .withColumn(outCol, expr(
        s"${s(3)} + CASE WHEN (${s(3)} + 1) * (${s(3)} + 1) <= $xCol " +
          "THEN 1 ELSE 0 END"))
  }

  /** The DuckDB rendering of the same ladder, as chained CTE bodies:
    * returns the five `SELECT *, ... AS <step>` clauses to splice as
    * successive CTEs over a relation exposing `xExpr` named `x`.
    * Kept here so the Spark and oracle renderings can't drift. */
  def duckIsqrtSteps(out: String): Seq[String] = Seq(
    s"SELECT *, floor(sqrt(x::DOUBLE))::HUGEINT AS ${out}_s0",
    s"SELECT *, ${out}_s0 - CASE WHEN ${out}_s0 * ${out}_s0 > x THEN 1 ELSE 0 END AS ${out}_s1",
    s"SELECT *, ${out}_s1 - CASE WHEN ${out}_s1 * ${out}_s1 > x THEN 1 ELSE 0 END AS ${out}_s2",
    s"SELECT *, ${out}_s2 + CASE WHEN (${out}_s2 + 1) * (${out}_s2 + 1) <= x THEN 1 ELSE 0 END AS ${out}_s3",
    s"SELECT *, ${out}_s3 + CASE WHEN (${out}_s3 + 1) * (${out}_s3 + 1) <= x THEN 1 ELSE 0 END AS $out")
}
