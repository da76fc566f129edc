package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed range join: left row (key, tl) matches right rows (key,
  * tr) with `tl - before <= tr <= tl`.
  *
  * Spark plans a naive range predicate as a broadcast-nested-loop or
  * cartesian join — quadratic on hot keys. Here both sides are
  * BUCKETIZED on time (bucket width = `before`): a right row lands in
  * bucket floor(tr/w); a left row's window can only overlap buckets
  * floor((tl-before)/w)..floor(tl/w) (at most 2 when w = before), so
  * the join becomes an EQUI-join on (key, bucket) — one hash shuffle,
  * AQE-skew-splittable — followed by the exact range filter. The
  * classic interval-bucketing technique for time-window joins at
  * scale.
  */
object RangeJoin {

  /** @param keys     equi-key columns present on both sides
    * @param leftTime / rightTime numeric (e.g. epoch micros) columns
    * @param before   window length, same unit as the time columns
    */
  def priorWindowJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTime: String, rightTime: String, before: Long): DataFrame = {
    require(before > 0, "window must be positive")
    // Exact integer division for bucket ids (double division could
    // misbucket boundary values by one ulp; the post-filter would then
    // silently DROP true matches, not just keep false ones).
    val w = before
    val lb = left.withColumn("__bucket",
      explode(sequence(
        expr(s"($leftTime - ${before}L) div ${w}L"),
        expr(s"$leftTime div ${w}L"))))
    val rb = right.withColumn("__bucket", expr(s"$rightTime div ${w}L"))
    lb.join(rb, keys :+ "__bucket")
      .where(col(rightTime) >= col(leftTime) - before && col(rightTime) <= col(leftTime))
      .drop("__bucket")
  }
}
