package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the LATEST right row with
  * `rightTime <= leftTime` within the same key group (inclusive; ties
  * among right rows broken by the ordering column, highest wins).
  *
  * Null-key semantics: rows whose key values are null form ONE group
  * and match each other (Window.partitionBy treats nulls as equal) —
  * unlike a SQL equi-join, where null keys never match. Filter null
  * keys out first if join semantics are required.
  *
  * The reference has no join operators at all (SURVEY.md §2.3); this
  * is an extension operator Spark also lacks natively.
  *
  * Scale design (100 TB): implemented as union → ONE shuffle on the
  * key → per-key sort → running `last(ignoreNulls)` carry-forward,
  * i.e. O(n log n) per key and never a time-range cross join (the
  * naive `l JOIN r ON key AND tr <= tl` + argmax explodes
  * quadratically on hot keys). The carried payload is a single STRUCT
  * so all right-side columns travel atomically (independent per-column
  * carries would mix rows when payloads contain nulls).
  */
object AsofJoin {

  /** @param left       left frame
    * @param right      right frame
    * @param keys       equi-join key columns (same names both sides)
    * @param leftTime   left ordering column (numeric or timestamp)
    * @param rightTime  right ordering column
    * @param rightCols  right payload columns to attach (prefixed `r_`
    *                   in the output)
    * @param rightOrd   deterministic tie-break column among right rows
    *                   with equal time (e.g. an id)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               rightCols: Seq[String], rightOrd: String): DataFrame =
    asofImpl(left, right, keys, leftTime, rightTime, rightCols, rightOrd,
      forward = false)

  /** FORWARD as-of join — pandas `merge_asof(direction='forward')` /
    * kdb `aj` mirrored: for each left row, the EARLIEST right row
    * with `rightTime >= leftTime` (inclusive; ties among right rows
    * broken by `rightOrd`, lowest wins). The "next reading after the
    * order" / "first response after the alert" lookup the backward
    * join cannot express. Same union → one-shuffle → shared-sort
    * carry shape, with the carry running from the FOLLOWING frame
    * edge (`first(ignoreNulls)` over `[current, +∞)`) and right rows
    * sorted AFTER left at equal time so inclusivity holds. */
  def asofJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTime: String, rightTime: String,
                      rightCols: Seq[String], rightOrd: String): DataFrame =
    asofImpl(left, right, keys, leftTime, rightTime, rightCols, rightOrd,
      forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTime: String, rightTime: String,
                       rightCols: Seq[String], rightOrd: String,
                       forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    // Internal bookkeeping names and r_-prefixed outputs must not
    // collide with user columns — fail loudly instead of silently
    // shadowing (round-2 advice).
    val reserved = Set("__t", "__side", "__ord", "__payload", "__match")
    val inputCols = (leftCols ++ right.columns).toSet
    require(inputCols.intersect(reserved).isEmpty,
      s"asofJoin reserves internal column names ${reserved.mkString(", ")}; " +
        s"rename the colliding input columns: ${inputCols.intersect(reserved).mkString(", ")}")
    val outCollisions = rightCols.map(c => s"r_$c").toSet.intersect(leftCols.toSet)
    require(outCollisions.isEmpty,
      s"asofJoin output columns collide with left columns: ${outCollisions.mkString(", ")}")

    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__ord", lit(0L))

    // Build the union by hand so both sides share one schema:
    // keys ++ (__t, __side, __ord, __payload struct) ++ left payload.
    val payloadStruct = struct(rightCols.map(c => col(c).as(c)): _*)
    // Backward: right (0) sorts BEFORE left (1) at equal time and
    // the carry looks back — equal-time rights are included.
    // Forward: right (2) sorts AFTER left (1) and the carry looks
    // ahead — equal-time rights are again included, and __ord asc
    // makes "earliest right" the first non-null in frame.
    val rightSide = if (forward) 2 else 0
    val rSel = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"),
        lit(rightSide).as("__side"),
        col(rightOrd).cast("long").as("__ord"),
        payloadStruct.as("__payload")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lSel = l.select(
      keys.map(col) ++ Seq(
        col("__t"), col("__side"), col("__ord"),
        lit(null).cast(rSel.schema("__payload").dataType).as("__payload")) ++
        leftCols.filterNot(keys.contains).map(col): _*)

    val unioned = lSel.unionByName(rSel)
    val base = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__ord"))
    val carried =
      if (forward)
        unioned.withColumn("__match",
          first(col("__payload"), ignoreNulls = true)
            .over(base.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      else
        unioned.withColumn("__match",
          last(col("__payload"), ignoreNulls = true)
            .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    val out = carried.where(col("__side") === 1)
    val withPayload = rightCols.foldLeft(out) { (d, c) =>
      d.withColumn(s"r_$c", col("__match").getField(c))
    }
    withPayload.drop("__t", "__side", "__ord", "__payload", "__match")
  }
}
