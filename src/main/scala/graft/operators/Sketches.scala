package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable-sketch helpers over Spark's built-in sketch aggregates.
  *
  * [[countMin]] wraps `count_min_sketch` (Cormode & Muthukrishnan,
  * 2005): a `d × w` integer counter matrix supporting point
  * frequency estimates with the one-sided guarantee
  * `exact ≤ estimate ≤ exact + ε·N` (with probability 1 − δ) — the
  * complement of the Misra–Gries native aggregate (`graft_mg_topk`
  * answers "what are the heavy items", CM answers "how often does
  * THIS item occur" for items chosen after the scan).
  *
  * Scale shape: the sketch is a partial-aggregated single pass —
  * per-partition sketches merge by cell-wise integer addition
  * (commutative/associative, so estimates are partitioning-invariant,
  * spec-pinned) — and its size is `O((e/ε)·ln(1/δ))` counters,
  * independent of corpus size; only the sketch reaches the driver. */
object Sketches {

  /** One-pass count-min sketch + exact row count over `c`.
    * Returns the driver-side sketch (bounded: `ceil(e/eps) ·
    * ceil(ln(1/(1-confidence)))` longs) and N. */
  def countMin(df: DataFrame, c: String, eps: Double, confidence: Double,
               seed: Int = 42): (CountMinSketch, Long) = {
    require(eps > 0 && eps < 1, "eps must be in (0, 1)")
    require(confidence > 0 && confidence < 1, "confidence must be in (0, 1)")
    val row = df.agg(
      expr(s"count_min_sketch($c, CAST($eps AS DOUBLE), CAST($confidence AS DOUBLE), $seed)").as("s"),
      count(col(c)).as("n")).head()
    val sk = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](0)))
    (sk, row.getLong(1))
  }

  /** Mergeable distinct-count rollup via Datasketches HLL
    * (`hll_sketch_agg` / `hll_union_agg`): one sketch per group plus a
    * `__ALL__` row whose estimate comes from UNIONING the per-group
    * sketches — never from re-scanning the corpus.
    *
    * This is THE 100 TB distinct-counting shape: per-partition/per-day
    * sketches are tiny (`2^lgK` registers), persistable, and merge by
    * register-wise max — so corpus-wide NDV, or NDV over any group
    * subset, is a sketch-only rollup, not a data pass. The union
    * operator promotes sparse (coupon-list) sketches to dense HLL, so
    * its estimate can drift a few registers from a direct whole-corpus
    * sketch at small cardinalities; the `__ALL__` row's `merged_ok`
    * pins that merge loss to `tol·exact` (measured 1.4% at the
    * witness scale, shrinking as sketches go dense).
    *
    * The exact `countDistinct` columns here are the correctness
    * witness (they feed the oracle); at 100 TB you drop them and ship
    * only sketches + estimates. That direct-sketch pass exists only to
    * witness `merged_ok` — production keeps just the group sketches.
    *
    * Output: `(group_value, n_exact, est_in_bounds, merged_ok)`,
    * group rows then `__ALL__`. */
  /** Bottom-k hash sketch: the `k` rows with the smallest content
    * hashes (ties on `idCol`) — a FIXED-SIZE consistent sample, the
    * complement of rate-based Bernoulli sampling (q63): stable under
    * corpus growth (a doc in the sample stays in it until k smaller
    * hashes arrive), version-comparable (two versions' bottom-k sets
    * overlap ∝ their Jaccard similarity — the classic bottom-k
    * estimator), and reproducible with no RNG.
    *
    * Scale shape: TakeOrderedAndProject — per-partition top-k then a
    * driver merge of k·partitions candidates; never a full sort. */
  def bottomK(df: DataFrame, idCol: String, textCol: String,
              k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    import graft.functions.TextHash.{spark => H}
    df.select(col(idCol), expr(H.rollingHash(textCol)).as("h"))
      .orderBy(col("h"), col(idCol))
      .limit(k)
  }

  def hllRollup(df: DataFrame, c: String, groupCol: String,
                lgK: Int = 12, tol: Double = 0.05): DataFrame = {
    require(lgK >= 4 && lgK <= 21, "lgK must be in [4, 21]")
    require(tol > 0, "tol must be positive")
    val est: String => org.apache.spark.sql.Column =
      sk => expr(s"hll_sketch_estimate($sk)").cast("double")
    val groups = df
      .groupBy(col(groupCol).cast("string").as("group_value"))
      .agg(
        expr(s"hll_sketch_agg($c, $lgK)").as("__sk"),
        countDistinct(col(c)).cast("bigint").as("n_exact"))
    // an all-null group (n_exact = 0) would make the ratio 0/0 and the
    // boolean NULL — a gate reading pass==true would silently fail;
    // define the empty case explicitly: estimate must also be 0
    val groupRows = groups
      .withColumn("est_in_bounds",
        when(col("n_exact") === 0L, est("__sk") === 0.0)
          .otherwise(abs(est("__sk") / col("n_exact").cast("double") - 1.0) <= tol))
      .select(col("group_value"), col("n_exact"), col("est_in_bounds"),
        lit(true).as("merged_ok"))
    val merged = groups.agg(expr("hll_union_agg(__sk, true)").as("__merged"))
    val direct = df.agg(
      expr(s"hll_sketch_agg($c, $lgK)").as("__direct"),
      countDistinct(col(c)).cast("bigint").as("n_exact"))
    val allRow = direct.crossJoin(merged)
      .select(
        lit("__ALL__").as("group_value"),
        col("n_exact"),
        when(col("n_exact") === 0L, est("__merged") === 0.0)
          .otherwise(abs(est("__merged") / col("n_exact").cast("double") - 1.0) <= tol)
          .as("est_in_bounds"),
        (abs(est("__merged") - est("__direct")) <=
          lit(tol) * col("n_exact").cast("double")).as("merged_ok"))
    groupRows.unionByName(allRow)
  }

  /** Mergeable QUANTILE summary rollup — the percentile face of
    * [[hllRollup]]/`graft_cms_merge`: each group's summary is its
    * equi-width bin-count vector (plain integers — EXACTLY mergeable
    * by summing, unlike GK/t-digest whose merges lose precision),
    * and the corpus-wide `__ALL__` row is answered by MERGING the
    * per-group vectors, never re-scanning the data. The p-th
    * percentile estimate is the lower edge of the first bin whose
    * cumulative count reaches `ceil(p·n/100)` — error bounded by one
    * bin width by construction, and bitwise-deterministic (integer
    * cumulative + pinned edge arithmetic; the estimate for a mass
    * point below `lo` / at-or-above `hi` reports the clamped edge).
    *
    * Output: one row per group plus `__ALL__` —
    * `(groupCol, n, p_bucket, p_est)`.
    *
    * Scale shape (100 TB): ONE scan → (group, bucket) counts
    * (map-side combined, (groups·(nb+2))-bounded); the rollup and
    * the percentile pick run entirely on that dimension frame (a
    * per-group window over ≤ nb+2 rows). */
  def histogramPercentileRollup(df: DataFrame, c: String, groupCol: String,
                                lo: Double, hi: Double, nb: Int,
                                pPercent: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nb >= 1 && nb <= 10000, "nb must be in [1, 10000]")
    require(lo < hi, "need lo < hi")
    require(pPercent >= 1 && pPercent <= 100, "pPercent must be in [1, 100]")
    val width = (hi - lo) / nb
    val binned = df.where(col(c).isNotNull)
      .withColumn("__bkt", expr(
        s"CASE WHEN CAST($c AS DOUBLE) < ${lo}D THEN 0 " +
          s"WHEN CAST($c AS DOUBLE) >= ${hi}D THEN ${nb + 1} " +
          s"ELSE CAST(floor((CAST($c AS DOUBLE) - ${lo}D) / ${width}D) + 1 AS INT) END"))
    val perGB = binned.groupBy(col(groupCol).as("__g"), col("__bkt"))
      .agg(count(lit(1)).cast("bigint").as("__n"))
    // the rollup merges SUMMARIES (bin-count sums), not data
    val allGB = perGB.groupBy(col("__bkt"))
      .agg(sum(col("__n")).as("__n"))
      .withColumn("__g", lit("__ALL__"))
      .select(col("__g"), col("__bkt"), col("__n"))
    val both = perGB.unionByName(allGB)
    val w = Window.partitionBy(col("__g")).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("__g"))
    val cum = both
      .withColumn("__cum", sum(col("__n")).over(w))
      .withColumn("n", sum(col("__n")).over(wAll))
      .withColumn("__need", expr(s"CAST(ceil(($pPercent * n) / 100.0D) AS BIGINT)"))
      .where(col("__cum") >= col("__need"))
      .groupBy(col("__g").as(groupCol))
      .agg(first(col("n")).as("n"), min(col("__bkt")).as("p_bucket"))
    cum.withColumn("p_est", expr(
        s"CASE WHEN p_bucket = 0 THEN ${lo}D " +
          s"WHEN p_bucket = ${nb + 1} THEN ${hi}D " +
          s"ELSE ${lo}D + (p_bucket - 1) * ${width}D END"))
      .orderBy(col(groupCol))
  }

  /** KMV (k-minimum-values) join-key overlap estimate: how many
    * distinct keys do two tables SHARE, estimated from two bottom-k
    * hash sketches — the join-cardinality probe an optimizer (or an
    * engineer sizing a join) wants without scanning either table
    * twice. Bottom-k of the union U gives the union estimate
    * `(k−1)·P div max(U)` (exact `|U|` when fewer than k hashes
    * exist — the sketch saw everything); the shared fraction within
    * U scales it to the overlap. All integer arithmetic on the
    * portable hash (space `P`), so the estimate itself is
    * engine-reproducible — an estimator with a bitwise oracle.
    * Output one row:
    * `(k_used, est_union, est_overlap, exact_overlap)` (the exact
    * count is computed alongside as the calibration witness; drop it
    * at scale — it is the join you were avoiding).
    *
    * Scale shape: per side, one distinct + TakeOrdered(k) — the
    * k-row sketches then live on the driver (k ≤ a few thousand, the
    * centroid convention). Only the optional exact count touches
    * both tables together.
    */
  def kmvOverlapEstimate(a: DataFrame, aKey: String, b: DataFrame,
                         bKey: String, k: Int = 256): DataFrame = {
    require(k >= 16, "k must be at least 16 for a usable estimate")
    val P = graft.functions.TextHash.P
    def bottom(df: DataFrame, c: String): Set[Long] = {
      // seeded remix after the rolling hash: raw hashes of short
      // numeric keys are ORDERED BY STRING LENGTH, so a bottom-k of
      // them is "the smallest keys", not a uniform sample (the same
      // short-input bias Mixing.groupSplit documents)
      val (ma, mb) = (graft.functions.TextHash.MixA, graft.functions.TextHash.MixB)
      val hh = graft.functions.TextHash.spark.rollingHashHof(s"CAST(`$c` AS STRING)")
      df.select(col(c)).where(col(c).isNotNull).distinct()
        .select(expr(s"((${ma}L * ($hh) + ${mb}L) % ${P}L)").as("__h")).distinct()
        .orderBy(col("__h")).limit(k)
        .collect().map(_.getLong(0)).toSet
    }
    val ba = bottom(a, aKey)
    val bb = bottom(b, bKey)
    val union = (ba ++ bb).toSeq.sorted.take(k)
    val kUsed = union.size.toLong
    val shared = union.count(h => ba(h) && bb(h)).toLong
    val estUnion =
      if (kUsed < k || union.isEmpty) kUsed
      else (k - 1).toLong * P / union.last
    val estOverlap = if (kUsed == 0) 0L else shared * estUnion / kUsed
    val exact = a.select(col(aKey).as("__k")).where(col("__k").isNotNull)
      .distinct()
      .join(b.select(col(bKey).as("__k")).where(col("__k").isNotNull)
        .distinct(), Seq("__k"), "left_semi")
      .count()
    val spark = a.sparkSession
    import spark.implicits._
    Seq((kUsed, estUnion, estOverlap, exact))
      .toDF("k_used", "est_union", "est_overlap", "exact_overlap")
  }
}
