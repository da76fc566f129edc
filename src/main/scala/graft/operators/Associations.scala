package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket pair association mining — co-purchase / co-occurrence
  * rules with support, confidence, and lift, integer-exact in ppm.
  * The A-priori 2-itemset pass: at pipeline scale the pair level is
  * where nearly all of the value (recommendations, bundling,
  * co-occurrence features) lives, and it needs no candidate-pruning
  * iteration.
  *
  * Not in the reference (polario is dataset I/O only — SURVEY.md §0);
  * north-star extension family.
  */
object Associations {

  /** Pair rules over (basket, item) rows: for every unordered item
    * pair `(a < b)` co-occurring in at least `minSupport` baskets,
    * the joint support `n_ab`, marginals `n_a`/`n_b`, directional
    * confidences `conf(a→b) = (1e6·n_ab) div n_a` (and symmetric),
    * and `lift_ppm = (1e6·n_ab·N) div (n_a·n_b)` with `N` = basket
    * count — lift > 1e6 means "bought together more than chance".
    * Top-`k` by `(n_ab DESC, lift_ppm DESC, item_a, item_b)`.
    *
    * Scale shape: ONE basket-keyed aggregation collects each basket's
    * distinct items as a sorted array (replacing the former
    * distinct + size-gate + basket-keyed SELF-JOIN — three shuffles
    * of the basket-item frame and a join — with a single shuffle);
    * pair generation is then a local within-array explode — cost
    * Σ items(b)², bounded by `maxBasketItems` (a basket above the
    * cap is dropped whole, the standard guard: a degenerate "basket"
    * with 10⁵ items is a crawler artifact, and its pairs would
    * dominate for no signal; its transient collect_set buffer is
    * items-sized, the same memory the join build side held). Pair
    * counts and item marginals partial-aggregate; the marginal join
    * keys on single items (vocabulary-sized); the scalar N
    * broadcasts; top-k is TakeOrderedAndProject.
    */
  def pairRules(df: DataFrame, basketCol: String, itemCol: String,
                minSupport: Long, k: Int,
                maxBasketItems: Int = 1000): DataFrame = {
    require(minSupport >= 1, "minSupport must be positive")
    require(k >= 1, "k must be positive")
    require(maxBasketItems >= 2, "maxBasketItems must be at least 2")
    // `baskets` feeds THREE consumers (N, marginals, pairs) — persist
    // so the collect_set shuffle runs once, not per consumer (session
    // cache hygiene: Verify/Bench clear the cache between queries).
    // sort_array makes the array order deterministic AND gives the
    // pair explode its `a < b` orientation for free (items are
    // distinct, so strictly-later array elements are strictly
    // greater under the same ordering `<` uses).
    val baskets = df.select(col(basketCol).as("__bk"), col(itemCol).as("__it"))
      .where(col("__it").isNotNull)
      .groupBy(col("__bk"))
      .agg(sort_array(collect_set(col("__it"))).as("__items"))
      .where(size(col("__items")) <= maxBasketItems)
      .select(col("__items"))
      .persist()
    val nBaskets = baskets.agg(count(lit(1)).cast("bigint").as("__N"))
    val itemSupp = baskets.select(explode(col("__items")).as("__it"))
      .groupBy(col("__it"))
      .agg(count(lit(1)).cast("bigint").as("__supp"))
    // two chained Generate operators (posexplode + explode-of-slice)
    // stay inside whole-stage codegen; a transform-lambda rendering of
    // the same pairs is interpreted per element
    val pairs = baskets
      .select(col("__items"), posexplode(col("__items")).as(Seq("__i", "item_a")))
      .select(col("item_a"), explode(expr(
        "slice(__items, __i + 2, size(__items) - __i - 1)")).as("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).cast("bigint").as("n_ab"))
      .where(col("n_ab") >= minSupport)
    // the marginal tables are VOCABULARY-sized (one row per distinct
    // item) — pin the broadcast instead of trusting AQE to discover
    // it at runtime: two fewer shuffle stages on the pair frame
    pairs
      .join(broadcast(itemSupp
        .select(col("__it").as("item_a"), col("__supp").as("n_a"))),
        Seq("item_a"))
      .join(broadcast(itemSupp
        .select(col("__it").as("item_b"), col("__supp").as("n_b"))),
        Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .withColumn("conf_ab_ppm", expr("(1000000L * n_ab) div n_a"))
      .withColumn("conf_ba_ppm", expr("(1000000L * n_ab) div n_b"))
      .withColumn("lift_ppm", expr(
        "CAST((CAST(1000000 AS DECIMAL(38,0)) * n_ab * __N) div " +
          "(CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"),
        col("n_b"), col("conf_ab_ppm"), col("conf_ba_ppm"), col("lift_ppm"))
      .orderBy(col("n_ab").desc, col("lift_ppm").desc,
        col("item_a"), col("item_b"))
      .limit(k)
  }
}
