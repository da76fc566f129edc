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
    * Scale shape: items dedupe per basket FIRST (one basket-keyed
    * aggregation); pair generation is the within-basket self-join —
    * cost Σ items(b)², bounded by `maxBasketItems` (a basket above
    * the cap is dropped whole, the standard guard: a degenerate
    * "basket" with 10⁵ items is a crawler artifact, and its pairs
    * would dominate the join for no signal). Pair counts and item
    * marginals partial-aggregate; the marginal join keys on single
    * items (vocabulary-sized); the scalar N broadcasts; top-k is
    * TakeOrderedAndProject.
    */
  def pairRules(df: DataFrame, basketCol: String, itemCol: String,
                minSupport: Long, k: Int,
                maxBasketItems: Int = 1000): DataFrame = {
    require(minSupport >= 1, "minSupport must be positive")
    require(k >= 1, "k must be positive")
    require(maxBasketItems >= 2, "maxBasketItems must be at least 2")
    val bi = df.select(col(basketCol).as("__bk"), col(itemCol).as("__it"))
      .where(col("__it").isNotNull)
      .distinct()
    val sized = bi.groupBy(col("__bk"))
      .agg(count(lit(1)).as("__sz"))
      .where(col("__sz") <= maxBasketItems)
      .select(col("__bk"))
    // `kept` feeds FOUR consumers (N, marginals, both join sides) —
    // persist the deduped basket-item frame so the dedup shuffle and
    // the size gate run once, not per consumer (session cache
    // hygiene: Verify/Bench clear the cache between queries).
    val kept = bi.join(sized, Seq("__bk"), "left_semi").persist()
    // `sized` is already one row per surviving basket — count it
    // instead of re-distincting the basket-item frame
    val nBaskets = sized.agg(count(lit(1)).cast("bigint").as("__N"))
    val itemSupp = kept.groupBy(col("__it"))
      .agg(count(lit(1)).cast("bigint").as("__supp"))
    val pairs = kept.alias("x")
      .join(kept.alias("y"),
        col("x.__bk") === col("y.__bk") && col("x.__it") < col("y.__it"))
      .groupBy(col("x.__it").as("item_a"), col("y.__it").as("item_b"))
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
