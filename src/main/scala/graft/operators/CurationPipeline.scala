package graft.operators

import graft.functions.TextHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the operator families composed
  * the way a production corpus pipeline runs them.
  *
  *  1. exact dedup — keep the LOWEST id per content digest (stable,
  *     deterministic survivor selection);
  *  2. quality gate — token-count bounds and stopword-ratio floor
  *     (integer/exact arithmetic only);
  *  3. annotation — token count + rolling-hash fingerprint for
  *     downstream near-dup passes.
  *
  * Shuffle budget: the digest pick is a groupBy(min) + digest-keyed
  * join — the min is PARTIAL-AGGREGATED (map-side combined), so a
  * viral duplicate at 10⁸ copies collapses to one row per map
  * partition before the shuffle, where a digest rank window would
  * funnel all copies through one reducer's sort. The trade: the
  * corpus is SCANNED TWICE (once to aggregate the pick, once for the
  * join-back — each scan re-computes md5(text)) in exchange for
  * never shuffling corpus rows on the digest; that is the right side
  * of the trade under skew, and at 100 TB a bucketed digest table
  * (or a persisted `(id, digest)` projection) amortizes the second
  * pass. The quality gate and annotation are per-row codegen'd
  * expressions.
  *
  * Contract (shared with [[DedupOps.incrementalDedup]]): ids are
  * row-unique. Two FULLY identical rows (same id, same text) both
  * survive the pick — only a rank could arbitrate between
  * indistinguishable rows.
  */
object CurationPipeline {

  import TextHash.{spark => H}

  def curate(docs: DataFrame, idCol: String, textCol: String,
             minTokens: Int = 10, maxTokens: Int = 5000,
             minStopRatio: Double = 0.0): DataFrame = {
    // NULL text ⇒ NULL digest: a sentinel key (md5 is 32 hex chars,
    // no collision possible) keeps those rows groupable, matching the
    // window's null-partition behavior; min(struct(id)) picks the
    // nulls-first min id the old orderBy picked
    val digested = docs
      .withColumn("__digest", md5(col(textCol)))
      .withColumn("__dg", coalesce(col("__digest"), lit("∅")))
    val firsts = digested.groupBy(col("__dg"))
      .agg(min(struct(col(idCol))).as("__m"))
      .select(col("__dg"), col("__m").getField(idCol).as("__first_id"))
    digested
      .join(firsts, Seq("__dg"))
      .where(col(idCol) <=> col("__first_id"))
      .drop("__dg", "__first_id")
      .withColumn("__toks", expr(H.tokens(textCol)))
      .withColumn("n_tokens", size(col("__toks")))
      .withColumn("n_stop", expr(H.tokenCount("__toks", "the")))
      .where(col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
      .where(col("n_stop").cast("double") >= col("n_tokens") * minStopRatio)
      .withColumn("fingerprint", expr(H.rollingHash(textCol)))
      .drop("__digest", "__toks")
  }
}
