package graft.operators

import graft.functions.TextHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * Shuffle budget: ONE shuffle (the digest window) + the final
  * aggregation the caller adds. The quality gate and annotation are
  * per-row codegen'd expressions; at 100 TB the digest window would
  * be a groupBy(min(id)) + self-semi-join or a bucketed table on
  * digest — same semantics, same single shuffle.
  */
object CurationPipeline {

  import TextHash.{spark => H}

  def curate(docs: DataFrame, idCol: String, textCol: String,
             minTokens: Int = 10, maxTokens: Int = 5000,
             minStopRatio: Double = 0.0): DataFrame = {
    val w = Window.partitionBy(col("__digest")).orderBy(col(idCol))
    docs
      .withColumn("__digest", md5(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
      .withColumn("__toks", expr(H.tokens(textCol)))
      .withColumn("n_tokens", size(col("__toks")))
      .withColumn("n_stop", expr(H.tokenCount("__toks", "the")))
      .where(col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
      .where(col("n_stop").cast("double") >= col("n_tokens") * minStopRatio)
      .withColumn("fingerprint", expr(H.rollingHash(textCol)))
      .drop("__digest", "__toks")
  }
}
