package graft

import graft.queries.AllQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  /** Flagship: a composed curation pass over the documents table —
    * near-duplicate removal (MinHash LSH → connected components →
    * keep-BEST-representative by length) → repetition-gate
    * (Gopher-style) → word-length/long-token quality rules (the
    * C4-gate components that apply to a multilingual corpus) →
    * PII scrub (regex count-and-redact) → span-level dedup →
    * batched model-score seam → per-source acceptance stats —
    * showcasing the LLM-pipeline operators end to end in one plan.
    * Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val unique = graft.operators.DedupOps.dropNearDuplicates(
      docs, "doc_id", "text", bands = 2, rowsPerBand = 4, minJaccard = 0.2,
      keepBestBy = Some("n_chars"))
    val gated = graft.operators.TextOps.withRepetitionStats(unique, "text")
      .where(col("dup_bigram_frac") <= 0.2 && col("top_bigram_frac") <= 0.3)
      .select("doc_id", "text", "source")
    // language-neutral C4 rules only (the stopword rule would drop
    // every non-English doc of this multilingual corpus)
    val c4 = graft.operators.TextOps.withC4Flags(gated, "text")
      .where(!col("f_min_words") && !col("f_long_word") && !col("f_word_len"))
      .select("doc_id", "text", "source")
    val scrubbed = graft.operators.TextOps.redactPii(c4, "text", "clean_text")
    val deduped = graft.operators.DedupOps.dedupSpans(
      scrubbed.select(col("doc_id"), col("clean_text").as("text"), col("source")),
      "doc_id", "text", spanTokens = 8)
    val scored = graft.operators.Scoring.withModelScore(
      scrubbed.join(deduped, "doc_id"), "doc_id", "clean_text")
    scored
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_spans")).as("total_spans"),
        sum(col("n_kept")).as("kept_spans"),
        sum(col("n_email") + col("n_ipv4") + col("n_id") + col("n_phone")).as("pii_hits"),
        sum(col("score_permille")).as("sum_score_permille"))
      .orderBy("source")
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * north-star extension operators). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    AllQueries.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    AllQueries.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
