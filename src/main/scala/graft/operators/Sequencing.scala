package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence assembly for LLM training: packing short documents into
  * fixed token budgets and chunking long documents into overlapping
  * context windows.
  *
  * Not in the reference (polario is dataset I/O only — SURVEY.md §0);
  * first-class LLM-pipeline extensions.
  *
  * Scale design (100 TB): packing needs a running token count, which
  * is inherently sequential — so it runs PER SHARD (`shardCol`):
  * each shard's window is one sorted partition, shards run in
  * parallel, and the shard key (language, source, date bucket, hash
  * bucket) bounds the sequential region. Never pack over an
  * unpartitioned window — that is a single-reducer sort at any scale.
  * Chunking is per-row (explode of window starts), shuffle-free.
  */
object Sequencing {

  /** Assign each document a `pack_id` within its shard: documents are
    * taken in `idCol` order and a pack boundary falls every `budget`
    * tokens (running-sum division — the deterministic streaming-pack
    * approximation; fragmentation at pack tails is the accepted cost
    * of one-pass packing). Output adds `pack_id` (0-based within
    * shard). */
  def packGreedy(df: DataFrame, idCol: String, tokenCountCol: String,
                 shardCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val reserved = Set("__cum", "pack_id")
    val collisions = df.columns.toSet.intersect(reserved)
    require(collisions.isEmpty,
      s"packGreedy reserves column names ${reserved.mkString(", ")}; " +
        s"rename the colliding input columns: ${collisions.mkString(", ")}")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokenCountCol).cast("bigint")).over(w))
      .withColumn("pack_id", expr(s"(__cum - $tokenCountCol) div ${budget}L"))
      .drop("__cum")
  }

  /** Explode each document into overlapping token windows of
    * `chunkSize` tokens advancing by `chunkSize - overlap`: one row
    * per (doc, chunk) with `chunk_idx` (0-based), `chunk_len`, and the
    * chunk text re-joined with single spaces. Tail chunks may be
    * shorter, but a tail start past `n - overlap` is skipped: such a
    * window lies entirely inside the previous chunk's overlap region,
    * so emitting it would double-count its tokens in training data.
    * Pure per-row explode — no shuffle. */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need chunkSize > 0 and 0 <= overlap < chunkSize")
    val reserved = Set("__toks", "__n", "__start", "chunk_idx", "chunk_len", "chunk_text")
    val collisions = df.columns.toSet.intersect(reserved)
    require(collisions.isEmpty,
      s"chunkTokens reserves column names ${reserved.mkString(", ")}; " +
        s"rename the colliding input columns: ${collisions.mkString(", ")}")
    val stride = chunkSize - overlap
    df.withColumn("__toks", split(col(textCol), " "))
      .withColumn("__n", size(col("__toks")))
      .select(col(idCol), col("__toks"), col("__n"),
        posexplode(expr(s"sequence(1, __n, $stride)")).as(Seq("chunk_idx", "__start")))
      // A window starting at s covers [s, min(n, s + chunkSize - 1)];
      // for s > n - overlap that range sits fully inside the previous
      // window [s - stride, s + overlap - 1]. Starts increase, so the
      // kept set is a dense prefix and chunk_idx stays 0..k gap-free.
      .where(col("chunk_idx") === 0 || col("__start") <= col("__n") - overlap)
      .withColumn("chunk_len", least(lit(chunkSize), col("__n") - col("__start") + 1))
      .withColumn("chunk_text",
        concat_ws(" ", expr(s"slice(__toks, __start, $chunkSize)")))
      .select(col(idCol), col("chunk_idx"), col("chunk_len"), col("chunk_text"))
  }
}
