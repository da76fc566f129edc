package graft.operators

import graft.functions.VectorSql
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over embedding columns
  * (`array<float>`).
  *
  * Scale design (100 TB):
  *  - the query/centroid side is always tiny → `broadcast()` it, so
  *    scoring is a broadcast nested-loop with NO shuffle of the big
  *    side;
  *  - brute-force top-k compiles to `TakeOrderedAndProject`
  *    (per-partition heap + driver merge of k rows);
  *  - the IVF path prunes candidates to the probed cluster(s) before
  *    scoring — the scan of non-probed clusters is skipped entirely
  *    when the corpus is stored partitioned/bucketed by `cluster`;
  *  - cosine is a built-in HOF expression chain (VectorSql), inside
  *    whole-stage codegen, bitwise-reproducible across engines.
  */
object SimilarityOps {

  import VectorSql.{spark => V}

  /** Cosine of two array<float> columns as a deterministic expression. */
  def cosineCol(a: String, b: String) = expr(V.cosine(a, b))

  /** Brute-force top-k cosine neighbors of a single query vector
    * (`queries` must be a 1-row frame with column `q`). */
  def topK(corpus: DataFrame, idCol: String, vecCol: String,
           query: DataFrame, k: Int, excludeId: Option[Long] = None): DataFrame = {
    val scored = corpus.crossJoin(broadcast(query))
      .withColumn("sim", cosineCol(vecCol, "q"))
    val base = excludeId.fold(scored)(id => scored.where(col(idCol) =!= id))
    base.select(col(idCol), col("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** kNN join: top-k cosine neighbors from `corpus` for EVERY row of
    * (small, broadcast) `queries`. Ranking via window row_number with
    * deterministic tie-break. */
  def knnJoin(corpus: DataFrame, corpusId: String, corpusVec: String,
              queries: DataFrame, queryId: String, queryVec: String,
              k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = corpus.crossJoin(broadcast(queries))
      .withColumn("sim", cosineCol(corpusVec, queryVec))
    val w = Window.partitionBy(col(queryId)).orderBy(col("sim").desc, col(corpusId))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId).as("q_id"), col(corpusId).as("c_id"), col("rank"), col("sim"))
      .orderBy("q_id", "rank")
  }

  /** IVF-style ANN: assign every corpus vector to its nearest
    * (broadcast) centroid, then search only the query's probed
    * cluster. `centroids` columns: (cid, cvec). */
  def ivfSearch(corpus: DataFrame, idCol: String, vecCol: String,
                centroids: DataFrame, query: DataFrame, k: Int,
                excludeId: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Coarse assignment: argmax cosine to a centroid (tie-break cid).
    val w = Window.partitionBy(col(idCol)).orderBy(col("csim").desc, col("cid"))
    val assigned = corpus.crossJoin(broadcast(centroids))
      .withColumn("csim", cosineCol(vecCol, "cvec"))
      .withColumn("crank", row_number().over(w))
      .where(col("crank") === 1)
      .select(col(idCol), col(vecCol), col("cid").as("cluster"))

    // Probe: the query vector's own nearest centroid.
    val probed = query.crossJoin(broadcast(centroids))
      .withColumn("csim", cosineCol("q", "cvec"))
      .orderBy(col("csim").desc, col("cid")).limit(1)
      .select(col("q"), col("cid").as("cluster"))

    // Fine search restricted to the probed cluster.
    val cand = assigned.join(broadcast(probed), "cluster")
      .withColumn("sim", cosineCol(vecCol, "q"))
    val base = excludeId.fold(cand)(id => cand.where(col(idCol) =!= id))
    base.select(col(idCol), col("cluster"), col("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Embedding-cosine near-dup pair counts within equality blocks
    * (`blockCol`), pairs above `minSim`. */
  def nearDupPairStats(corpus: DataFrame, idCol: String, vecCol: String,
                       blockCol: String, minSim: Double): DataFrame = {
    val x = corpus.select(col(blockCol).as("blk"), col(idCol).as("a_id"), col(vecCol).as("va"))
    val y = corpus.select(col(blockCol).as("blk"), col(idCol).as("b_id"), col(vecCol).as("vb"))
    x.join(y, "blk").where(col("a_id") < col("b_id"))
      .withColumn("sim", cosineCol("va", "vb"))
      .where(col("sim") >= minSim)
      .groupBy(col("blk").as(blockCol))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col(blockCol))
  }
}
