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
  *  - L2 norms are materialized once per VECTOR, so each scored pair
  *    costs one array fold (the dot product), not three — bitwise
  *    identical to inline cosine (see VectorSql.cosineWithNorms);
  *  - brute-force top-k compiles to `TakeOrderedAndProject`
  *    (per-partition heap + driver merge of k rows);
  *  - the IVF path prunes candidates to the probed cluster(s) before
  *    scoring — with the corpus stored partitioned/bucketed by
  *    `cluster`, non-probed clusters are never scanned;
  *  - cosine is a built-in HOF expression chain (VectorSql), inside
  *    whole-stage codegen, bitwise-reproducible across engines.
  */
object SimilarityOps {

  import VectorSql.{spark => V}

  /** Cosine of two array<float> columns as a deterministic expression. */
  def cosineCol(a: String, b: String) = expr(V.cosine(a, b))

  private def simWithNorms(a: String, b: String, na: String, nb: String) =
    expr(V.cosineWithNorms(a, b, na, nb))

  /** Brute-force top-k cosine neighbors of a single query vector
    * (`query` must be a 1-row frame with column `q`). */
  def topK(corpus: DataFrame, idCol: String, vecCol: String,
           query: DataFrame, k: Int, excludeId: Option[Long] = None): DataFrame = {
    val corpusN = corpus.withColumn("__nrm", expr(V.norm(vecCol)))
    val queryN = query.withColumn("__qnrm", expr(V.norm("q")))
    val scored = corpusN.crossJoin(broadcast(queryN))
      .withColumn("sim", simWithNorms(vecCol, "q", "__nrm", "__qnrm"))
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
    val corpusN = corpus.withColumn("__cnrm", expr(V.norm(corpusVec)))
    val queriesN = queries.withColumn("__qnrm", expr(V.norm(queryVec)))
    val scored = corpusN.crossJoin(broadcast(queriesN))
      .withColumn("sim", simWithNorms(corpusVec, queryVec, "__cnrm", "__qnrm"))
    val w = Window.partitionBy(col(queryId)).orderBy(col("sim").desc, col(corpusId))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId).as("q_id"), col(corpusId).as("c_id"), col("rank"), col("sim"))
      .orderBy("q_id", "rank")
  }

  /** IVF-style ANN: assign every corpus vector to its nearest
    * (broadcast) centroid, then search only the query's `nProbe`
    * closest clusters. `centroids` columns: (cid, cvec). Recall
    * rises with nProbe; probing every cluster degenerates to exact
    * brute force (the spec's invariant). */
  def ivfSearch(corpus: DataFrame, idCol: String, vecCol: String,
                centroids: DataFrame, query: DataFrame, k: Int,
                excludeId: Option[Long] = None, nProbe: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centN = centroids.withColumn("__ctnrm", expr(V.norm("cvec")))
    val corpusN = corpus.withColumn("__nrm", expr(V.norm(vecCol)))
    // Coarse assignment: argmax cosine to a centroid (tie-break cid).
    val w = Window.partitionBy(col(idCol)).orderBy(col("csim").desc, col("cid"))
    val assigned = corpusN.crossJoin(broadcast(centN))
      .withColumn("csim", simWithNorms(vecCol, "cvec", "__nrm", "__ctnrm"))
      .withColumn("crank", row_number().over(w))
      .where(col("crank") === 1)
      .select(col(idCol), col(vecCol), col("__nrm"), col("cid").as("cluster"))

    // Probe: the query vector's nProbe nearest centroids.
    val probed = query.withColumn("__qnrm", expr(V.norm("q")))
      .crossJoin(broadcast(centN))
      .withColumn("csim", simWithNorms("q", "cvec", "__qnrm", "__ctnrm"))
      .orderBy(col("csim").desc, col("cid")).limit(nProbe)
      .select(col("q"), col("__qnrm"), col("cid").as("cluster"))

    // Fine search restricted to the probed cluster.
    val cand = assigned.join(broadcast(probed), "cluster")
      .withColumn("sim", simWithNorms(vecCol, "q", "__nrm", "__qnrm"))
    val base = excludeId.fold(cand)(id => cand.where(col(idCol) =!= id))
    base.select(col(idCol), col("cluster"), col("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Random-hyperplane LSH near-dup pairs over an embedding column —
    * the SCALE path for embedding dedup (no blocking attribute
    * needed, unlike [[nearDupPairStats]]'s label blocking): the sign
    * pattern of `planesPerBand` deterministic hyperplane projections
    * forms a band key (SimHash for vectors — collision probability
    * per plane is 1 - angle/pi), vectors are self-joined per band on
    * that key, and candidates are verified with exact cosine at
    * `minSim`.
    *
    * Cost shape: `bands` hash self-joins over `2^planesPerBand`
    * buckets per band (the default 16 planes = 65,536 — the same
    * key-width lesson as the text simhash operator: bucket count must
    * outgrow `n / targetBucketSize`, so raise `planesPerBand` with
    * corpus size, `bands` only for recall), then one exact fold per
    * surviving candidate pair. Projections are per-row codegen'd dots
    * against constant-folded literal plane arrays — no shuffle until
    * the band join, never an unblocked cross join. */
  def hyperplaneLshPairs(corpus: DataFrame, idCol: String, vecCol: String,
                         dim: Int, minSim: Double,
                         bands: Int = 2, planesPerBand: Int = 16): DataFrame = {
    require(bands >= 1 && planesPerBand >= 1 && planesPerBand <= 62)
    // planeComponent cubes x = p*1000003 + i + 1 in int64; x*x needs
    // x < 2^31.5, i.e. plane index p <= ~3037. Spark would wrap
    // silently past that (non-ANSI) while the DuckDB oracle raises on
    // BIGINT overflow — corrupted band keys, diverging engines. Keep
    // the total plane count inside the exact-arithmetic envelope.
    require(bands.toLong * planesPerBand <= 3000,
      s"bands * planesPerBand must be <= 3000 (got ${bands.toLong * planesPerBand}): " +
        "plane indexes past ~3037 overflow the int64 cube in planeComponent")
    // A wrong `dim` or a null vector/component would NULL every plane
    // dot, mapping every row to band key 0 — a silent full cross join.
    // Fail the job loudly instead: the guard wraps the vector column
    // itself (an asserted-then-dropped side column would be pruned by
    // the optimizer and never evaluated). The null-condition CASE also
    // routes null vectors to the error branch.
    val guarded = corpus.withColumn(vecCol, expr(
      s"CASE WHEN size($vecCol) = $dim AND NOT exists($vecCol, x -> isnull(x)) THEN $vecCol " +
        s"ELSE raise_error('hyperplaneLshPairs: $vecCol must be a null-free array<float> of length $dim') END"))
    val n = guarded.withColumn("__nrm", expr(V.norm(vecCol)))
    val keyed = (0 until bands).foldLeft(n) { (d, b) =>
      val key = (0 until planesPerBand).map { j =>
        val p = b * planesPerBand + j
        when(expr(V.dotPlane(vecCol, p, dim)) >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
      d.withColumn(s"__hpb$b", key)
    }.localCheckpoint() // feeds both sides of every band self-join
    // Band joins and the cross-band dedup move bare id pairs only;
    // vectors/norms re-join from the checkpointed frame afterwards, so
    // the dedup exchange carries O(candidates) ids, not O(candidates x
    // dim) floats (same shape as DedupOps.verifyJaccard).
    val pairs = (0 until bands).map { b =>
      val x = keyed.select(col(idCol).as("a_id"), col(s"__hpb$b").as("bk"))
      val y = keyed.select(col(idCol).as("b_id"), col(s"__hpb$b").as("bk"))
      x.join(y, "bk").where(col("a_id") < col("b_id")).select("a_id", "b_id")
    }.reduce(_ unionAll _)
      .dropDuplicates("a_id", "b_id")
    pairs
      .join(keyed.select(col(idCol).as("a_id"), col(vecCol).as("va"), col("__nrm").as("na")), "a_id")
      .join(keyed.select(col(idCol).as("b_id"), col(vecCol).as("vb"), col("__nrm").as("nb")), "b_id")
      .withColumn("sim", simWithNorms("va", "vb", "na", "nb"))
      .where(col("sim") >= minSim)
      .select(col("a_id"), col("b_id"), col("sim"))
      .orderBy("a_id", "b_id")
  }

  /** Embedding-cosine near-dup pair counts within equality blocks
    * (`blockCol`), pairs above `minSim`. Norms are computed once per
    * vector BEFORE the pair join, so each candidate pair costs one
    * fold.
    *
    * Hot-block guard: a block larger than `maxBlockSize` is split into
    * `ceil(size / maxBlockSize)` deterministic sub-blocks (xxhash64 of
    * the id), bounding per-block pair work at ~maxBlockSize²/2 instead
    * of letting one dominant block go quadratic in the corpus. The
    * cost is recall: pairs straddling sub-blocks of an oversize block
    * are not compared — the standard bounded-blocking tradeoff. Blocks
    * at or under the cap are compared exhaustively (one sub-block), so
    * results are exact whenever no block exceeds the cap. */
  def nearDupPairStats(corpus: DataFrame, idCol: String, vecCol: String,
                       blockCol: String, minSim: Double,
                       maxBlockSize: Int = 8192): DataFrame = {
    val n = Blocking.withSubBlock(
      corpus.withColumn("__nrm", expr(V.norm(vecCol))),
      col(blockCol), idCol, maxBlockSize, "__sub")
    val x = n.select(col(blockCol).as("blk"), col("__sub"), col(idCol).as("a_id"),
      col(vecCol).as("va"), col("__nrm").as("na"))
    val y = n.select(col(blockCol).as("blk"), col("__sub"), col(idCol).as("b_id"),
      col(vecCol).as("vb"), col("__nrm").as("nb"))
    x.join(y, Seq("blk", "__sub")).where(col("a_id") < col("b_id"))
      .withColumn("sim", simWithNorms("va", "vb", "na", "nb"))
      .where(col("sim") >= minSim)
      .groupBy(col("blk").as(blockCol))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col(blockCol))
  }
}
