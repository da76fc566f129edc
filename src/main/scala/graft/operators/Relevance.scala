package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus relevance scoring: term/document frequencies, TF-IDF
  * keyword extraction, and BM25 ranking against a fixed query.
  *
  * Not in the reference (polario is dataset I/O only — SURVEY.md §0);
  * first-class LLM-pipeline extensions (keyword-based quality
  * signals, retrieval-style corpus probes).
  *
  * Scale shape (100 TB):
  *  - term frequencies are one explode + partial-aggregated groupBy
  *    on (doc, token) — shuffle bounded by distinct (doc, token);
  *  - document frequencies reduce the tf table by token — vocabulary-
  *    bounded output, NOT corpus-bounded;
  *  - TF-IDF keyword extraction joins tf⋈df on token. The df side is
  *    vocabulary-sized: broadcast when the vocabulary is bounded
  *    (`broadcastDf = true`, the common case for whitespace-token
  *    corpora), shuffle-join otherwise;
  *  - BM25 against a FIXED query first filters the tf table to the
  *    query's tokens — the df table then has ≤ |query| rows and both
  *    scalars (N, avgdl) are single aggregates, so scoring is one
  *    broadcast join over a query-pruned tf table, never a
  *    vocabulary-wide shuffle.
  *
  * Numeric parity discipline (graft oracle rules): the default
  * `logIdf = false` scoring uses only +,-,*,/ over exact integers —
  * every operation is correctly rounded IEEE, so Spark and DuckDB
  * agree bitwise and per-term contributions are summed as a FIXED
  * expression tree (per-term columns added left-to-right), never a
  * float SUM whose accumulation order the engine picks. `logIdf =
  * true` gives the classic Robertson/Sparck-Jones log idf (a
  * per-term monotone transform) for library users; transcendental
  * libm results are not guaranteed bitwise-identical across engines,
  * so witnesses pin the rational variant.
  */
object Relevance {

  /** Per-document whitespace-token term frequencies:
    * `(idCol, token, tf)`. */
  def termFrequencies(df: DataFrame, idCol: String, textCol: String): DataFrame =
    TextOps.withTokens(df, textCol, "__toks")
      .select(col(idCol), explode(col("__toks")).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))

  /** Document frequencies from a [[termFrequencies]] table:
    * `(token, df)` — vocabulary-sized. */
  def documentFrequencies(tf: DataFrame): DataFrame =
    tf.groupBy(col("token")).agg(count(lit(1)).as("dfreq"))

  /** Per-document vocabulary coverage against the corpus's own
    * top-`vocabSize` tokens (by count, token-lexical tie-break —
    * deterministic): `(idCol, n_toks, n_oov)` where `n_oov` counts
    * token OCCURRENCES outside the vocabulary. The out-of-vocabulary
    * rate is the standard pre-tokenizer health check (a rising OOV
    * rate on a new drop of data means the tokenizer/vocab no longer
    * fits the distribution). Zero-token and null-text documents keep
    * a row with `n_toks = 0`.
    *
    * Scale shape: vocabulary selection is a partial-aggregated token
    * count + top-k (TakeOrdered on the vocabulary-bounded count
    * table); the vocab is broadcast, so annotating the corpus adds NO
    * shuffle of the big side; one groupBy on the doc id. */
  def vocabCoverage(df: DataFrame, idCol: String, textCol: String,
                    vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, "vocabSize must be positive")
    val tok = TextOps.withTokens(df, textCol, "__toks")
      .select(col(idCol), explode(col("__toks")).as("token"))
    val vocab = broadcast(
      tok.groupBy(col("token")).agg(count(lit(1)).as("__cnt"))
        .orderBy(col("__cnt").desc, col("token")).limit(vocabSize)
        .select(col("token"), lit(1).as("__in_vocab")))
    val stats = tok.join(vocab, Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_toks"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
    df.select(col(idCol))
      .join(stats, Seq(idCol), "left")
      .withColumn("n_toks", coalesce(col("n_toks"), lit(0L)))
      .withColumn("n_oov", coalesce(col("n_oov"), lit(0L)))
  }

  /** Corpus token-mass coverage curve: the top-`k` tokens by corpus
    * frequency with each prefix's cumulative share of ALL token
    * occurrences — "how big must the vocabulary be to cover X% of
    * the corpus", the curve that sizes a tokenizer's vocab before
    * training it.
    *
    * Scale: one (token) aggregation with map-side combine; the
    * running sum windows over only the `k` surviving rows (constant,
    * driver-bounded), never the full vocabulary; the corpus total is
    * a broadcast scalar. `cum_n` is an exact integer running sum, so
    * each `cum_share` is a single IEEE division — bitwise across
    * engines.
    *
    * Output: `(rank, token, n, cum_n, cum_share)` ordered by rank. */
  def coverageCurve(df: DataFrame, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, "k must be positive")
    val counts = TextOps.withTokens(df.select(col(textCol)), textCol, "__toks")
      .select(explode(col("__toks")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).cast("bigint").as("n"))
    val total = counts.agg(sum(col("n")).cast("bigint").as("__total"))
    val top = counts
      .orderBy(col("n").desc, col("token")).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col("token"))))
    top.crossJoin(broadcast(total))
      .withColumn("cum_n",
        sum(col("n")).over(
          Window.orderBy(col("rank"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("bigint"))
      .withColumn("cum_share", col("cum_n").cast("double") / col("__total").cast("double"))
      .select(col("rank"), col("token"), col("n"), col("cum_n"), col("cum_share"))
      .orderBy("rank")
  }

  /** Rank-biased overlap (Webber et al. 2010) between two top-`k`
    * rankings at persistence `p = 1/2`:
    * `Σ_{d=1..k} (1/2)^d · |A_d ∩ B_d| / d` over prefix overlaps —
    * "how much do two rankers agree, weighted toward the top". The
    * metric every ranker change should report before shipping.
    *
    * Exactness: `(1/2)^d` weights are dyadic literals, each term is
    * two multiplies and one integer-ratio division, and the sum is a
    * strict left-to-right fold over `d` — fully bitwise across
    * engines (no libm, no reduction-order ambiguity). Both rankings
    * collapse to one `k`-element array row, so the computation is a
    * driver-scale crossJoin of two single-row frames.
    *
    * Inputs: frames with (`idCol`, `rankCol`) where rank 1..k.
    * Output: one row `(rbo, overlap_at_k)`. */
  def rbo(a: DataFrame, b: DataFrame, idCol: String, rankCol: String,
          k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    def arr(df: DataFrame, out: String) = df
      .where(col(rankCol) <= k)
      .agg(sort_array(collect_list(struct(col(rankCol).as("r"),
        col(idCol).as("i")))).as("__s"))
      .select(expr("transform(__s, x -> x.i)").as(out))
    val weights = (1 to k)
      .map(d => java.math.BigDecimal.valueOf(0.5).pow(d).toPlainString + "D")
      .mkString("array(", ", ", ")")
    arr(a, "__a").crossJoin(arr(b, "__b"))
      .select(
        expr(
          s"aggregate(sequence(1, $k), CAST(0 AS DOUBLE), (acc, d) -> " +
            s"acc + element_at($weights, d) * " +
            "CAST(size(array_intersect(slice(__a, 1, d), slice(__b, 1, d))) AS DOUBLE)" +
            " / CAST(d AS DOUBLE))").as("rbo"),
        expr("CAST(size(array_intersect(__a, __b)) AS BIGINT)").as("overlap_at_k"))
  }

  /** Corpus token CO-OCCURRENCE counts: unordered token pairs within
    * `maxDist` positions of each other (the word2vec/GloVe context
    * extraction), top-`k` by count. Pairs are generated MAP-SIDE by
    * zipping the token array against its own shifts (`zip_with` over
    * slices — one struct per position per distance, no per-document
    * self-join, no shuffle before the final count), so the stage
    * stays in whole-stage codegen and scales with token volume ×
    * maxDist.
    *
    * Output: `(tok_a, tok_b, n)` with `tok_a <= tok_b`, ordered by
    * `(n DESC, tok_a, tok_b)`. */
  def cooccurrencePairs(df: DataFrame, textCol: String, maxDist: Int,
                        k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    cooccurrenceCounts(df, textCol, maxDist)
      .orderBy(col("n").desc, col("tok_a"), col("tok_b"))
      .limit(k)
  }

  /** Full (un-limited) co-occurrence count table backing
    * [[cooccurrencePairs]] and [[pmiCollocations]]:
    * `(tok_a, tok_b, n)` with `tok_a <= tok_b`, one row per distinct
    * unordered pair within `maxDist`. Output is pair-vocabulary-
    * bounded, not corpus-bounded; the single shuffle is the keyed
    * count (partial aggregation applies). */
  def cooccurrenceCounts(df: DataFrame, textCol: String,
                         maxDist: Int): DataFrame = {
    require(maxDist >= 1, "maxDist must be positive")
    // Native single-pass pair expression (bitwise-equal to the HOF
    // rendering `concat(zip_with(slice…))` — NativeExprSpec): the HOF
    // paid two slice copies plus an interpreted lambda per token
    // position, on the hottest explode of the collocation family.
    TextOps.withTokens(df.select(col(textCol)), textCol, "__toks")
      .withColumn("__p", explode(expr(s"graft_adjacent_pairs(__toks, $maxDist)")))
      .groupBy(col("__p.a").as("tok_a"), col("__p.b").as("tok_b"))
      .agg(count(lit(1)).cast("bigint").as("n"))
  }

  /** Per-document bigram rarity — mean inverse corpus frequency of
    * the doc's ORDERED token bigrams, as the exact scaled integer
    * `rarity_ppm = (Σ 1e6 div count(bigram)) div n_bigrams`. The
    * log-free stand-in for n-gram-LM perplexity scoring (a KenLM
    * gate's job): fluent text repeats the corpus's common
    * transitions → low rarity; gibberish / boilerplate-mangled text
    * hits unique bigrams → rarity near 1e6. Ordered bigrams, unlike
    * [[cooccurrenceCounts]]'s unordered windows — word ORDER is the
    * fluency signal. Docs with fewer than two tokens get
    * `n_bigrams = 0`, rarity NULL (no evidence, not "perfect").
    *
    * Scale shape: one bigram-keyed count (partial agg, vocabulary²-
    * bounded in distinct keys) + one bigram-keyed equi-join back to
    * doc occurrences + one doc-keyed aggregation — the TF-IDF plan
    * shape; integer divides keep it engine/partition-invariant. */
  def withBigramRarity(df: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val reserved = Set("__toks", "__bg", "__c", "__rs", "n_bigrams", "rarity_ppm")
    val collisions = df.columns.toSet.intersect(reserved)
    require(collisions.isEmpty,
      s"withBigramRarity reserves column names ${reserved.mkString(", ")}; " +
        s"rename the colliding input columns: ${collisions.mkString(", ")}")
    val pairs = TextOps.withTokens(df.select(col(idCol), col(textCol)),
        textCol, "__toks")
      .where(expr("size(__toks) >= 2"))
      .select(col(idCol), explode(expr(
        "transform(sequence(1, size(__toks) - 1), " +
          "i -> concat(element_at(__toks, i), ' ', element_at(__toks, i + 1)))"))
        .as("__bg"))
    val counts = pairs.groupBy(col("__bg"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("__c"))
    val perDoc = pairs.join(counts, "__bg")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("bigint").as("n_bigrams"),
        sum(expr("CAST(1000000 AS DECIMAL(38,0)) div __c")
          .cast("decimal(38,0)")).as("__rs"))
    df.join(perDoc, Seq(idCol), "left")
      .withColumn("rarity_ppm",
        expr("CASE WHEN n_bigrams IS NULL THEN NULL " +
          "ELSE __rs div n_bigrams END").cast("bigint"))
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
      .drop("__rs")
  }

  /** PMI-ranked collocations: top-`k` token pairs by pointwise mutual
    * information, the standard phrase-mining / tokenizer-merge signal.
    * PMI's exponent `P(a,b) / (P(a)·P(b))` is rank-equivalent to the
    * log form, so the score is computed WITHOUT libm (graft oracle
    * rule: no transcendentals) as an exact scaled integer:
    *
    *   `lift_ppm = (1e6 · n_ab · T²) div (P · c_a · c_b)`
    *
    * where `T` = total token occurrences, `P` = total pair slots,
    * `c_x` = unigram counts — all products in DECIMAL(38,0)
    * (overflow-safe far past 100 TB token counts; DuckDB side uses
    * HUGEINT), one integral division back to BIGINT. Bitwise-portable
    * by construction.
    *
    * `minCount` drops pairs with fewer than that many sightings —
    * PMI's classic rare-pair pathology (a pair seen once between two
    * hapaxes scores astronomically); every published collocation
    * pipeline applies this floor.
    *
    * Scale shape (100 TB): the pair-count table is the only large
    * intermediate (one keyed shuffle, map-side pair generation — see
    * [[cooccurrenceCounts]]); unigram counts are vocabulary-bounded
    * and BROADCAST onto it twice; the two scalar totals ride the same
    * broadcasts. Nothing corpus-sized crosses the network after the
    * pair count. */
  def pmiCollocations(df: DataFrame, textCol: String, maxDist: Int,
                      minCount: Long, k: Int): DataFrame = {
    require(minCount >= 1, "minCount must be positive")
    require(k >= 1, "k must be positive")
    val pairs = cooccurrenceCounts(df, textCol, maxDist)
    val uni = TextOps.withTokens(df.select(col(textCol)), textCol, "__toks")
      .select(explode(col("__toks")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).cast("bigint").as("c"))
    val totals = uni.agg(sum(col("c")).cast("bigint").as("t_toks"))
      .crossJoin(pairs.agg(sum(col("n")).cast("bigint").as("t_pairs")))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    pairs.where(col("n") >= minCount)
      .join(broadcast(uni.withColumnRenamed("token", "tok_a")
        .withColumnRenamed("c", "c_a")), "tok_a")
      .join(broadcast(uni.withColumnRenamed("token", "tok_b")
        .withColumnRenamed("c", "c_b")), "tok_b")
      .crossJoin(broadcast(totals))
      .withColumn("__num",
        dec(lit(1000000L)) * dec(col("n")) * dec(col("t_toks")) * dec(col("t_toks")))
      .withColumn("__den",
        dec(col("t_pairs")) * dec(col("c_a")) * dec(col("c_b")))
      .withColumn("lift_ppm", expr("__num div __den").cast("bigint"))
      .select(col("tok_a"), col("tok_b"), col("n"), col("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("tok_a"), col("tok_b"))
      .limit(k)
  }

  /** Greedy maximum-coverage seed selection: pick `k` documents that
    * together cover the most DISTINCT tokens — each round takes the
    * document adding the most not-yet-covered tokens (ties: smallest
    * id). The classic (1−1/e)-approximate seed-set / eval-set
    * selection, and the diversity-first dual of the MMR picker.
    *
    * Determinism: argmax is `(gain DESC, id ASC)` — total order, so
    * re-runs pick identical sets; pure integer gains.
    *
    * Scale shape: the (doc, token) table materializes once
    * (checkpointed); each of the `k` rounds is one anti-join against
    * the covered-token set (vocabulary-bounded, broadcast) + one
    * doc-keyed count + a TakeOrdered(1) — a bounded driver loop of
    * `k` small jobs, the [[SimilarityOps]] k-means|| shape, never a
    * corpus-width collect. */
  def greedyCoverage(df: DataFrame, idCol: String, textCol: String,
                     k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val dt = TextOps.withTokens(df.select(col(idCol), col(textCol)),
      textCol, "__toks")
      .select(col(idCol).cast("long").as("__id"),
        explode(col("__toks")).as("token"))
      .distinct()
      .localCheckpoint()
    var covered: DataFrame = dt.select(col("token")).where(lit(false))
    var picked = List.empty[(Int, Long, Long)]
    var round = 1
    while (round <= k) {
      val pickedIds = picked.map(_._2)
      val gains = dt
        .where(if (pickedIds.isEmpty) lit(true) else !col("__id").isin(pickedIds: _*))
        .join(broadcast(covered), Seq("token"), "left_anti")
        .groupBy(col("__id"))
        .agg(count(lit(1)).cast("bigint").as("__gain"))
      val best = gains.orderBy(col("__gain").desc, col("__id")).limit(1).collect()
      if (best.isEmpty) round = k + 1 // coverage exhausted: stop early
      else {
        val (id, gain) = (best(0).getLong(0), best(0).getLong(1))
        picked = picked :+ ((round, id, gain))
        // LAZY checkpoint: plan truncation now, materialization rides
        // the next round's broadcast build (or the final action) —
        // one fewer driver-paced job per greedy round.
        covered = covered.union(dt.where(col("__id") === id).select(col("token")))
          .distinct().localCheckpoint(eager = false)
        round += 1
      }
    }
    picked.toDF("rk", idCol, "n_new")
  }

  /** Pairwise vocabulary Jaccard between `groupCol` slices: the
    * source-redundancy signal (two crawls sharing 90% of their
    * vocabulary are near-substitutes for mixture planning) —
    * `jaccard_ppm = 1e6·|Vₐ∩V_b| div (|Vₐ|+|V_b|−|Vₐ∩V_b|)`, exact
    * integers end to end. Top-`k` pairs by similarity.
    *
    * Scale shape: one (group, token) distinct (map-side combined,
    * vocabulary×groups-bounded), one token-keyed self-join producing
    * only group-PAIR counts (group²-bounded output), sizes broadcast
    * back. The token join's fan-out per token is the number of groups
    * containing it — bounded by the group count, never corpus-sized. */
  def vocabOverlapPairs(df: DataFrame, textCol: String, groupCol: String,
                        k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val v = TextOps.withTokens(df.select(col(groupCol), col(textCol)),
      textCol, "__toks")
      .select(col(groupCol).as("__g"), explode(col("__toks")).as("token"))
      .distinct()
    val sizes = v.groupBy(col("__g")).agg(count(lit(1)).cast("bigint").as("__vs"))
    val inter = v.select(col("__g").as("g_a"), col("token"))
      .join(v.select(col("__g").as("g_b"), col("token")), "token")
      .where(col("g_a") < col("g_b"))
      .groupBy(col("g_a"), col("g_b"))
      .agg(count(lit(1)).cast("bigint").as("n_shared"))
    inter
      .join(broadcast(sizes.withColumnRenamed("__g", "g_a")
        .withColumnRenamed("__vs", "__va")), "g_a")
      .join(broadcast(sizes.withColumnRenamed("__g", "g_b")
        .withColumnRenamed("__vs", "__vb")), "g_b")
      .withColumn("jaccard_ppm", expr(
        "(CAST(1000000 AS DECIMAL(38,0)) * n_shared) " +
          "div (__va + __vb - n_shared)").cast("bigint"))
      .select(col("g_a"), col("g_b"), col("n_shared"), col("jaccard_ppm"))
      .orderBy(col("jaccard_ppm").desc, col("g_a"), col("g_b"))
      .limit(k)
  }

  /** χ²-ranked class-association terms: which tokens are most
    * associated with the `positive` class of `classCol` vs the rest —
    * the classic feature-selection / "what words define this slice"
    * probe (language signatures, source fingerprints, topic leakage).
    *
    * The 2×2 χ² statistic `N·(aB−bA)² / ((a+b)(N−a−b)AB)` is computed
    * as an exact scaled integer `chi2_ppm` (numerator ×1e6, DECIMAL
    * (38,0)/HUGEINT products, one integral divide — the same no-libm
    * discipline as [[pmiCollocations]]); `minCount` floors the pair
    * total to kill hapax noise.
    *
    * Scale shape: one vocabulary-keyed count aggregate (map-side
    * combined), scalar totals broadcast, TakeOrdered top-k. Nothing
    * corpus-sized moves after the token count. */
  def classAssociationTerms(df: DataFrame, textCol: String,
                            classCol: String, positive: String,
                            minCount: Long, k: Int): DataFrame = {
    require(minCount >= 1, "minCount must be positive")
    require(k >= 1, "k must be positive")
    val toks = TextOps.withTokens(
      df.select(col(classCol), col(textCol)), textCol, "__toks")
      .select((col(classCol) === positive).as("__pos"),
        explode(col("__toks")).as("token"))
    val counts = toks.groupBy(col("token")).agg(
      sum(when(col("__pos"), 1L).otherwise(0L)).cast("bigint").as("n_a"),
      sum(when(!col("__pos"), 1L).otherwise(0L)).cast("bigint").as("n_b"))
    val totals = toks.groupBy().agg(
      sum(when(col("__pos"), 1L).otherwise(0L)).cast("bigint").as("__ta"),
      sum(when(!col("__pos"), 1L).otherwise(0L)).cast("bigint").as("__tb"))
    counts.where(col("n_a") + col("n_b") >= minCount)
      .crossJoin(broadcast(totals))
      .withColumn("__d", // aB - bA, exact
        col("n_a").cast("decimal(38,0)") * col("__tb") -
          col("n_b").cast("decimal(38,0)") * col("__ta"))
      .withColumn("__num",
        lit(1000000L).cast("decimal(38,0)") * (col("__ta") + col("__tb")) *
          col("__d") * col("__d"))
      .withColumn("__den",
        (col("n_a") + col("n_b")).cast("decimal(38,0)") *
          (col("__ta") + col("__tb") - col("n_a") - col("n_b")) *
          col("__ta") * col("__tb"))
      .withColumn("chi2_ppm", expr("__num div __den").cast("bigint"))
      .select(col("token"), col("n_a"), col("n_b"), col("chi2_ppm"))
      .orderBy(col("chi2_ppm").desc, col("token"))
      .limit(k)
  }

  /** Top-`k` keywords per document by rarity-weighted term frequency
    * `tf * N / df` (rational idf — see class doc), deterministic
    * tie-break on the token. Output: `(idCol, rk, token, tf, dfreq)`.
    */
  def tfidfTopKeywords(df: DataFrame, idCol: String, textCol: String,
                       k: Int, broadcastDf: Boolean = true): DataFrame = {
    require(k >= 1, "k must be positive")
    // tf feeds both the df reduction and the scoring join — tiny
    // (doc, token, tf) projection, safe to materialize once.
    val tf = termFrequencies(df, idCol, textCol).localCheckpoint()
    val dfs = documentFrequencies(tf)
    val dim = if (broadcastDf) broadcast(dfs) else dfs
    val n = df.select(count(lit(1)).as("__n"))
    val scored = tf.join(dim, "token")
      .crossJoin(broadcast(n))
      .withColumn("__score",
        col("tf").cast("double") * col("__n").cast("double") / col("dfreq").cast("double"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__score").desc, col("token"))
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col(idCol), col("rk"), col("token"), col("tf"), col("dfreq"))
  }

  /** Inverted-index posting lists: one row per token with its
    * document frequency and the first `maxPostings` containing doc
    * ids (ascending). The capped, sorted prefix keeps the output row
    * bounded regardless of how hot a token is — the list for a
    * stopword at 100 TB would otherwise be corpus-sized; downstream
    * retrieval joins the full tf table instead, this is the bounded
    * index/diagnostic surface. One (doc, token) dedup + one
    * vocabulary-keyed aggregation (partial agg applies; the
    * collect_list is bounded post-aggregation by construction only at
    * maxPostings·docs-per-token — at cluster scale cap earlier with a
    * per-token window rank when stopword skew matters). */
  def postingLists(df: DataFrame, idCol: String, textCol: String,
                   maxPostings: Int = 10): DataFrame = {
    require(maxPostings >= 1, "maxPostings must be positive")
    termFrequencies(df, idCol, textCol)
      .groupBy(col("token"))
      .agg(
        count(lit(1)).as("dfreq"),
        concat_ws(",", expr(
          s"transform(slice(array_sort(collect_list($idCol)), 1, $maxPostings), pid -> CAST(pid AS string))"))
          .as("postings"))
  }

  /** Conjunctive (boolean-AND) retrieval: documents containing EVERY
    * query term, ranked by total query-term frequency (integer; ties
    * break on the id). The exact-match complement of the scored
    * [[bm25TopK]] — "must contain all of" is its own query class
    * (filters, faceting, legal/compliance search).
    *
    * Scale shape: tokens are filtered to the query's terms BEFORE
    * anything shuffles — the surviving row count is the postings
    * volume of the query terms, not the corpus; then one doc-keyed
    * partial aggregation (the AND is `count(distinct term) = |terms|`
    * on that bounded set) and a TakeOrderedAndProject for the top-k.
    * No posting-list materialization, no join.
    */
  def conjunctiveTopK(df: DataFrame, idCol: String, textCol: String,
                      terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    require(k >= 1, "k must be positive")
    val distinctTerms = terms.distinct
    TextOps.withTokens(df.select(col(idCol), col(textCol)), textCol, "__toks")
      .select(col(idCol), explode(col("__toks")).as("__tok"))
      .where(col("__tok").isin(distinctTerms: _*))
      .groupBy(col(idCol))
      .agg(countDistinct(col("__tok")).as("__nt"),
        count(lit(1)).cast("bigint").as("score"))
      .where(col("__nt") === distinctTerms.size)
      .select(col(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Fuzzy (edit-distance-≤1) term matching via deletion
    * neighborhoods — the SymSpell trick: a corpus token and a query
    * term are within one insert/delete/substitute iff their
    * single-deletion neighborhoods (the word itself plus every
    * drop-one-character variant) intersect. No pairwise edit-distance
    * scan, no trie: candidate generation is a pure equi-join on
    * variant strings. Output: `(query, matched_token, n_docs)` — each
    * real vocabulary token matching each query term, with its
    * document frequency.
    *
    * Scale shape: the variant table is VOCABULARY × avg-token-length
    * sized (the SymSpell space/time trade), never corpus-sized; query
    * variants broadcast; doc counting is one (token-semi-joined)
    * distinct aggregation. */
  def fuzzyTermMatch(df: DataFrame, idCol: String, textCol: String,
                     queries: Seq[String]): DataFrame = {
    require(queries.nonEmpty, "need at least one query term")
    val spark = df.sparkSession
    import spark.implicits._
    def deletions(w: String): Seq[String] =
      (w +: w.indices.map(i => w.take(i) + w.drop(i + 1))).distinct
    val qv = queries.distinct
      .flatMap(q => deletions(q).map(v => (q, v)))
      .toDF("query", "__v")
    val docTok = TextOps.withTokens(
        df.select(col(idCol), col(textCol)), textCol, "__toks")
      .select(col(idCol), explode(col("__toks")).as("tk"))
      .distinct()
    val varExpr =
      "CASE WHEN length(tk) >= 1 THEN concat(array(tk), " +
        "transform(sequence(1, length(tk)), " +
        "di -> concat(substring(tk, 1, di - 1), " +
        "substring(tk, di + 1, length(tk))))) ELSE array(tk) END"
    val tv = docTok.select(col("tk")).distinct()
      .select(col("tk"), explode(expr(varExpr)).as("__v"))
      .distinct()
    val matched = tv.join(broadcast(qv), Seq("__v"))
      .select(col("query"), col("tk")).distinct()
    val dc = docTok
      .join(matched.select(col("tk")).distinct(), Seq("tk"), "left_semi")
      .groupBy(col("tk"))
      .agg(countDistinct(col(idCol)).cast("bigint").as("n_docs"))
    matched.join(dc, Seq("tk"))
      .select(col("query"), col("tk").as("matched_token"), col("n_docs"))
      .orderBy(col("query"), col("matched_token"))
  }

  /** Reciprocal-rank fusion of N rankings (hybrid retrieval — the
    * standard way to combine lexical BM25 and vector rankings without
    * score calibration): each input frame carries `(idCol, rank)`
    * (1-based); the fused score is `Σ 1/(kRrf + rank_i)`, items
    * absent from a ranking contribute 0.
    *
    * Output: `(idCol, rank0..rank{n-1}, rrf_score)`.
    *
    * Parity/scale notes: ranks are exact integers, each term is one
    * IEEE division and the terms add as a FIXED expression tree — so
    * the fused score is bitwise-reproducible. The joins are id-keyed
    * equi-joins; feed top-k-truncated rankings (the usual practice)
    * to keep them broadcast-sized at 100 TB. */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(kRrf >= 1, "kRrf must be positive")
    val renamed = rankings.zipWithIndex.map { case (d, i) =>
      d.select(col(idCol), col("rank").as(s"__r$i"))
    }
    val joined = renamed.reduce((x, y) => x.join(y, Seq(idCol), "full_outer"))
    val score = rankings.indices.map { i =>
      when(col(s"__r$i").isNotNull,
        lit(1.0) / (lit(kRrf).cast("double") + col(s"__r$i").cast("double")))
        .otherwise(lit(0.0))
    }.reduceLeft(_ + _)
    joined.withColumn("rrf_score", score)
      .select(col(idCol) +:
        rankings.indices.map(i => col(s"__r$i").as(s"rank$i")) :+
        col("rrf_score"): _*)
  }

  /** BM25 score of every document against a fixed token query.
    * Output: `(idCol, dl, score)` — `dl` the document token length.
    *
    * `score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`
    * with `idf` either the rational odds `(N − df + 0.5)/(df + 0.5)`
    * (`logIdf = false`, cross-engine bitwise-reproducible) or its
    * classic `ln(1 + ·)` transform (`logIdf = true`). Documents
    * containing no query token score 0.
    *
    * avgdl note: the mean document length is exact while the token
    * total stays under 2^53 (always, for realistic corpora — 2^53
    * tokens is ~9 petatokens); beyond that the double sum's rounding
    * is order-dependent. */
  def bm25(df: DataFrame, idCol: String, textCol: String,
           queryTokens: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           logIdf: Boolean = true): DataFrame = {
    require(queryTokens.nonEmpty, "queryTokens must be non-empty")
    require(queryTokens.distinct == queryTokens, "queryTokens must be distinct")
    val lens = TextOps.withTokens(df, textCol, "__toks")
      .select(col(idCol), size(col("__toks")).cast("bigint").as("dl"))
    // Corpus scalars: one row, broadcast everywhere.
    val stats = lens.agg(
      count(lit(1)).as("__n"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("__avgdl"))
    // Query-pruned tf: at most |query| rows per document.
    val tf = termFrequencies(df, idCol, textCol)
      .where(col("token").isInCollection(queryTokens))
    val dfs = documentFrequencies(tf) // ≤ |query| rows
    val scoredTerms = tf.join(broadcast(dfs), "token")
      .crossJoin(broadcast(stats))
    // Per-term partial scores pivoted to columns so the final sum is
    // a fixed expression tree (see class doc), not an unordered SUM.
    val idf: Column = {
      val ratio = (col("__n").cast("double") - col("dfreq").cast("double") + lit(0.5)) /
        (col("dfreq").cast("double") + lit(0.5))
      if (logIdf) log(ratio + lit(1.0)) else ratio
    }
    val termScore = idf * (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("__avgdl")))
    val withLen = scoredTerms.join(lens, idCol)
    val aggCols = first(col("dl")).as("dl") +:
      queryTokens.zipWithIndex.map { case (q, i) =>
        max(when(col("token") === q, termScore)).as(s"__s_$i")
      }
    val pivoted = withLen.groupBy(col(idCol)).agg(aggCols.head, aggCols.tail: _*)
    val total = queryTokens.indices.map(i => coalesce(col(s"__s_$i"), lit(0.0)))
      .reduceLeft(_ + _)
    val scoredDocs = pivoted.withColumn("score", total)
      .select(col(idCol), col("dl"), col("score"))
    // Zero-score documents (no query token) re-enter via the length
    // table so the operator ranks the WHOLE corpus deterministically.
    lens.join(scoredDocs.select(col(idCol), col("score")), Seq(idCol), "left")
      .withColumn("score", coalesce(col("score"), lit(0.0)))
      .select(col(idCol), col("dl"), col("score"))
  }

  /** EXACT BM25 top-`k` with MaxScore upper-bound pruning (Turtle &
    * Flood 1995, the classic dynamic-pruning family WAND/MaxScore
    * belongs to): returns byte-identical results to ranking the whole
    * corpus with [[bm25]] (`logIdf = false`) and taking the top `k`,
    * while skipping the full per-document scoring for candidates that
    * provably cannot reach the top.
    *
    * The pruning argument, distributed form:
    *  1. per-term upper bound `UB(t)` = the MAX actual term score of
    *     `t` over the corpus (computed exactly from the query-pruned
    *     term table — tighter than the textbook `idf·(k1+1)` bound);
    *  2. seed threshold `θ` = the k-th exact score among documents
    *     containing the highest-UB ("essential") term — a posting
    *     list that must intersect any top-k candidate set dominated
    *     by that term;
    *  3. a candidate with `Σ_{t ∈ doc} UB(t) < θ` scores < θ, and the
    *     global k-th best is ≥ θ (k seed docs already reach it), so
    *     it can never enter the top k — even under the `(score DESC,
    *     id)` tie-break, because the inequality is strict. Candidates
    *     with bound = θ are KEPT (a tie at θ can still win on id).
    *     If the essential posting list has fewer than `k` documents,
    *     no pruning happens (θ undefined) — exactness first.
    *
    * Scale shape (100 TB): the query-pruned `(doc, term, tf)` table
    * is localCheckpointed once (≤ |query| rows per matching doc) and
    * every subsequent stage — UB dim (≤ |query| rows, broadcast),
    * per-doc bounds (one id-keyed partial agg), seed scoring (one
    * posting list), final scoring (survivors only) — works off it;
    * the corpus is tokenized twice (tf + lens), never more. The
    * expensive per-doc pivot runs on ONE posting list + survivors
    * instead of every candidate.
    *
    * Output: `(idCol, dl, score)`, the exact top `k` by
    * `(score DESC, idCol)`. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               queryTokens: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTokens.nonEmpty, "queryTokens must be non-empty")
    require(queryTokens.distinct == queryTokens, "queryTokens must be distinct")
    require(k >= 1, "k must be positive")
    val lens = TextOps.withTokens(df, textCol, "__toks")
      .select(col(idCol), size(col("__toks")).cast("bigint").as("dl"))
      .localCheckpoint()
    val stats = lens.agg(
      count(lit(1)).as("__n"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("__avgdl"))
    val tf = termFrequencies(df, idCol, textCol)
      .where(col("token").isInCollection(queryTokens))
      .localCheckpoint()
    val dfs = documentFrequencies(tf)
    // Identical expression tree to bm25(logIdf = false) — scoring a
    // SUBSET yields bitwise-identical per-term values.
    val idf = (col("__n").cast("double") - col("dfreq").cast("double") + lit(0.5)) /
      (col("dfreq").cast("double") + lit(0.5))
    val termScore = idf * (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("__avgdl")))
    val withLen = tf.join(broadcast(dfs), "token").crossJoin(broadcast(stats))
      .join(lens, idCol)
      .withColumn("__ts", termScore)
      .localCheckpoint()

    def pivotScores(candidateIds: DataFrame): DataFrame = {
      val rows = withLen.join(candidateIds, Seq(idCol), "left_semi")
      val aggCols = first(col("dl")).as("dl") +:
        queryTokens.zipWithIndex.map { case (q, i) =>
          max(when(col("token") === q, col("__ts"))).as(s"__s_$i")
        }
      rows.groupBy(col(idCol)).agg(aggCols.head, aggCols.tail: _*)
        .withColumn("score", queryTokens.indices
          .map(i => coalesce(col(s"__s_$i"), lit(0.0))).reduceLeft(_ + _))
        .select(col(idCol), col("dl"), col("score"))
    }

    val ubDim = withLen.groupBy(col("token")).agg(max(col("__ts")).as("__ub"))
    val essential = ubDim.orderBy(col("__ub").desc, col("token")).limit(1)
      .select(col("token"))
    val seedIds = withLen.join(broadcast(essential), Seq("token"))
      .select(col(idCol))
    val theta = pivotScores(seedIds)
      .orderBy(col("score").desc, col(idCol)).limit(k)
      .agg(min(col("score")).as("__theta"), count(lit(1)).cast("int").as("__nk"))
    val survivors = withLen.select(col(idCol), col("token"))
      .join(broadcast(ubDim), "token")
      .groupBy(col(idCol)).agg(sum(col("__ub")).as("__ub_doc"))
      .crossJoin(broadcast(theta))
      .where(col("__nk") < k || col("__ub_doc") >= col("__theta"))
      .select(col(idCol))
    // Zero-fill so k larger than the candidate set still ranks the
    // whole corpus (bm25 semantics), then exact top-k.
    lens.join(pivotScores(survivors).select(col(idCol), col("score")),
        Seq(idCol), "left")
      .withColumn("score", coalesce(col("score"), lit(0.0)))
      .select(col(idCol), col("dl"), col("score"))
      .orderBy(col("score").desc, col(idCol)).limit(k)
  }

  /** Good–Turing unseen mass + Chao1 richness per group — "how much
    * vocabulary have we NOT seen yet?" The Good–Turing estimate of
    * the probability mass on unseen types is `V₁/N` (singleton types
    * over tokens); Chao1 estimates total richness as
    * `V + V₁²/(2V₂)` (bias-corrected `V + V₁(V₁−1)/2` when there are
    * no doubletons). Both are exact integer ratios here (ppm / floor)
    * — the coverage-estimation companion to [[noveltyCurve]]:
    * novelty says how fast vocabulary grew, this says how much is
    * still missing.
    *
    * Scale shape (100 TB): token explode → (group, token) count →
    * count-of-counts — each map-side combinable, outputs vocabulary-
    * then group-bounded. No joins, no windows. */
  def speciesRichness(df: DataFrame, groupCol: String,
                      textCol: String): DataFrame = {
    val tc = TextOps.withTokens(
        df.select(col(groupCol).as("grp"), col(textCol)), textCol, "__toks")
      .select(col("grp"), explode(col("__toks")).as("__w"))
      .groupBy(col("grp"), col("__w"))
      .agg(count(lit(1)).cast("bigint").as("__c"))
    tc.groupBy(col("grp"))
      .agg(sum(col("__c")).cast("bigint").as("n_tokens"),
        count(lit(1)).cast("bigint").as("types"),
        sum(when(col("__c") === 1, 1L).otherwise(0L)).cast("bigint")
          .as("singletons"),
        sum(when(col("__c") === 2, 1L).otherwise(0L)).cast("bigint")
          .as("doubletons"))
      .withColumn("unseen_ppm",
        expr("(1000000L * singletons) div n_tokens").cast("bigint"))
      .withColumn("chao1", expr(
        "CASE WHEN doubletons > 0 " +
          "THEN types + (singletons * singletons) div (2L * doubletons) " +
          "ELSE types + (singletons * (singletons - 1L)) div 2L END")
        .cast("bigint"))
  }

  /** Vocabulary novelty curve (Heaps-law growth audit): split the
    * corpus into `nBuckets` equal id-ordinal slices and report, per
    * slice, how much genuinely NEW trigram vocabulary it introduces —
    * `new_types` (trigram types whose corpus-wide FIRST occurrence
    * lands in the slice), cumulative types, total occurrences, and
    * `novelty_ppm = 10⁶·new_types div occurrences`. A flattening
    * curve says additional data is rehashing the same language — the
    * collect-more-data-or-not signal for a training corpus.
    *
    * Scale shape (100 TB): one trigram explode feeding (a) a
    * vocabulary-keyed `min(id)` aggregate and (b) a bucket-keyed
    * occurrence count — both map-side combinable, both outputs
    * vocabulary-/bucket-bounded, never corpus-bounded. The cumulative
    * window runs over the `nBuckets`-row frame only; the id-extent
    * scalar broadcasts. */
  def noveltyCurve(df: DataFrame, idCol: String, textCol: String,
                   nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be positive")
    val H = graft.functions.TextHash.spark
    val tri = TextOps.withTokens(
        df.select(col(idCol).cast("bigint").as("__id"), col(textCol)),
        textCol, "__toks")
      .select(col("__id"), explode(expr(H.shingles3("__toks", textCol))).as("__sh"))
    val ext = df.agg(max(col(idCol)).cast("bigint").as("__maxid"))
    val bucketed = tri.crossJoin(broadcast(ext))
      .withColumn("__bkt", expr(s"__id div ((__maxid div ${nBuckets}L) + 1L)"))
    val occ = bucketed.groupBy(col("__bkt"))
      .agg(count(lit(1)).cast("bigint").as("occurrences"),
        countDistinct(col("__id")).cast("bigint").as("n_docs"))
    val novel = bucketed
      .groupBy(col("__sh")).agg(min(col("__bkt")).as("__firstb"))
      .groupBy(col("__firstb").as("__bkt"))
      .agg(count(lit(1)).cast("bigint").as("new_types"))
    val w = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, 0)
    occ.join(novel, Seq("__bkt"), "left")
      .withColumn("new_types", coalesce(col("new_types"), lit(0L)))
      .withColumn("cum_types", sum(col("new_types")).over(w).cast("bigint"))
      .select(col("__bkt").cast("bigint").as("bucket"), col("n_docs"),
        col("occurrences"), col("new_types"), col("cum_types"),
        expr("(1000000L * new_types) div occurrences").cast("bigint")
          .as("novelty_ppm"))
  }
}
