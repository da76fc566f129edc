package graft.queries

import graft.functions.TextHash
import graft.operators.{DedupOps, TextOps}
import org.apache.spark.sql.functions._

/** Driver-checkable witnesses for the text-analysis / dedup operator
  * family (north-star extensions; the reference has no text operators
  * — SURVEY.md §0). Oracles are generated from the same hash
  * arithmetic via TextHash.duck, so results are bitwise-comparable.
  */
object TextQ {

  import Q.{t, tp}
  import TextHash.{duck => D}

  // DuckDB-side shared fragments.
  private val duckToks = D.tokens("text")
  private val duckShingles = D.shingles3("t", "text")

  private def minhashCols(n: Int): String =
    TextHash.Seeds.take(n).zipWithIndex
      .map { case ((a, b), i) => s"${D.minhash("shs", a, b)} AS m$i" }
      .mkString(", ")

  /** [[sigCte]] over a filtered corpus slice (`pred` in SQL). */
  private def sigCteWhere(pred: String) =
    s"""WITH toks AS (SELECT doc_id, text, $duckToks AS t FROM documents WHERE $pred),
       |sh AS (SELECT doc_id, text, $duckShingles AS shs FROM toks),
       |sig AS (SELECT doc_id, ${minhashCols(8)} FROM sh)""".stripMargin

  private val sigCte = sigCteWhere("TRUE")

  /** LSH candidate pairs + exact shingle overlap stats (2×4 band
    * collisions → per-pair n_common / n_sh sizes) as composable CTEs
    * after [[sigCte]] — the shared candidate stage for symmetric
    * Jaccard ([[vpairsCtes]]) and asymmetric containment (q89). */
  private val candCtes =
    s"""b AS (SELECT doc_id,
       |  m0::VARCHAR || '|' || m1::VARCHAR || '|' || m2::VARCHAR || '|' || m3::VARCHAR AS band0,
       |  m4::VARCHAR || '|' || m5::VARCHAR || '|' || m6::VARCHAR || '|' || m7::VARCHAR AS band1
       |  FROM sig),
       |pairs AS (
       |  SELECT x.doc_id AS a_id, y.doc_id AS b_id FROM b x JOIN b y ON x.band0 = y.band0 AND x.doc_id < y.doc_id
       |  UNION
       |  SELECT x.doc_id, y.doc_id FROM b x JOIN b y ON x.band1 = y.band1 AND x.doc_id < y.doc_id),
       |shex AS (SELECT DISTINCT doc_id, shingle FROM (SELECT doc_id, unnest(shs) AS shingle FROM sh)),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM shex GROUP BY doc_id),
       |common AS (
       |  SELECT p.a_id, p.b_id, count(*) AS n_common
       |  FROM pairs p
       |  JOIN shex sa ON sa.doc_id = p.a_id
       |  JOIN shex sb ON sb.doc_id = p.b_id AND sb.shingle = sa.shingle
       |  GROUP BY p.a_id, p.b_id)""".stripMargin

  /** Bipartite variant of [[candCtes]]+vpairs for the incremental
    * near-dup gate (q137): candidates pair a batch doc (`doc_id <
    * split`) against a corpus doc only, same band scheme and exact
    * Jaccard verification. */
  private def bipartiteVpairsCtes(split: Long, minJ: Double) =
    s"""b AS (SELECT doc_id,
       |  m0::VARCHAR || '|' || m1::VARCHAR || '|' || m2::VARCHAR || '|' || m3::VARCHAR AS band0,
       |  m4::VARCHAR || '|' || m5::VARCHAR || '|' || m6::VARCHAR || '|' || m7::VARCHAR AS band1
       |  FROM sig),
       |pairs AS (
       |  SELECT x.doc_id AS a_id, y.doc_id AS b_id FROM b x JOIN b y
       |    ON x.band0 = y.band0 AND x.doc_id < $split AND y.doc_id >= $split
       |  UNION
       |  SELECT x.doc_id, y.doc_id FROM b x JOIN b y
       |    ON x.band1 = y.band1 AND x.doc_id < $split AND y.doc_id >= $split),
       |shex AS (SELECT DISTINCT doc_id, shingle FROM (SELECT doc_id, unnest(shs) AS shingle FROM sh)),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM shex GROUP BY doc_id),
       |common AS (
       |  SELECT p.a_id, p.b_id, count(*) AS n_common
       |  FROM pairs p
       |  JOIN shex sa ON sa.doc_id = p.a_id
       |  JOIN shex sb ON sb.doc_id = p.b_id AND sb.shingle = sa.shingle
       |  GROUP BY p.a_id, p.b_id),
       |vpairs AS (
       |  SELECT c.a_id, c.b_id,
       |    c.n_common::DOUBLE / (za.n_sh + zb.n_sh - c.n_common) AS jaccard
       |  FROM common c
       |  JOIN sizes za ON za.doc_id = c.a_id
       |  JOIN sizes zb ON zb.doc_id = c.b_id
       |  WHERE c.n_common::DOUBLE / (za.n_sh + zb.n_sh - c.n_common) >= $minJ)""".stripMargin

  /** Verified LSH near-dup pairs (exact shingle Jaccard ≥ 0.2) over
    * [[candCtes]] — shared by q33 (the pair list) and q71/q79/q87
    * (transitive clusters over it). */
  private val vpairsCtes =
    s"""$candCtes,
       |vpairs AS (
       |  SELECT c.a_id, c.b_id,
       |    c.n_common::DOUBLE / (za.n_sh + zb.n_sh - c.n_common) AS jaccard
       |  FROM common c
       |  JOIN sizes za ON za.doc_id = c.a_id
       |  JOIN sizes zb ON zb.doc_id = c.b_id
       |  WHERE c.n_common::DOUBLE / (za.n_sh + zb.n_sh - c.n_common) >= 0.2)""".stripMargin

  val qs: Seq[Q] = Seq(

    // ---- exact dedup: content-digest groupBy ---------------------
    Q("q30_dedup_exact",
      Some("""SELECT source, count(*) AS n_docs, count(DISTINCT md5(text)) AS n_unique
             |FROM documents GROUP BY source ORDER BY source""".stripMargin),
      (s, dir) => DedupOps.exactDupStats(t(s, dir, "documents"), "text", "source")),

    // ---- rolling-hash document fingerprint -----------------------
    Q("q31_fingerprint",
      Some(s"""SELECT doc_id, ${D.rollingHash("text")} AS fingerprint
              |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        TextOps.withFingerprint(t(s, dir, "documents"), "text")
          .where(col("doc_id") < 100)
          .select("doc_id", "fingerprint")
          .orderBy("doc_id")),

    // ---- minhash signatures --------------------------------------
    Q("q32_minhash_signature",
      Some(s"""$sigCte
              |SELECT doc_id, m0, m1, m2, m3, m4, m5, m6, m7
              |FROM sig WHERE doc_id < 200 ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        TextOps.withMinhashSignature(t(s, dir, "documents"), "text", 8)
          .where(col("doc_id") < 200)
          .select("doc_id", "m0", "m1", "m2", "m3", "m4", "m5", "m6", "m7")
          .orderBy("doc_id")),

    // ---- minhash + LSH banding → verified near-dup pairs ---------
    Q("q33_lsh_near_dup_pairs",
      Some(s"""$sigCte,
              |$vpairsCtes
              |SELECT a_id, b_id, jaccard FROM vpairs
              |ORDER BY a_id, b_id""".stripMargin),
      (s, dir) =>
        DedupOps.lshNearDupPairs(tp(s, dir, "documents", "doc_id"), "doc_id", "text",
          bands = 2, rowsPerBand = 4, minJaccard = 0.2)),

    // ---- near-dup pairs → transitive dedup clusters --------------
    // Connected components (alternating large-star/small-star) over
    // the q33 verified pair graph; cluster_id = min doc in the
    // component. Oracle: recursive-CTE transitive closure.
    // NOTE the recursion is scoped to an inner subquery: DuckDB 1.0
    // mis-evaluates an outer-level `WITH RECURSIVE` chain whose
    // NON-recursive CTEs contain UNIONs (the `pairs` CTE silently
    // loses rows — observed 243 vs 251 pairs at sf0.1).
    Q("q71_dedup_clusters",
      Some(s"""$sigCte,
              |$vpairsCtes
              |SELECT doc_id, cluster_id FROM (
              |  WITH RECURSIVE edges AS (SELECT a_id AS u, b_id AS v FROM vpairs
              |    UNION SELECT b_id, a_id FROM vpairs),
              |  reach AS (
              |    SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges) t
              |    UNION
              |    SELECT e.u, q.r FROM edges e JOIN reach q ON e.v = q.u)
              |  SELECT u AS doc_id, min(r)::BIGINT AS cluster_id
              |  FROM reach GROUP BY u
              |) z ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val pairs = DedupOps.lshNearDupPairs(tp(s, dir, "documents", "doc_id"), "doc_id", "text",
          bands = 2, rowsPerBand = 4, minJaccard = 0.2)
        graft.operators.Components.connectedComponents(pairs, "a_id", "b_id")
          .select(col("id").as("doc_id"), col("cluster_id"))
          .orderBy("doc_id")
      }),

    // ---- dedup cluster-size histogram ----------------------------
    // Aggregate over the q71 clustering: how many duplicate groups of
    // each size exist (the shape curators read before choosing a
    // dedup policy).
    // (same inner-scoped recursion as q71 — see the DuckDB 1.0 note)
    Q("q79_cluster_sizes",
      Some(s"""$sigCte,
              |$vpairsCtes
              |SELECT cluster_size, count(*)::BIGINT AS n_clusters FROM (
              |  WITH RECURSIVE edges AS (SELECT a_id AS u, b_id AS v FROM vpairs
              |    UNION SELECT b_id, a_id FROM vpairs),
              |  reach AS (
              |    SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges) t
              |    UNION
              |    SELECT e.u, q.r FROM edges e JOIN reach q ON e.v = q.u),
              |  cl AS (SELECT u, min(r) AS c FROM reach GROUP BY u)
              |  SELECT c, count(*)::BIGINT AS cluster_size FROM cl GROUP BY c
              |) sz GROUP BY cluster_size ORDER BY cluster_size""".stripMargin),
      (s, dir) => {
        val pairs = DedupOps.lshNearDupPairs(tp(s, dir, "documents", "doc_id"), "doc_id", "text",
          bands = 2, rowsPerBand = 4, minJaccard = 0.2)
        graft.operators.Components.connectedComponents(pairs, "a_id", "b_id")
          .groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
          .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
          .orderBy("cluster_size")
      }),

    // ---- asymmetric containment pairs ----------------------------
    // C(A→B) = |A∩B|/|A| over distinct 3-shingle sets for the same
    // LSH candidates as q33 — the quote/boilerplate-inclusion signal
    // symmetric Jaccard dilutes. Single IEEE divisions of exact
    // integers; bitwise-portable.
    Q("q89_containment_pairs",
      Some(s"""$sigCte,
              |$candCtes
              |SELECT c.a_id, c.b_id,
              |  c.n_common::DOUBLE / za.n_sh AS containment_a,
              |  c.n_common::DOUBLE / zb.n_sh AS containment_b
              |FROM common c
              |JOIN sizes za ON za.doc_id = c.a_id
              |JOIN sizes zb ON zb.doc_id = c.b_id
              |WHERE c.n_common::DOUBLE / za.n_sh >= 0.6
              |   OR c.n_common::DOUBLE / zb.n_sh >= 0.6
              |ORDER BY a_id, b_id""".stripMargin),
      (s, dir) =>
        DedupOps.containmentPairs(tp(s, dir, "documents", "doc_id"), "doc_id", "text",
          bands = 2, rowsPerBand = 4, minContainment = 0.6)),

    // ---- out-of-vocabulary rate (tokenizer health check) ---------
    // Vocabulary = corpus top-20 tokens (count desc, token asc —
    // deterministic); OOV counts occurrences outside it, aggregated
    // per language. Single division of exact integer sums.
    Q("q88_oov_rate",
      Some(s"""WITH toks AS (SELECT doc_id, lang, $duckToks AS t FROM documents),
              |tok AS (SELECT doc_id, lang, unnest(t) AS token FROM toks),
              |cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
              |vocab AS (SELECT token FROM cnt ORDER BY c DESC, token LIMIT 20),
              |ann AS (SELECT tk.doc_id, tk.lang,
              |  CASE WHEN v.token IS NULL THEN 1 ELSE 0 END AS oov
              |  FROM tok tk LEFT JOIN vocab v USING (token))
              |SELECT lang, count(*)::BIGINT AS n_tok_occurrences,
              |  sum(oov)::BIGINT AS n_oov,
              |  (sum(oov)::BIGINT)::DOUBLE / ((count(*)::BIGINT)::DOUBLE) AS oov_rate
              |FROM ann GROUP BY lang ORDER BY lang""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        graft.operators.Relevance.vocabCoverage(docs, "doc_id", "text", vocabSize = 20)
          .join(docs.select(col("doc_id"), col("lang")), "doc_id")
          .groupBy(col("lang"))
          .agg(
            sum(col("n_toks")).as("n_tok_occurrences"),
            sum(col("n_oov")).as("n_oov"))
          .withColumn("oov_rate",
            col("n_oov").cast("double") / col("n_tok_occurrences").cast("double"))
          .orderBy("lang")
      }),

    // ---- winnowed-fingerprint substring-sharing pairs ------------
    // MOSS-style clone candidates: docs sharing >= 2 sufficiently
    // rare winnow fingerprints. The df cap scales WITH the corpus
    // (4% of doc count, floor) — an absolute cap either admits
    // everything at one scale or nothing at another (this corpus's
    // tiny vocabulary makes every fingerprint's df grow linearly
    // with sf); both engines derive the cap from the same count.
    // 4% sits below this corpus's bimodal df split (rare shared
    // passages vs corpus-wide boilerplate): join volume 22.5k pairs
    // at sf0.1 vs 14M at an 8% cap — the df histogram, not the
    // output size, is what the cap controls.
    Q("q91_winnow_pairs",
      Some(s"""WITH kh AS (SELECT doc_id, text, ${D.kgramHashes("text", 5)} AS h FROM documents),
              |fp AS (SELECT doc_id,
              |  CASE WHEN length(text) >= 8 THEN ${D.winnowFromHashes("h", 4)}
              |       ELSE [${D.rollingHash("text")}] END AS fps FROM kh),
              |fx AS (SELECT DISTINCT doc_id, f FROM (SELECT doc_id, unnest(fps) AS f FROM fp)),
              |dfc AS (SELECT f, count(*) AS dfx FROM fx GROUP BY f),
              |usable AS (SELECT f FROM dfc
              |  WHERE dfx >= 2 AND dfx::DOUBLE <= (SELECT count(*) FROM documents)::DOUBLE * 0.04),
              |fu AS (SELECT fx.doc_id, fx.f FROM fx JOIN usable USING (f))
              |SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*)::BIGINT AS n_shared
              |FROM fu x JOIN fu y ON y.f = x.f AND x.doc_id < y.doc_id
              |GROUP BY 1, 2 HAVING count(*) >= 2
              |ORDER BY a_id, b_id""".stripMargin),
      (s, dir) => {
        val docs = tp(s, dir, "documents", "doc_id")
        val maxDf = math.max(2, (docs.count().toDouble * 0.04).toInt)
        DedupOps.winnowSharedPairs(docs, "doc_id", "text",
          k = 5, w = 4, minShared = 2, maxDf = maxDf)
      }),

    // ---- end-user near-dup removal (composed verb) ---------------
    // dropNearDuplicates = lshNearDupPairs → connectedComponents →
    // keep-min-id representative → anti-join, in one call. Witness:
    // the surviving doc ids. Oracle: transitive closure via the same
    // inner-scoped recursion as q71 (DuckDB 1.0 outer-WITH-RECURSIVE
    // bug), survivors = everything except non-min cluster members.
    Q("q87_drop_near_dups",
      Some(s"""$sigCte,
              |$vpairsCtes
              |SELECT d.doc_id FROM documents d
              |WHERE d.doc_id NOT IN (
              |  SELECT doc_id FROM (
              |    WITH RECURSIVE edges AS (SELECT a_id AS u, b_id AS v FROM vpairs
              |      UNION SELECT b_id, a_id FROM vpairs),
              |    reach AS (
              |      SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges) t
              |      UNION
              |      SELECT e.u, q.r FROM edges e JOIN reach q ON e.v = q.u)
              |    SELECT u AS doc_id FROM reach GROUP BY u HAVING min(r) <> u
              |  ) z)
              |ORDER BY d.doc_id""".stripMargin),
      (s, dir) =>
        DedupOps.dropNearDuplicates(tp(s, dir, "documents", "doc_id"), "doc_id", "text",
          bands = 2, rowsPerBand = 4, minJaccard = 0.2)
          .select("doc_id")
          .orderBy("doc_id")),

    // ---- near-dup removal, keep-best representative --------------
    // Same verb as q87 but the surviving cluster member is the
    // HIGHEST-QUALITY copy (score = n_chars, min-id tiebreak), not
    // the min id — the policy a curation pass wants once a quality
    // score exists. Scoped to doc_id < 300 (7 verified pairs at
    // sf0.01) to keep the third run of the LSH pipeline off the
    // bench's critical path.
    Q("q101_drop_near_dups_best",
      Some(s"""${sigCteWhere("doc_id < 300")},
              |$vpairsCtes
              |SELECT d.doc_id FROM documents d
              |WHERE d.doc_id < 300 AND d.doc_id NOT IN (
              |  SELECT doc_id FROM (
              |    WITH RECURSIVE edges AS (SELECT a_id AS u, b_id AS v FROM vpairs
              |      UNION SELECT b_id, a_id FROM vpairs),
              |    reach AS (
              |      SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges) t
              |      UNION
              |      SELECT e.u, q.r FROM edges e JOIN reach q ON e.v = q.u),
              |    cl AS (SELECT u AS doc_id, min(r) AS cluster_id FROM reach GROUP BY u),
              |    rk AS (SELECT c.doc_id, row_number() OVER (
              |        PARTITION BY c.cluster_id ORDER BY d2.n_chars DESC NULLS LAST, c.doc_id) AS rk
              |      FROM cl c JOIN documents d2 USING (doc_id))
              |    SELECT doc_id FROM rk WHERE rk > 1
              |  ) z)
              |ORDER BY d.doc_id""".stripMargin),
      (s, dir) =>
        DedupOps.dropNearDuplicates(
          tp(s, dir, "documents", "doc_id").where(col("doc_id") < 300), "doc_id", "text",
          bands = 2, rowsPerBand = 4, minJaccard = 0.2, keepBestBy = Some("n_chars"))
          .select("doc_id")
          .orderBy("doc_id")),

    // ---- Gopher-style repetition statistics (per document) -------
    Q("q72_repetition_stats",
      Some(s"""WITH toks AS (SELECT doc_id, $duckToks AS t FROM documents WHERE doc_id < 100),
              |bg AS (SELECT doc_id, t, CASE WHEN len(t) >= 2
              |  THEN list_transform(range(1, len(t)), bi -> t[bi] || ' ' || t[bi+1])
              |  ELSE []::VARCHAR[] END AS b FROM toks)
              |SELECT doc_id, len(t)::BIGINT AS n_toks,
              |  (len(t) - len(list_distinct(t)))::BIGINT AS n_dup_toks,
              |  (len(b) - len(list_distinct(b)))::BIGINT AS n_dup_bigrams,
              |  (CASE WHEN len(b) = 0 THEN 0
              |   ELSE list_max(list_transform(list_distinct(b), g -> len(list_filter(b, x -> x = g)))) END)::BIGINT AS top_bigram_n
              |FROM bg ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        TextOps.withRepetitionStats(
          t(s, dir, "documents").where(col("doc_id") < 100), "text")
          .select("doc_id", "n_toks", "n_dup_toks", "n_dup_bigrams", "top_bigram_n")
          .orderBy("doc_id")),

    // ---- repetition-based quality gate (per source) --------------
    // Flags documents whose duplicate-bigram fraction or top-bigram
    // token mass exceeds the Gopher-style thresholds; counts are
    // exact integers, ratios are single IEEE divisions (bitwise-equal
    // across engines).
    Q("q73_repetition_filter",
      Some(s"""WITH toks AS (SELECT source, $duckToks AS t FROM documents),
              |bg AS (SELECT source, t, CASE WHEN len(t) >= 2
              |  THEN list_transform(range(1, len(t)), bi -> t[bi] || ' ' || t[bi+1])
              |  ELSE []::VARCHAR[] END AS b FROM toks),
              |st AS (SELECT source, len(t) AS n, len(b) AS nb,
              |  len(b) - len(list_distinct(b)) AS dupb,
              |  CASE WHEN len(b) = 0 THEN 0
              |    ELSE list_max(list_transform(list_distinct(b), g -> len(list_filter(b, x -> x = g)))) END AS topb
              |  FROM bg)
              |SELECT source, count(*)::BIGINT AS n_docs,
              |  sum(CASE WHEN (nb > 0 AND dupb::DOUBLE / nb::DOUBLE > 0.06)
              |            OR (topb::DOUBLE * 2.0 / n::DOUBLE > 0.12) THEN 1 ELSE 0 END)::BIGINT AS n_repetitive
              |FROM st GROUP BY source ORDER BY source""".stripMargin),
      (s, dir) =>
        TextOps.withRepetitionStats(t(s, dir, "documents"), "text")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("dup_bigram_frac") > 0.06 || col("top_bigram_frac") > 0.12, 1)
              .otherwise(0)).cast("bigint").as("n_repetitive"))
          .orderBy("source")),

    // ---- simhash -------------------------------------------------
    Q("q34_simhash",
      Some(s"""WITH toks AS (SELECT doc_id, $duckToks AS t FROM documents),
              |hs AS (SELECT doc_id, ${D.tokenHashes16("t")} AS hashes FROM toks)
              |SELECT doc_id, ${D.simhash16("hashes")} AS simhash16
              |FROM hs WHERE doc_id < 200 ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        TextOps.withSimhash16(t(s, dir, "documents"), "text")
          .where(col("doc_id") < 200)
          .select("doc_id", "simhash16")
          .orderBy("doc_id")),

    // ---- minhash Jaccard ESTIMATE over LSH candidates ------------
    // The estimator property: matching signature fraction ~ Jaccard.
    // Division by 8 (power of two) keeps the double exact.
    Q("q51_minhash_estimate",
      Some(s"""$sigCte,
              |b AS (SELECT doc_id,
              |  m0::VARCHAR || '|' || m1::VARCHAR || '|' || m2::VARCHAR || '|' || m3::VARCHAR AS band0,
              |  m0, m1, m2, m3, m4, m5, m6, m7 FROM sig),
              |pairs AS (
              |  SELECT x.doc_id AS a_id, y.doc_id AS b_id,
              |    ((CASE WHEN x.m0 = y.m0 THEN 1 ELSE 0 END) + (CASE WHEN x.m1 = y.m1 THEN 1 ELSE 0 END) +
              |     (CASE WHEN x.m2 = y.m2 THEN 1 ELSE 0 END) + (CASE WHEN x.m3 = y.m3 THEN 1 ELSE 0 END) +
              |     (CASE WHEN x.m4 = y.m4 THEN 1 ELSE 0 END) + (CASE WHEN x.m5 = y.m5 THEN 1 ELSE 0 END) +
              |     (CASE WHEN x.m6 = y.m6 THEN 1 ELSE 0 END) + (CASE WHEN x.m7 = y.m7 THEN 1 ELSE 0 END)
              |    )::DOUBLE / 8 AS est_jaccard
              |  FROM b x JOIN b y ON x.band0 = y.band0 AND x.doc_id < y.doc_id)
              |SELECT a_id, b_id, est_jaccard FROM pairs ORDER BY a_id, b_id""".stripMargin),
      (s, dir) => {
        val sigs = DedupOps.signatures(tp(s, dir, "documents", "doc_id"), "doc_id", "text", 2, 4)
          .select(col("doc_id").as("id") +: (0 until 8).map(i => col(s"m$i")) :+ col("band0"): _*)
          .localCheckpoint()
        val x = sigs.select(col("id").as("a_id") +:
          (0 until 8).map(i => col(s"m$i").as(s"xa$i")) :+ col("band0").as("bk"): _*)
        val y = sigs.select(col("id").as("b_id") +:
          (0 until 8).map(i => col(s"m$i").as(s"yb$i")) :+ col("band0").as("bk"): _*)
        x.join(y, "bk").where(col("a_id") < col("b_id"))
          .withColumn("est_jaccard",
            (0 until 8).map(i => when(col(s"xa$i") === col(s"yb$i"), 1).otherwise(0))
              .reduce(_ + _).cast("double") / 8)
          .select("a_id", "b_id", "est_jaccard")
          .orderBy("a_id", "b_id")
      }),

    // ---- simhash-banded near-dup pairs ---------------------------
    // 60-bit simhash, 4 bands of 15 bits = 32,768 buckets per band
    // (band-bucket cardinality must grow with corpus size: the round-2
    // 30-bit/5-band shape's 64 buckets made each band self-join
    // O(n²/64)); Hamming <= 3 (< bands, so pigeonhole guarantees
    // candidate coverage).
    Q("q46_simhash_near_dup", {
      val branches = (0 until 4).map { b =>
        val div = 1L << (15 * b)
        s"""SELECT x.doc_id AS a_id, y.doc_id AS b_id, x.sim AS sa, y.sim AS sb
           |    FROM sim x JOIN sim y
           |      ON (x.sim // $div) % 32768 = (y.sim // $div) % 32768 AND x.doc_id < y.doc_id""".stripMargin
      }.mkString("\n    UNION\n    ")
      Some(s"""WITH toks AS (SELECT doc_id, $duckToks AS t FROM documents),
              |hs AS (SELECT doc_id, ${D.tokenHashesWide("t", 60)} AS hashes FROM toks),
              |sim AS (SELECT doc_id, ${D.simhashN("hashes", 60)} AS sim FROM hs),
              |pairs AS (
              |  SELECT DISTINCT a_id, b_id, sa, sb FROM (
              |    $branches))
              |SELECT bit_count(xor(sa, sb))::INT AS hamming, count(*) AS n_pairs,
              |  min(a_id) AS min_a, max(b_id) AS max_b
              |FROM pairs
              |WHERE bit_count(xor(sa, sb)) <= 3
              |GROUP BY 1 ORDER BY hamming""".stripMargin)
    },
      (s, dir) => {
        import org.apache.spark.sql.functions.{count => cnt, lit => l, min => mn, max => mx, col => c}
        DedupOps.simhashNearDupPairs(t(s, dir, "documents"), "doc_id", "text",
          bits = 60, bands = 4, maxHamming = 3)
          .groupBy(c("hamming"))
          .agg(cnt(l(1)).as("n_pairs"), mn(c("a_id")).as("min_a"), mx(c("b_id")).as("max_b"))
          .orderBy("hamming")
      }),

    // ---- blocked n-gram Jaccard near-dup -------------------------
    Q("q35_blocked_jaccard",
      Some(s"""WITH blocked AS (SELECT doc_id, text, substr(text, 1, 40) AS blk FROM documents),
              |pairs AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id
              |  FROM blocked x JOIN blocked y ON x.blk = y.blk AND x.doc_id < y.doc_id),
              |toks AS (SELECT doc_id, text, $duckToks AS t FROM documents),
              |sh AS (SELECT doc_id, $duckShingles AS shs FROM toks),
              |shex AS (SELECT DISTINCT doc_id, shingle FROM (SELECT doc_id, unnest(shs) AS shingle FROM sh)),
              |sizes AS (SELECT doc_id, count(*) AS n_sh FROM shex GROUP BY doc_id),
              |common AS (
              |  SELECT p.a_id, p.b_id, count(*) AS n_common
              |  FROM pairs p
              |  JOIN shex sa ON sa.doc_id = p.a_id
              |  JOIN shex sb ON sb.doc_id = p.b_id AND sb.shingle = sa.shingle
              |  GROUP BY p.a_id, p.b_id)
              |SELECT c.a_id, c.b_id,
              |  c.n_common::DOUBLE / (za.n_sh + zb.n_sh - c.n_common) AS jaccard
              |FROM common c
              |JOIN sizes za ON za.doc_id = c.a_id
              |JOIN sizes zb ON zb.doc_id = c.b_id
              |WHERE c.n_common::DOUBLE / (za.n_sh + zb.n_sh - c.n_common) >= 0.3
              |ORDER BY a_id, b_id""".stripMargin),
      (s, dir) =>
        DedupOps.blockedJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
          prefixLen = 40, minJaccard = 0.3)),

    // ---- language-ID heuristic (stopword-marker argmax) ----------
    Q("q36_lang_id", {
      val langs = graft.operators.TextOps.LangMarkers
      val scoreCols = langs.map { case (lang, words) =>
        s"${words.map(w => D.tokenCount("t", w)).mkString(" + ")} AS s_$lang"
      }.mkString(",\n              ")
      val branches = langs.zipWithIndex.init.map { case ((lang, _), i) =>
        val conds = langs.drop(i + 1).map { case (other, _) => s"s_$lang >= s_$other" }
        s"WHEN ${conds.mkString(" AND ")} THEN '$lang'"
      }.mkString(" ")
      Some(s"""WITH toks AS (SELECT lang, $duckToks AS t FROM documents),
              |sc AS (SELECT lang,
              |  $scoreCols
              |  FROM toks),
              |g AS (SELECT lang, CASE $branches ELSE '${langs.last._1}' END AS lang_guess FROM sc)
              |SELECT lang, count(*) AS n,
              |  sum(CASE WHEN lang_guess = 'en' THEN 1 ELSE 0 END)::BIGINT AS n_guessed_en
              |FROM g GROUP BY lang ORDER BY lang""".stripMargin)
    },
      (s, dir) =>
        TextOps.withLangGuess(t(s, dir, "documents"), "text")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("lang_guess") === "en", 1).otherwise(0)).as("n_guessed_en"))
          .orderBy("lang")),

    // ---- language-ID confusion matrix ----------------------------
    // The q36 classifier EVALUATED: full (actual, predicted) count
    // matrix — the artifact that says where the heuristic fails, not
    // just how often.
    Q("q152_langid_confusion", {
      val langs = graft.operators.TextOps.LangMarkers
      val scoreCols = langs.map { case (lang, words) =>
        s"${words.map(w => D.tokenCount("t", w)).mkString(" + ")} AS s_$lang"
      }.mkString(",\n              ")
      val branches = langs.zipWithIndex.init.map { case ((lang, _), i) =>
        val conds = langs.drop(i + 1).map { case (other, _) => s"s_$lang >= s_$other" }
        s"WHEN ${conds.mkString(" AND ")} THEN '$lang'"
      }.mkString(" ")
      Some(s"""WITH toks AS (SELECT lang, $duckToks AS t FROM documents),
              |sc AS (SELECT lang,
              |  $scoreCols
              |  FROM toks),
              |g AS (SELECT lang, CASE $branches ELSE '${langs.last._1}' END AS lang_guess FROM sc)
              |SELECT lang, lang_guess, count(*)::BIGINT AS n
              |FROM g GROUP BY lang, lang_guess ORDER BY lang, lang_guess""".stripMargin)
    },
      (s, dir) =>
        TextOps.withLangGuess(t(s, dir, "documents"), "text")
          .groupBy(col("lang"), col("lang_guess"))
          .agg(count(lit(1)).cast("bigint").as("n"))
          .orderBy("lang", "lang_guess")),

    // ---- Cohen's kappa (chance-corrected agreement) --------------
    // The q152 matrix reduced to the labeling-QA scalar: κ over
    // (actual, guessed) language — exact integer marginals, then a
    // fixed five-op IEEE tree (bitwise in both engines).
    Q("q157_kappa", {
      val langs = graft.operators.TextOps.LangMarkers
      val scoreCols = langs.map { case (lang, words) =>
        s"${words.map(w => D.tokenCount("t", w)).mkString(" + ")} AS s_$lang"
      }.mkString(",\n              ")
      val branches = langs.zipWithIndex.init.map { case ((lang, _), i) =>
        val conds = langs.drop(i + 1).map { case (other, _) => s"s_$lang >= s_$other" }
        s"WHEN ${conds.mkString(" AND ")} THEN '$lang'"
      }.mkString(" ")
      Some(s"""WITH toks AS (SELECT lang, $duckToks AS t FROM documents),
              |sc AS (SELECT lang,
              |  $scoreCols
              |  FROM toks),
              |g AS (SELECT lang AS a, CASE $branches ELSE '${langs.last._1}' END AS p FROM sc),
              |nn AS (SELECT count(*)::BIGINT AS n,
              |  sum(CASE WHEN a = p THEN 1 ELSE 0 END)::BIGINT AS agree FROM g),
              |r AS (SELECT a, count(*)::BIGINT AS ra FROM g GROUP BY a),
              |c AS (SELECT p, count(*)::BIGINT AS cp FROM g GROUP BY p),
              |sp AS (SELECT coalesce(sum(ra * cp), 0)::BIGINT AS sumprod
              |  FROM r JOIN c ON r.a = c.p),
              |m AS (SELECT nn.n, agree::DOUBLE / nn.n::DOUBLE AS po,
              |  sumprod::DOUBLE / (nn.n::HUGEINT * nn.n)::DOUBLE AS pe FROM nn, sp)
              |SELECT n, po, pe, (po - pe) / (1 - pe) AS kappa FROM m""".stripMargin)
    },
      (s, dir) =>
        graft.operators.Validate.agreementKappa(
          TextOps.withLangGuess(t(s, dir, "documents"), "text"),
          "lang", "lang_guess")),

    // ---- two-sample KS drift statistic ---------------------------
    // D = max |F_src0 − F_src1| over pooled n_chars: the numeric
    // drift gate beside q99's token drift. ECDF steps are single
    // integer divisions; max is order-insensitive — bitwise. The
    // operator's cumulative counts ride the quantile-bucket
    // decomposition, never a global sort.
    Q("q158_ks_drift",
      Some("""WITH c AS (SELECT n_chars::DOUBLE AS v,
             |  sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)::BIGINT AS ca,
             |  sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END)::BIGINT AS cb
             |  FROM documents
             |  WHERE source IN ('src0', 'src1') AND n_chars IS NOT NULL
             |  GROUP BY 1),
             |t AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb FROM c),
             |f AS (SELECT
             |  (sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING))::DOUBLE
             |    / t.na::DOUBLE AS fa,
             |  (sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING))::DOUBLE
             |    / t.nb::DOUBLE AS fb
             |  FROM c, t),
             |m AS (SELECT max(abs(fa - fb)) AS ks FROM f)
             |SELECT t.na AS n_a, t.nb AS n_b, m.ks FROM t, m""".stripMargin),
      (s, dir) =>
        graft.operators.RobustStats.ksStatistic(
          t(s, dir, "documents"), "n_chars", "source", "src0", "src1")),

    // ---- provenance-preserving exact dedup -----------------------
    // q30's drop replaced by a MERGE: one row per distinct content
    // with keep-min-id, copy count, and the sorted source set (the
    // duplication-count weighting signal). Duplicate content is
    // PLANTED deterministically (text keyed off doc_id % 137) since
    // the synthetic corpus has none.
    Q("q159_merge_duplicates",
      Some("""WITH d AS (SELECT doc_id, source,
             |  't' || (doc_id % 137)::VARCHAR AS text FROM documents)
             |SELECT min(doc_id)::BIGINT AS keep_id, count(*)::BIGINT AS n_copies,
             |  array_to_string(list_sort(list_distinct(list(source))), ',') AS sources,
             |  min(text) AS text
             |FROM d GROUP BY text
             |ORDER BY keep_id""".stripMargin),
      (s, dir) => {
        val planted = t(s, dir, "documents").select(
          col("doc_id"), col("source"),
          concat(lit("t"), (col("doc_id") % 137).cast("string")).as("text"))
        DedupOps.mergeDuplicates(planted, "doc_id", "text", "source")
          .select(col("keep_id"), col("n_copies"), col("sources"), col("text"))
          .orderBy("keep_id")
      }),

    // ---- blocklist safety filter ---------------------------------
    // Per-source flag/hit totals for a compiled term blocklist —
    // counts are exact token-filter sizes summed left-to-right.
    Q("q160_blocklist",
      Some(s"""WITH toks AS (SELECT source, $duckToks AS t FROM documents),
              |h AS (SELECT source,
              |  (${D.tokenCount("t", "join")})::BIGINT +
              |  (${D.tokenCount("t", "hash")})::BIGINT +
              |  (${D.tokenCount("t", "scan")})::BIGINT AS nb FROM toks)
              |SELECT source, count(*)::BIGINT AS n_docs,
              |  sum(CASE WHEN nb > 0 THEN 1 ELSE 0 END)::BIGINT AS n_flagged,
              |  sum(nb)::BIGINT AS n_hits
              |FROM h GROUP BY source ORDER BY source""".stripMargin),
      (s, dir) =>
        TextOps.withBlocklistCounts(t(s, dir, "documents"), "text",
          Seq("join", "hash", "scan"))
          .groupBy(col("source"))
          .agg(count(lit(1)).cast("bigint").as("n_docs"),
            sum(when(col("blocked"), 1L).otherwise(0L)).cast("bigint").as("n_flagged"),
            sum(col("n_blocked")).cast("bigint").as("n_hits"))
          .orderBy("source")),

    // ---- token-distribution total-variation distance -------------
    // The corpus-drift SCALAR beside q99's per-token top-k: TV over
    // en-vs-de token distributions — integer summands
    // |n_a·tot_b − n_b·tot_a| (order-insensitive), one final IEEE
    // division. No libm, no float sum.
    Q("q161_total_variation",
      Some(s"""WITH tk AS (SELECT lang AS g, unnest($duckToks) AS token
              |  FROM documents WHERE lang IN ('en', 'de')),
              |c AS (SELECT token,
              |  sum(CASE WHEN g = 'en' THEN 1 ELSE 0 END)::BIGINT AS n_a,
              |  sum(CASE WHEN g = 'de' THEN 1 ELSE 0 END)::BIGINT AS n_b
              |  FROM tk GROUP BY token),
              |t AS (SELECT
              |  sum(CASE WHEN g = 'en' THEN 1 ELSE 0 END)::BIGINT AS tot_a,
              |  sum(CASE WHEN g = 'de' THEN 1 ELSE 0 END)::BIGINT AS tot_b FROM tk),
              |s AS (SELECT sum(abs(n_a::HUGEINT * tot_b - n_b::HUGEINT * tot_a)) AS num
              |  FROM c, t)
              |SELECT t.tot_a, t.tot_b,
              |  s.num::DOUBLE / (2::HUGEINT * tot_a * tot_b)::DOUBLE AS tv
              |FROM t, s""".stripMargin),
      (s, dir) =>
        TextOps.distributionDistance(
          t(s, dir, "documents"), "text", "lang", "en", "de")),

    // ---- chi-square class-association terms ----------------------
    // Tokens most associated with lang='en' vs the rest: 2x2 chi2 as
    // the exact scaled integer 1e6*N*(aB-bA)^2 div ((a+b)(N-a-b)AB) —
    // q153's no-libm discipline applied to feature selection.
    Q("q164_chi2_terms",
      Some(s"""WITH tk AS (SELECT (lang = 'en') AS pos, unnest($duckToks) AS token
              |  FROM documents),
              |c AS (SELECT token,
              |  sum(CASE WHEN pos THEN 1 ELSE 0 END)::BIGINT AS n_a,
              |  sum(CASE WHEN NOT pos THEN 1 ELSE 0 END)::BIGINT AS n_b
              |  FROM tk GROUP BY token),
              |t AS (SELECT
              |  sum(CASE WHEN pos THEN 1 ELSE 0 END)::BIGINT AS ta,
              |  sum(CASE WHEN NOT pos THEN 1 ELSE 0 END)::BIGINT AS tb FROM tk)
              |SELECT token, n_a, n_b,
              |  ((1000000::HUGEINT * (ta + tb) *
              |      (n_a::HUGEINT * tb - n_b::HUGEINT * ta) *
              |      (n_a::HUGEINT * tb - n_b::HUGEINT * ta))
              |    // ((n_a + n_b)::HUGEINT * (ta + tb - n_a - n_b) * ta * tb))::BIGINT
              |    AS chi2_ppm
              |FROM c, t WHERE n_a + n_b >= 5
              |ORDER BY chi2_ppm DESC, token LIMIT 30""".stripMargin),
      (s, dir) =>
        graft.operators.Relevance.classAssociationTerms(
          t(s, dir, "documents"), "text", "lang", "en",
          minCount = 5L, k = 30)),

    // ---- deterministic MLM masking -------------------------------
    // The denoising-objective transform: token i masked iff
    // (doc_id·31 + i) % 5 == 0 — RNG-free, retry/engine-reproducible;
    // masked text, extraction target, and mask counts hash-checked.
    Q("q179_span_mask",
      Some(s"""WITH toks AS (SELECT doc_id, $duckToks AS t FROM documents)
              |SELECT doc_id,
              |  array_to_string(list_transform(range(1, len(t) + 1),
              |    i -> CASE WHEN (doc_id * 31 + i) % 5 = 0 THEN '<mask>' ELSE t[i] END), ' ')
              |    AS masked_text,
              |  array_to_string(list_filter(list_transform(range(1, len(t) + 1),
              |    i -> CASE WHEN (doc_id * 31 + i) % 5 = 0 THEN t[i] ELSE NULL END),
              |    x -> x IS NOT NULL), ' ') AS target,
              |  len(list_filter(range(1, len(t) + 1),
              |    i -> (doc_id * 31 + i) % 5 = 0))::BIGINT AS n_masked
              |FROM toks ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        TextOps.withMaskedSpans(t(s, dir, "documents"), "doc_id", "text")
          .select(col("doc_id"), col("masked_text"), col("target"), col("n_masked"))
          .orderBy("doc_id")),

    // ---- deterministic FIM transform -----------------------------
    // The infilling-objective prep (Bavarian et al. 2022): a
    // content-hash-selected half of the corpus is re-serialized PSM
    // (<|fim_pre|>p<|fim_suf|>s<|fim_mid|>m) with BOTH character cuts
    // derived from the same rolling hash — RNG-free, engine/retry
    // reproducible. The full transformed text is hash-checked.
    Q("q217_fim_transform",
      Some(s"""WITH h0 AS (SELECT doc_id, text, ${D.rollingHash("text")} AS h,
              |  length(text)::BIGINT AS len FROM documents),
              |c AS (SELECT doc_id, text, h, len,
              |  (len * least((h // 1000) % 1000, (h // 1000000) % 1000)) // 1000 AS c1,
              |  (len * greatest((h // 1000) % 1000, (h // 1000000) % 1000)) // 1000 AS c2
              |  FROM h0)
              |SELECT doc_id, h % 1000 < 500 AS fim_applied,
              |  CASE WHEN h % 1000 < 500 THEN
              |    '<|fim_pre|>' || substring(text, 1, c1) ||
              |    '<|fim_suf|>' || substring(text, c2 + 1, len - c2) ||
              |    '<|fim_mid|>' || substring(text, c1 + 1, c2 - c1)
              |  ELSE text END AS fim_text
              |FROM c ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        TextOps.withFimTransform(t(s, dir, "documents"), "text")
          .select(col("doc_id"), col("fim_applied"), col("fim_text"))
          .orderBy("doc_id")),

    // ---- CDC log application -------------------------------------
    // Ordered change feed applied to the corpus snapshot: every 10th
    // doc updated (+1000 chars), every (10k+5)th updated then DELETED
    // at a later sequence — only each key's latest op counts; the
    // oracle states the final expected state directly.
    Q("q178_cdc_apply",
      Some("""SELECT source, count(*)::BIGINT AS n,
             |  sum(CASE WHEN doc_id % 10 = 0 THEN n_chars + 1000
             |    ELSE n_chars END)::BIGINT AS sum_chars
             |FROM documents WHERE doc_id % 10 != 5
             |GROUP BY source ORDER BY source""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val u0 = docs.where(col("doc_id") % 10 === 0)
          .withColumn("n_chars", col("n_chars") + 1000L)
          .withColumn("__op", lit("U")).withColumn("__seq", lit(1L))
        val u5 = docs.where(col("doc_id") % 10 === 5)
          .withColumn("n_chars", col("n_chars") + 1L)
          .withColumn("__op", lit("U")).withColumn("__seq", lit(1L))
        val d5 = docs.where(col("doc_id") % 10 === 5)
          .withColumn("__op", lit("D")).withColumn("__seq", lit(2L))
        graft.operators.Inspect.applyCdc(docs,
          u0.unionByName(u5).unionByName(d5), "doc_id", "__seq", "__op")
          .groupBy(col("source"))
          .agg(count(lit(1)).cast("bigint").as("n"),
            sum(col("n_chars")).cast("bigint").as("sum_chars"))
          .orderBy("source")
      }),

    // ---- triangle count on the collocation graph -----------------
    // Graph QA beyond connected components: triangles in the top-100
    // co-occurrence edge list via the canonical (a,b)(b,c)(a,c)
    // ordered self-joins — each triangle counted exactly once.
    Q("q176_triangles",
      Some(s"""WITH toks AS (SELECT $duckToks AS t FROM documents),
              |pr AS (
              |  SELECT unnest(list_transform(range(1, len(t)),
              |    i -> {'a': least(t[i], t[i+1]), 'b': greatest(t[i], t[i+1])})) AS p
              |  FROM toks
              |  UNION ALL
              |  SELECT unnest(list_transform(range(1, len(t) - 1),
              |    i -> {'a': least(t[i], t[i+2]), 'b': greatest(t[i], t[i+2])})) AS p
              |  FROM toks),
              |pc AS (SELECT p.a AS tok_a, p.b AS tok_b, count(*)::BIGINT AS n
              |  FROM pr GROUP BY 1, 2),
              |e AS (SELECT tok_a, tok_b FROM pc
              |  ORDER BY n DESC, tok_a, tok_b LIMIT 100)
              |SELECT count(*)::BIGINT AS n_triangles
              |FROM e e1 JOIN e e2 ON e1.tok_b = e2.tok_a
              |  JOIN e e3 ON e3.tok_a = e1.tok_a AND e3.tok_b = e2.tok_b""".stripMargin),
      (s, dir) => {
        val edges = graft.operators.Relevance.cooccurrencePairs(
          tp(s, dir, "documents", "doc_id"), "text", maxDist = 2, k = 100)
          .select(col("tok_a"), col("tok_b"))
        graft.operators.Components.triangleCount(edges, "tok_a", "tok_b")
      }),

    // ---- detector evaluation on planted ground truth -------------
    // 50 docs copied with their first token replaced, giving known
    // near-dup pairs (i, i+10000); the q33 detector runs on the
    // planted corpus and its PLANTED-pair recall is measured — both
    // engines execute the same pipeline, so the reported recall is
    // the detector's true banding recall, hash-checked.
    Q("q203_detector_recall",
      Some(s"""WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 50),
              |planted AS (
              |  SELECT doc_id, text FROM base
              |  UNION ALL
              |  SELECT doc_id + 10000,
              |    'zzz ' || array_to_string(list_slice(string_split(text, ' '), 2, 100000), ' ')
              |  FROM base),
              |toks AS (SELECT doc_id, text, $duckToks AS t FROM planted),
              |sh AS (SELECT doc_id, text, $duckShingles AS shs FROM toks),
              |sig AS (SELECT doc_id, ${minhashCols(8)} FROM sh),
              |$vpairsCtes,
              |truth AS (SELECT doc_id AS a_id, doc_id + 10000 AS b_id FROM base)
              |SELECT
              |  (SELECT count(*) FROM vpairs)::BIGINT AS n_detected,
              |  (SELECT count(*) FROM truth)::BIGINT AS n_planted,
              |  (SELECT count(*) FROM vpairs JOIN truth USING (a_id, b_id))::BIGINT AS n_found,
              |  (SELECT count(*) FROM vpairs JOIN truth USING (a_id, b_id))::DOUBLE
              |    / (SELECT count(*) FROM truth)::DOUBLE AS planted_recall""".stripMargin),
      (s, dir) => {
        val base = tp(s, dir, "documents", "doc_id").where(col("doc_id") < 50)
          .select(col("doc_id"), col("text"))
        val mutated = base.select((col("doc_id") + 10000).as("doc_id"),
          concat(lit("zzz "),
            array_join(slice(split(col("text"), " "), 2, 100000), " ")).as("text"))
        val planted = base.unionByName(mutated)
        val pairs = DedupOps.lshNearDupPairs(planted, "doc_id", "text",
          bands = 2, rowsPerBand = 4, minJaccard = 0.2).localCheckpoint()
        val truth = base.select(col("doc_id").as("a_id"),
          (col("doc_id") + 10000).as("b_id"))
        pairs.agg(count(lit(1)).cast("bigint").as("n_detected"))
          .crossJoin(truth.agg(count(lit(1)).cast("bigint").as("n_planted")))
          .crossJoin(pairs.join(truth, Seq("a_id", "b_id"))
            .agg(count(lit(1)).cast("bigint").as("n_found")))
          .withColumn("planted_recall",
            col("n_found").cast("double") / col("n_planted").cast("double"))
      }),

    // ---- simhash detector on the same planted truth --------------
    // q203's plant evaluated under the OTHER LSH family: the 60-bit/
    // 4-band simhash detector's planted-pair recall, directly
    // comparable to minhash's operating point.
    Q("q204_simhash_recall", {
      val branches = (0 until 4).map { b =>
        val div = 1L << (15 * b)
        s"""SELECT x.doc_id AS a_id, y.doc_id AS b_id, x.sim AS sa, y.sim AS sb
           |    FROM sim x JOIN sim y
           |      ON (x.sim // $div) % 32768 = (y.sim // $div) % 32768 AND x.doc_id < y.doc_id""".stripMargin
      }.mkString("\n    UNION\n    ")
      Some(s"""WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 50),
              |planted AS (
              |  SELECT doc_id, text FROM base
              |  UNION ALL
              |  SELECT doc_id + 10000,
              |    'zzz ' || array_to_string(list_slice(string_split(text, ' '), 2, 100000), ' ')
              |  FROM base),
              |toks AS (SELECT doc_id, $duckToks AS t FROM planted),
              |hs AS (SELECT doc_id, ${D.tokenHashesWide("t", 60)} AS hashes FROM toks),
              |sim AS (SELECT doc_id, ${D.simhashN("hashes", 60)} AS sim FROM hs),
              |pairs AS (
              |  SELECT DISTINCT a_id, b_id, sa, sb FROM (
              |    $branches)),
              |v AS (SELECT a_id, b_id FROM pairs WHERE bit_count(xor(sa, sb)) <= 3),
              |truth AS (SELECT doc_id AS a_id, doc_id + 10000 AS b_id FROM base)
              |SELECT
              |  (SELECT count(*) FROM v)::BIGINT AS n_detected,
              |  (SELECT count(*) FROM truth)::BIGINT AS n_planted,
              |  (SELECT count(*) FROM v JOIN truth USING (a_id, b_id))::BIGINT AS n_found,
              |  (SELECT count(*) FROM v JOIN truth USING (a_id, b_id))::DOUBLE
              |    / (SELECT count(*) FROM truth)::DOUBLE AS planted_recall""".stripMargin)
    },
      (s, dir) => {
        val base = t(s, dir, "documents").where(col("doc_id") < 50)
          .select(col("doc_id"), col("text"))
        val mutated = base.select((col("doc_id") + 10000).as("doc_id"),
          concat(lit("zzz "),
            array_join(slice(split(col("text"), " "), 2, 100000), " ")).as("text"))
        val planted = base.unionByName(mutated)
        val pairs = DedupOps.simhashNearDupPairs(planted, "doc_id", "text",
          bits = 60, bands = 4, maxHamming = 3)
          .select(col("a_id"), col("b_id")).localCheckpoint()
        val truth = base.select(col("doc_id").as("a_id"),
          (col("doc_id") + 10000).as("b_id"))
        pairs.agg(count(lit(1)).cast("bigint").as("n_detected"))
          .crossJoin(truth.agg(count(lit(1)).cast("bigint").as("n_planted")))
          .crossJoin(pairs.join(truth, Seq("a_id", "b_id"))
            .agg(count(lit(1)).cast("bigint").as("n_found")))
          .withColumn("planted_recall",
            col("n_found").cast("double") / col("n_planted").cast("double"))
      }),

    // ---- Zipf slope (corpus-health scalar) -----------------------
    // Rank-frequency slope of the top-1000 tokens in log2/log2 space,
    // with log2 taken EXACTLY as bit length (length(bin(n)) — minimal
    // width in both engines) and the fit being q201's integer OLS —
    // a natural corpus sits near −1e6 (Zipf exponent ≈ 1); template
    // spam or truncated vocabularies bend it. Top-k via
    // TakeOrdered, so the rank window touches 1000 rows, never the
    // vocabulary.
    Q("q215_zipf_slope",
      Some(s"""WITH toks AS (SELECT $duckToks AS t FROM documents),
              |c AS (SELECT unnest(t) AS tok FROM toks),
              |cnt AS (SELECT tok, count(*)::BIGINT AS n FROM c GROUP BY tok),
              |top AS (SELECT tok, n FROM cnt ORDER BY n DESC, tok LIMIT 1000),
              |r AS (SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS rk FROM top),
              |pts AS (SELECT 'all' AS g, length(bin(rk))::HUGEINT AS x,
              |  length(bin(n))::HUGEINT AS y FROM r),
              |m AS (SELECT g, min(x) AS x0 FROM pts GROUP BY g),
              |ctr AS (SELECT pts.g, (pts.x - m.x0) AS x, pts.y
              |  FROM pts JOIN m ON pts.g = m.g),
              |a AS (SELECT g, count(*)::BIGINT AS n, sum(x) AS sx, sum(y) AS sy,
              |  sum(x * y) AS sxy, sum(x * x) AS sxx FROM ctr GROUP BY g),
              |d AS (SELECT g, n, n * sxy - sx * sy AS num,
              |  n * sxx - sx * sx AS den FROM a)
              |SELECT g, n,
              |  CASE WHEN den = 0 THEN NULL ELSE
              |    (CASE WHEN num < 0 THEN -1 ELSE 1 END *
              |     ((1000000::HUGEINT * abs(num)) // den))::BIGINT END AS slope_micro
              |FROM d ORDER BY g""".stripMargin),
      (s, dir) => {
        val cnt = TextOps.withTokens(
            tp(s, dir, "documents", "doc_id").select(col("text")), "text", "__toks")
          .select(explode(col("__toks")).as("tok"))
          .groupBy(col("tok"))
          .agg(count(lit(1)).cast("bigint").as("n"))
        val top = cnt.orderBy(col("n").desc, col("tok")).limit(1000)
        val ranked = top.withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("n").desc, col("tok"))))
        val pts = ranked.select(lit("all").as("g"),
          expr("CAST(length(bin(rk)) AS BIGINT)").as("x"),
          expr("CAST(length(bin(n)) AS BIGINT)").as("y"))
        graft.operators.Profile.groupTrend(pts, "g", "x", "y")
      }),

    // ---- EXACT set-similarity join (prefix filtering) ------------
    // AllPairs/PPJoin-style rarest-first prefix candidates + exact
    // integer verification, checked against a BRUTE-FORCE all-pairs
    // oracle on a planted corpus — the exactness guarantee itself is
    // the witness (every J ≥ 9/10 pair present, none extra), which a
    // banded LSH detector cannot promise.
    Q("q213_prefix_jaccard",
      Some("""WITH base AS (SELECT doc_id, text FROM documents
             |    WHERE doc_id < 60 AND text IS NOT NULL),
             |planted AS (
             |  SELECT doc_id, text FROM base
             |  UNION ALL
             |  SELECT doc_id + 10000,
             |    'zzz ' || array_to_string(list_slice(string_split(text, ' '), 2, 100000), ' ')
             |  FROM base),
             |d AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS s FROM planted),
             |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |  len(list_intersect(a.s, b.s))::BIGINT AS n_inter,
             |  (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))::BIGINT AS n_union
             |  FROM d a JOIN d b ON a.doc_id < b.doc_id)
             |SELECT a_id, b_id, n_inter, n_union,
             |  ((1000000::HUGEINT * n_inter) // n_union)::BIGINT AS jac_ppm
             |FROM p WHERE 10 * n_inter >= 9 * n_union
             |ORDER BY a_id, b_id""".stripMargin),
      (s, dir) => {
        val base = tp(s, dir, "documents", "doc_id")
          .where(col("doc_id") < 60 && col("text").isNotNull)
          .select(col("doc_id"), col("text"))
        val mutated = base.select((col("doc_id") + 10000).as("doc_id"),
          concat(lit("zzz "),
            array_join(slice(split(col("text"), " "), 2, 100000), " ")).as("text"))
        DedupOps.prefixJaccardPairs(base.unionByName(mutated),
          "doc_id", "text", tNum = 9, tDen = 10)
          .orderBy("a_id", "b_id")
      }),

    // ---- split-leakage audit -------------------------------------
    // Near-duplicate pairs crossing the q184 fold boundaries — the
    // cross-validation hygiene check (a near-dup of a training doc
    // sitting in the eval fold is leakage): q33's verified pairs
    // joined to content-hash folds, counted per fold pair.
    Q("q202_fold_leakage",
      Some(s"""$sigCte,
              |$vpairsCtes,
              |fd AS (SELECT doc_id, (${D.rollingHash("text")} % 5)::INT AS fold
              |  FROM documents)
              |SELECT fa.fold AS fold_a, fb.fold AS fold_b, count(*)::BIGINT AS n_pairs
              |FROM vpairs
              |JOIN fd fa ON fa.doc_id = vpairs.a_id
              |JOIN fd fb ON fb.doc_id = vpairs.b_id
              |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (s, dir) => {
        val docs = tp(s, dir, "documents", "doc_id")
        val pairs = DedupOps.lshNearDupPairs(docs, "doc_id", "text",
          bands = 2, rowsPerBand = 4, minJaccard = 0.2)
        val folds = graft.operators.Mixing.withFold(docs, "text", k = 5)
          .select(col("doc_id"), col("fold"))
        pairs
          .join(folds.select(col("doc_id").as("a_id"), col("fold").as("fold_a")), "a_id")
          .join(folds.select(col("doc_id").as("b_id"), col("fold").as("fold_b")), "b_id")
          .groupBy(col("fold_a"), col("fold_b"))
          .agg(count(lit(1)).cast("bigint").as("n_pairs"))
          .orderBy("fold_a", "fold_b")
      }),

    // ---- curation funnel (capstone) ------------------------------
    // The pipeline's own funnel: corpus-wide survivor counts after
    // each gate — repetition (q73 formulas), language-neutral C4
    // rules (q172), blocklist (q160) — every stage a conjunction of
    // already-oracled exact predicates.
    Q("q200_curation_funnel",
      Some(s"""WITH toks AS (SELECT doc_id, text, $duckToks AS t FROM documents),
              |bg AS (SELECT doc_id, text, t, CASE WHEN len(t) >= 2
              |  THEN list_transform(range(1, len(t)), bi -> t[bi] || ' ' || t[bi+1])
              |  ELSE []::VARCHAR[] END AS b FROM toks),
              |st AS (SELECT doc_id, len(t)::BIGINT AS n, len(b) AS nb,
              |  len(b) - len(list_distinct(b)) AS dupb,
              |  CASE WHEN len(b) = 0 THEN 0
              |    ELSE list_max(list_transform(list_distinct(b), g -> len(list_filter(b, x -> x = g)))) END AS topb,
              |  list_sum(list_transform(t, x -> length(x)))::BIGINT AS sl,
              |  (len(list_filter(t, x -> length(x) > 20)) > 0) AS flong,
              |  (${D.tokenCount("t", "join")})::BIGINT +
              |  (${D.tokenCount("t", "hash")})::BIGINT +
              |  (${D.tokenCount("t", "scan")})::BIGINT AS nbk
              |  FROM bg),
              |f AS (SELECT doc_id,
              |  NOT ((nb > 0 AND dupb::DOUBLE / nb::DOUBLE > 0.06)
              |    OR (topb::DOUBLE * 2.0 / n::DOUBLE > 0.12)) AS ok2,
              |  NOT (n < 5) AND NOT flong AND NOT (sl < 3 * n OR sl > 10 * n) AS c4,
              |  (nbk = 0) AS clean FROM st)
              |SELECT * FROM (
              |  SELECT 1 AS stage, 'raw' AS stage_name, count(*)::BIGINT AS n_docs FROM f
              |  UNION ALL SELECT 2, 'repetition_ok', sum(CASE WHEN ok2 THEN 1 ELSE 0 END)::BIGINT FROM f
              |  UNION ALL SELECT 3, 'c4_ok', sum(CASE WHEN ok2 AND c4 THEN 1 ELSE 0 END)::BIGINT FROM f
              |  UNION ALL SELECT 4, 'blocklist_ok', sum(CASE WHEN ok2 AND c4 AND clean THEN 1 ELSE 0 END)::BIGINT FROM f)
              |ORDER BY stage""".stripMargin),
      (s, dir) => {
        val rep = TextOps.withRepetitionStats(tp(s, dir, "documents", "doc_id"), "text")
        val c4 = TextOps.withC4Flags(rep, "text")
        val bl = TextOps.withBlocklistCounts(c4, "text", Seq("join", "hash", "scan"))
        val flags = bl.select(
          (!(col("dup_bigram_frac") > 0.06 || col("top_bigram_frac") > 0.12)).as("ok2"),
          (!col("f_min_words") && !col("f_long_word") && !col("f_word_len")).as("c4ok"),
          (col("n_blocked") === 0L).as("clean"))
        val agg = flags.agg(
          count(lit(1)).cast("bigint").as("__n1"),
          sum(when(col("ok2"), 1L).otherwise(0L)).cast("bigint").as("__n2"),
          sum(when(col("ok2") && col("c4ok"), 1L).otherwise(0L)).cast("bigint").as("__n3"),
          sum(when(col("ok2") && col("c4ok") && col("clean"), 1L).otherwise(0L))
            .cast("bigint").as("__n4"))
        agg.select(expr(
          "stack(4, 1, 'raw', __n1, 2, 'repetition_ok', __n2, " +
            "3, 'c4_ok', __n3, 4, 'blocklist_ok', __n4) " +
            "AS (stage, stage_name, n_docs)"))
          .orderBy("stage")
      }),

    // ---- common-prefix boilerplate strip -------------------------
    // A per-source banner PLANTED ('HDR-<source> | ' prepended), then
    // stripped via the min/max order-statistics identity (the group's
    // common prefix = common prefix of its lexicographic extremes) —
    // one aggregate, one scalar fold per group.
    Q("q197_prefix_strip",
      Some("""WITH p AS (SELECT source,
             |  'HDR-' || source || ' | ' || text AS text FROM documents),
             |mm AS (SELECT source, min(text) AS mn, max(text) AS mx FROM p
             |  GROUP BY source),
             |l AS (SELECT source, list_reduce(
             |  list_prepend(0::BIGINT, range(1, least(length(mn), length(mx)) + 1)),
             |  (acc, i) -> CASE WHEN acc = i - 1
             |      AND substr(mn, i::INT, 1) = substr(mx, i::INT, 1)
             |    THEN i ELSE acc END)::BIGINT AS prefix_len FROM mm)
             |SELECT p.source, l.prefix_len, count(*)::BIGINT AS n_docs,
             |  sum(length(substr(p.text, (l.prefix_len + 1)::INT)))::BIGINT AS chars_after
             |FROM p JOIN l ON p.source = l.source
             |GROUP BY p.source, l.prefix_len ORDER BY p.source""".stripMargin),
      (s, dir) => {
        val planted = t(s, dir, "documents").select(col("source"),
          concat(lit("HDR-"), col("source"), lit(" | "), col("text")).as("text"))
        TextOps.stripCommonPrefix(planted, "text", "source")
          .groupBy(col("source"), col("prefix_len"))
          .agg(count(lit(1)).cast("bigint").as("n_docs"),
            sum(length(col("trimmed"))).cast("bigint").as("chars_after"))
          .select("source", "prefix_len", "n_docs", "chars_after")
          .orderBy("source")
      }),

    // ---- common-suffix footer strip ------------------------------
    // q197's mirror: a planted per-source footer stripped via the
    // same identity on REVERSED strings.
    Q("q198_suffix_strip",
      Some("""WITH p AS (SELECT source,
             |  text || ' | FOOTER-' || source AS text FROM documents),
             |r AS (SELECT source, text, reverse(text) AS rv FROM p),
             |mm AS (SELECT source, min(rv) AS mn, max(rv) AS mx FROM r
             |  GROUP BY source),
             |l AS (SELECT source, list_reduce(
             |  list_prepend(0::BIGINT, range(1, least(length(mn), length(mx)) + 1)),
             |  (acc, i) -> CASE WHEN acc = i - 1
             |      AND substr(mn, i::INT, 1) = substr(mx, i::INT, 1)
             |    THEN i ELSE acc END)::BIGINT AS suffix_len FROM mm)
             |SELECT p.source, l.suffix_len, count(*)::BIGINT AS n_docs,
             |  sum(length(substr(p.text, 1, (length(p.text) - l.suffix_len)::INT)))::BIGINT
             |    AS chars_after
             |FROM p JOIN l ON p.source = l.source
             |GROUP BY p.source, l.suffix_len ORDER BY p.source""".stripMargin),
      (s, dir) => {
        val planted = t(s, dir, "documents").select(col("source"),
          concat(col("text"), lit(" | FOOTER-"), col("source")).as("text"))
        TextOps.stripCommonSuffix(planted, "text", "source")
          .groupBy(col("source"), col("suffix_len"))
          .agg(count(lit(1)).cast("bigint").as("n_docs"),
            sum(length(col("trimmed"))).cast("bigint").as("chars_after"))
          .select("source", "suffix_len", "n_docs", "chars_after")
          .orderBy("source")
      }),

    // ---- expectation exemplar rows -------------------------------
    // q84's gate with the on-call half: the first 5 violating doc_ids
    // per failed rule (deterministic smallest-id exemplars), passing
    // rules absent.
    Q("q196_expect_examples",
      Some("""SELECT * FROM (
             |  SELECT 'chars_bounded' AS rule,
             |    count(*)::BIGINT AS n_examples,
             |    array_to_string(list_sort(list(doc_id)), ',') AS example_ids
             |  FROM (SELECT doc_id FROM documents WHERE NOT coalesce(n_chars < 400, FALSE)
             |    ORDER BY doc_id LIMIT 5)
             |  UNION ALL
             |  SELECT 'has_text', count(*)::BIGINT,
             |    array_to_string(list_sort(list(doc_id)), ',')
             |  FROM (SELECT doc_id FROM documents WHERE NOT coalesce(length(text) > 0, FALSE)
             |    ORDER BY doc_id LIMIT 5))
             |WHERE n_examples > 0 ORDER BY rule""".stripMargin),
      (s, dir) =>
        graft.operators.Validate.expectExamples(
          t(s, dir, "documents"), "doc_id",
          Seq("chars_bounded" -> "n_chars < 400", "has_text" -> "length(text) > 0"),
          maxExamples = 5)),

    // ---- hashing-trick featurization -----------------------------
    // (lang × source) crosses mapped into 64 stable hash buckets;
    // the witness reports collisions (features per bucket) — the
    // property the hashing trick trades away, measured.
    Q("q195_feature_hashing",
      Some(s"""WITH f AS (SELECT lang || '|' || source AS feat FROM documents),
              |b AS (SELECT feat, ${D.rollingHash("feat")} % 64 AS bucket,
              |  count(*)::BIGINT AS n FROM f GROUP BY feat)
              |SELECT bucket::INT AS feature_bucket, count(*)::BIGINT AS n_features,
              |  sum(n)::BIGINT AS n_rows
              |FROM b GROUP BY bucket ORDER BY feature_bucket""".stripMargin),
      (s, dir) =>
        graft.operators.Scoring.withHashedFeature(
          t(s, dir, "documents"), Seq("lang", "source"), nBuckets = 64)
          .groupBy(col("feature_bucket"))
          .agg(countDistinct(concat_ws("|", col("lang"), col("source")))
            .cast("bigint").as("n_features"),
            count(lit(1)).cast("bigint").as("n_rows"))
          .orderBy("feature_bucket")),

    // ---- unique content contribution per source ------------------
    // Distinct 3-shingles appearing in ONE source only — the
    // drop-this-source cost, q187's redundancy view inverted; zero
    // contributors kept explicitly.
    Q("q194_unique_shingles",
      Some(s"""WITH toks AS (SELECT source, text, $duckToks AS t FROM documents),
              |sh AS (SELECT DISTINCT source, unnest($duckShingles) AS s FROM toks),
              |d AS (SELECT s, count(*)::BIGINT AS nsrc FROM sh GROUP BY s),
              |u AS (SELECT sh.source, count(*)::BIGINT AS n_unique
              |  FROM sh JOIN d ON sh.s = d.s WHERE d.nsrc = 1 GROUP BY sh.source)
              |SELECT src.source, coalesce(u.n_unique, 0)::BIGINT AS n_unique
              |FROM (SELECT DISTINCT source FROM documents) src
              |LEFT JOIN u ON u.source = src.source
              |ORDER BY src.source""".stripMargin),
      (s, dir) =>
        TextOps.uniqueShingleContribution(
          t(s, dir, "documents"), "text", "source")),

    // ---- few-shot prompt assembly --------------------------------
    // Per-lang exemplar prompts under a 1500-char budget, shots in
    // content-hash order (a pure function of the corpus) — the
    // assembled prompt itself is hash-compared.
    Q("q193_prompt_assembly",
      Some(s"""WITH h AS (SELECT lang, doc_id, text,
              |  ${D.rollingHash("text")} AS hh FROM documents),
              |c AS (SELECT lang, doc_id, text, hh,
              |  sum(length(text)) OVER (PARTITION BY lang ORDER BY hh, doc_id
              |    ROWS UNBOUNDED PRECEDING) AS cum FROM h)
              |SELECT lang, count(*)::BIGINT AS n_shots, max(cum)::BIGINT AS n_chars,
              |  string_agg(text, chr(10) ORDER BY hh, doc_id) AS prompt
              |FROM c WHERE cum <= 1500 GROUP BY lang ORDER BY lang""".stripMargin),
      (s, dir) =>
        graft.operators.Sequencing.assemblePrompts(
          t(s, dir, "documents"), "lang", "doc_id", "text", charBudget = 1500L)
          .orderBy("lang")),

    // ---- greedy max-coverage seed selection ----------------------
    // Five docs covering the most distinct tokens, picked greedily
    // (gain DESC, id ASC) — the (1-1/e) seed-set verb; oracle unrolls
    // the five rounds as chained CTE stages (q113 discipline). Docs
    // are truncated to their first 4 tokens (the full corpus shares a
    // 31-token vocabulary, so one long doc would cover everything in
    // round 1 and end the walk).
    Q("q192_greedy_coverage", {
      val rounds = (2 to 5).map { r =>
        val prev = (1 until r).map(i => s"SELECT doc_id FROM p$i").mkString(" UNION ALL ")
        s"""g$r AS (SELECT dt.doc_id, count(*)::BIGINT AS n FROM dt
           |  ANTI JOIN c${r - 1} ON dt.tok = c${r - 1}.tok
           |  WHERE dt.doc_id NOT IN ($prev) GROUP BY dt.doc_id),
           |p$r AS (SELECT $r AS rk, doc_id, n AS n_new FROM g$r
           |  ORDER BY n DESC, doc_id LIMIT 1),
           |c$r AS (SELECT tok FROM c${r - 1}
           |  UNION SELECT tok FROM dt JOIN p$r USING (doc_id))""".stripMargin
      }.mkString(",\n")
      Some(s"""WITH dt AS (SELECT DISTINCT doc_id,
              |    unnest(list_slice($duckToks, 1, 4)) AS tok
              |  FROM documents),
              |g1 AS (SELECT doc_id, count(*)::BIGINT AS n FROM dt GROUP BY doc_id),
              |p1 AS (SELECT 1 AS rk, doc_id, n AS n_new FROM g1
              |  ORDER BY n DESC, doc_id LIMIT 1),
              |c1 AS (SELECT DISTINCT tok FROM dt JOIN p1 USING (doc_id)),
              |$rounds
              |SELECT rk, doc_id, n_new FROM (
              |  SELECT * FROM p1 UNION ALL SELECT * FROM p2
              |  UNION ALL SELECT * FROM p3 UNION ALL SELECT * FROM p4
              |  UNION ALL SELECT * FROM p5)
              |ORDER BY rk""".stripMargin)
    },
      (s, dir) =>
        graft.operators.Relevance.greedyCoverage(
          tp(s, dir, "documents", "doc_id").select(col("doc_id"),
            array_join(slice(split(col("text"), " "), 1, 4), " ").as("text")),
          "doc_id", "text", k = 5)),

    // ---- variant canonicalization --------------------------------
    // Spelling variants PLANTED (docs with doc_id % 7 == 0 are
    // uppercased) then mapped to the majority spelling per
    // normalized form — the entity-cleanup verb; window partitioned
    // by form, vocabulary-bounded.
    Q("q191_canonicalize",
      Some(s"""WITH p AS (SELECT CASE WHEN doc_id % 7 = 0 THEN upper(text)
              |    ELSE text END AS text FROM documents),
              |c AS (SELECT t AS variant, count(*)::BIGINT AS n_variant
              |  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM p)
              |  GROUP BY t),
              |f AS (SELECT variant, n_variant, lower(trim(variant)) AS form,
              |  row_number() OVER (PARTITION BY lower(trim(variant))
              |    ORDER BY n_variant DESC, variant) AS rn FROM c),
              |k AS (SELECT form, variant AS canonical, n_variant AS n_canonical
              |  FROM f WHERE rn = 1)
              |SELECT f.variant, k.canonical, f.n_variant, k.n_canonical
              |FROM f JOIN k ON f.form = k.form
              |WHERE f.variant != k.canonical
              |ORDER BY f.variant, k.canonical""".stripMargin),
      (s, dir) => {
        val planted = tp(s, dir, "documents", "doc_id").select(
          when(col("doc_id") % 7 === 0, upper(col("text")))
            .otherwise(col("text")).as("text"))
        TextOps.canonicalizeVariants(planted, "text")
          .orderBy("variant", "canonical")
      }),

    // ---- capped (water-filling) budget allocation ----------------
    // 150 doc slots across (source, lang) groups where small groups
    // cap out at their availability and the rest fill to a common
    // integer level (+1 for the first remainder groups in key order)
    // — q138's apportionment with the supply constraint it lacked.
    Q("q188_capped_allocation",
      Some("""WITH c AS (SELECT source || '/' || lang AS k, count(*)::BIGINT AS a
             |  FROM documents GROUP BY source, lang),
             |r AS (SELECT k, a, row_number() OVER (ORDER BY a, k) AS i,
             |  sum(a) OVER (ORDER BY a, k ROWS UNBOUNDED PRECEDING) AS p FROM c),
             |t AS (SELECT count(*)::BIGINT AS n, sum(a)::BIGINT AS sa FROM c),
             |mi AS (SELECT min(i) AS mi FROM r, t
             |  WHERE (p - a) + (t.n - i + 1) * a >= 150),
             |pj AS (SELECT coalesce(
             |  (SELECT (r.p - r.a) FROM r, mi WHERE r.i = mi.mi), 0)::BIGINT AS pj
             |  FROM mi),
             |pr AS (SELECT mi.mi, pj.pj, t.n,
             |  CASE WHEN mi.mi IS NULL THEN NULL
             |    ELSE (150 - pj.pj) // (t.n - mi.mi + 1) END AS lvl,
             |  CASE WHEN mi.mi IS NULL THEN NULL
             |    ELSE (150 - pj.pj) % (t.n - mi.mi + 1) END AS ex
             |  FROM mi, pj, t),
             |lk AS (SELECT r.k, row_number() OVER (ORDER BY r.k) AS kr
             |  FROM r, pr WHERE pr.mi IS NOT NULL AND r.i >= pr.mi)
             |SELECT r.k AS grp, r.a AS avail,
             |  (CASE WHEN pr.mi IS NULL THEN r.a
             |       WHEN r.i < pr.mi THEN r.a
             |       ELSE pr.lvl + CASE WHEN lk.kr <= pr.ex THEN 1 ELSE 0 END
             |   END)::BIGINT AS quota
             |FROM r CROSS JOIN pr LEFT JOIN lk ON lk.k = r.k
             |ORDER BY grp""".stripMargin),
      (s, dir) => {
        val cnts = t(s, dir, "documents")
          .groupBy(concat_ws("/", col("source"), col("lang")).as("grp"))
          .agg(count(lit(1)).cast("bigint").as("avail"))
        graft.operators.Mixing.allocateCapped(cnts, "grp", "avail", budget = 150L)
          .orderBy("grp")
      }),

    // ---- pairwise source vocabulary overlap ----------------------
    // Source-redundancy matrix: exact vocab Jaccard (ppm) per source
    // pair, top-10 — (group, token) distinct then a token-keyed join
    // whose output is source-pair-bounded.
    Q("q187_vocab_overlap",
      Some(s"""WITH v AS (SELECT DISTINCT source AS g, unnest($duckToks) AS token
              |  FROM documents),
              |sz AS (SELECT g, count(*)::BIGINT AS vs FROM v GROUP BY g),
              |iv AS (SELECT a.g AS g_a, b.g AS g_b, count(*)::BIGINT AS n_shared
              |  FROM v a JOIN v b ON a.token = b.token AND a.g < b.g
              |  GROUP BY a.g, b.g)
              |SELECT g_a, g_b, n_shared,
              |  ((1000000::HUGEINT * n_shared)
              |    // (sa.vs + sb.vs - n_shared))::BIGINT AS jaccard_ppm
              |FROM iv JOIN sz sa ON sa.g = iv.g_a JOIN sz sb ON sb.g = iv.g_b
              |ORDER BY jaccard_ppm DESC, g_a, g_b LIMIT 10""".stripMargin),
      (s, dir) =>
        graft.operators.Relevance.vocabOverlapPairs(
          t(s, dir, "documents"), "text", "source", k = 10)),

    // ---- deterministic k-fold assignment -------------------------
    // Content-addressed 5-fold split (q52 generalized): fold = hash %
    // 5, stable under re-runs and corpus changes; balance witnessed
    // per (fold, lang).
    Q("q184_kfold",
      Some(s"""WITH f AS (SELECT lang, (${D.rollingHash("text")} % 5)::INT AS fold
              |  FROM documents)
              |SELECT fold, lang, count(*)::BIGINT AS n
              |FROM f GROUP BY fold, lang ORDER BY fold, lang""".stripMargin),
      (s, dir) =>
        graft.operators.Mixing.withFold(t(s, dir, "documents"), "text", k = 5)
          .groupBy(col("fold"), col("lang"))
          .agg(count(lit(1)).cast("bigint").as("n"))
          .orderBy("fold", "lang")),

    // ---- per-source min-max scaling ------------------------------
    // Shape-preserving [0,1] normalization of n_chars within each
    // source (q131's rank calibration flattens; this keeps shape);
    // constant groups explicitly NULL on both engines.
    Q("q185_minmax_scale",
      Some("""WITH mm AS (SELECT source, min(n_chars::DOUBLE) AS mn,
             |  max(n_chars::DOUBLE) AS mx FROM documents GROUP BY source)
             |SELECT d.doc_id, d.source, d.n_chars,
             |  CASE WHEN mm.mx > mm.mn
             |    THEN (d.n_chars::DOUBLE - mm.mn) / (mm.mx - mm.mn) END AS scaled
             |FROM documents d JOIN mm USING (source)
             |ORDER BY d.doc_id""".stripMargin),
      (s, dir) =>
        graft.operators.RobustStats.withMinMaxScaled(
          t(s, dir, "documents"), "n_chars", "source")
          .select(col("doc_id"), col("source"), col("n_chars"), col("scaled"))
          .orderBy("doc_id")),

    // ---- source-share Gini ---------------------------------------
    // Mixture-balance scalar: exact integer Gini of the per-source
    // row counts (0 = even mixture) — 1e6·Σ(2i−n−1)cᵢ div (n·Σc) on
    // the ascending-sorted counts.
    Q("q186_source_gini",
      Some("""WITH c AS (SELECT source, count(*)::BIGINT AS c FROM documents
             |  GROUP BY source),
             |r AS (SELECT c, row_number() OVER (ORDER BY c, source) AS i FROM c),
             |a AS (SELECT count(*)::BIGINT AS n_groups, sum(c)::BIGINT AS n_rows,
             |  sum(2 * i::HUGEINT * c) AS aa, sum(c)::HUGEINT AS s FROM r)
             |SELECT n_groups, n_rows,
             |  ((1000000::HUGEINT * (aa - (n_groups + 1) * s))
             |    // (n_groups * s))::BIGINT AS gini_ppm
             |FROM a""".stripMargin),
      (s, dir) =>
        graft.operators.Mixing.groupGini(t(s, dir, "documents"), "source")),

    // ---- power-of-two padding buckets ----------------------------
    // Batch-shape planning: docs bucketed to the next power of two of
    // their token count (log2 = bit length, no libm); per-bucket
    // padding waste as exact ppm.
    Q("q183_padding_buckets",
      Some(s"""WITH t AS (SELECT len($duckToks)::BIGINT AS n FROM documents),
              |b AS (SELECT n, CASE WHEN n <= 16 THEN 16::BIGINT
              |  ELSE (1::BIGINT << length(bin(n - 1))) END AS bucket_len FROM t)
              |SELECT bucket_len, count(*)::BIGINT AS n_docs,
              |  sum(n)::BIGINT AS sum_tokens,
              |  (count(*) * bucket_len)::BIGINT AS padded_tokens,
              |  ((1000000::HUGEINT * (count(*) * bucket_len - sum(n)))
              |    // (count(*) * bucket_len))::BIGINT AS waste_ppm
              |FROM b GROUP BY bucket_len ORDER BY bucket_len""".stripMargin),
      (s, dir) => {
        val withN = TextOps.withTokens(t(s, dir, "documents"), "text", "__toks")
          .select(size(col("__toks")).cast("long").as("n"))
        graft.operators.Sequencing.withPaddedBucket(withN, "n")
          .groupBy(col("bucket_len"))
          .agg(count(lit(1)).cast("bigint").as("n_docs"),
            sum(col("n")).cast("bigint").as("sum_tokens"),
            (count(lit(1)) * col("bucket_len")).cast("bigint").as("padded_tokens"))
          .withColumn("waste_ppm", expr(
            "(CAST(1000000 AS DECIMAL(38,0)) * (padded_tokens - sum_tokens)) div padded_tokens")
            .cast("bigint"))
          .orderBy("bucket_len")
      }),

    // ---- deterministic hash-walk context pairs -------------------
    // node2vec-style (start, end) pairs with the RNG replaced by an
    // edge hash: per step every node moves to its min-hash neighbor,
    // so walks are retry/engine-reproducible — one argmin aggregate
    // + one frontier join per step.
    Q("q181_hash_walks", {
      def stepCte(s: Int) =
        s"""s$s AS (SELECT src, dst, row_number() OVER (PARTITION BY src
           |  ORDER BY ${D.rollingHash(s"(src || '|' || dst || '|' || '$s')")}, dst) AS rn
           |  FROM d),
           |c$s AS (SELECT src AS cur, dst AS nxt FROM s$s WHERE rn = 1)""".stripMargin
      Some(s"""WITH toks AS (SELECT $duckToks AS t FROM documents),
              |pr AS (
              |  SELECT unnest(list_transform(range(1, len(t)),
              |    i -> {'a': least(t[i], t[i+1]), 'b': greatest(t[i], t[i+1])})) AS p
              |  FROM toks
              |  UNION ALL
              |  SELECT unnest(list_transform(range(1, len(t) - 1),
              |    i -> {'a': least(t[i], t[i+2]), 'b': greatest(t[i], t[i+2])})) AS p
              |  FROM toks),
              |pc AS (SELECT p.a AS tok_a, p.b AS tok_b, count(*)::BIGINT AS n
              |  FROM pr GROUP BY 1, 2),
              |e AS (SELECT tok_a, tok_b FROM pc
              |  ORDER BY n DESC, tok_a, tok_b LIMIT 100),
              |d AS (SELECT tok_a AS src, tok_b AS dst FROM e
              |  UNION ALL SELECT tok_b, tok_a FROM e),
              |${stepCte(1)},
              |${stepCte(2)},
              |w0 AS (SELECT DISTINCT src AS start FROM d),
              |w1 AS (SELECT w0.start, c1.nxt AS cur FROM w0 JOIN c1 ON c1.cur = w0.start),
              |w2 AS (SELECT w1.start, c2.nxt AS cur FROM w1 JOIN c2 ON c2.cur = w1.cur)
              |SELECT start, cur AS end_node FROM w2 ORDER BY start""".stripMargin)
    },
      (s, dir) => {
        val edges = graft.operators.Relevance.cooccurrencePairs(
          tp(s, dir, "documents", "doc_id"), "text", maxDist = 2, k = 100)
          .select(col("tok_a"), col("tok_b"))
        graft.operators.Components.hashWalkPairs(edges, "tok_a", "tok_b", steps = 2)
      }),

    // ---- batched model-scoring seam ------------------------------
    // The inference seam hash-checked end to end: the stub scorer is
    // rollingHash(text) % 1000 computed inside the batched
    // mapPartitions pipeline (one init per partition, explicit
    // batches, narrow in / id-keyed join out) — the oracle recomputes
    // the stub arithmetically, so a match proves the WHOLE seam.
    Q("q182_model_scores",
      Some(s"""SELECT source, count(*)::BIGINT AS n,
              |  sum(${D.rollingHash("text")} % 1000)::BIGINT AS sum_score_permille
              |FROM documents GROUP BY source ORDER BY source""".stripMargin),
      (s, dir) =>
        graft.operators.Scoring.withModelScore(
          t(s, dir, "documents"), "doc_id", "text")
          .groupBy(col("source"))
          .agg(count(lit(1)).cast("bigint").as("n"),
            sum(col("score_permille")).cast("bigint").as("sum_score_permille"))
          .orderBy("source")),

    // ---- clustering coefficient of the collocation graph ---------
    // q176's triangles closed into the graph-QA scalar: 3e6·T div
    // wedges over the same top-100 edges — clique-like vs chain-like.
    Q("q180_clustering_coeff",
      Some(s"""WITH toks AS (SELECT $duckToks AS t FROM documents),
              |pr AS (
              |  SELECT unnest(list_transform(range(1, len(t)),
              |    i -> {'a': least(t[i], t[i+1]), 'b': greatest(t[i], t[i+1])})) AS p
              |  FROM toks
              |  UNION ALL
              |  SELECT unnest(list_transform(range(1, len(t) - 1),
              |    i -> {'a': least(t[i], t[i+2]), 'b': greatest(t[i], t[i+2])})) AS p
              |  FROM toks),
              |pc AS (SELECT p.a AS tok_a, p.b AS tok_b, count(*)::BIGINT AS n
              |  FROM pr GROUP BY 1, 2),
              |e AS (SELECT tok_a, tok_b FROM pc
              |  ORDER BY n DESC, tok_a, tok_b LIMIT 100),
              |tr AS (SELECT count(*)::BIGINT AS n_triangles
              |  FROM e e1 JOIN e e2 ON e1.tok_b = e2.tok_a
              |    JOIN e e3 ON e3.tok_a = e1.tok_a AND e3.tok_b = e2.tok_b),
              |dg AS (SELECT v, count(*)::BIGINT AS d FROM (
              |  SELECT tok_a AS v FROM e UNION ALL SELECT tok_b AS v FROM e)
              |  GROUP BY v),
              |wg AS (SELECT coalesce(sum(d * (d - 1) // 2), 0)::BIGINT AS n_wedges FROM dg)
              |SELECT tr.n_triangles, wg.n_wedges,
              |  CASE WHEN wg.n_wedges = 0 THEN NULL
              |    ELSE ((3000000::HUGEINT * tr.n_triangles) // wg.n_wedges)::BIGINT
              |  END AS coeff_ppm
              |FROM tr, wg""".stripMargin),
      (s, dir) => {
        val edges = graft.operators.Relevance.cooccurrencePairs(
          t(s, dir, "documents"), "text", maxDist = 2, k = 100)
          .select(col("tok_a"), col("tok_b"))
        graft.operators.Components.clusteringCoefficient(edges, "tok_a", "tok_b")
      }),

    // ---- bottom-k consistent sample ------------------------------
    // Fixed-size hash-min sample: reproducible, growth-stable, and a
    // version-overlap (Jaccard) estimator — rate-based q63's
    // complement; TakeOrdered, never a full sort.
    Q("q177_bottom_k",
      Some(s"""SELECT doc_id, ${D.rollingHash("text")}::BIGINT AS h
              |FROM documents ORDER BY h, doc_id LIMIT 20""".stripMargin),
      (s, dir) =>
        graft.operators.Sketches.bottomK(
          t(s, dir, "documents"), "doc_id", "text", k = 20)
          .select(col("doc_id"), col("h").cast("bigint").as("h"))),

    // ---- packing efficiency report -------------------------------
    // q69's bins rolled up to the waste metric: bins used and exact
    // fill rate 1e6·tokens div (bins·512) per lang.
    Q("q175_packing_report",
      Some("""WITH t AS (SELECT lang, doc_id, len(string_split(text, ' '))::BIGINT AS n_toks
             |  FROM documents),
             |c AS (SELECT lang, doc_id, n_toks,
             |  sum(n_toks) OVER (PARTITION BY lang ORDER BY doc_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t),
             |p AS (SELECT lang, ((cum - n_toks) // 512)::BIGINT AS pack_id, n_toks FROM c)
             |SELECT lang, count(*)::BIGINT AS n_docs,
             |  (max(pack_id) + 1)::BIGINT AS n_bins,
             |  sum(n_toks)::BIGINT AS sum_tokens,
             |  ((1000000::HUGEINT * sum(n_toks)) // ((max(pack_id) + 1) * 512))::BIGINT AS fill_ppm
             |FROM p GROUP BY lang ORDER BY lang""".stripMargin),
      (s, dir) => {
        val withToks = t(s, dir, "documents")
          .withColumn("n_toks", size(split(col("text"), " ")).cast("bigint"))
        graft.operators.Sequencing.packingReport(
          withToks, "doc_id", "n_toks", "lang", budget = 512L)
          .select("lang", "n_docs", "n_bins", "sum_tokens", "fill_ppm")
      }),

    // ---- control-character scrub ---------------------------------
    // Encoding hygiene: C0 controls PLANTED deterministically (every
    // third doc gets BEL+US appended — the corpus has none), scrubbed
    // by the portable character-class regex; removal count is a pure
    // length difference.
    Q("q174_ctrl_scrub",
      Some("""WITH p AS (SELECT source,
             |  CASE WHEN doc_id % 3 = 0 THEN text || chr(7) || chr(31)
             |    ELSE text END AS t FROM documents),
             |s AS (SELECT source, t,
             |  regexp_replace(t, '[\x00-\x08\x0B\x0C\x0E-\x1F]', '', 'g') AS c
             |  FROM p)
             |SELECT source, count(*)::BIGINT AS n_docs,
             |  sum(CASE WHEN length(t) > length(c) THEN 1 ELSE 0 END)::BIGINT AS n_dirty,
             |  sum(length(t) - length(c))::BIGINT AS n_ctrl
             |FROM s GROUP BY source ORDER BY source""".stripMargin),
      (s, dir) => {
        val planted = t(s, dir, "documents").select(col("source"),
          when(col("doc_id") % 3 === 0,
            concat(col("text"), expr("chr(7)"), expr("chr(31)")))
            .otherwise(col("text")).as("t"))
        TextOps.scrubControlChars(planted, "t")
          .groupBy(col("source"))
          .agg(count(lit(1)).cast("bigint").as("n_docs"),
            sum(when(col("n_ctrl") > 0L, 1L).otherwise(0L))
              .cast("bigint").as("n_dirty"),
            sum(col("n_ctrl")).cast("bigint").as("n_ctrl"))
          .orderBy("source")
      }),

    // ---- shingle diversity (compressibility proxy) ---------------
    // Distinct/total 3-token shingles per source — boilerplate-heavy
    // sources score low; one exact integer division.
    Q("q170_shingle_diversity",
      Some(s"""WITH toks AS (SELECT source, text, $duckToks AS t FROM documents),
              |sh AS (SELECT source, unnest($duckShingles) AS s FROM toks)
              |SELECT source, count(*)::BIGINT AS n_shingles,
              |  count(DISTINCT s)::BIGINT AS n_distinct,
              |  (count(DISTINCT s)::BIGINT)::DOUBLE / (count(*)::BIGINT)::DOUBLE AS diversity
              |FROM sh GROUP BY source ORDER BY source""".stripMargin),
      (s, dir) =>
        TextOps.shingleDiversity(t(s, dir, "documents"), "text", "source")),

    // ---- language-ID ambiguity margin ----------------------------
    // Top-minus-runner-up marker score per doc: margin 0 = coin-flip
    // guess (code-switching detector); integer sort + subtraction.
    Q("q171_lang_margin", {
      val langs = graft.operators.TextOps.LangMarkers
      val scores = langs.map { case (_, words) =>
        words.map(w => s"(${D.tokenCount("t", w)})").mkString(" + ")
      }.mkString("[", ", ", "]")
      Some(s"""WITH toks AS (SELECT lang, $duckToks AS t FROM documents),
              |sc AS (SELECT lang, list_sort($scores, 'DESC') AS l FROM toks)
              |SELECT lang, count(*)::BIGINT AS n_docs,
              |  sum(CASE WHEN l[1] - l[2] = 0 THEN 1 ELSE 0 END)::BIGINT AS n_ambiguous,
              |  sum(l[1] - l[2])::BIGINT AS sum_margin
              |FROM sc GROUP BY lang ORDER BY lang""".stripMargin)
    },
      (s, dir) =>
        TextOps.withLangMargin(t(s, dir, "documents"), "text")
          .groupBy(col("lang"))
          .agg(count(lit(1)).cast("bigint").as("n_docs"),
            sum(when(col("lang_margin") === 0L, 1L).otherwise(0L))
              .cast("bigint").as("n_ambiguous"),
            sum(col("lang_margin")).cast("bigint").as("sum_margin"))
          .orderBy("lang")),

    // ---- C4-style quality gate -----------------------------------
    // The classic document filter bundle with per-rule drop counts —
    // every component an integer token stat (mean-length band via
    // cross-multiplied comparisons, no float mean).
    Q("q172_c4_gate",
      Some(s"""WITH toks AS (SELECT source, $duckToks AS t FROM documents),
              |f AS (SELECT source, len(t)::BIGINT AS n,
              |  list_sum(list_transform(t, x -> length(x)))::BIGINT AS sl,
              |  (len(list_filter(t, x -> length(x) > 20)) > 0) AS f_long,
              |  NOT list_contains(t, 'the') AS f_nostop,
              |  list_contains(t, 'lorem') AS f_lorem
              |  FROM toks),
              |g AS (SELECT source, (n < 5) AS f_min, f_long, f_nostop, f_lorem,
              |  (sl < 3 * n OR sl > 10 * n) AS f_wlen FROM f)
              |SELECT source, count(*)::BIGINT AS n_docs,
              |  sum(CASE WHEN f_min THEN 1 ELSE 0 END)::BIGINT AS n_min_words,
              |  sum(CASE WHEN f_long THEN 1 ELSE 0 END)::BIGINT AS n_long_word,
              |  sum(CASE WHEN f_nostop THEN 1 ELSE 0 END)::BIGINT AS n_no_stop,
              |  sum(CASE WHEN f_lorem THEN 1 ELSE 0 END)::BIGINT AS n_lorem,
              |  sum(CASE WHEN f_wlen THEN 1 ELSE 0 END)::BIGINT AS n_word_len,
              |  sum(CASE WHEN NOT f_min AND NOT f_long AND NOT f_nostop
              |    AND NOT f_lorem AND NOT f_wlen THEN 1 ELSE 0 END)::BIGINT AS n_pass
              |FROM g GROUP BY source ORDER BY source""".stripMargin),
      (s, dir) =>
        TextOps.withC4Flags(t(s, dir, "documents"), "text")
          .groupBy(col("source"))
          .agg(count(lit(1)).cast("bigint").as("n_docs"),
            sum(when(col("f_min_words"), 1L).otherwise(0L)).cast("bigint").as("n_min_words"),
            sum(when(col("f_long_word"), 1L).otherwise(0L)).cast("bigint").as("n_long_word"),
            sum(when(col("f_no_stop"), 1L).otherwise(0L)).cast("bigint").as("n_no_stop"),
            sum(when(col("f_lorem"), 1L).otherwise(0L)).cast("bigint").as("n_lorem"),
            sum(when(col("f_word_len"), 1L).otherwise(0L)).cast("bigint").as("n_word_len"),
            sum(when(col("c4_pass"), 1L).otherwise(0L)).cast("bigint").as("n_pass"))
          .orderBy("source")),

    // ---- BPE pair counting (tokenizer training step) -------------
    // Occurrence-weighted adjacent char-pair counts over the WORD
    // FREQUENCY table (vocabulary-bounded, the BPE trainer's first
    // merge decision); top pair == the first learned merge.
    Q("q168_bpe_pairs",
      Some(s"""WITH wd AS (SELECT unnest($duckToks) AS w FROM documents),
              |wc AS (SELECT w, count(*)::BIGINT AS n FROM wd GROUP BY w),
              |pr AS (SELECT unnest(list_transform(range(1, len(w)),
              |    i -> substr(w, i, 2))) AS pair, n
              |  FROM wc WHERE len(w) >= 2)
              |SELECT pair, sum(n)::BIGINT AS n FROM pr
              |GROUP BY pair ORDER BY n DESC, pair LIMIT 30""".stripMargin),
      (s, dir) =>
        TextOps.bpePairCounts(t(s, dir, "documents"), "text", k = 30)),

    // ---- token-mass weighted length percentiles ------------------
    // The length below which 1/4, 1/2, 3/4 of all TOKEN mass lives —
    // exact cross-multiplied integer thresholds over the shared
    // running-total decomposition; no float quantile math.
    Q("q165_weighted_percentiles",
      Some(s"""WITH d AS (SELECT n_chars::DOUBLE AS v,
              |  len($duckToks)::BIGINT AS w FROM documents),
              |g AS (SELECT v, sum(w)::BIGINT AS w FROM d GROUP BY v),
              |c AS (SELECT v, w, coalesce(sum(w) OVER (ORDER BY v
              |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb FROM g),
              |t AS (SELECT sum(w)::HUGEINT AS tot FROM g)
              |SELECT * FROM (
              |  SELECT 1 AS p_num, 4 AS p_den,
              |    (SELECT min(v) FROM c, t WHERE (cb + w)::HUGEINT * 4 >= 1 * tot) AS value
              |  UNION ALL SELECT 2, 4,
              |    (SELECT min(v) FROM c, t WHERE (cb + w)::HUGEINT * 4 >= 2 * tot)
              |  UNION ALL SELECT 3, 4,
              |    (SELECT min(v) FROM c, t WHERE (cb + w)::HUGEINT * 4 >= 3 * tot))
              |ORDER BY p_num""".stripMargin),
      (s, dir) => {
        val d = TextOps.withTokens(tp(s, dir, "documents", "doc_id"), "text", "__toks")
          .select(col("n_chars"), size(col("__toks")).as("w"))
        graft.operators.RobustStats.weightedPercentiles(
          d, "n_chars", "w", Seq(1 -> 4, 2 -> 4, 3 -> 4))
      }),

    // ---- quality scoring (exact-integer components) --------------
    Q("q37_quality_stats",
      Some(s"""WITH toks AS (SELECT source, text, $duckToks AS t FROM documents)
              |SELECT source, count(*) AS n_docs,
              |  sum(length(text))::BIGINT AS sum_chars,
              |  sum(len(t))::BIGINT AS sum_toks,
              |  sum(${D.tokenCount("t", "the")})::BIGINT AS sum_stop,
              |  (sum(${D.tokenCount("t", "the")})::BIGINT)::DOUBLE / (sum(len(t))::BIGINT) AS stop_ratio,
              |  (sum(length(text))::BIGINT)::DOUBLE / count(*) AS avg_chars
              |FROM toks GROUP BY source ORDER BY source""".stripMargin),
      (s, dir) => {
        import TextHash.{spark => H}
        TextOps.withTokens(t(s, dir, "documents"), "text")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(length(col("text"))).as("sum_chars"),
            sum(size(col("toks"))).as("sum_toks"),
            sum(expr(H.tokenCount("toks", "the"))).as("sum_stop"))
          .withColumn("stop_ratio", col("sum_stop").cast("double") / col("sum_toks"))
          .withColumn("avg_chars", col("sum_chars").cast("double") / col("n_docs"))
          .orderBy("source")
      }),

    // ---- token counting: whitespace + regex tokenizer ------------
    Q("q38_token_stats",
      Some(s"""SELECT lang, count(*) AS n_docs,
              |  sum(len($duckToks))::BIGINT AS sum_ws_tokens,
              |  sum(len(regexp_extract_all(text, '[a-z]+')))::BIGINT AS sum_re_tokens
              |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),
      (s, dir) =>
        t(s, dir, "documents")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(size(split(col("text"), " "))).as("sum_ws_tokens"),
            sum(size(expr("regexp_extract_all(text, '[a-z]+', 0)"))).as("sum_re_tokens"))
          .orderBy("lang")),

    // ---- character trigram frequencies (language-model features) --
    Q("q56_char_trigrams",
      // length >= 3 guard: Spark's sequence DESCENDS when stop < start
      // while DuckDB's range returns empty — filter short texts out on
      // both sides rather than diverge.
      Some("""WITH tg AS (
             |  SELECT unnest(list_transform(range(1, length(text) - 1),
             |    i -> substr(text, i, 3))) AS trigram
             |  FROM documents WHERE length(text) >= 3),
             |cnt AS (SELECT trigram, count(*) AS n FROM tg GROUP BY trigram)
             |SELECT trigram, n FROM cnt ORDER BY n DESC, trigram LIMIT 20""".stripMargin),
      (s, dir) =>
        tp(s, dir, "documents", "doc_id")
          .where(length(col("text")) >= 3)
          .select(explode(expr("graft_char_grams(text, 3)")).as("trigram"))
          .groupBy("trigram").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("trigram"))
          .limit(20)),

    // ---- trigram-rarity quality score (LM-style fluency proxy) ---
    // Corpus char-trigram counts joined back to each document's
    // trigrams: freq_sum is the corpus-frequency mass of the doc's
    // trigrams, n_rare counts trigrams seen <= 5 times corpus-wide —
    // a language-model-flavored quality signal kept in exact integers
    // (a log-prob variant would sum doubles in join order, which is
    // not reproducible; the integer form is, at any parallelism).
    // Shape: one explode -> one count agg -> one join back -> one agg.
    Q("q67_trigram_rarity",
      Some("""WITH tg AS (SELECT doc_id,
             |  unnest(list_transform(range(1, length(text) - 1), i -> substr(text, i, 3))) AS trigram
             |  FROM documents WHERE length(text) >= 3),
             |cnt AS (SELECT trigram, count(*) AS c FROM tg GROUP BY trigram)
             |SELECT doc_id, count(*) AS n_tg, sum(c)::BIGINT AS freq_sum,
             |  sum(CASE WHEN c <= 5 THEN 1 ELSE 0 END)::BIGINT AS n_rare
             |FROM tg JOIN cnt USING (trigram)
             |WHERE doc_id < 50 GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val tg = tp(s, dir, "documents", "doc_id")
          .where(length(col("text")) >= 3)
          .select(col("doc_id"),
            explode(expr("graft_char_grams(text, 3)")).as("trigram"))
        // Char-trigram cardinality is bounded by the alphabet (tens of
        // thousands of distinct values regardless of corpus size), so
        // the counts table is broadcast-safe: partial aggregation
        // shrinks the count shuffle to distinct-per-partition, and the
        // join back costs the big side NO shuffle at any corpus scale.
        val cnt = broadcast(tg.groupBy("trigram").agg(count(lit(1)).as("c")))
        tg.join(cnt, "trigram")
          .where(col("doc_id") < 50)
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_tg"),
            sum(col("c")).as("freq_sum"),
            sum(when(col("c") <= 5, 1L).otherwise(0L)).as("n_rare"))
          .orderBy("doc_id")
      }),

    // ---- quantile bucketing (ntile) ------------------------------
    // Training pipelines bucket documents by a quality signal; ntile
    // is the window shape for that (equal-frequency buckets per
    // stratum). Bucket membership is deterministic given the unique
    // (n_chars, doc_id) ordering.
    Q("q68_quality_buckets",
      Some("""WITH b AS (SELECT lang, doc_id, n_chars,
             |  ntile(4) OVER (PARTITION BY lang ORDER BY n_chars, doc_id)::INT AS bucket
             |  FROM documents)
             |SELECT lang, bucket, count(*) AS n, min(n_chars) AS min_chars,
             |  max(n_chars) AS max_chars
             |FROM b GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        t(s, dir, "documents")
          .withColumn("bucket",
            ntile(4).over(Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))))
          .groupBy(col("lang"), col("bucket"))
          .agg(
            count(lit(1)).as("n"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"))
          .orderBy("lang", "bucket")
      }),

    // ---- sequence packing (fixed token budgets per shard) --------
    // Running-sum packing per language shard: a pack boundary every
    // 512 tokens in doc_id order. The shard key bounds the sequential
    // window region — packs across languages compute in parallel.
    Q("q69_pack_sequences",
      Some("""WITH t AS (SELECT lang, doc_id, len(string_split(text, ' '))::BIGINT AS n_toks
             |  FROM documents),
             |c AS (SELECT lang, doc_id, n_toks,
             |  sum(n_toks) OVER (PARTITION BY lang ORDER BY doc_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t)
             |SELECT lang, ((cum - n_toks) // 512)::BIGINT AS pack_id,
             |  count(*) AS n_docs, sum(n_toks)::BIGINT AS sum_tokens
             |FROM c GROUP BY lang, pack_id ORDER BY lang, pack_id""".stripMargin),
      (s, dir) => {
        val withToks = t(s, dir, "documents")
          .withColumn("n_toks", size(split(col("text"), " ")).cast("bigint"))
        graft.operators.Sequencing.packGreedy(withToks, "doc_id", "n_toks", "lang", budget = 512L)
          .groupBy(col("lang"), col("pack_id"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("sum_tokens"))
          .orderBy("lang", "pack_id")
      }),

    // ---- token-budget corpus selection ---------------------------
    // Fill a 20k-token budget with documents best-first (score =
    // n_chars, id tiebreak): the maximal prefix of the global
    // (score desc, id) order whose running token total fits. The
    // Spark side decomposes the global cumulative sum into
    // quantile-range buckets + per-bucket windows (no single-reducer
    // window); the oracle states it as the naive global window —
    // identical output, different scale shape.
    Q("q100_token_budget",
      Some("""WITH t AS (SELECT doc_id, n_chars,
             |  len(string_split(text, ' '))::BIGINT AS n_toks FROM documents),
             |c AS (SELECT doc_id, n_toks,
             |  sum(n_toks) OVER (ORDER BY n_chars DESC, doc_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_tokens FROM t)
             |SELECT doc_id, n_toks, cum_tokens FROM c WHERE cum_tokens <= 20000
             |ORDER BY cum_tokens, doc_id""".stripMargin),
      (s, dir) => {
        val withToks = tp(s, dir, "documents", "doc_id")
          .withColumn("n_toks", size(split(col("text"), " ")).cast("bigint"))
        graft.operators.Sequencing.selectUnderBudget(
          withToks, "doc_id", "n_toks", "n_chars", budget = 20000L)
          .select(col("doc_id"), col("n_toks"), col("cum_tokens"))
          .orderBy("cum_tokens", "doc_id")
      }),

    // ---- context-window chunking (overlapping token windows) -----
    // 20-token chunks advancing by 15 (5-token overlap); the witness
    // checks chunk counts, length mass, and the first chunk's exact
    // re-joined text per document.
    Q("q70_chunk_windows",
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
             |  WHERE doc_id < 50),
             |st0 AS (SELECT doc_id, len(toks)::BIGINT AS n_toks,
             |  array_to_string(toks[1:20], ' ') AS fc,
             |  unnest(range(1, len(toks) + 1, 15)) AS start FROM t),
             |st AS (SELECT * FROM st0 WHERE start = 1 OR start <= n_toks - 5)
             |SELECT doc_id, any_value(n_toks) AS n_toks, count(*) AS n_chunks,
             |  sum(least(20, n_toks - start + 1))::BIGINT AS sum_chunk_toks,
             |  any_value(fc) AS first_chunk
             |FROM st GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val chunks = graft.operators.Sequencing.chunkTokens(
          t(s, dir, "documents").where(col("doc_id") < 50), "doc_id", "text",
          chunkSize = 20, overlap = 5)
        val nToks = t(s, dir, "documents").where(col("doc_id") < 50)
          .select(col("doc_id"), size(split(col("text"), " ")).cast("bigint").as("n_toks"))
        chunks
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_chunks"),
            sum(col("chunk_len").cast("bigint")).as("sum_chunk_toks"),
            min(when(col("chunk_idx") === 0, col("chunk_text"))).as("first_chunk"))
          .join(nToks, "doc_id")
          .select(col("doc_id"), col("n_toks"), col("n_chunks"),
            col("sum_chunk_toks"), col("first_chunk"))
          .orderBy("doc_id")
      }),

    // ---- CCNet-style span-level dedup ----------------------------
    // Non-overlapping 8-token windows, exact-text keep-first across
    // the WHOLE corpus; witness reports the first 50 docs' span
    // counts and reconstructed cleaned text.
    Q("q76_span_dedup",
      Some(s"""WITH toks AS (SELECT doc_id, $duckToks AS t FROM documents),
              |sidx AS (SELECT doc_id, t, unnest(range(0, (len(t) + 7) // 8)) AS span_idx FROM toks),
              |sp AS (SELECT doc_id, span_idx::INT AS span_idx,
              |  array_to_string(t[(span_idx*8+1):(span_idx*8+8)], ' ') AS span FROM sidx),
              |rn AS (SELECT doc_id, span_idx, span,
              |  row_number() OVER (PARTITION BY span ORDER BY doc_id, span_idx) AS rn FROM sp),
              |keep AS (SELECT doc_id, span_idx, span FROM rn WHERE rn = 1),
              |nsp AS (SELECT doc_id, count(*)::BIGINT AS n_spans FROM sp GROUP BY doc_id),
              |rec AS (SELECT doc_id, count(*)::BIGINT AS n_kept,
              |  string_agg(span, ' ' ORDER BY span_idx) AS kept_text FROM keep GROUP BY doc_id)
              |SELECT nsp.doc_id, n_spans,
              |  coalesce(n_kept, 0)::BIGINT AS n_kept,
              |  coalesce(kept_text, '') AS kept_text
              |FROM nsp LEFT JOIN rec ON rec.doc_id = nsp.doc_id
              |WHERE nsp.doc_id < 50 ORDER BY nsp.doc_id""".stripMargin),
      (s, dir) =>
        DedupOps.dedupSpans(t(s, dir, "documents"), "doc_id", "text", spanTokens = 8)
          .where(col("doc_id") < 50)
          .orderBy("doc_id")),

    // ---- document-frequency boilerplate removal ------------------
    // Spans occurring in >= max(3, ceil(0.001·nDocs)) DISTINCT
    // documents are stripped from EVERY document (no keep-first
    // survivor — the CCNet/RefinedWeb paragraph-df policy, vs q76's
    // keep-first). Witness: first 60 docs' span counts + cleaned
    // text.
    Q("q102_strip_boilerplate",
      Some(s"""WITH toks AS (SELECT doc_id, $duckToks AS t FROM documents),
              |sidx AS (SELECT doc_id, t, unnest(range(0, (len(t) + 7) // 8)) AS span_idx FROM toks),
              |sp AS (SELECT doc_id, span_idx::INT AS span_idx,
              |  array_to_string(t[(span_idx*8+1):(span_idx*8+8)], ' ') AS span FROM sidx),
              |nd AS (SELECT count(*) AS n_docs FROM documents),
              |bp AS (SELECT span FROM sp CROSS JOIN nd
              |  GROUP BY span, n_docs
              |  HAVING count(DISTINCT doc_id) >= greatest(3, ceil(0.001 * n_docs))),
              |keep AS (SELECT s.doc_id, s.span_idx, s.span FROM sp s
              |  LEFT JOIN bp ON bp.span = s.span WHERE bp.span IS NULL),
              |nsp AS (SELECT doc_id, count(*)::BIGINT AS n_spans FROM sp GROUP BY doc_id),
              |rec AS (SELECT doc_id, count(*)::BIGINT AS n_kept,
              |  string_agg(span, ' ' ORDER BY span_idx) AS kept_text FROM keep GROUP BY doc_id)
              |SELECT nsp.doc_id, n_spans,
              |  coalesce(n_kept, 0)::BIGINT AS n_kept,
              |  coalesce(kept_text, '') AS kept_text
              |FROM nsp LEFT JOIN rec ON rec.doc_id = nsp.doc_id
              |WHERE nsp.doc_id < 60 ORDER BY nsp.doc_id""".stripMargin),
      (s, dir) =>
        DedupOps.stripBoilerplateSpans(t(s, dir, "documents"), "doc_id", "text",
          spanTokens = 8, maxDocFrac = 0.001, minDf = 3)
          .where(col("doc_id") < 60)
          .orderBy("doc_id")),

    // ---- TF-IDF top keywords per document ------------------------
    // Rarity-weighted keywords (tf·N/df, rational idf — single IEEE
    // ops, bitwise-equal across engines), deterministic token
    // tie-break; df computed over the WHOLE corpus, output filtered.
    Q("q74_tfidf_topk",
      Some(s"""WITH toks AS (SELECT doc_id, $duckToks AS t FROM documents),
              |tfx AS (SELECT doc_id, unnest(t) AS token FROM toks),
              |tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf FROM tfx GROUP BY doc_id, token),
              |dfreq AS (SELECT token, count(*)::BIGINT AS dfreq FROM tf GROUP BY token),
              |n AS (SELECT count(*)::BIGINT AS nn FROM documents),
              |scored AS (SELECT tf.doc_id, tf.token, tf.tf, dfreq.dfreq,
              |  row_number() OVER (PARTITION BY tf.doc_id
              |    ORDER BY tf.tf::DOUBLE * nn::DOUBLE / dfreq.dfreq::DOUBLE DESC, tf.token)::INT AS rk
              |  FROM tf JOIN dfreq USING (token) CROSS JOIN n)
              |SELECT doc_id, rk, token, tf, dfreq FROM scored
              |WHERE rk <= 3 AND doc_id < 30 ORDER BY doc_id, rk""".stripMargin),
      (s, dir) =>
        graft.operators.Relevance.tfidfTopKeywords(
          tp(s, dir, "documents", "doc_id"), "doc_id", "text", k = 3)
          .where(col("doc_id") < 30)
          .orderBy("doc_id", "rk")),

    // ---- inverted-index posting lists ----------------------------
    // Per token: document frequency + the first 10 containing doc ids
    // (bounded output per token regardless of token popularity).
    Q("q77_posting_lists",
      Some(s"""WITH toks AS (SELECT doc_id, $duckToks AS t FROM documents),
              |tfx AS (SELECT DISTINCT doc_id, unnest(t) AS token FROM toks)
              |SELECT token, count(*)::BIGINT AS dfreq,
              |  array_to_string(list_transform(list_sort(list(doc_id))[1:10], pid -> pid::VARCHAR), ',') AS postings
              |FROM tfx GROUP BY token ORDER BY token""".stripMargin),
      (s, dir) =>
        graft.operators.Relevance.postingLists(
          t(s, dir, "documents"), "doc_id", "text", maxPostings = 10)
          .orderBy("token")),

    // ---- BM25 ranking against a fixed query ----------------------
    // Rational-idf BM25 (logIdf=false — the witnessable variant; see
    // Relevance scaladoc). Constants are interpolated from the SAME
    // Scala doubles the operator uses, so both engines parse
    // identical values; per-term scores sum as a fixed expression
    // tree, never an unordered float SUM.
    Q("q75_bm25_rank", {
      val (k1, b) = (1.2, 0.75)
      val (k1p1, oneMinusB) = (k1 + 1.0, 1.0 - b)
      Some(s"""WITH toks AS (SELECT doc_id, $duckToks AS t FROM documents),
              |lens AS (SELECT doc_id, len(t)::BIGINT AS dl FROM toks),
              |stats AS (SELECT count(*)::BIGINT AS nn, sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl FROM lens),
              |tfx AS (SELECT doc_id, unnest(t) AS token FROM toks),
              |tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf FROM tfx
              |  WHERE token IN ('spark', 'join', 'vector') GROUP BY doc_id, token),
              |dfreq AS (SELECT token, count(*)::BIGINT AS dfreq FROM tf GROUP BY token),
              |ts AS (SELECT tf.doc_id, tf.token,
              |  ((nn::DOUBLE - dfreq::DOUBLE + 0.5) / (dfreq::DOUBLE + 0.5)) *
              |  (tf::DOUBLE * $k1p1) / (tf::DOUBLE + $k1 * ($oneMinusB + $b * lens.dl::DOUBLE / avgdl)) AS s
              |  FROM tf JOIN dfreq USING (token) CROSS JOIN stats
              |  JOIN lens ON lens.doc_id = tf.doc_id),
              |piv AS (SELECT doc_id,
              |  max(CASE WHEN token = 'spark' THEN s END) AS s0,
              |  max(CASE WHEN token = 'join' THEN s END) AS s1,
              |  max(CASE WHEN token = 'vector' THEN s END) AS s2
              |  FROM ts GROUP BY doc_id),
              |sc AS (SELECT lens.doc_id, lens.dl,
              |  coalesce(s0, 0.0) + coalesce(s1, 0.0) + coalesce(s2, 0.0) AS score
              |  FROM lens LEFT JOIN piv ON piv.doc_id = lens.doc_id)
              |SELECT doc_id, dl, score FROM sc
              |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)
    },
      (s, dir) =>
        graft.operators.Relevance.bm25(
          tp(s, dir, "documents", "doc_id"), "doc_id", "text",
          queryTokens = Seq("spark", "join", "vector"), logIdf = false)
          .orderBy(col("score").desc, col("doc_id"))
          .limit(10)),

    // ---- heavy hitters via the native Misra-Gries aggregate ------
    // capacity 64 > the 31-token vocabulary, so the mergeable summary
    // is EXACT and oracle-checkable (update/merge/serialize machinery
    // exercised across 32 partitions); the approximate regime's
    // bounds are pinned in MisraGriesSpec.
    Q("q83_heavy_hitters",
      Some(s"""WITH toks AS (SELECT doc_id, $duckToks AS t FROM documents),
              |tfx AS (SELECT unnest(t) AS item FROM toks)
              |SELECT item, count(*)::BIGINT AS count_lo
              |FROM tfx GROUP BY item ORDER BY count_lo DESC, item""".stripMargin),
      (s, dir) =>
        TextOps.withTokens(tp(s, dir, "documents", "doc_id"), "text")
          .select(explode(col("toks")).as("item"))
          .selectExpr("graft_mg_topk(item, 64) AS s")
          .selectExpr("explode(s) AS e")
          .select(col("e.item").as("item"), col("e.count_lo").as("count_lo"))
          .orderBy(col("count_lo").desc, col("item"))),

    // ---- heavy hitters PER GROUP (native aggregate in groupBy) ---
    // graft_mg_topk under a group-by key: each language gets its own
    // capacity-bounded mergeable summary — the partial-agg/merge path
    // the TypedImperativeAggregate runs per group across partitions.
    // Capacity 64 > the 31-token vocabulary, so summaries are exact
    // and the oracle is a plain per-group count.
    Q("q94_heavy_hitters_by_lang",
      Some(s"""WITH toks AS (SELECT lang, $duckToks AS t FROM documents),
              |tfx AS (SELECT lang, unnest(t) AS item FROM toks)
              |SELECT lang, item, count(*)::BIGINT AS count_lo
              |FROM tfx GROUP BY lang, item ORDER BY lang, count_lo DESC, item""".stripMargin),
      (s, dir) =>
        TextOps.withTokens(t(s, dir, "documents"), "text")
          .select(col("lang"), explode(col("toks")).as("item"))
          .groupBy(col("lang"))
          .agg(expr("graft_mg_topk(item, 64)").as("s"))
          .select(col("lang"), explode(col("s")).as("e"))
          .select(col("lang"), col("e.item").as("item"), col("e.count_lo").as("count_lo"))
          .orderBy(col("lang"), col("count_lo").desc, col("item"))),

    // ---- blocked edit-distance (fuzzy) near-dup pairs ------------
    // Levenshtein within prefix-20 blocks, distance <= 30 — the
    // fuzzy-dedup shape for short fields; exact integer distances,
    // identical DP definition in both engines. (Blocks here are far
    // under the operator's hot-block cap, so results are exact.)
    Q("q95_edit_distance_pairs",
      Some("""WITH b AS (SELECT doc_id, substr(text, 1, 1000) AS t,
             |  substr(text, 1, 20) AS blk FROM documents)
             |SELECT x.doc_id AS a_id, y.doc_id AS b_id,
             |  levenshtein(x.t, y.t)::INT AS distance
             |FROM b x JOIN b y ON x.blk = y.blk AND x.doc_id < y.doc_id
             |WHERE levenshtein(x.t, y.t) <= 30
             |ORDER BY a_id, b_id""".stripMargin),
      (s, dir) =>
        DedupOps.editDistancePairs(t(s, dir, "documents"), "doc_id", "text",
          prefixLen = 20, maxDistance = 30, maxLen = 1000)),

    // ---- hybrid retrieval: BM25 ⊕ vector rank fusion (RRF) -------
    // Lexical ranking (rational-idf BM25, q75's pipeline) fused with
    // a cosine ranking against vec 0's embedding via reciprocal-rank
    // fusion: integer ranks, one division per term, fixed sum tree —
    // bitwise-portable. Global ranks are witness-scale; production
    // feeds top-k-truncated rankings.
    Q("q82_hybrid_rrf", {
      val (k1, b) = (1.2, 0.75)
      val (k1p1, oneMinusB) = (k1 + 1.0, 1.0 - b)
      Some(s"""WITH toks AS (SELECT doc_id, $duckToks AS t FROM documents),
              |lens AS (SELECT doc_id, len(t)::BIGINT AS dl FROM toks),
              |stats AS (SELECT count(*)::BIGINT AS nn, sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl FROM lens),
              |tfx AS (SELECT doc_id, unnest(t) AS token FROM toks),
              |tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf FROM tfx
              |  WHERE token IN ('spark', 'join', 'vector') GROUP BY doc_id, token),
              |dfreq AS (SELECT token, count(*)::BIGINT AS dfreq FROM tf GROUP BY token),
              |ts AS (SELECT tf.doc_id, tf.token,
              |  ((nn::DOUBLE - dfreq::DOUBLE + 0.5) / (dfreq::DOUBLE + 0.5)) *
              |  (tf::DOUBLE * $k1p1) / (tf::DOUBLE + $k1 * ($oneMinusB + $b * lens.dl::DOUBLE / avgdl)) AS s
              |  FROM tf JOIN dfreq USING (token) CROSS JOIN stats
              |  JOIN lens ON lens.doc_id = tf.doc_id),
              |piv AS (SELECT doc_id,
              |  max(CASE WHEN token = 'spark' THEN s END) AS s0,
              |  max(CASE WHEN token = 'join' THEN s END) AS s1,
              |  max(CASE WHEN token = 'vector' THEN s END) AS s2
              |  FROM ts GROUP BY doc_id),
              |sc AS (SELECT lens.doc_id,
              |  coalesce(s0, 0.0) + coalesce(s1, 0.0) + coalesce(s2, 0.0) AS score
              |  FROM lens LEFT JOIN piv ON piv.doc_id = lens.doc_id),
              |br AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id)::INT AS rb
              |  FROM (SELECT * FROM sc ORDER BY score DESC, doc_id LIMIT 100)),
              |qv AS (SELECT embedding AS qq FROM embeddings WHERE vec_id = 0),
              |vs AS (SELECT vec_id AS doc_id, ${graft.functions.VectorSql.duck.cosine("embedding", "qq")} AS vsim
              |  FROM embeddings, qv),
              |vr AS (SELECT doc_id, row_number() OVER (ORDER BY vsim DESC, doc_id)::INT AS rv
              |  FROM (SELECT * FROM vs ORDER BY vsim DESC, doc_id LIMIT 100))
              |SELECT doc_id, rb AS rank0, rv AS rank1,
              |  CASE WHEN rb IS NOT NULL THEN 1.0 / (60.0 + rb::DOUBLE) ELSE 0.0 END +
              |  CASE WHEN rv IS NOT NULL THEN 1.0 / (60.0 + rv::DOUBLE) ELSE 0.0 END AS rrf_score
              |FROM br FULL OUTER JOIN vr USING (doc_id)
              |ORDER BY rrf_score DESC, doc_id LIMIT 10""".stripMargin)
    },
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val bm = graft.operators.Relevance.bm25(
          tp(s, dir, "documents", "doc_id"), "doc_id", "text",
          queryTokens = Seq("spark", "join", "vector"), logIdf = false)
        // rank only the top-100 of each ranker: the heavy selection is
        // a distributed TakeOrderedAndProject; the global row_number
        // window then sees 100 rows, never the corpus (ranks of kept
        // items are identical to full-corpus ranks)
        val br = bm.orderBy(col("score").desc, col("doc_id")).limit(100)
          .withColumn("rank",
            row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
          .select("doc_id", "rank")
        val emb = t(s, dir, "embeddings")
        val qv = emb.where(col("vec_id") === 0).select(col("embedding").as("qq"))
        val vr = emb.crossJoin(broadcast(qv))
          .withColumn("vsim", graft.operators.SimilarityOps.cosineCol("embedding", "qq"))
          .orderBy(col("vsim").desc, col("vec_id")).limit(100)
          .withColumn("rank",
            row_number().over(Window.orderBy(col("vsim").desc, col("vec_id"))))
          .select(col("vec_id").as("doc_id"), col("rank"))
        graft.operators.Relevance.rrfFuse(Seq(br, vr), "doc_id", kRrf = 60)
          .orderBy(col("rrf_score").desc, col("doc_id"))
          .limit(10)
      }),

    // ---- array predicates (exists / forall over tokens) ----------
    Q("q60_array_predicates",
      Some(s"""WITH toks AS (SELECT lang, $duckToks AS t FROM documents)
              |SELECT lang, count(*) AS n,
              |  sum(CASE WHEN len(list_filter(t, x -> x = 'spark')) > 0 THEN 1 ELSE 0 END)::BIGINT AS n_mentions_spark,
              |  sum(CASE WHEN len(list_filter(t, x -> length(x) >= 10)) = 0 THEN 1 ELSE 0 END)::BIGINT AS n_all_short
              |FROM toks GROUP BY lang ORDER BY lang""".stripMargin),
      (s, dir) =>
        TextOps.withTokens(t(s, dir, "documents"), "text")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n"),
            sum(when(expr("exists(toks, x -> x = 'spark')"), 1).otherwise(0))
              .as("n_mentions_spark"),
            sum(when(expr("forall(toks, x -> length(x) < 10)"), 1).otherwise(0))
              .as("n_all_short"))
          .orderBy("lang")),

    // ---- text normalization (cleanup preprocessing) --------------
    Q("q55_text_normalize",
      Some("""SELECT source, count(*) AS n,
             |  sum(length(regexp_replace(lower(trim(text)), ' +', ' ', 'g')))::BIGINT AS sum_norm_chars,
             |  sum(CASE WHEN regexp_replace(lower(trim(text)), ' +', ' ', 'g') = text THEN 1 ELSE 0 END)::BIGINT AS n_already_clean
             |FROM documents GROUP BY source ORDER BY source""".stripMargin),
      (s, dir) => {
        val norm = regexp_replace(lower(trim(col("text"))), " +", " ")
        t(s, dir, "documents")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n"),
            sum(length(norm)).as("sum_norm_chars"),
            sum(when(norm === col("text"), 1).otherwise(0)).as("n_already_clean"))
          .orderBy("source")
      }),

    // ---- incremental dedup: new batch vs existing corpus ---------
    Q("q53_incremental_dedup",
      Some("""WITH existing AS (SELECT * FROM documents WHERE doc_id < 250),
             |incoming AS (SELECT * FROM documents WHERE doc_id >= 250),
             |ann AS (
             |  SELECT i.lang,
             |    (row_number() OVER (PARTITION BY md5(i.text) ORDER BY i.doc_id)) > 1 AS dup_batch,
             |    EXISTS (SELECT 1 FROM existing e WHERE md5(e.text) = md5(i.text)) AS dup_corpus
             |  FROM incoming i)
             |SELECT lang, count(*) AS n_incoming,
             |  sum(CASE WHEN NOT dup_batch AND NOT dup_corpus THEN 1 ELSE 0 END)::BIGINT AS n_accepted,
             |  sum(CASE WHEN dup_batch THEN 1 ELSE 0 END)::BIGINT AS n_dup_batch,
             |  sum(CASE WHEN dup_corpus THEN 1 ELSE 0 END)::BIGINT AS n_dup_corpus
             |FROM ann GROUP BY lang ORDER BY lang""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        DedupOps.incrementalDedup(
          docs.where(col("doc_id") >= 250), docs.where(col("doc_id") < 250),
          "doc_id", "text")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_incoming"),
            sum(when(col("accepted"), 1).otherwise(0)).as("n_accepted"),
            sum(when(col("is_dup_in_batch"), 1).otherwise(0)).as("n_dup_batch"),
            sum(when(col("is_dup_in_corpus"), 1).otherwise(0)).as("n_dup_corpus"))
          .orderBy("lang")
      }),

    // ---- bloom-pruned incremental dedup --------------------------
    // Same observable semantics as q53 (the oracle is the plain
    // EXISTS formulation — bloom false positives are provably
    // invisible: they only add candidates to an exact digest join),
    // but the corpus side is pruned map-side by a bloom sketch of the
    // batch digests instead of being distinct'd and shuffled whole.
    Q("q98_bloom_incremental_dedup",
      Some("""WITH existing AS (SELECT * FROM documents WHERE doc_id < 400),
             |incoming AS (SELECT * FROM documents WHERE doc_id >= 400),
             |ann AS (
             |  SELECT i.source,
             |    (row_number() OVER (PARTITION BY md5(i.text) ORDER BY i.doc_id)) > 1 AS dup_batch,
             |    EXISTS (SELECT 1 FROM existing e WHERE md5(e.text) = md5(i.text)) AS dup_corpus
             |  FROM incoming i)
             |SELECT source, count(*) AS n_incoming,
             |  sum(CASE WHEN NOT dup_batch AND NOT dup_corpus THEN 1 ELSE 0 END)::BIGINT AS n_accepted,
             |  sum(CASE WHEN dup_corpus THEN 1 ELSE 0 END)::BIGINT AS n_dup_corpus
             |FROM ann GROUP BY source ORDER BY source""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        DedupOps.bloomIncrementalDedup(
          docs.where(col("doc_id") >= 400), docs.where(col("doc_id") < 400),
          "doc_id", "text")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_incoming"),
            sum(when(col("accepted"), 1).otherwise(0)).as("n_accepted"),
            sum(when(col("is_dup_in_corpus"), 1).otherwise(0)).as("n_dup_corpus"))
          .orderBy("source")
      }),

    // ---- deterministic train/val split ---------------------------
    // Hash-based splitting (not rand()): assignment is a pure function
    // of content, so re-runs, retried tasks, and incremental additions
    // never reshuffle examples across splits.
    Q("q52_hash_split",
      Some(s"""WITH s AS (SELECT lang,
              |  CASE WHEN ${D.rollingHash("text")} % 100 < 90 THEN 'train' ELSE 'val' END AS split
              |  FROM documents)
              |SELECT lang, split, count(*) AS n FROM s
              |GROUP BY lang, split ORDER BY lang, split""".stripMargin),
      (s, dir) =>
        t(s, dir, "documents")
          .withColumn("split",
            when(expr(TextHash.spark.rollingHash("text")) % 100 < 90, "train")
              .otherwise("val"))
          .groupBy("lang", "split").agg(count(lit(1)).as("n"))
          .orderBy("lang", "split")),

    // ---- top tokens per language (explode + count + rank) --------
    Q("q48_top_tokens",
      Some(s"""WITH tok AS (SELECT lang, unnest($duckToks) AS token FROM documents),
              |cnt AS (SELECT lang, token, count(*) AS n FROM tok GROUP BY lang, token),
              |ranked AS (SELECT lang, token, n,
              |  row_number() OVER (PARTITION BY lang ORDER BY n DESC, token)::INT AS rnk FROM cnt)
              |SELECT lang, token, n, rnk FROM ranked WHERE rnk <= 5 ORDER BY lang, rnk""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("token"))
        tp(s, dir, "documents", "doc_id")
          .select(col("lang"), explode(split(col("text"), " ")).as("token"))
          .groupBy("lang", "token").agg(count(lit(1)).as("n"))
          .withColumn("rnk", row_number().over(w))
          .where(col("rnk") <= 5)
          .select("lang", "token", "n", "rnk")
          .orderBy("lang", "rnk")
      }),

    // ---- composed curation pipeline ------------------------------
    // dedup (keep-first) -> quality gate -> annotate, then summarize.
    Q("q47_curation_pipeline",
      Some(s"""WITH dedup AS (
              |  SELECT * FROM (
              |    SELECT doc_id, text, lang,
              |      row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
              |    FROM documents) WHERE rn = 1),
              |gated AS (
              |  SELECT doc_id, lang, len($duckToks) AS n_tokens,
              |    ${D.tokenCount(D.tokens("text"), "the")} AS n_stop,
              |    ${D.rollingHash("text")} AS fingerprint
              |  FROM dedup
              |  WHERE len($duckToks) BETWEEN 20 AND 5000)
              |SELECT lang, count(*) AS n_docs, sum(n_tokens)::BIGINT AS sum_tokens,
              |  sum(n_stop)::BIGINT AS sum_stop, min(fingerprint) AS min_fp
              |FROM gated GROUP BY lang ORDER BY lang""".stripMargin),
      (s, dir) =>
        graft.operators.CurationPipeline.curate(
          tp(s, dir, "documents", "doc_id"), "doc_id", "text", minTokens = 20, maxTokens = 5000)
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("sum_tokens"),
            sum(col("n_stop")).as("sum_stop"),
            min(col("fingerprint")).as("min_fp"))
          .orderBy("lang")),

    // ---- stratified deterministic sampling -----------------------
    // Per-stratum hash-threshold sampling (en kept at 50%, the rest at
    // 10%): content-hash based, so the sample is reproducible across
    // retries and engines — the property a training-data pipeline
    // needs (no rand()). One scan, no shuffle before the aggregation.
    Q("q63_stratified_sample",
      Some(s"""WITH s AS (SELECT doc_id, lang FROM documents
              |  WHERE ${D.rollingHash("text")} % 100 <
              |    (CASE WHEN lang = 'en' THEN 50 ELSE 10 END))
              |SELECT lang, count(*) AS n_sampled, sum(doc_id)::BIGINT AS id_sum
              |FROM s GROUP BY lang ORDER BY lang""".stripMargin),
      (s, dir) => {
        import TextHash.{spark => H}
        t(s, dir, "documents")
          .where(expr(H.rollingHash("text")) % 100 <
            when(col("lang") === "en", 50).otherwise(10))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_sampled"), sum(col("doc_id")).as("id_sum"))
          .orderBy("lang")
      }),

    // ---- deterministic weighted data mixture ---------------------
    // Per-source keep rates from a broadcast weights table (rates
    // derived from the source name's hash so both engines build the
    // identical recipe); content-hash keep decisions — rerun-stable.
    Q("q85_weighted_mix",
      Some(s"""WITH w AS (SELECT source, (${D.rollingHash("source")} % 80) * 10 AS permille
              |  FROM (SELECT DISTINCT source FROM documents)),
              |s AS (SELECT d.source, d.doc_id FROM documents d JOIN w USING (source)
              |  WHERE ${D.rollingHash("text")} % 1000 < permille)
              |SELECT source, count(*) AS n_sampled, sum(doc_id)::BIGINT AS id_sum
              |FROM s GROUP BY source ORDER BY source""".stripMargin),
      (s, dir) => {
        import TextHash.{spark => H}
        val docs = t(s, dir, "documents")
        val weights = docs.select(col("source")).distinct()
          .withColumn("permille", (expr(H.rollingHash("source")) % 80) * 10)
        graft.operators.Mixing.weightedSample(docs, "text", "source", weights)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_sampled"), sum(col("doc_id")).as("id_sum"))
          .orderBy("source")
      }),

    // ---- count-min sketch point estimates (bounds witness) -------
    // The q45 pattern for CM: Spark checks its own sketch estimates
    // against its own exact counts at the pinned ε·N bound
    // (exact ≤ est ≤ exact + ceil(ε·N)) and emits booleans; the
    // oracle derives exact counts + true literals — a sketch drifting
    // out of bounds is a hash mismatch.
    Q("q114_count_min", {
      val probes = Seq("the", "spark", "join", "vector", "der")
      val probesSql = probes.map(t => s"('$t')").mkString(", ")
      Some(s"""WITH tk AS (SELECT unnest($duckToks) AS token FROM documents),
              |p(token) AS (VALUES $probesSql),
              |c AS (SELECT p.token, count(tk.token)::BIGINT AS n
              |  FROM p LEFT JOIN tk ON tk.token = p.token GROUP BY p.token)
              |SELECT token, n, true AS within_bounds FROM c ORDER BY token""".stripMargin)
    },
      (s, dir) => {
        val probes = Seq("the", "spark", "join", "vector", "der")
        val toks = TextOps.withTokens(t(s, dir, "documents"), "text", "__toks")
          .select(explode(col("__toks")).as("token"))
        val (cm, n) = graft.operators.Sketches.countMin(toks, "token",
          eps = 0.005, confidence = 0.99)
        val slack = math.ceil(0.005 * n).toLong
        import s.implicits._
        val est = probes.map(tk => (tk, cm.estimateCount(tk))).toDF("token", "__est")
        val exact = toks.where(col("token").isin(probes: _*))
          .groupBy(col("token")).agg(count(lit(1)).as("__n"))
        est.join(exact, Seq("token"), "left")
          .withColumn("n", coalesce(col("__n"), lit(0L)))
          .withColumn("within_bounds",
            col("__est") >= col("n") && col("__est") <= col("n") + lit(slack))
          .select("token", "n", "within_bounds")
          .orderBy("token")
      }),

    // ---- mergeable HLL distinct-count rollup ---------------------
    // Per-source Datasketches-HLL sketches rolled up to a corpus-wide
    // `__ALL__` estimate by sketch UNION (register-wise max), never a
    // re-scan — the shape that makes corpus NDV a metadata operation
    // at 100 TB. `merged_ok` pins the union estimate within tol·exact
    // of a direct whole-corpus sketch (sparse→dense promotion drifts
    // a few registers); `est_in_bounds` pins estimates to ±5% of
    // exact. Oracle = exact distincts + true literals (q45 pattern:
    // a sketch drifting out of bounds is a hash mismatch).
    Q("q120_hll_rollup",
      Some("""WITH g AS (SELECT source AS group_value,
             |    count(DISTINCT text)::BIGINT AS n_exact
             |  FROM documents GROUP BY source),
             |a AS (SELECT '__ALL__' AS group_value,
             |    count(DISTINCT text)::BIGINT AS n_exact FROM documents)
             |SELECT group_value, n_exact, true AS est_in_bounds, true AS merged_ok FROM g
             |UNION ALL
             |SELECT group_value, n_exact, true, true FROM a
             |ORDER BY group_value""".stripMargin),
      (s, dir) =>
        graft.operators.Sketches.hllRollup(
          t(s, dir, "documents"), "text", "source")
          .orderBy("group_value")),

    // ---- rank-biased overlap of two quality rankers --------------
    // RBO@10 (p = 1/2, dyadic weights) between the length ranking and
    // the token-Gini ranking — "do the two quality signals agree at
    // the top"; every term exact, summed by a strict fold in both
    // engines.
    Q("q151_rbo",
      Some(s"""WITH toks AS (SELECT doc_id, $duckToks AS t FROM documents),
              |x AS (SELECT doc_id, unnest(t) AS token FROM toks),
              |cg AS (SELECT doc_id, token, count(*) AS n_t FROM x GROUP BY doc_id, token),
              |g AS (SELECT doc_id, sum(n_t)::BIGINT AS n_tokens,
              |  sum(n_t * n_t)::BIGINT AS s2 FROM cg GROUP BY doc_id),
              |gin AS (SELECT d.doc_id,
              |  CASE WHEN g.n_tokens > 0
              |    THEN 1.0::DOUBLE - s2::DOUBLE / (g.n_tokens * g.n_tokens)::DOUBLE
              |  END AS gini
              |  FROM documents d LEFT JOIN g USING (doc_id)),
              |a AS (SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r
              |  FROM documents),
              |b AS (SELECT doc_id, row_number() OVER (ORDER BY gini DESC NULLS LAST, doc_id) AS r
              |  FROM gin),
              |la AS (SELECT list(doc_id ORDER BY r) AS ai FROM a WHERE r <= 10),
              |lb AS (SELECT list(doc_id ORDER BY r) AS bi FROM b WHERE r <= 10),
              |z AS (SELECT ai, bi,
              |  [0.5,0.25,0.125,0.0625,0.03125,0.015625,0.0078125,0.00390625,0.001953125,0.0009765625]::DOUBLE[] AS wl
              |  FROM la, lb)
              |SELECT list_reduce(list_prepend(0.0::DOUBLE,
              |    list_transform(range(1, 11), d ->
              |      wl[d] * len(list_intersect(ai[1:d], bi[1:d]))::DOUBLE / d::DOUBLE)),
              |    (acc, q) -> acc + q) AS rbo,
              |  len(list_intersect(ai, bi))::BIGINT AS overlap_at_k
              |FROM z""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = t(s, dir, "documents")
        // rbo@10 only reads prefix depths 1..10, so each ranker keeps
        // its top-10 via a distributed TakeOrderedAndProject FIRST;
        // the global row_number window then sees 10 rows, never the
        // corpus (kept items' ranks equal full-corpus ranks — the q82
        // pattern)
        val a = docs.orderBy(col("n_chars").desc, col("doc_id")).limit(10)
          .withColumn("rank",
            row_number().over(Window.orderBy(col("n_chars").desc, col("doc_id"))))
          .select(col("doc_id"), col("rank"))
        val b = TextOps.withTokenGini(docs, "doc_id", "text")
          .orderBy(col("gini").desc, col("doc_id")).limit(10)
          .withColumn("rank",
            row_number().over(Window.orderBy(col("gini").desc, col("doc_id"))))
          .select(col("doc_id"), col("rank"))
        graft.operators.Relevance.rbo(a, b, "doc_id", "rank", k = 10)
      }),

    // ---- quota plan execution (plan → corpus) --------------------
    // The q138 apportionment (here: 100 doc slots by source count)
    // EXECUTED: each source contributes exactly its quota of docs in
    // deterministic content-hash order — planner and selector compose
    // into one exact query.
    Q("q150_take_quotas",
      Some(s"""WITH c AS (SELECT source, count(*)::BIGINT AS n FROM documents GROUP BY source),
              |t AS (SELECT sum(n)::HUGEINT AS tot FROM c),
              |b AS (SELECT source, n, ((100::HUGEINT * n) // tot)::BIGINT AS qf,
              |  ((100::HUGEINT * n) % tot) AS rem FROM c, t),
              |l AS (SELECT (100 - sum(qf))::BIGINT AS lr FROM b),
              |q AS (SELECT source, (qf + CASE WHEN row_number() OVER (ORDER BY rem DESC, source) <= l.lr
              |  THEN 1 ELSE 0 END)::BIGINT AS quota FROM b, l),
              |r AS (SELECT source, doc_id, row_number() OVER (PARTITION BY source
              |  ORDER BY ${D.rollingHash("text")}, doc_id) AS rn FROM documents)
              |SELECT r.source, r.doc_id FROM r JOIN q USING (source)
              |WHERE r.rn <= q.quota ORDER BY r.source, r.doc_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val counts = docs.groupBy(col("source"))
          .agg(count(lit(1)).cast("bigint").as("n"))
        val quotas = graft.operators.Mixing.allocateBudget(counts, "source", "n",
          budget = 100L).select(col("source"), col("quota"))
        graft.operators.Mixing.takeQuotas(docs, "text", "source", "doc_id", quotas)
          .select(col("source"), col("doc_id"))
          .orderBy("source", "doc_id")
      }),

    // ---- balanced shard planning ---------------------------------
    // Exactly-7 sorted output shards whose sizes differ by at most
    // one row: floor((ordinal-1)·7/total) over the global (n_chars,
    // doc_id) order — reproducible integer math where
    // repartitionByRange would give sampled, non-reproducible splits.
    Q("q149_shard_plan",
      Some("""WITH r AS (SELECT row_number() OVER (ORDER BY n_chars, doc_id) AS ord,
             |    count(*) OVER () AS tot FROM documents)
             |SELECT (((ord - 1) * 7) // tot)::INT AS shard, count(*)::BIGINT AS n_rows
             |FROM r GROUP BY 1 ORDER BY shard""".stripMargin),
      (s, dir) =>
        graft.operators.Sequencing.withShardAssignment(
          t(s, dir, "documents"), "n_chars", "doc_id", nShards = 7)
          .groupBy(col("shard"))
          .agg(count(lit(1)).cast("bigint").as("n_rows"))
          .orderBy("shard")),

    // ---- byte-balanced shard planning ----------------------------
    // q149 weighted by SIZE: shard = floor(cum_bytes_before·7/total)
    // in doc_id order — equal-byte output files when row sizes vary;
    // cumulative weights through the same quantile-bucket windows
    // (never a single-partition sort), HUGEINT/DECIMAL exact.
    Q("q156_byte_shards",
      Some("""WITH o AS (SELECT doc_id, n_chars,
             |  coalesce(sum(n_chars) OVER (ORDER BY doc_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::HUGEINT AS cumb
             |  FROM documents),
             |t AS (SELECT sum(n_chars)::HUGEINT AS tot FROM documents)
             |SELECT ((cumb * 7) // tot)::INT AS shard,
             |  count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS n_bytes
             |FROM o, t GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) =>
        graft.operators.Sequencing.withWeightedShardAssignment(
          t(s, dir, "documents"), "doc_id", "doc_id", "n_chars", nShards = 7)
          .groupBy(col("shard"))
          .agg(count(lit(1)).cast("bigint").as("n_docs"),
            sum(col("n_chars")).cast("bigint").as("n_bytes"))
          .orderBy("shard")),

    // ---- content-addressed partition digests ---------------------
    // Per-source (count, xor-of-content-hashes) fingerprints: an
    // order-independent digest comparable across corpus versions
    // without moving data — "which partitions changed" before the
    // row-level q109 diff.
    Q("q148_partition_digest",
      Some(s"""SELECT source, count(*)::BIGINT AS n_rows,
              |  bit_xor(${D.rollingHash("text")})::BIGINT AS digest
              |FROM documents GROUP BY source ORDER BY source""".stripMargin),
      (s, dir) =>
        graft.operators.Inspect.partitionDigests(
          t(s, dir, "documents"), "source", "text")),

    // ---- negative-sampling table (unigram^(3/4)) -----------------
    // word2vec's smoothed sampling distribution: per-token weight
    // n^(3/4) via the exact-rounded sqrt·sqrt(sqrt) chain (no libm
    // pow), integerized at 1000×, then Hamilton-apportioned into
    // exactly 100k sampling slots — q138's operator composed on a
    // derived weight.
    Q("q147_negative_sampling",
      Some(s"""WITH x AS (SELECT unnest($duckToks) AS token FROM documents),
              |c AS (SELECT token, count(*)::BIGINT AS n FROM x GROUP BY token),
              |w AS (SELECT token,
              |  round(1000 * sqrt(n::DOUBLE) * sqrt(sqrt(n::DOUBLE)))::BIGINT AS wt FROM c),
              |t AS (SELECT sum(wt)::HUGEINT AS tot FROM w),
              |b AS (SELECT token, wt, ((100000::HUGEINT * wt) // tot)::BIGINT AS qf,
              |  ((100000::HUGEINT * wt) % tot) AS rem FROM w, t),
              |l AS (SELECT (100000 - sum(qf))::BIGINT AS lr FROM b),
              |r AS (SELECT token, wt, qf,
              |  row_number() OVER (ORDER BY rem DESC, token) AS rk FROM b)
              |SELECT r.token, r.wt, (r.qf + CASE WHEN r.rk <= l.lr THEN 1 ELSE 0 END)::BIGINT AS quota
              |FROM r, l ORDER BY r.token""".stripMargin),
      (s, dir) => {
        val counts = TextOps.withTokens(
          t(s, dir, "documents").select(col("text")), "text", "__toks")
          .select(explode(col("__toks")).as("token"))
          .groupBy(col("token")).agg(count(lit(1)).cast("bigint").as("n"))
        val weights = counts.withColumn("wt",
          round(lit(1000.0) * sqrt(col("n").cast("double")) *
            sqrt(sqrt(col("n").cast("double")))).cast("long"))
          .select(col("token"), col("wt"))
        graft.operators.Mixing.allocateBudget(weights, "token", "wt",
          budget = 100000L)
          .orderBy("token")
      }),

    // ---- token co-occurrence pairs -------------------------------
    // word2vec-style context extraction: unordered token pairs within
    // 2 positions, counted corpus-wide — pairs built map-side by
    // zipping the token array against its own shifts (no self-join).
    Q("q146_cooccurrence",
      Some(s"""WITH toks AS (SELECT $duckToks AS t FROM documents),
              |pr AS (
              |  SELECT unnest(list_transform(range(1, len(t)),
              |    i -> {'a': least(t[i], t[i+1]), 'b': greatest(t[i], t[i+1])})) AS p
              |  FROM toks
              |  UNION ALL
              |  SELECT unnest(list_transform(range(1, len(t) - 1),
              |    i -> {'a': least(t[i], t[i+2]), 'b': greatest(t[i], t[i+2])})) AS p
              |  FROM toks)
              |SELECT p.a AS tok_a, p.b AS tok_b, count(*)::BIGINT AS n
              |FROM pr GROUP BY 1, 2 ORDER BY n DESC, tok_a, tok_b LIMIT 20""".stripMargin),
      (s, dir) =>
        graft.operators.Relevance.cooccurrencePairs(
          t(s, dir, "documents"), "text", maxDist = 2, k = 20)),

    // ---- PMI collocations ----------------------------------------
    // Phrase-mining signal on the q146 pair table: PMI's exponent as
    // an exact scaled-integer lift (1e6·n·T² div P·c_a·c_b) — no
    // libm, HUGEINT/DECIMAL(38,0) products, bitwise by construction;
    // n >= 5 floor kills the rare-pair pathology.
    Q("q153_pmi",
      Some(s"""WITH toks AS (SELECT $duckToks AS t FROM documents),
              |pr AS (
              |  SELECT unnest(list_transform(range(1, len(t)),
              |    i -> {'a': least(t[i], t[i+1]), 'b': greatest(t[i], t[i+1])})) AS p
              |  FROM toks
              |  UNION ALL
              |  SELECT unnest(list_transform(range(1, len(t) - 1),
              |    i -> {'a': least(t[i], t[i+2]), 'b': greatest(t[i], t[i+2])})) AS p
              |  FROM toks),
              |pc AS (SELECT p.a AS tok_a, p.b AS tok_b, count(*)::BIGINT AS n
              |  FROM pr GROUP BY 1, 2),
              |uc AS (SELECT unnest(t) AS token FROM toks),
              |cc AS (SELECT token, count(*)::BIGINT AS c FROM uc GROUP BY token),
              |tt AS (SELECT sum(c)::HUGEINT AS t_toks FROM cc),
              |tp AS (SELECT sum(n)::HUGEINT AS t_pairs FROM pc)
              |SELECT pc.tok_a, pc.tok_b, pc.n,
              |  ((1000000::HUGEINT * pc.n * tt.t_toks * tt.t_toks)
              |    // (tp.t_pairs * ua.c * ub.c))::BIGINT AS lift_ppm
              |FROM pc
              |JOIN cc ua ON ua.token = pc.tok_a
              |JOIN cc ub ON ub.token = pc.tok_b
              |CROSS JOIN tt CROSS JOIN tp
              |WHERE pc.n >= 5
              |ORDER BY lift_ppm DESC, tok_a, tok_b LIMIT 30""".stripMargin),
      (s, dir) =>
        graft.operators.Relevance.pmiCollocations(
          tp(s, dir, "documents", "doc_id"), "text", maxDist = 2, minCount = 5L, k = 30)),

    // ---- multimodal decode plumbing ------------------------------
    // Payload bytes constructed from doc_id (unhex of arithmetic),
    // pushed through the REAL decode path — binary column →
    // mapPartitions codec seam → typed meta struct; the oracle
    // recomputes the stub parser's header fields arithmetically, so
    // a hash match proves the whole Spark-side pipeline byte-exactly
    // (the codec itself is the documented container stub).
    Q("q140_multimodal_meta",
      Some("""SELECT doc_id,
             |  CASE (doc_id % 256) % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
             |    ELSE 'video' END AS kind,
             |  (16 * (1 + ((doc_id * 7) % 256) % 64))::INT AS width,
             |  (16 * (1 + ((doc_id * 13) % 256) % 64))::INT AS height,
             |  (1000 * (1 + ((doc_id * 3) % 256) % 60))::BIGINT AS duration_ms
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val payloads = t(s, dir, "documents").select(col("doc_id"),
          unhex(concat(
            lpad(hex(col("doc_id") % 256), 2, "0"),
            lpad(hex((col("doc_id") * 7) % 256), 2, "0"),
            lpad(hex((col("doc_id") * 13) % 256), 2, "0"),
            lpad(hex((col("doc_id") * 3) % 256), 2, "0"))).as("payload"))
        graft.operators.Multimodal.withMeta(payloads, "doc_id", "payload")
          .select(col("id").as("doc_id"), col("meta.kind").as("kind"),
            col("meta.width").as("width"), col("meta.height").as("height"),
            col("meta.durationMs").as("duration_ms"))
          .orderBy("doc_id")
      }),

    // ---- multimodal frame sampling -------------------------------
    // 1 fps sampling over the q140 payloads: the bounded explode
    // (sequence over duration) whose row count is set by the rate,
    // not payload size. Oracle derives frames-per-doc and the first/
    // last timestamps arithmetically from the same header fields.
    Q("q141_frame_sample",
      Some("""WITH m AS (SELECT doc_id,
             |    (1000 * (1 + ((doc_id * 3) % 256) % 60))::BIGINT AS dur
             |  FROM documents)
             |SELECT doc_id, (dur // 1000)::BIGINT AS n_frames,
             |  0::BIGINT AS first_ms, (1000 * (dur // 1000 - 1))::BIGINT AS last_ms
             |FROM m ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val payloads = t(s, dir, "documents").select(col("doc_id"),
          unhex(concat(
            lpad(hex(col("doc_id") % 256), 2, "0"),
            lpad(hex((col("doc_id") * 7) % 256), 2, "0"),
            lpad(hex((col("doc_id") * 13) % 256), 2, "0"),
            lpad(hex((col("doc_id") * 3) % 256), 2, "0"))).as("payload"))
        val decoded = graft.operators.Multimodal.withMeta(payloads, "doc_id", "payload")
        graft.operators.Multimodal.frameSample(decoded, fps = 1.0)
          .groupBy(col("id").as("doc_id"))
          .agg(count(lit(1)).cast("bigint").as("n_frames"),
            min(col("frame_ms")).cast("bigint").as("first_ms"),
            max(col("frame_ms")).cast("bigint").as("last_ms"))
          .orderBy("doc_id")
      }),

    // ---- deterministic pseudonymization --------------------------
    // sha256(salt || id): stable one-way identifier tokens (joins and
    // dedup survive, the mapping doesn't without the salt) — the
    // structured-key partner of q97's free-text redaction. Map-side
    // only; both engines emit lowercase hex.
    Q("q139_pseudonymize",
      Some("""SELECT doc_id, sha256('graft-r5:' || doc_id::VARCHAR) AS pseudo_id
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        graft.operators.TextOps.withPseudonym(
          t(s, dir, "documents"), "doc_id", "graft-r5:")
          .select(col("doc_id"), col("pseudo_id"))
          .orderBy("doc_id")),

    // ---- largest-remainder token-budget apportionment ------------
    // Split a 1M-token budget across sources proportionally to their
    // character mass, exactly (quotas sum to B, each within 1 of
    // proportional). Decimal/HUGEINT products keep the arithmetic
    // exact where int64 would overflow at corpus scale.
    Q("q138_budget_allocation",
      Some("""WITH c AS (SELECT source, sum(n_chars)::BIGINT AS n
             |  FROM documents GROUP BY source),
             |t AS (SELECT sum(n)::HUGEINT AS tot FROM c),
             |b AS (SELECT source, n,
             |    ((1000000::HUGEINT * n) // tot)::BIGINT AS qf,
             |    ((1000000::HUGEINT * n) % tot) AS rem FROM c, t),
             |l AS (SELECT (1000000 - sum(qf))::BIGINT AS R FROM b),
             |r AS (SELECT source, n, qf,
             |  row_number() OVER (ORDER BY rem DESC, source) AS rk FROM b)
             |SELECT r.source, r.n, (r.qf + CASE WHEN r.rk <= l.R THEN 1 ELSE 0 END)::BIGINT AS quota
             |FROM r, l ORDER BY r.source""".stripMargin),
      (s, dir) => {
        val counts = t(s, dir, "documents")
          .groupBy(col("source"))
          .agg(sum(col("n_chars")).cast("bigint").as("n"))
        graft.operators.Mixing.allocateBudget(counts, "source", "n",
          budget = 1000000L)
          .orderBy("source")
      }),

    // ---- incremental near-dup admission gate ---------------------
    // Daily-drop shape: docs < 100 are the incoming batch, the rest
    // the accumulated corpus; LSH bands pair batch×corpus ONLY
    // (batch keys broadcast — the corpus never shuffles), exact
    // Jaccard verifies. Cost ∝ drop size, not corpus size.
    Q("q137_incremental_near_dup",
      Some(s"""$sigCte,
              |${bipartiteVpairsCtes(split = 100L, minJ = 0.2)}
              |SELECT a_id, b_id, jaccard FROM vpairs
              |ORDER BY a_id, b_id""".stripMargin),
      (s, dir) => {
        val docs = tp(s, dir, "documents", "doc_id")
        DedupOps.lshNearDupAgainstCorpus(
          docs.where(col("doc_id") < 100),
          docs.where(col("doc_id") >= 100),
          "doc_id", "text", bands = 2, rowsPerBand = 4, minJaccard = 0.2)
      }),

    // ---- per-source label purity ---------------------------------
    // Dominant language share per source (mixing QA): argmax as one
    // ordered-struct max, purity one exact-integer division; oracle
    // states the winner via row_number over (n DESC, lang DESC).
    Q("q135_source_purity",
      Some("""WITH c AS (SELECT source, lang, count(*)::BIGINT AS n
             |  FROM documents GROUP BY source, lang),
             |t AS (SELECT source, sum(n)::BIGINT AS n_docs FROM c GROUP BY source),
             |r AS (SELECT source, lang, n, row_number() OVER (
             |  PARTITION BY source ORDER BY n DESC, lang DESC) AS rn FROM c)
             |SELECT r.source, t.n_docs, r.lang AS top_label,
             |  r.n::DOUBLE / t.n_docs::DOUBLE AS purity
             |FROM r JOIN t USING (source) WHERE rn = 1 ORDER BY r.source""".stripMargin),
      (s, dir) =>
        graft.operators.Mixing.sourcePurity(
          t(s, dir, "documents"), "source", "lang")
          .orderBy("source")),

    // ---- cross-source score calibration --------------------------
    // percent_rank of n_chars within each source: every source's
    // score distribution mapped onto [0,1] so one global threshold
    // is comparable across sources; (rank-1)/(n-1) is one exact
    // integer division.
    Q("q131_calibrated_rank",
      Some("""SELECT doc_id, source, n_chars,
             |  percent_rank() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS calibrated
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        graft.operators.RobustStats.withCalibratedRank(
          t(s, dir, "documents"), "n_chars", "source", "doc_id")
          .select(col("doc_id"), col("source"), col("n_chars"), col("calibrated"))
          .orderBy("doc_id")),

    // ---- k-anonymity small-group audit ---------------------------
    // Quasi-identifier (lang, source) combinations carried by fewer
    // than 4 documents — the suppression list of a privacy release
    // gate; output bounded by rare-combination count, never corpus
    // size.
    Q("q133_small_groups",
      Some("""SELECT lang, source, count(*)::BIGINT AS n FROM documents
             |GROUP BY lang, source HAVING count(*) < 4
             |ORDER BY lang, source""".stripMargin),
      (s, dir) =>
        graft.operators.Validate.smallGroups(
          t(s, dir, "documents"), Seq("lang", "source"), k = 4L)),

    // ---- chunk-boundary (concat-leak) pairs ----------------------
    // Docs whose last 3 tokens equal another doc's first 3 tokens —
    // split-document leakage neither doc-level nor span-grid dedup
    // sees; one equi-join on the boundary shingle with a hot-key
    // boilerplate cap on each side.
    Q("q130_boundary_overlap",
      Some(s"""WITH f AS (SELECT doc_id, $duckToks AS t FROM documents),
              |hd AS (SELECT doc_id AS b_id, array_to_string(t[1:3], ' ') AS shingle
              |  FROM f WHERE len(t) >= 3
              |  QUALIFY count(*) OVER (PARTITION BY shingle) <= 100),
              |tl AS (SELECT doc_id AS a_id, array_to_string(t[len(t)-2:len(t)], ' ') AS shingle
              |  FROM f WHERE len(t) >= 3
              |  QUALIFY count(*) OVER (PARTITION BY shingle) <= 100)
              |SELECT a_id, b_id, shingle FROM tl JOIN hd USING (shingle)
              |WHERE a_id <> b_id ORDER BY a_id, b_id""".stripMargin),
      (s, dir) =>
        DedupOps.boundaryOverlapPairs(
          t(s, dir, "documents"), "doc_id", "text", k = 3)),

    // ---- token-diversity (Gini/Simpson) score --------------------
    // Log-free entropy surrogate: 1 − Σn_t²/n² from exact integer
    // monoids + one division — the degenerate-text signal that stays
    // bitwise across engines where libm-log entropy would drift.
    Q("q126_token_gini",
      Some(s"""WITH toks AS (SELECT doc_id, $duckToks AS t FROM documents),
              |x AS (SELECT doc_id, unnest(t) AS token FROM toks),
              |c AS (SELECT doc_id, token, count(*) AS n_t FROM x GROUP BY doc_id, token),
              |g AS (SELECT doc_id, sum(n_t)::BIGINT AS n_tokens,
              |  sum(n_t * n_t)::BIGINT AS s2 FROM c GROUP BY doc_id)
              |SELECT d.doc_id, coalesce(g.n_tokens, 0)::BIGINT AS n_tokens,
              |  CASE WHEN g.n_tokens > 0
              |    THEN 1.0::DOUBLE - s2::DOUBLE / (g.n_tokens * g.n_tokens)::DOUBLE
              |  END AS gini
              |FROM documents d LEFT JOIN g USING (doc_id)
              |ORDER BY d.doc_id""".stripMargin),
      (s, dir) =>
        graft.operators.TextOps.withTokenGini(
          t(s, dir, "documents"), "doc_id", "text")
          .select(col("doc_id"), col("n_tokens"), col("gini"))
          .orderBy("doc_id")),

    // ---- vocabulary coverage curve -------------------------------
    // Cumulative corpus-mass share of the top-40 tokens — the curve
    // that sizes a tokenizer vocab; exact integer running sums, one
    // division per row.
    Q("q127_coverage_curve",
      Some(s"""WITH x AS (SELECT unnest($duckToks) AS token FROM documents),
              |c AS (SELECT token, count(*)::BIGINT AS n FROM x GROUP BY token),
              |t AS (SELECT sum(n)::BIGINT AS total FROM c),
              |top AS (SELECT token, n, row_number() OVER (ORDER BY n DESC, token)::INT AS rank
              |  FROM c ORDER BY n DESC, token LIMIT 40)
              |SELECT rank, token, n,
              |  sum(n) OVER (ORDER BY rank)::BIGINT AS cum_n,
              |  (sum(n) OVER (ORDER BY rank))::DOUBLE / total::DOUBLE AS cum_share
              |FROM top, t ORDER BY rank""".stripMargin),
      (s, dir) =>
        graft.operators.Relevance.coverageCurve(
          t(s, dir, "documents"), "text", k = 40)),

    // ---- equi-depth histogram ------------------------------------
    // Eight equal-count buckets over n_chars via ntile on the pinned
    // total order (n_chars, doc_id) — the exact/oracle mode; the
    // operator's approx mode replaces the global sort with one
    // approx_percentile boundary pass for 100 TB (spec-pinned).
    Q("q125_equidepth_hist",
      Some("""WITH b AS (SELECT n_chars, ntile(8) OVER (ORDER BY n_chars, doc_id) AS bucket
             |  FROM documents WHERE n_chars IS NOT NULL)
             |SELECT bucket::INT AS bucket, min(n_chars) AS lo_value,
             |  max(n_chars) AS hi_value, count(*)::BIGINT AS n
             |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin),
      (s, dir) =>
        graft.operators.Profile.equidepthHistogram(
          t(s, dir, "documents"), "n_chars", "doc_id", nb = 8)),

    // ---- round-robin source interleaving -------------------------
    // Training order where every source appears once per epoch before
    // any repeats — epoch = per-source position in content-hash order
    // (deterministic, no rand()); the global order is (epoch, source,
    // doc_id), materialized at scale by a range shuffle, never a
    // single-partition sort.
    Q("q123_interleave_sources",
      Some(s"""WITH r AS (SELECT source, doc_id, row_number() OVER (
              |  PARTITION BY source ORDER BY ${D.rollingHash("text")}, doc_id)::BIGINT AS epoch
              |  FROM documents)
              |SELECT epoch, source, doc_id FROM r
              |ORDER BY epoch, source, doc_id""".stripMargin),
      (s, dir) =>
        graft.operators.Mixing.interleaveSources(
          t(s, dir, "documents"), "source", "text", "doc_id")
          .select(col("epoch"), col("source"), col("doc_id"))
          .orderBy("epoch", "source", "doc_id")),

    // ---- inverse-frequency class weights -------------------------
    // sklearn-"balanced" loss weights per language: n_total/(k·n_cls)
    // from one aggregation pass + a broadcast totals scalar; the
    // single division is bitwise across engines.
    Q("q124_class_weights",
      Some("""WITH c AS (SELECT lang AS class, count(*)::BIGINT AS n_class
             |  FROM documents GROUP BY lang),
             |t AS (SELECT sum(n_class)::BIGINT AS n_total, count(*)::BIGINT AS k FROM c)
             |SELECT class, n_class,
             |  n_total::DOUBLE / (k * n_class)::DOUBLE AS weight
             |FROM c, t ORDER BY class""".stripMargin),
      (s, dir) =>
        graft.operators.Mixing.classWeights(t(s, dir, "documents"), "lang")
          .orderBy("class")),

    // ---- incremental (mergeable) corpus statistics ---------------
    // Three disjoint drops are profiled independently and their
    // algebraic stats frames folded together — the oracle recomputes
    // over the full table directly, so a hash match proves
    // merge(d1, d2, d3) == full recompute bitwise (integer monoids
    // exact; mean/variance from pinned fixed-tree float chains).
    // At 100 TB only the delta drop is ever scanned.
    Q("q121_stats_merge",
      Some("""SELECT source AS group_value, count(*)::BIGINT AS n_rows,
             |  (count(*) - count(n_chars))::BIGINT AS n_nulls,
             |  count(n_chars)::BIGINT AS n_vals,
             |  sum(n_chars)::BIGINT AS sum_value,
             |  sum(n_chars * n_chars)::BIGINT AS sum_sq,
             |  min(n_chars)::BIGINT AS min_value,
             |  max(n_chars)::BIGINT AS max_value,
             |  sum(n_chars)::DOUBLE / count(n_chars)::DOUBLE AS mean_value,
             |  sum(n_chars * n_chars)::DOUBLE / count(n_chars)::DOUBLE
             |    - (sum(n_chars)::DOUBLE / count(n_chars)::DOUBLE)
             |      * (sum(n_chars)::DOUBLE / count(n_chars)::DOUBLE) AS var_value
             |FROM documents GROUP BY source ORDER BY group_value""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val parts = Seq(
          docs.where(col("doc_id") < 200),
          docs.where(col("doc_id") >= 200 && col("doc_id") < 400),
          docs.where(col("doc_id") >= 400))
          .map(graft.operators.Profile.numericStats(_, "n_chars", "source"))
        graft.operators.Profile.finalizeStats(
          graft.operators.Profile.mergeStats(parts))
          .orderBy("group_value")
      }),

    // ---- corpus snapshot diff ------------------------------------
    // "What did the pipeline change": before = docs < 400, after =
    // docs >= 100 with every 7th text edited — both engines construct
    // the versions identically, diff by content digest over one
    // id-keyed full-outer join of (id, digest) projections.
    Q("q109_snapshot_diff",
      Some("""WITH b AS (SELECT doc_id, md5(text) AS d FROM documents WHERE doc_id < 400),
             |a AS (SELECT doc_id, md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END) AS d
             |  FROM documents WHERE doc_id >= 100),
             |j AS (SELECT coalesce(b.doc_id, a.doc_id) AS doc_id,
             |  CASE WHEN b.d IS NULL THEN 'added' WHEN a.d IS NULL THEN 'removed'
             |       WHEN b.d = a.d THEN 'unchanged' ELSE 'changed' END AS status
             |  FROM b FULL OUTER JOIN a ON a.doc_id = b.doc_id)
             |SELECT status, count(*) AS n FROM j GROUP BY status ORDER BY status""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val before = docs.where(col("doc_id") < 400)
        val after = docs.where(col("doc_id") >= 100)
          .withColumn("text", when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(" v2"))).otherwise(col("text")))
        graft.operators.Inspect.diffSnapshots(before, after, "doc_id", "text")
          .groupBy(col("status")).agg(count(lit(1)).as("n"))
          .orderBy("status")
      }),

    // ---- cross-source duplication matrix -------------------------
    // Distinct shared 8-token spans per source pair — the provenance
    // probe ("which feeds copy from each other"). Top-20 pairs.
    Q("q106_source_overlap",
      Some(s"""WITH toks AS (SELECT source, $duckToks AS t FROM documents),
              |sidx AS (SELECT source, t, unnest(range(0, (len(t) + 7) // 8)) AS span_idx FROM toks),
              |sp AS (SELECT DISTINCT source,
              |  array_to_string(t[(span_idx*8+1):(span_idx*8+8)], ' ') AS span FROM sidx)
              |SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared_spans
              |FROM sp a JOIN sp b ON a.span = b.span AND a.source < b.source
              |GROUP BY 1, 2
              |ORDER BY n_shared_spans DESC, src_a, src_b LIMIT 20""".stripMargin),
      (s, dir) =>
        DedupOps.sourceOverlapMatrix(tp(s, dir, "documents", "doc_id"), "text", "source",
          spanTokens = 8)
          .limit(20)),

    // ---- deterministic per-source quota --------------------------
    // Cap every source at 10 documents, picked in content-hash order
    // (no rand(): re-runs keep the same rows). Oracle is the plain
    // per-group row_number over the same hash order.
    Q("q104_cap_per_source",
      Some(s"""WITH r AS (SELECT source, doc_id, row_number() OVER (
              |  PARTITION BY source ORDER BY ${D.rollingHash("text")}, doc_id) AS rn
              |  FROM documents)
              |SELECT source, doc_id FROM r WHERE rn <= 10
              |ORDER BY source, doc_id""".stripMargin),
      (s, dir) =>
        graft.operators.Mixing.capPerGroup(
          t(s, dir, "documents"), "text", "source", "doc_id", n = 10)
          .select("source", "doc_id")
          .orderBy("source", "doc_id")),

    // ---- temperature-flattened mixture sampling ------------------
    // q85's hash-derived recipe flattened at τ = 1/2 (sqrt is an
    // IEEE-core correctly-rounded op — unlike pow — so the reweighted
    // permilles are bitwise-identical across engines), then the same
    // deterministic content-hash sampling.
    Q("q119_mix_temperature",
      Some(s"""WITH w AS (SELECT DISTINCT source,
              |    (${D.rollingHash("source")} % 80) * 10 AS permille FROM documents),
              |t AS (SELECT sum(sqrt(permille::DOUBLE)) AS tot FROM w),
              |w2 AS (SELECT source,
              |    round(1000.0 * sqrt(permille::DOUBLE) / tot)::BIGINT AS permille FROM w, t)
              |SELECT d.source, count(*) AS n_sampled, sum(d.doc_id)::BIGINT AS id_sum
              |FROM documents d JOIN w2 USING (source)
              |WHERE ${D.rollingHash("d.text")} % 1000 < w2.permille
              |GROUP BY d.source ORDER BY d.source""".stripMargin),
      (s, dir) => {
        import TextHash.{spark => H}
        val docs = t(s, dir, "documents")
        val weights = docs.select(col("source")).distinct()
          .withColumn("permille", (expr(H.rollingHash("source")) % 80) * 10)
        val flat = graft.operators.Mixing.reweightTemperature(
          weights, "source", tauNum = 1, tauDen = 2)
        graft.operators.Mixing.weightedSample(docs, "text", "source", flat)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_sampled"), sum(col("doc_id")).as("id_sum"))
          .orderBy("source")
      }),

    // ---- train/benchmark decontamination -------------------------
    // Docs 0..19 stand in for an eval set; the rest is the training
    // corpus. A corpus doc is contaminated if it shares ANY 3-token
    // shingle with the benchmark (broadcast semi-join against the
    // benchmark's distinct shingles — see operators.Decontaminate).
    Q("q64_decontaminate",
      Some(s"""WITH toks AS (SELECT doc_id, lang, text, $duckToks AS t FROM documents),
              |bench AS (SELECT DISTINCT unnest($duckShingles) AS sh FROM toks WHERE doc_id < 20),
              |corpus AS (SELECT doc_id, lang, $duckShingles AS shs FROM toks WHERE doc_id >= 20),
              |cont AS (SELECT DISTINCT doc_id FROM (SELECT doc_id, unnest(shs) AS sh FROM corpus)
              |  JOIN bench USING (sh))
              |SELECT c.lang, count(*) AS n_docs,
              |  sum(CASE WHEN k.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_contaminated
              |FROM corpus c LEFT JOIN cont k USING (doc_id)
              |GROUP BY c.lang ORDER BY c.lang""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        graft.operators.Decontaminate.flagContaminated(
          docs.where(col("doc_id") >= 20),
          docs.where(col("doc_id") < 20),
          "doc_id", "text")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("contaminated"), 1L).otherwise(0L)).as("n_contaminated"))
          .orderBy("lang")
      }),

    // ---- bigram rarity (LM-free perplexity proxy) ----------------
    // Mean inverse corpus frequency of each doc's ordered token
    // bigrams, as exact nested integer divides — the fluency gate's
    // score without a language model. Corpus-wide counts, output
    // restricted to docs < 200.
    Q("q210_bigram_rarity",
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
             |    i -> t[i] || ' ' || t[i + 1])) AS b
             |  FROM toks WHERE len(t) >= 2),
             |bc AS (SELECT b, count(*)::HUGEINT AS cnt FROM bg GROUP BY b),
             |p AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams,
             |    sum(1000000::HUGEINT // cnt) AS rs
             |  FROM bg JOIN bc USING (b) GROUP BY doc_id),
             |d AS (SELECT doc_id FROM documents WHERE doc_id < 200)
             |SELECT d.doc_id, coalesce(p.n_bigrams, 0) AS n_bigrams,
             |  (rs // p.n_bigrams)::BIGINT AS rarity_ppm
             |FROM d LEFT JOIN p USING (doc_id) ORDER BY d.doc_id""".stripMargin),
      (s, dir) => {
        graft.operators.Relevance.withBigramRarity(
          tp(s, dir, "documents", "doc_id"), "doc_id", "text")
          .where(col("doc_id") < 200)
          .select("doc_id", "n_bigrams", "rarity_ppm")
          .orderBy("doc_id")
      }),

    // ---- top-p (nucleus) selection per source --------------------
    // Per source, the biggest documents carrying the first half of
    // its character mass: strict-before cumulative compare by exact
    // cross-multiplication (1000·cum < 500·total), (n_chars desc,
    // doc_id) pinned order. The census checks the kept SET (count +
    // id-sum + kept mass), not just sizes.
    Q("q209_top_share",
      Some("""WITH w AS (SELECT source, doc_id, n_chars,
             |  coalesce(sum(n_chars) OVER (PARTITION BY source
             |    ORDER BY n_chars DESC NULLS LAST, doc_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb,
             |  sum(n_chars) OVER (PARTITION BY source) AS tot FROM documents),
             |k AS (SELECT * FROM w WHERE 1000::HUGEINT * cumb < 500::HUGEINT * tot)
             |SELECT source, count(*)::BIGINT AS n_kept,
             |  sum(doc_id)::BIGINT AS sum_ids, sum(n_chars)::BIGINT AS kept_chars
             |FROM k GROUP BY source ORDER BY source""".stripMargin),
      (s, dir) => {
        graft.operators.Mixing.takeTopShare(
          t(s, dir, "documents"), "source", "n_chars", "doc_id", pPermille = 500)
          .groupBy(col("source"))
          .agg(count(lit(1)).cast("bigint").as("n_kept"),
            sum(col("doc_id")).cast("bigint").as("sum_ids"),
            sum(col("n_chars")).cast("bigint").as("kept_chars"))
          .orderBy("source")
      }),

    // ---- target-distribution downsample (histogram matching) -----
    // Rebalance the corpus to a pinned 40/20/15/15/10 language
    // mixture: water-filling sets the kept total from the first
    // bucket to run dry (de: 70·1000 div 200 = 350), every bucket
    // keeps T·p div 1000 docs in content-hash order, and the witness
    // hashes the per-language census + kept-id sums — the SELECTION
    // is checked, not just the counts.
    Q("q208_match_distribution",
      Some(s"""WITH tgt(lang, tp) AS (VALUES ('en', 400), ('de', 200),
              |  ('es', 150), ('fr', 150), ('zh', 100)),
              |c AS (SELECT lang, count(*)::HUGEINT AS n FROM documents GROUP BY lang),
              |j AS (SELECT t.lang, t.tp::HUGEINT AS tp, coalesce(c.n, 0::HUGEINT) AS n
              |  FROM tgt t LEFT JOIN c USING (lang)),
              |lvl AS (SELECT min(n * 1000 // tp) AS lev FROM j WHERE tp > 0),
              |q AS (SELECT lang, (lev * tp // 1000) AS quota FROM j CROSS JOIN lvl),
              |r AS (SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
              |    ORDER BY ${D.rollingHash("text")}, doc_id) AS rn FROM documents),
              |k AS (SELECT r.lang, r.doc_id FROM r JOIN q USING (lang) WHERE rn <= quota)
              |SELECT lang, count(*)::BIGINT AS n_kept, sum(doc_id)::BIGINT AS sum_ids
              |FROM k GROUP BY lang ORDER BY lang""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val tgt = Seq(("en", 400L), ("de", 200L), ("es", 150L), ("fr", 150L),
          ("zh", 100L)).toDF("lang", "target_permille")
        graft.operators.Mixing.matchDistribution(
          tp(s, dir, "documents", "doc_id"), "text", "lang", "doc_id", tgt)
          .groupBy(col("lang"))
          .agg(count(lit(1)).cast("bigint").as("n_kept"),
            sum(col("doc_id")).cast("bigint").as("sum_ids"))
          .orderBy("lang")
      }),

    // ---- graded contamination (overlap fraction) -----------------
    // q64's boolean made quantitative: docs 100..149 are PLANTED as
    // partial copies (own text ++ benchmark doc_id−100's text), so
    // their distinct-shingle overlap fraction lands strictly between
    // the wholesale-copy 1e6 ppm (docs 0..49 ARE the benchmark) and
    // the clean corpus's 0 — the threshold a drop-at->50% gate tunes.
    // Exact scaled-integer ppm, hash-checked.
    Q("q207_overlap_fraction",
      Some(s"""WITH bench0 AS (SELECT doc_id, text FROM documents WHERE doc_id < 50),
              |corpus0 AS (SELECT c.doc_id,
              |    CASE WHEN c.doc_id BETWEEN 100 AND 149
              |      THEN c.text || ' ' || b.text ELSE c.text END AS text
              |  FROM (SELECT doc_id, text FROM documents WHERE doc_id < 300) c
              |  LEFT JOIN bench0 b ON b.doc_id = c.doc_id - 100),
              |bt AS (SELECT text, $duckToks AS t FROM bench0),
              |bs AS (SELECT DISTINCT unnest($duckShingles) AS bsh FROM bt),
              |ct AS (SELECT doc_id, text, $duckToks AS t FROM corpus0),
              |cs AS (SELECT doc_id, unnest($duckShingles) AS sh FROM ct),
              |agg AS (SELECT doc_id, count(DISTINCT sh)::BIGINT AS n_shingles,
              |  count(DISTINCT CASE WHEN sh IN (SELECT bsh FROM bs) THEN sh END)::BIGINT AS n_overlap
              |  FROM cs GROUP BY doc_id)
              |SELECT doc_id, n_shingles, n_overlap,
              |  CASE WHEN n_shingles = 0 THEN NULL
              |    ELSE ((1000000::HUGEINT * n_overlap) // n_shingles)::BIGINT
              |  END AS overlap_ppm
              |FROM agg WHERE n_overlap > 0 ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "text")
        val bench = docs.where(col("doc_id") < 50)
        val corpus = docs.where(col("doc_id") < 300).as("c")
          .join(bench.select(col("doc_id").as("b_id"), col("text").as("b_text")),
            col("c.doc_id") - 100 === col("b_id"), "left")
          .select(col("c.doc_id").as("doc_id"),
            when(col("c.doc_id").between(100, 149),
              concat(col("c.text"), lit(" "), col("b_text")))
              .otherwise(col("c.text")).as("text"))
        graft.operators.Decontaminate.overlapFraction(corpus, bench, "doc_id", "text")
          .where(col("n_overlap") > 0)
          .orderBy("doc_id")
      }),

    // ---- winnowed (MOSS) document fingerprints -------------------
    // Window-min selection over char-5-gram rolling hashes (w=4):
    // robust fingerprints with the coverage guarantee (any shared
    // 8-char substring shares a fingerprint). The witness reduces the
    // per-doc fingerprint SET to its cardinality, minimum, and sum —
    // all exact integers, hash-comparable.
    Q("q66_winnow_fingerprints",
      Some(s"""WITH kh AS (SELECT doc_id, text, ${D.kgramHashes("text", 5)} AS h
              |  FROM documents WHERE doc_id < 100),
              |fp AS (SELECT doc_id,
              |  CASE WHEN length(text) >= 8 THEN ${D.winnowFromHashes("h", 4)}
              |       ELSE [${D.rollingHash("text")}] END AS fps FROM kh)
              |SELECT doc_id, len(fps)::INT AS n_fp, fps[1] AS min_fp,
              |  list_reduce(list_prepend(0::BIGINT, fps), (a, x) -> a + x) AS fp_sum
              |FROM fp ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        TextOps.withWinnowedFingerprints(
          t(s, dir, "documents").where(col("doc_id") < 100), "text", k = 5, w = 4)
          .select(
            col("doc_id"),
            size(col("fps")).as("n_fp"),
            element_at(col("fps"), 1).as("min_fp"),
            expr("aggregate(fps, cast(0 as bigint), (a, x) -> a + x)").as("fp_sum"))
          .orderBy("doc_id")),

    // ---- multimodal plumbing: opaque binary column stats ---------
    // Binary payloads (here: utf8 bytes as a deterministic stand-in
    // for image/audio blobs) flow through untouched; metadata is
    // computed without decoding. See graft.operators.Multimodal for
    // the full decode-stub pipeline.
    Q("q39_binary_stats",
      Some("""SELECT source, count(*) AS n,
             |  sum(octet_length(text::BLOB))::BIGINT AS sum_bytes,
             |  min(lower(hex(substr(text, 1, 4)::BLOB))) AS min_first4
             |FROM documents GROUP BY source ORDER BY source""".stripMargin),
      (s, dir) =>
        t(s, dir, "documents")
          .withColumn("payload", col("text").cast("binary"))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n"),
            sum(length(col("payload"))).as("sum_bytes"),
            min(lower(hex(substring(col("payload"), 1, 4)))).as("min_first4"))
          .orderBy("source")),

    // ---- content-defined chunking (CDC) --------------------------
    // Boundaries where the local 8-gram rolling hash % 64 == 0
    // (position-independent — the dedup re-sync property), long
    // chunks subdivided at 256 chars. Witness: per-doc chunk count,
    // exact hash-sum over chunk texts, min/max chunk length.
    // Dialect note: Spark sequence(a, b) inclusive == DuckDB
    // range(a, b+1) exclusive; both step maxLen for subdivision.
    Q("q108_cdc_chunks",
      Some(s"""WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents WHERE doc_id < 200),
              |kh AS (SELECT doc_id, text, n, CASE WHEN n >= 9
              |  THEN ${D.kgramHashes("text", 8)} ELSE []::BIGINT[] END AS h FROM t),
              |cuts AS (SELECT doc_id, text, n, list_concat(list_concat(
              |  [1], CASE WHEN n >= 9 THEN list_filter(range(2, n - 6), p -> h[p] % 64 = 0)
              |       ELSE []::BIGINT[] END), [n + 1]) AS c FROM kh),
              |st AS (SELECT doc_id, text, n, flatten(list_transform(range(1, len(c)),
              |  j -> range(c[j], c[j + 1], 256))) AS s FROM cuts WHERE n > 0),
              |ch AS (SELECT doc_id, unnest(list_transform(range(1, len(s) + 1), j -> {
              |  'ctext': substring(text, s[j]::INT, ((CASE WHEN j + 1 <= len(s)
              |     THEN s[j + 1] ELSE n + 1 END) - s[j])::INT),
              |  'clen': ((CASE WHEN j + 1 <= len(s) THEN s[j + 1] ELSE n + 1 END) - s[j])::BIGINT
              |  })) AS u FROM st)
              |SELECT doc_id, count(*) AS n_chunks,
              |  sum(${D.rollingHash("u.ctext")})::BIGINT AS hash_sum,
              |  min(u.clen) AS min_len, max(u.clen) AS max_len
              |FROM ch GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        import TextHash.{spark => H}
        TextOps.cdcChunks(t(s, dir, "documents").where(col("doc_id") < 200),
          "doc_id", "text", k = 8, mod = 64, maxLen = 256)
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_chunks"),
            sum(expr(H.rollingHash("chunk_text"))).as("hash_sum"),
            min(col("chunk_len")).as("min_len"),
            max(col("chunk_len")).as("max_len"))
          .orderBy("doc_id")
      }),

    // ---- BPE-ish pre-tokenizer counts ----------------------------
    // Word-salad text is planted with a contraction/number/punct tail
    // (identically in both engines) so the pre-tokenizer's
    // non-letter branches are exercised; n_bpeish vs the whitespace
    // n_ws gives the fertility signal.
    Q("q107_bpeish_tokens", {
      val pat = TextOps.BpeishTokenPattern.replace("'", "''")
      Some(s"""WITH p AS (SELECT doc_id,
              |  text || ' it''s 2024, costs $$12.50!' AS t2 FROM documents WHERE doc_id < 200)
              |SELECT doc_id, len(string_split(t2, ' '))::BIGINT AS n_ws,
              |  length(regexp_extract_all(t2, '$pat'))::BIGINT AS n_bpeish
              |FROM p ORDER BY doc_id""".stripMargin)
    },
      (s, dir) => {
        val planted = t(s, dir, "documents").where(col("doc_id") < 200)
          .withColumn("t2", concat(col("text"), lit(" it's 2024, costs $12.50!")))
        TextOps.withBpeishTokenCount(planted, "t2", "n_bpeish")
          .withColumn("n_ws", size(split(col("t2"), " ")).cast("bigint"))
          .select("doc_id", "n_ws", "n_bpeish")
          .orderBy("doc_id")
      }),

    // ---- token-distribution drift between corpus slices ----------
    // Which tokens does the English slice over/under-represent vs the
    // German slice: exact per-token counts in one shared shuffle,
    // drift = |relfreq_en - relfreq_de| (a fixed 3-op IEEE tree —
    // exactly-rounded in both engines, so hash-comparable), top-25
    // with token tiebreak.
    Q("q99_token_drift",
      Some(s"""WITH tk AS (SELECT lang AS g, unnest($duckToks) AS token
              |  FROM documents WHERE lang IN ('en', 'de')),
              |counts AS (SELECT token,
              |  sum(CASE WHEN g = 'en' THEN 1 ELSE 0 END)::BIGINT AS n_a,
              |  sum(CASE WHEN g = 'de' THEN 1 ELSE 0 END)::BIGINT AS n_b
              |  FROM tk GROUP BY token),
              |tot AS (SELECT
              |  sum(CASE WHEN g = 'en' THEN 1 ELSE 0 END)::BIGINT AS tot_a,
              |  sum(CASE WHEN g = 'de' THEN 1 ELSE 0 END)::BIGINT AS tot_b FROM tk)
              |SELECT token, n_a, n_b, abs(n_a / tot_a - n_b / tot_b) AS drift
              |FROM counts, tot
              |ORDER BY drift DESC, token LIMIT 25""".stripMargin),
      (s, dir) =>
        TextOps.tokenDrift(t(s, dir, "documents"), "text", "lang", "en", "de", k = 25)),

    // ---- PII detection + redaction -------------------------------
    // The corpus text is synthetic word-salad, so the witness plants
    // deterministic PII (an email, an IPv4, and an SSN-like id or a
    // phone, keyed off doc_id) IDENTICALLY in both engines, then runs
    // the sequential count-and-redact pipeline. The oracle's regex
    // text is interpolated from the same TextOps.PiiPatterns
    // constants the Spark side compiles — one source of truth, two
    // dialects (Java regex vs RE2 agree on this lookaround-free
    // subset; DuckDB needs the explicit 'g' flag Spark implies).
    Q("q97_pii_redact",
      Some {
        val stages = TextOps.PiiPatterns.zipWithIndex.map {
          case ((name, pat, repl), i) =>
            val src = if (i == 0) "p" else s"s${i - 1}"
            s"""s$i AS (SELECT *, length(regexp_extract_all(r$i, '$pat'))::BIGINT AS n_$name,
               |  regexp_replace(r$i, '$pat', '$repl', 'g') AS r${i + 1} FROM $src)""".stripMargin
        }
        val names = TextOps.PiiPatterns.map { case (n, _, _) => s"n_$n" }.mkString(", ")
        s"""WITH p AS (SELECT doc_id,
           |  text || ' user' || doc_id::VARCHAR || '@example.com 10.0.' ||
           |  (doc_id % 256)::VARCHAR || '.7 ' ||
           |  CASE WHEN doc_id % 3 = 0 THEN '+15550001234' ELSE '123-45-6789' END AS r0
           |  FROM documents WHERE doc_id < 100),
           |${stages.mkString(",\n")}
           |SELECT doc_id, $names, r${TextOps.PiiPatterns.size} AS redacted
           |FROM s${TextOps.PiiPatterns.size - 1} ORDER BY doc_id""".stripMargin
      },
      (s, dir) => {
        val docs = t(s, dir, "documents").where(col("doc_id") < 100)
        val planted = docs.withColumn("__pii", concat(
          col("text"), lit(" user"), col("doc_id").cast("string"),
          lit("@example.com 10.0."), (col("doc_id") % 256).cast("string"), lit(".7 "),
          when(col("doc_id") % 3 === 0, lit("+15550001234")).otherwise(lit("123-45-6789"))))
        val redacted = TextOps.redactPii(planted, "__pii", "redacted")
        val counts = TextOps.PiiPatterns.map { case (n, _, _) => col(s"n_$n") }
        redacted.select(col("doc_id") +: counts :+ col("redacted"): _*)
          .orderBy("doc_id")
      }),

    // ---- Unicode script mix --------------------------------------
    // Testdata text is ASCII word-salad, so Cyrillic documents are
    // PLANTED deterministically (every 97th doc replaced wholesale —
    // q97 planting pattern); the script profiler then routes each doc
    // by pinned-priority dominant script and the per-script census is
    // hash-checked. Length-difference counts over portable character
    // classes; per-row only, zero shuffles before the final census.
    Q("q206_script_mix",
      Some("""WITH p AS (SELECT doc_id,
             |  CASE WHEN doc_id % 97 = 0
             |    THEN 'привет мир документ ' || doc_id
             |    ELSE text END AS t FROM documents),
             |m AS (SELECT doc_id,
             |  (length(t) - length(regexp_replace(t, '[a-zA-Z]', '', 'g')))::BIGINT AS n_latin,
             |  (length(t) - length(regexp_replace(t, '[а-яА-Я]', '', 'g')))::BIGINT AS n_cyrillic,
             |  (length(t) - length(regexp_replace(t, '[0-9]', '', 'g')))::BIGINT AS n_digit
             |  FROM p),
             |d AS (SELECT *, CASE
             |    WHEN n_latin >= n_cyrillic AND n_latin >= n_digit THEN 'latin'
             |    WHEN n_cyrillic >= n_digit THEN 'cyrillic'
             |    ELSE 'digit' END AS dominant_script FROM m)
             |SELECT dominant_script, count(*)::BIGINT AS n_docs,
             |  sum(n_latin)::BIGINT AS sum_latin,
             |  sum(n_cyrillic)::BIGINT AS sum_cyrillic,
             |  sum(n_digit)::BIGINT AS sum_digit
             |FROM d GROUP BY dominant_script ORDER BY dominant_script""".stripMargin),
      (s, dir) => {
        val planted = t(s, dir, "documents").select(col("doc_id"),
          when(col("doc_id") % 97 === 0,
            concat(lit("привет мир документ "), col("doc_id").cast("string")))
            .otherwise(col("text")).as("t"))
        TextOps.withScriptMix(planted, "t")
          .groupBy(col("dominant_script"))
          .agg(count(lit(1)).cast("bigint").as("n_docs"),
            sum(col("n_latin")).cast("bigint").as("sum_latin"),
            sum(col("n_cyrillic")).cast("bigint").as("sum_cyrillic"),
            sum(col("n_digit")).cast("bigint").as("sum_digit"))
          .orderBy("dominant_script")
      }),

    // ---- homoglyph folding (confusable de-spoofing) --------------
    // Both engines SPOOF every 13th doc (Latin→Cyrillic confusables
    // via translate), FOLD with the shared homoglyph map, and count
    // round-trips back to the honest text plus Cyrillic mass before/
    // after — a wrong or incomplete map breaks the census, not a
    // tautology. translate is a single-pass char map in both engines.
    Q("q237_homoglyph_fold", {
      val from = graft.operators.TextOps.HomoglyphFrom
      val to = graft.operators.TextOps.HomoglyphTo
      Some(s"""WITH p AS (SELECT source, text,
              |  CASE WHEN doc_id % 13 = 0
              |    THEN translate(text, 'aeopcxy', 'аеорсху') ELSE text END AS spoofed,
              |  doc_id % 13 = 0 AS is_spoofed FROM documents),
              |f AS (SELECT source, text, spoofed, is_spoofed,
              |  translate(spoofed, '$from', '$to') AS folded FROM p)
              |SELECT source, count(*)::BIGINT AS n_docs,
              |  sum(CASE WHEN is_spoofed THEN 1 ELSE 0 END)::BIGINT AS n_spoofed,
              |  sum(CASE WHEN folded = text THEN 1 ELSE 0 END)::BIGINT AS n_roundtrip,
              |  sum(length(spoofed) - length(regexp_replace(spoofed, '[а-яА-Я]', '', 'g')))::BIGINT AS cyr_before,
              |  sum(length(folded) - length(regexp_replace(folded, '[а-яА-Я]', '', 'g')))::BIGINT AS cyr_after
              |FROM f GROUP BY source ORDER BY source""".stripMargin)
    },
      (s, dir) => {
        val planted = t(s, dir, "documents").select(
          col("source"), col("text"),
          when(col("doc_id") % 13 === 0,
            translate(col("text"), "aeopcxy", "аеорсху"))
            .otherwise(col("text")).as("spoofed"),
          (col("doc_id") % 13 === 0).as("is_spoofed"))
        def cyr(c: String) =
          (length(col(c)) - length(regexp_replace(col(c), "[а-яА-Я]", "")))
            .cast("bigint")
        graft.operators.TextOps.foldHomoglyphs(planted, "spoofed", "folded")
          .groupBy(col("source"))
          .agg(count(lit(1)).cast("bigint").as("n_docs"),
            sum(when(col("is_spoofed"), 1L).otherwise(0L)).cast("bigint")
              .as("n_spoofed"),
            sum(when(col("folded") === col("text"), 1L).otherwise(0L))
              .cast("bigint").as("n_roundtrip"),
            sum(cyr("spoofed")).as("cyr_before"),
            sum(cyr("folded")).as("cyr_after"))
          .orderBy("source")
      }),

    // ---- DSIR importance weights ---------------------------------
    // Data selection via importance resampling (Xie et al. 2023):
    // hashed unigram+bigram buckets, target = English documents,
    // raw = the whole pool; per-doc score from the integer-log2
    // (bit-length) surrogate so both engines agree bitwise. Top 20
    // most-target-like docs by (score, id).
    Q("q218_dsir_importance",
      Some {
        val uni = s"list_transform(t, tk -> ${D.rollingHash("tk")})"
        val big = "list_transform(range(1, len(t)), " +
          s"bi -> ${D.rollingHash("(t[bi] || ' ' || t[bi + 1])")})"
        s"""WITH d AS (SELECT doc_id, lang = 'en' AS tgt,
           |  ${D.tokens("text")} AS t FROM documents),
           |g AS (SELECT doc_id, tgt, list_concat($uni, $big) AS hs FROM d),
           |f AS (SELECT doc_id, tgt, unnest(hs) % 512 AS b FROM g),
           |dc AS (SELECT doc_id, tgt, b, count(*)::BIGINT AS c
           |  FROM f GROUP BY 1, 2, 3),
           |bs AS (SELECT b, sum(c)::BIGINT AS cq,
           |  sum(CASE WHEN tgt THEN c ELSE 0 END)::BIGINT AS cp
           |  FROM dc GROUP BY b),
           |tot AS (SELECT sum(cq)::BIGINT AS nq, sum(cp)::BIGINT AS np FROM bs),
           |dim AS (SELECT b, length(bin(cp + 1)) - length(bin(cq + 1))
           |    + length(bin(nq + 512)) - length(bin(np + 512)) AS w
           |  FROM bs CROSS JOIN tot),
           |sc AS (SELECT dc.doc_id, sum(dc.c * dim.w)::BIGINT AS iw_score,
           |    sum(dc.c)::BIGINT AS n_feats
           |  FROM dc JOIN dim USING (b) GROUP BY dc.doc_id),
           |top AS (SELECT doc_id, iw_score, n_feats FROM sc
           |  ORDER BY iw_score DESC, doc_id LIMIT 20)
           |SELECT top.doc_id, documents.source, iw_score, n_feats
           |FROM top JOIN documents USING (doc_id)
           |ORDER BY iw_score DESC, doc_id""".stripMargin
      },
      (s, dir) => {
        val docs = tp(s, dir, "documents", "doc_id")
          .withColumn("is_tgt", col("lang") === "en")
        broadcast(graft.operators.Mixing
          .dsirWeights(docs, "doc_id", "text", "is_tgt", buckets = 512)
          .orderBy(col("iw_score").desc, col("doc_id")).limit(20))
          // narrow two-column lookup for the 20 survivors: plain `t`
          // scan (no repartition — `tp` would drag the wide text
          // column through an exchange), with the 20-row side pinned
          // broadcast so the probe never shuffles documents at all
          .join(t(s, dir, "documents").select(col("doc_id"), col("source")),
            Seq("doc_id"))
          .select(col("doc_id"), col("source"), col("iw_score"), col("n_feats"))
          .orderBy(col("iw_score").desc, col("doc_id"))
      }),

    // ---- MinHash detector calibration ----------------------------
    // Reliability diagram of the 8-component estimator: candidate
    // pairs binned by matched-component count, each bin scored
    // against exact Jaccard >= 1/2 (integer cross-compare). Inner-
    // join pair-stats semantics (zero-common pairs absent), matching
    // the operator.
    Q("q219_minhash_calibration",
      Some {
        val matched = (0 until 8)
          .map(i => s"(CASE WHEN x.m$i = y.m$i THEN 1 ELSE 0 END)")
          .mkString(" + ")
        s"""$sigCte,
           |$candCtes,
           |m AS (SELECT p.a_id, p.b_id, $matched AS n_matched
           |  FROM pairs p JOIN sig x ON x.doc_id = p.a_id
           |  JOIN sig y ON y.doc_id = p.b_id),
           |v AS (SELECT m.n_matched, c.n_common AS nc, sa.n_sh AS na,
           |    sb.n_sh AS nb
           |  FROM m JOIN common c ON c.a_id = m.a_id AND c.b_id = m.b_id
           |  JOIN sizes sa ON sa.doc_id = m.a_id
           |  JOIN sizes sb ON sb.doc_id = m.b_id),
           |agg AS (SELECT n_matched, count(*)::BIGINT AS n_pairs,
           |    sum(CASE WHEN 2 * nc >= na + nb - nc THEN 1 ELSE 0 END)::BIGINT AS n_true
           |  FROM v GROUP BY n_matched)
           |SELECT n_matched, n_pairs, n_true,
           |  ((1000000 * n_true) // n_pairs)::BIGINT AS precision_ppm
           |FROM agg ORDER BY n_matched""".stripMargin
      },
      (s, dir) =>
        DedupOps.minhashCalibration(tp(s, dir, "documents", "doc_id"), "doc_id", "text",
          bands = 2, rowsPerBand = 4, tNum = 1, tDen = 2)),

    // ---- MaxScore-pruned BM25 top-k ------------------------------
    // The oracle is the UNPRUNED ranking (q75 shape) — equality IS
    // the witness that upper-bound pruning is exact. Query mixes one
    // low-idf common term ('the') with rarer terms so the prune path
    // actually fires (see the ScaleShapeSpec witness).
    Q("q220_bm25_pruned_topk", {
      val (k1, b) = (1.2, 0.75)
      val (k1p1, oneMinusB) = (k1 + 1.0, 1.0 - b)
      Some(s"""WITH toks AS (SELECT doc_id, $duckToks AS t FROM documents),
              |lens AS (SELECT doc_id, len(t)::BIGINT AS dl FROM toks),
              |stats AS (SELECT count(*)::BIGINT AS nn, sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl FROM lens),
              |tfx AS (SELECT doc_id, unnest(t) AS token FROM toks),
              |tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf FROM tfx
              |  WHERE token IN ('the', 'merge', 'window', 'dup') GROUP BY doc_id, token),
              |dfreq AS (SELECT token, count(*)::BIGINT AS dfreq FROM tf GROUP BY token),
              |ts AS (SELECT tf.doc_id, tf.token,
              |  ((nn::DOUBLE - dfreq::DOUBLE + 0.5) / (dfreq::DOUBLE + 0.5)) *
              |  (tf::DOUBLE * $k1p1) / (tf::DOUBLE + $k1 * ($oneMinusB + $b * lens.dl::DOUBLE / avgdl)) AS s
              |  FROM tf JOIN dfreq USING (token) CROSS JOIN stats
              |  JOIN lens ON lens.doc_id = tf.doc_id),
              |piv AS (SELECT doc_id,
              |  max(CASE WHEN token = 'the' THEN s END) AS s0,
              |  max(CASE WHEN token = 'merge' THEN s END) AS s1,
              |  max(CASE WHEN token = 'window' THEN s END) AS s2,
              |  max(CASE WHEN token = 'dup' THEN s END) AS s3
              |  FROM ts GROUP BY doc_id),
              |sc AS (SELECT lens.doc_id, lens.dl,
              |  coalesce(s0, 0.0) + coalesce(s1, 0.0) + coalesce(s2, 0.0) + coalesce(s3, 0.0) AS score
              |  FROM lens LEFT JOIN piv ON piv.doc_id = lens.doc_id)
              |SELECT doc_id, dl, score FROM sc
              |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin)
    },
      (s, dir) =>
        graft.operators.Relevance.bm25TopK(
          tp(s, dir, "documents", "doc_id"), "doc_id", "text",
          queryTokens = Seq("the", "merge", "window", "dup"), k = 15)),

    // ---- BPE merge application -----------------------------------
    // A pinned ordered merge table applied to every token via the
    // wrapped-piece string encoding ("<t><h><e>" --replace-->
    // "<th><e>" → "<the>"); later merges compose with earlier ones
    // (('t','h') then ('th','e')). Census: top-20 BPE pieces by
    // corpus count — hash-exact across engines because replace()
    // scans left-to-right non-overlapping in both.
    Q("q221_bpe_apply", {
      val merges = Seq("t" -> "h", "th" -> "e", "a" -> "t", "e" -> "r",
        "o" -> "r", "a" -> "n")
      Some {
        val seg0 = "CASE WHEN length(w) = 0 THEN '' ELSE " +
          "list_reduce(list_prepend('', list_transform(range(1, length(w) + 1), " +
          "i -> '<' || substr(w, i, 1) || '>')), (acc, ch) -> acc || ch) END"
        val mergedCtes = merges.zipWithIndex.map { case ((a, b), i) =>
          val src = if (i == 0) "seg" else s"m$i"
          s"m${i + 1} AS (SELECT doc_id, list_transform(s, g -> " +
            s"replace(g, '<$a><$b>', '<$a$b>')) AS s FROM $src)"
        }
        s"""WITH toks AS (SELECT doc_id, ${D.tokens("text")} AS t FROM documents),
           |seg AS (SELECT doc_id, list_transform(t, w -> $seg0) AS s FROM toks),
           |${mergedCtes.mkString(",\n")},
           |fl AS (SELECT doc_id, unnest(s) AS g FROM m${merges.size}),
           |p AS (SELECT doc_id, unnest(list_filter(
           |    string_split(substr(g, 2, greatest(length(g) - 2, 0)), '><'),
           |    x -> x <> '')) AS piece FROM fl)
           |SELECT piece, count(*)::BIGINT AS n FROM p
           |GROUP BY piece ORDER BY n DESC, piece LIMIT 20""".stripMargin
      }
    },
      (s, dir) =>
        TextOps.applyBpeMerges(tp(s, dir, "documents", "doc_id"), "text",
          Seq("t" -> "h", "th" -> "e", "a" -> "t", "e" -> "r",
            "o" -> "r", "a" -> "n"), out = "pieces")
          .select(explode(col("pieces")).as("piece"))
          .groupBy(col("piece")).agg(count(lit(1)).cast("bigint").as("n"))
          .orderBy(col("n").desc, col("piece")).limit(20)),

    // ---- URL decomposition + registered-domain census ------------
    // Testdata has no URL column, so URLs are PLANTED from doc_id
    // (q97 planting pattern) — ports, userinfo, query strings, and a
    // malformed every-11th row exercise each regex branch; the
    // census is the C4-style domain-level view a blocklist joins
    // against.
    Q("q223_url_census",
      Some("""WITH p AS (SELECT doc_id,
             |  CASE WHEN doc_id % 11 = 0 THEN 'not a url at all'
             |    ELSE 'https://' ||
             |      CASE WHEN doc_id % 5 = 0 THEN 'user:pw@' ELSE '' END ||
             |      'w' || (doc_id % 7)::VARCHAR || '.site' ||
             |      (doc_id % 13)::VARCHAR || '.' ||
             |      CASE WHEN doc_id % 3 = 0 THEN 'com'
             |        WHEN doc_id % 3 = 1 THEN 'org' ELSE 'net' END ||
             |      CASE WHEN doc_id % 4 = 0 THEN ':8443' ELSE '' END ||
             |      '/p/' || doc_id::VARCHAR ||
             |      CASE WHEN doc_id % 2 = 0 THEN '?q=1' ELSE '' END
             |  END AS url FROM documents),
             |u AS (SELECT doc_id,
             |  regexp_extract(url, '^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)', 1) AS url_host,
             |  regexp_extract(url, '^([a-z][a-z0-9+.-]*)://', 1) AS url_scheme
             |  FROM p),
             |d AS (SELECT doc_id, url_scheme,
             |  CASE WHEN regexp_extract(url_host, '([a-z0-9-]+\.[a-z0-9-]+)$', 1) = ''
             |    THEN url_host
             |    ELSE regexp_extract(url_host, '([a-z0-9-]+\.[a-z0-9-]+)$', 1) END AS url_domain,
             |  regexp_extract(url_host, '\.([a-z0-9-]+)$', 1) AS url_tld
             |  FROM u)
             |SELECT url_domain, url_tld, count(*)::BIGINT AS n_docs,
             |  sum(doc_id)::BIGINT AS sum_ids,
             |  sum(CASE WHEN url_scheme = 'https' THEN 1 ELSE 0 END)::BIGINT AS n_https
             |FROM d GROUP BY url_domain, url_tld
             |ORDER BY url_domain, url_tld""".stripMargin),
      (s, dir) => {
        val planted = t(s, dir, "documents").select(col("doc_id"),
          when(col("doc_id") % 11 === 0, lit("not a url at all"))
            .otherwise(concat(lit("https://"),
              when(col("doc_id") % 5 === 0, lit("user:pw@")).otherwise(lit("")),
              lit("w"), (col("doc_id") % 7).cast("string"),
              lit(".site"), (col("doc_id") % 13).cast("string"), lit("."),
              when(col("doc_id") % 3 === 0, lit("com"))
                .when(col("doc_id") % 3 === 1, lit("org")).otherwise(lit("net")),
              when(col("doc_id") % 4 === 0, lit(":8443")).otherwise(lit("")),
              lit("/p/"), col("doc_id").cast("string"),
              when(col("doc_id") % 2 === 0, lit("?q=1")).otherwise(lit(""))))
            .as("url"))
        TextOps.withUrlParts(planted, "url")
          .groupBy(col("url_domain"), col("url_tld"))
          .agg(count(lit(1)).cast("bigint").as("n_docs"),
            sum(col("doc_id")).cast("bigint").as("sum_ids"),
            sum(when(col("url_scheme") === "https", 1L).otherwise(0L))
              .cast("bigint").as("n_https"))
          .orderBy("url_domain", "url_tld")
      }),

    // ---- per-source epoch replay ---------------------------------
    // The "wiki x 3.3 epochs" recipe materialized: recipe rates are
    // derived from the source-name hash (500..3400 permille), so the
    // census exercises 0-copy drops, multi-epoch replication, AND
    // the fractional content-hash extra copy.
    Q("q224_replay_epochs",
      Some(s"""WITH r AS (SELECT source,
              |  500 + (${D.rollingHash("source")} % 30) * 100 AS ep
              |  FROM (SELECT DISTINCT source FROM documents)),
              |j AS (SELECT d.doc_id, d.source, d.text, r.ep
              |  FROM documents d JOIN r USING (source)),
              |c AS (SELECT doc_id, source, ep // 1000 +
              |  CASE WHEN ${D.rollingHash("text")} % 1000 < ep % 1000
              |    THEN 1 ELSE 0 END AS copies FROM j),
              |e AS (SELECT doc_id, source, unnest(range(0, copies)) AS copy FROM c)
              |SELECT source, count(*)::BIGINT AS n_copies,
              |  count(DISTINCT doc_id)::BIGINT AS n_docs,
              |  sum(doc_id)::BIGINT AS sum_ids, max(copy)::INT AS max_copy
              |FROM e GROUP BY source ORDER BY source""".stripMargin),
      (s, dir) => {
        import TextHash.{spark => H}
        val docs = t(s, dir, "documents")
        val recipe = docs.select(col("source")).distinct()
          .withColumn("epochs_permille",
            lit(500L) + (expr(H.rollingHash("source")) % 30) * 100L)
        graft.operators.Mixing.replayEpochs(docs, "text", "source", recipe)
          .groupBy(col("source"))
          .agg(count(lit(1)).cast("bigint").as("n_copies"),
            countDistinct(col("doc_id")).cast("bigint").as("n_docs"),
            sum(col("doc_id")).cast("bigint").as("sum_ids"),
            max(col("copy")).cast("int").as("max_copy"))
          .orderBy("source")
      }),

    // ---- contrastive pair mining ---------------------------------
    // Positives: verified Jaccard >= 1/2. Hard negatives: band
    // collisions that verify <= 1/5 — lexically confusable
    // non-duplicates. The ambiguous middle is dropped. Integer
    // cross-product compares; inner-join pair-stats semantics.
    Q("q225_contrastive_pairs",
      Some(s"""$sigCte,
              |$candCtes,
              |v AS (SELECT c.a_id, c.b_id, c.n_common,
              |    sa.n_sh AS n_a, sb.n_sh AS n_b
              |  FROM common c JOIN sizes sa ON sa.doc_id = c.a_id
              |  JOIN sizes sb ON sb.doc_id = c.b_id),
              |l AS (SELECT a_id, b_id, n_common, n_a, n_b,
              |  CASE WHEN n_common * 2 >= (n_a + n_b - n_common) * 1 THEN 'pos'
              |    WHEN n_common * 5 <= (n_a + n_b - n_common) * 1 THEN 'neg'
              |  END AS label FROM v)
              |SELECT a_id, b_id, n_common::BIGINT AS n_common,
              |  n_a::BIGINT AS n_a, n_b::BIGINT AS n_b, label
              |FROM l WHERE label IS NOT NULL ORDER BY a_id, b_id""".stripMargin),
      (s, dir) =>
        DedupOps.contrastivePairs(tp(s, dir, "documents", "doc_id"), "doc_id", "text",
          bands = 2, rowsPerBand = 4,
          posNum = 1, posDen = 2, negNum = 1, negDen = 5)),

    // ---- drop-contained curation verb ----------------------------
    // The removal action for q89's containment detector: a doc whose
    // shingle set is >= 2/3 inside a candidate partner's AND is the
    // smaller side (equal sizes keep the smaller id) is dropped —
    // independent greedy drops, chains keep only the maximal doc.
    // Per-source survivor census; integer cross-compares throughout.
    Q("q236_drop_contained",
      Some(s"""$sigCte,
              |$candCtes,
              |v AS (SELECT c.a_id, c.b_id, c.n_common,
              |    sa.n_sh AS n_a, sb.n_sh AS n_b
              |  FROM common c JOIN sizes sa ON sa.doc_id = c.a_id
              |  JOIN sizes sb ON sb.doc_id = c.b_id),
              |drops AS (
              |  SELECT a_id AS drop_id FROM v
              |  WHERE n_common * 3 >= n_a * 2
              |    AND (n_a < n_b OR (n_a = n_b AND a_id > b_id))
              |  UNION
              |  SELECT b_id FROM v
              |  WHERE n_common * 3 >= n_b * 2
              |    AND (n_b < n_a OR (n_a = n_b AND b_id > a_id)))
              |SELECT d.source, count(*)::BIGINT AS n_docs,
              |  sum(CASE WHEN dr.drop_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_kept,
              |  sum(CASE WHEN dr.drop_id IS NULL THEN d.doc_id ELSE 0 END)::BIGINT AS sum_kept_ids
              |FROM documents d LEFT JOIN drops dr ON dr.drop_id = d.doc_id
              |GROUP BY d.source ORDER BY d.source""".stripMargin),
      (s, dir) => {
        val docs = tp(s, dir, "documents", "doc_id")
        val keptAgg = DedupOps.dropContained(docs, "doc_id", "text",
          bands = 2, rowsPerBand = 4, cNum = 2, cDen = 3)
          .groupBy(col("source"))
          .agg(count(lit(1)).cast("bigint").as("n_kept"),
            sum(col("doc_id")).cast("bigint").as("sum_kept_ids"))
        docs.groupBy(col("source"))
          .agg(count(lit(1)).cast("bigint").as("n_docs"))
          .join(keptAgg, Seq("source"), "left")
          .na.fill(0L, Seq("n_kept", "sum_kept_ids"))
          .orderBy("source")
      }),

    // ---- ROUGE-2 reference overlap -------------------------------
    // Clipped bigram-multiset precision/recall/F1 (Lin 2004) of each
    // doc against its source's next doc — exact integer overlap
    // counts, single IEEE divisions; the planted near-dup pairs
    // surface as the high-F1 tail.
    Q("q233_rouge_overlap",
      Some("""WITH o AS (SELECT source, doc_id, text,
             |  lead(text) OVER (PARTITION BY source ORDER BY doc_id) AS ref
             |  FROM documents),
             |p AS (SELECT source, doc_id, text, ref FROM o WHERE ref IS NOT NULL),
             |g AS (SELECT source, doc_id,
             |  CASE WHEN len(string_split(text, ' ')) >= 2
             |    THEN list_transform(range(1, len(string_split(text, ' '))),
             |      i -> array_to_string(list_slice(string_split(text, ' '), i, i + 1), ' '))
             |    ELSE [] END AS cg,
             |  CASE WHEN len(string_split(ref, ' ')) >= 2
             |    THEN list_transform(range(1, len(string_split(ref, ' '))),
             |      i -> array_to_string(list_slice(string_split(ref, ' '), i, i + 1), ' '))
             |    ELSE [] END AS rg FROM p),
             |x AS (SELECT source, doc_id,
             |  list_reduce(list_prepend(0::BIGINT,
             |    list_transform(list_distinct(cg), gr ->
             |      least(len(list_filter(cg, z -> z = gr)),
             |            len(list_filter(rg, z -> z = gr)))::BIGINT)),
             |    (a, b) -> a + b) AS n_overlap,
             |  len(cg)::BIGINT AS n_cand, len(rg)::BIGINT AS n_ref FROM g)
             |SELECT source, doc_id, n_overlap, n_cand, n_ref,
             |  CASE WHEN n_cand > 0 THEN n_overlap::DOUBLE / n_cand END AS rouge_p,
             |  CASE WHEN n_ref > 0 THEN n_overlap::DOUBLE / n_ref END AS rouge_r,
             |  CASE WHEN n_cand + n_ref > 0
             |    THEN (2.0::DOUBLE * n_overlap) / (n_cand + n_ref) END AS rouge_f1
             |FROM x ORDER BY source, doc_id""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        val pairs = t(s, dir, "documents")
          .withColumn("ref", lead(col("text"), 1).over(w))
          .where(col("ref").isNotNull)
        graft.operators.Scoring.withRougeN(pairs, "text", "ref", n = 2)
          .select(col("source"), col("doc_id"), col("n_overlap"),
            col("n_cand"), col("n_ref"), col("rouge_p"), col("rouge_r"),
            col("rouge_f1"))
          .orderBy("source", "doc_id")
      }),

    // ---- deterministic weighted priority sample ------------------
    // Global bottom-100 by the integer surrogate priority
    // floor(u(text)·10^6 / w), w = length-derived weight — the
    // exact-arithmetic A-ES stand-in (longer docs proportionally
    // likelier, selection reproducible and engine-portable).
    // TakeOrderedAndProject on Spark's side, never a full sort.
    Q("q227_priority_sample", {
      import TextHash.{duck => D}
      val u = D.seeded(D.rollingHash("text"), 179424673L, 961748941L)
      Some(s"""WITH d AS (SELECT doc_id, source, text,
              |  greatest(1, n_chars // 100) AS w FROM documents),
              |p AS (SELECT doc_id, source, w,
              |  (($u) * 1000000) // w AS priority FROM d)
              |SELECT doc_id, source, w::BIGINT AS w, priority::BIGINT AS priority
              |FROM p ORDER BY priority, doc_id LIMIT 100""".stripMargin)
    },
      (s, dir) =>
        graft.operators.Mixing.prioritySample(
          t(s, dir, "documents")
            .withColumn("w", expr("greatest(1L, n_chars div 100L)")),
          "doc_id", "text", "w", k = 100)
          .select(col("doc_id"), col("source"), col("w"), col("priority"))
          .orderBy("priority", "doc_id")),

    // ---- BPE tokenizer training (greedy merge loop) --------------
    // Six rounds of the Sennrich trainer over the corpus vocabulary:
    // per round, the occurrence-weighted most frequent adjacent piece
    // pair (ties on pair lexical order) fuses everywhere via the
    // wrapped-piece replace algebra q221 applies. The oracle unrolls
    // the same six rounds as staged CTEs — each stage's 1-row argmax
    // cross-joins into the next re-segmentation, so both engines walk
    // the identical greedy path or hash-mismatch.
    Q("q229_bpe_train", {
      val n = 6
      val pcs = "list_filter(string_split(substr(seg, 2, length(seg) - 2), '><'), p -> p != '')"
      val stages = (1 to n).map { r =>
        s"""c$r AS (SELECT n, $pcs AS pcs FROM s${r - 1} WHERE length(seg) >= 6),
           |x$r AS (SELECT unnest(list_transform(range(1, len(pcs)),
           |    i -> {'a': pcs[i], 'b': pcs[i + 1]})) AS pr, n
           |  FROM c$r WHERE len(pcs) >= 2),
           |p$r AS (SELECT pr.a AS a, pr.b AS b, sum(n)::BIGINT AS pn
           |  FROM x$r GROUP BY 1, 2),
           |b$r AS (SELECT a, b, pn FROM p$r ORDER BY pn DESC, a, b LIMIT 1),
           |s$r AS (SELECT s.w, s.n, coalesce(replace(s.seg,
           |    '<' || b.a || '><' || b.b || '>',
           |    '<' || b.a || b.b || '>'), s.seg) AS seg
           |  FROM s${r - 1} s LEFT JOIN b$r b ON true)""".stripMargin
      }.mkString(",\n")
      val ranks = (1 to n).map(r =>
        s"SELECT $r AS rank, a AS piece_a, b AS piece_b, pn AS n FROM b$r")
        .mkString("\nUNION ALL ")
      Some(s"""WITH wd AS (SELECT unnest($duckToks) AS w FROM documents),
              |wc AS (SELECT w, count(*)::BIGINT AS n FROM wd GROUP BY w),
              |s0 AS (SELECT w, n, CASE WHEN length(w) = 0 THEN '' ELSE
              |  array_to_string(list_transform(range(1, length(w) + 1),
              |    i -> '<' || substr(w, i, 1) || '>'), '') END AS seg FROM wc),
              |$stages
              |SELECT * FROM ($ranks) ORDER BY rank""".stripMargin)
    },
      (s, dir) =>
        graft.operators.TextOps.trainBpe(tp(s, dir, "documents", "doc_id"), "text", 6)),

    // ---- tokenizer fertility (train -> apply, end to end) --------
    // The composition witness: LEARN 6 merges on the corpus (q229's
    // greedy path), APPLY them (q221's algebra), and report pieces
    // per token per source in exact ppm — the metric a tokenizer
    // owner actually tracks. The oracle re-derives the same merges
    // (staged CTEs) and applies them on the VOCAB segmentation, then
    // joins word frequencies back per source — algebraically the
    // same total as Spark's per-document apply.
    Q("q235_bpe_fertility", {
      val n = 6
      val pcs = "list_filter(string_split(substr(seg, 2, length(seg) - 2), '><'), p -> p != '')"
      val stages = (1 to n).map { r =>
        s"""c$r AS (SELECT n, $pcs AS pcs FROM s${r - 1} WHERE length(seg) >= 6),
           |x$r AS (SELECT unnest(list_transform(range(1, len(pcs)),
           |    i -> {'a': pcs[i], 'b': pcs[i + 1]})) AS pr, n
           |  FROM c$r WHERE len(pcs) >= 2),
           |p$r AS (SELECT pr.a AS a, pr.b AS b, sum(n)::BIGINT AS pn
           |  FROM x$r GROUP BY 1, 2),
           |b$r AS (SELECT a, b, pn FROM p$r ORDER BY pn DESC, a, b LIMIT 1),
           |s$r AS (SELECT s.w, s.n, coalesce(replace(s.seg,
           |    '<' || b.a || '><' || b.b || '>',
           |    '<' || b.a || b.b || '>'), s.seg) AS seg
           |  FROM s${r - 1} s LEFT JOIN b$r b ON true)""".stripMargin
      }.mkString(",\n")
      Some(s"""WITH wd AS (SELECT source, unnest($duckToks) AS w FROM documents),
              |wcs AS (SELECT source, w, count(*)::BIGINT AS n FROM wd GROUP BY 1, 2),
              |wc AS (SELECT w, sum(n)::BIGINT AS n FROM wcs GROUP BY w),
              |s0 AS (SELECT w, n, CASE WHEN length(w) = 0 THEN '' ELSE
              |  array_to_string(list_transform(range(1, length(w) + 1),
              |    i -> '<' || substr(w, i, 1) || '>'), '') END AS seg FROM wc),
              |$stages,
              |f AS (SELECT w, CASE WHEN length(seg) = 0 THEN 0
              |    ELSE len($pcs) END::BIGINT AS n_pieces FROM s$n)
              |SELECT wcs.source, sum(wcs.n)::BIGINT AS total_tokens,
              |  sum(wcs.n * f.n_pieces)::BIGINT AS total_pieces,
              |  (1000000 * sum(wcs.n * f.n_pieces) // sum(wcs.n))::BIGINT AS fertility_ppm
              |FROM wcs JOIN f USING (w)
              |GROUP BY wcs.source ORDER BY wcs.source""".stripMargin)
    },
      (s, dir) => {
        val docs = tp(s, dir, "documents", "doc_id")
        val learned = graft.operators.TextOps.trainBpe(docs, "text", 6)
          .collect().map(r => (r.getString(1), r.getString(2))).toSeq
        graft.operators.TextOps
          .applyBpeMerges(docs.select(col("source"), col("text")), "text", learned)
          .select(col("source"),
            size(split(col("text"), " ")).cast("long").as("__nt"),
            size(col("pieces")).cast("long").as("__np"))
          .groupBy(col("source"))
          .agg(sum(col("__nt")).cast("bigint").as("total_tokens"),
            sum(col("__np")).cast("bigint").as("total_pieces"))
          .withColumn("fertility_ppm",
            expr("1000000L * total_pieces div total_tokens"))
          .orderBy("source")
      }),

    // ---- markup strip (WET extraction) ---------------------------
    // Both engines wrap every doc in deterministic HTML (entity-
    // escaping the text), strip it with the identical tag/entity/
    // whitespace chain, and count round-trips back to the
    // whitespace-normalized original — n_roundtrip == n_docs is the
    // strip operator's correctness witness, not a tautology: a wrong
    // decode order or greedy tag regex breaks it.
    Q("q230_strip_markup",
      Some("""WITH h AS (SELECT source, text,
             |  '<div class="' || source || '"><p>  ' ||
             |  replace(replace(text, '&', '&amp;'), '<', '&lt;') ||
             |  '  </p><br/></div>' AS html FROM documents),
             |c AS (SELECT source, text, html,
             |  trim(regexp_replace(
             |    replace(replace(replace(replace(replace(replace(
             |      regexp_replace(html, '<[^>]*>', ' ', 'g'),
             |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
             |      '&#39;', ''''), '&apos;', ''''), '&amp;', '&'),
             |    '\s+', ' ', 'g')) AS clean FROM h)
             |SELECT source, count(*)::BIGINT AS n_docs,
             |  sum(CASE WHEN clean = trim(regexp_replace(text, '\s+', ' ', 'g'))
             |    THEN 1 ELSE 0 END)::BIGINT AS n_roundtrip,
             |  sum(length(html))::BIGINT AS sum_html_chars,
             |  sum(length(clean))::BIGINT AS sum_clean_chars
             |FROM c GROUP BY source ORDER BY source""".stripMargin),
      (s, dir) => {
        val wrapped = t(s, dir, "documents")
          .withColumn("html", expr(
            """concat('<div class="', source, '"><p>  ',
              |  replace(replace(text, '&', '&amp;'), '<', '&lt;'),
              |  '  </p><br/></div>')""".stripMargin))
        graft.operators.TextOps.stripMarkup(wrapped, "html", "clean")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("clean") ===
              expr("trim(regexp_replace(text, '\\\\s+', ' '))"), 1L)
              .otherwise(0L)).as("n_roundtrip"),
            sum(length(col("html"))).cast("bigint").as("sum_html_chars"),
            sum(length(col("clean"))).cast("bigint").as("sum_clean_chars"))
          .orderBy("source")
      }),

    // ---- CMS sketch rollup (merge == rebuild) --------------------
    // The 100 TB sketch pattern: build one CMS per source (map-side,
    // data-local), answer corpus-wide frequency questions by MERGING
    // the kilobyte sketches — never re-scanning the corpus. CMS
    // counters sum exactly, so merged estimates must EQUAL the
    // direct corpus sketch's, and both sit in [exact, exact+ceil(
    // eps*N)] at the pinned seed (q45 bounds pattern).
    Q("q231_cms_rollup",
      Some("""WITH b AS (SELECT n_chars // 100 AS bucket FROM documents),
             |c AS (SELECT bucket, count(*)::BIGINT AS exact_n FROM b GROUP BY bucket),
             |p AS (SELECT unnest(range(0, 6)) AS bucket)
             |SELECT p.bucket::BIGINT AS bucket,
             |  coalesce(c.exact_n, 0)::BIGINT AS exact_n,
             |  true AS est_in_bounds, true AS merged_eq_direct
             |FROM p LEFT JOIN c ON c.bucket = p.bucket
             |ORDER BY bucket""".stripMargin),
      (s, dir) => {
        val d = t(s, dir, "documents").withColumn("__b", expr("n_chars div 100L"))
        val per = d.groupBy(col("source"))
          .agg(expr("count_min_sketch(__b, 0.01d, 0.99d, 42)").as("sk"))
        val merged = per.agg(expr("graft_cms_merge(sk)").as("msk"))
        val direct = d.agg(
          expr("count_min_sketch(__b, 0.01d, 0.99d, 42)").as("dsk"),
          count(lit(1)).as("__n"))
        val exact = d.groupBy(col("__b").as("bucket"))
          .agg(count(lit(1)).as("exact_n"))
        s.range(0, 6).toDF("bucket")
          .join(exact, Seq("bucket"), "left")
          .na.fill(0L, Seq("exact_n"))
          .crossJoin(broadcast(merged)).crossJoin(broadcast(direct))
          .withColumn("__est", expr("graft_cms_query(msk, bucket)"))
          .withColumn("est_in_bounds",
            col("__est") >= col("exact_n") &&
              col("__est") <= col("exact_n") +
                expr("CAST(ceil(0.01d * __n) AS BIGINT)"))
          .withColumn("merged_eq_direct",
            col("__est") === expr("graft_cms_query(dsk, bucket)"))
          .select(col("bucket"), col("exact_n"),
            col("est_in_bounds"), col("merged_eq_direct"))
          .orderBy("bucket")
      }),

    // ---- exact repeated-substring coverage (Lee et al. 2022) -----
    // Substring-level dedup mass: per doc, the characters covered by
    // some ≥30-char substring that repeats ANYWHERE in the corpus
    // (gram-hash blocking ≡ the paper's suffix-array formulation —
    // DedupOps.repeatedCharSpans). Witness reports only docs with
    // duplicated mass; the oracle re-derives the same merged-interval
    // union via a count-over-gram window + gaps-and-islands.
    Q("q239_repeated_substrings",
      Some("""WITH d AS (SELECT doc_id, text FROM documents),
             |g AS (SELECT doc_id, unnest(range(0, length(text) - 30 + 1)) AS pos, text
             |  FROM d WHERE length(text) >= 30),
             |gg AS (SELECT doc_id, pos, substr(text, pos::INT + 1, 30) AS g FROM g),
             |dup AS (SELECT doc_id, pos::BIGINT AS pos, (pos + 30)::BIGINT AS e FROM
             |  (SELECT doc_id, pos, count(*) OVER (PARTITION BY g) AS gn FROM gg)
             |  WHERE gn >= 2),
             |m AS (SELECT doc_id, pos, e,
             |  CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY pos, e
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
             |    OR pos > max(e) OVER (PARTITION BY doc_id ORDER BY pos, e
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |    THEN 1 ELSE 0 END AS nw FROM dup),
             |mi AS (SELECT doc_id, pos, e, sum(nw) OVER (PARTITION BY doc_id
             |  ORDER BY pos, e ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
             |  FROM m),
             |mg AS (SELECT doc_id, gid, min(pos) AS s, max(e) AS en
             |  FROM mi GROUP BY doc_id, gid),
             |cov AS (SELECT doc_id, count(*)::BIGINT AS n_dup_spans,
             |  sum(en - s)::BIGINT AS dup_chars FROM mg GROUP BY doc_id),
             |l AS (SELECT doc_id, length(text)::BIGINT AS n_chars FROM d)
             |SELECT l.doc_id, n_chars, n_dup_spans, dup_chars,
             |  ((1000000 * dup_chars) // n_chars)::BIGINT AS dup_ppm
             |FROM l JOIN cov USING (doc_id)
             |WHERE dup_chars > 0 ORDER BY l.doc_id""".stripMargin),
      (s, dir) =>
        graft.operators.DedupOps.repeatedCharSpans(
          tp(s, dir, "documents", "doc_id"), "doc_id", "text", gramLen = 30)
          .where(col("dup_chars") > 0)
          .orderBy("doc_id")),

    // ---- repeated-substring CUT (keep-first excision) ------------
    // q239's transform half: each corpus-repeated ≥30-char span
    // survives at its FIRST (doc_id, pos) site and is excised
    // everywhere else. The witness hash-compares the full CLEANED
    // TEXT of every touched doc — the oracle rebuilds it via the
    // same keep-first rule (row_number per gram), interval merge,
    // and gap-segment string_agg.
    Q("q240_cut_repeated",
      Some("""WITH d AS (SELECT doc_id, text FROM documents),
             |g AS (SELECT doc_id, unnest(range(0, length(text) - 30 + 1)) AS pos, text
             |  FROM d WHERE length(text) >= 30),
             |gg AS (SELECT doc_id, pos, substr(text, pos::INT + 1, 30) AS g FROM g),
             |mk AS (SELECT doc_id, pos,
             |  row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn FROM gg),
             |cut AS (SELECT doc_id, pos::BIGINT AS pos, (pos + 30)::BIGINT AS e
             |  FROM mk WHERE rn >= 2),
             |m AS (SELECT doc_id, pos, e,
             |  CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY pos, e
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
             |    OR pos > max(e) OVER (PARTITION BY doc_id ORDER BY pos, e
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |    THEN 1 ELSE 0 END AS nw FROM cut),
             |mi AS (SELECT doc_id, pos, e, sum(nw) OVER (PARTITION BY doc_id
             |  ORDER BY pos, e ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
             |  FROM m),
             |mg AS (SELECT doc_id, gid, min(pos) AS s, max(e) AS en
             |  FROM mi GROUP BY doc_id, gid),
             |k AS (SELECT doc_id, s, en,
             |  coalesce(lag(en) OVER (PARTITION BY doc_id ORDER BY s), 0) AS gs FROM mg),
             |seg AS (SELECT k.doc_id, s, substr(d.text, gs::INT + 1, (s - gs)::INT) AS piece
             |  FROM k JOIN d USING (doc_id)),
             |per AS (SELECT doc_id, count(*)::BIGINT AS n_cut_spans,
             |  sum(en - s)::BIGINT AS cut_chars, max(en) AS last_e FROM mg GROUP BY doc_id),
             |txt AS (SELECT doc_id, string_agg(piece, '' ORDER BY s) AS head
             |  FROM seg GROUP BY doc_id)
             |SELECT p.doc_id, txt.head || substr(d.text, p.last_e::INT + 1) AS clean_text,
             |  p.n_cut_spans, p.cut_chars
             |FROM per p JOIN txt USING (doc_id) JOIN d USING (doc_id)
             |ORDER BY p.doc_id""".stripMargin),
      (s, dir) =>
        graft.operators.DedupOps.cutRepeatedSpans(
          tp(s, dir, "documents", "doc_id"), "doc_id", "text", gramLen = 30)
          .where(col("n_cut_spans") > 0)
          .orderBy("doc_id")),

    // ---- exact ROC-AUC (Mann–Whitney, midrank ties) --------------
    // Does doc length rank English docs above the rest? Per-source
    // AUC (windowed over each group's distinct scores) plus the
    // __ALL__ row through the quantile-bucket running-total path —
    // BOTH cumulative decompositions hash-checked against the same
    // oracle. Exact integer ppm.
    Q("q241_roc_auc",
      Some("""WITH b AS (SELECT source, n_chars AS s, (lang = 'en') AS y FROM documents),
             |c AS (SELECT source, s,
             |  sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS p,
             |  sum(CASE WHEN y THEN 0 ELSE 1 END)::BIGINT AS q
             |  FROM b GROUP BY source, s),
             |w AS (SELECT source, p, q, coalesce(sum(q) OVER (PARTITION BY source
             |  ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cq
             |  FROM c),
             |g AS (SELECT source, sum(p)::BIGINT AS n_pos, sum(q)::BIGINT AS n_neg,
             |  sum(p * (2 * cq + q))::BIGINT AS num2 FROM w GROUP BY source),
             |ca AS (SELECT s, sum(p)::BIGINT AS p, sum(q)::BIGINT AS q
             |  FROM c GROUP BY s),
             |wa AS (SELECT p, q, coalesce(sum(q) OVER (ORDER BY s
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cq FROM ca),
             |ga AS (SELECT '__ALL__' AS source, sum(p)::BIGINT AS n_pos,
             |  sum(q)::BIGINT AS n_neg, sum(p * (2 * cq + q))::BIGINT AS num2 FROM wa)
             |SELECT source, n_pos, n_neg,
             |  CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
             |    ELSE ((1000000 * num2) // (2 * n_pos * n_neg))::BIGINT END AS auc_ppm
             |FROM (SELECT * FROM g UNION ALL SELECT * FROM ga)
             |ORDER BY source""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .withColumn("__lab", col("lang") === "en")
        val per = graft.operators.Scoring.rocAuc(
          docs, "n_chars", "__lab", Seq("source"))
        val all = graft.operators.Scoring.rocAuc(docs, "n_chars", "__lab")
          .withColumn("source", lit("__ALL__"))
        per.unionByName(all)
          .select(col("source"), col("n_pos"), col("n_neg"), col("auc_ppm"))
          .orderBy("source")
      }),

    // ---- calibration / reliability report (ECE) ------------------
    // The model-seam permille scores binned 10-wide against the
    // is-English truth; per-bin confidence vs accuracy and the
    // corpus ECE, all exact integer ppm. The oracle recomputes the
    // stub score arithmetically (q182 precedent), so the whole
    // seam→binning→ECE path is hash-checked.
    Q("q242_calibration",
      Some(s"""WITH b AS (SELECT least(((${D.rollingHash("text")} % 1000) * 10) // 1000, 9) AS bin,
              |  ${D.rollingHash("text")} % 1000 AS pr, (lang = 'en') AS y FROM documents),
              |p AS (SELECT bin, count(*)::BIGINT AS n,
              |  ((1000 * sum(pr)) // count(*))::BIGINT AS conf_ppm,
              |  ((1000000 * sum(CASE WHEN y THEN 1 ELSE 0 END)) // count(*))::BIGINT AS acc_ppm
              |  FROM b GROUP BY bin),
              |p2 AS (SELECT bin, n, conf_ppm, acc_ppm,
              |  abs(acc_ppm - conf_ppm)::BIGINT AS gap_ppm FROM p),
              |e AS (SELECT (sum(n * gap_ppm) // sum(n))::BIGINT AS ece_ppm FROM p2),
              |spine AS (SELECT unnest(range(0, 10)) AS bin)
              |SELECT spine.bin::BIGINT AS bin, coalesce(p2.n, 0)::BIGINT AS n,
              |  conf_ppm, acc_ppm, gap_ppm, (SELECT ece_ppm FROM e) AS ece_ppm
              |FROM spine LEFT JOIN p2 ON p2.bin = spine.bin
              |ORDER BY bin""".stripMargin),
      (s, dir) => {
        val scored = graft.operators.Scoring.withModelScore(
          t(s, dir, "documents"), "doc_id", "text")
          .withColumn("__lab", col("lang") === "en")
        graft.operators.Scoring.calibrationReport(
          scored, "score_permille", "__lab", nBins = 10)
      }),

    // ---- per-doc shingle novelty vs the earlier corpus -----------
    // Fraction of each doc's distinct 3-shingles FIRST seen in that
    // doc (by doc_id order) — the crawl-increment freshness signal.
    // One shingle-keyed min + join; exact ppm per doc.
    Q("q243_shingle_novelty",
      Some(s"""WITH toks AS (SELECT doc_id, text, $duckToks AS t FROM documents),
              |sh AS (SELECT DISTINCT doc_id, unnest($duckShingles) AS s FROM toks),
              |own AS (SELECT s, min(doc_id) AS o FROM sh GROUP BY s),
              |per AS (SELECT sh.doc_id, count(*)::BIGINT AS n_distinct,
              |  sum(CASE WHEN sh.doc_id = own.o THEN 1 ELSE 0 END)::BIGINT AS n_novel
              |  FROM sh JOIN own ON sh.s = own.s GROUP BY sh.doc_id)
              |SELECT d.doc_id, coalesce(per.n_distinct, 0)::BIGINT AS n_distinct,
              |  coalesce(per.n_novel, 0)::BIGINT AS n_novel,
              |  CASE WHEN coalesce(per.n_distinct, 0) > 0
              |    THEN ((1000000 * per.n_novel) // per.n_distinct)::BIGINT END AS novelty_ppm
              |FROM (SELECT DISTINCT doc_id FROM documents) d
              |LEFT JOIN per ON per.doc_id = d.doc_id
              |ORDER BY d.doc_id""".stripMargin),
      (s, dir) =>
        TextOps.shingleNovelty(t(s, dir, "documents"), "doc_id", "text")
          .orderBy("doc_id")),

    // ---- char-distribution entropy surrogate ---------------------
    // Σ cᵢ·(bl(n) − bl(cᵢ)) per doc with bl = length(bin(·)) — the
    // integer bit-length log2 both engines share (DSIR/PSI/Zipf
    // precedent); per-source totals. Gibberish/run detection.
    Q("q244_char_entropy",
      Some("""WITH e AS (SELECT source,
             |  CASE WHEN length(text) = 0 THEN 0 ELSE
             |    list_sum(list_transform(list_distinct(string_split(text, '')),
             |      ch -> (length(text) - length(replace(text, ch, ''))) *
             |        (length(bin(length(text))) -
             |         length(bin(length(text) - length(replace(text, ch, ''))))))) END AS ent
             |  FROM documents)
             |SELECT source, count(*)::BIGINT AS n_docs,
             |  sum(ent)::BIGINT AS sum_ent, max(ent)::BIGINT AS max_ent
             |FROM e GROUP BY source ORDER BY source""".stripMargin),
      (s, dir) =>
        TextOps.withCharEntropy(t(s, dir, "documents"), "text")
          .groupBy(col("source"))
          .agg(count(lit(1)).cast("bigint").as("n_docs"),
            sum(col("ent_sum")).cast("bigint").as("sum_ent"),
            max(col("ent_sum")).cast("bigint").as("max_ent"))
          .orderBy("source")),

    // ---- majority label propagation (communities) ----------------
    // Deterministic synchronous LPA — 3 unrolled rounds over the
    // q176 top-100 co-occurrence edges; majority = max count then
    // min label (no RNG, no max_by). The oracle replays the same
    // three rounds as chained CTEs.
    Q("q245_label_propagation",
      Some(s"""WITH toks AS (SELECT $duckToks AS t FROM documents),
              |pr AS (
              |  SELECT unnest(list_transform(range(1, len(t)),
              |    i -> {'a': least(t[i], t[i+1]), 'b': greatest(t[i], t[i+1])})) AS p
              |  FROM toks
              |  UNION ALL
              |  SELECT unnest(list_transform(range(1, len(t) - 1),
              |    i -> {'a': least(t[i], t[i+2]), 'b': greatest(t[i], t[i+2])})) AS p
              |  FROM toks),
              |pc AS (SELECT p.a AS tok_a, p.b AS tok_b, count(*)::BIGINT AS n
              |  FROM pr GROUP BY 1, 2),
              |e AS (SELECT tok_a, tok_b FROM pc
              |  ORDER BY n DESC, tok_a, tok_b LIMIT 100),
              |sym AS (SELECT DISTINCT a, b FROM (
              |  SELECT tok_a AS a, tok_b AS b FROM e
              |  UNION ALL SELECT tok_b, tok_a FROM e) WHERE a <> b),
              |l0 AS (SELECT DISTINCT a AS node, a AS label FROM sym),
              |c1 AS (SELECT s.a AS node, l.label, count(*) AS n FROM sym s
              |  JOIN l0 l ON l.node = s.b GROUP BY 1, 2),
              |m1 AS (SELECT node, max(n) AS mx FROM c1 GROUP BY node),
              |l1 AS (SELECT c1.node, min(c1.label) AS label FROM c1
              |  JOIN m1 ON m1.node = c1.node AND c1.n = m1.mx GROUP BY c1.node),
              |c2 AS (SELECT s.a AS node, l.label, count(*) AS n FROM sym s
              |  JOIN l1 l ON l.node = s.b GROUP BY 1, 2),
              |m2 AS (SELECT node, max(n) AS mx FROM c2 GROUP BY node),
              |l2 AS (SELECT c2.node, min(c2.label) AS label FROM c2
              |  JOIN m2 ON m2.node = c2.node AND c2.n = m2.mx GROUP BY c2.node),
              |c3 AS (SELECT s.a AS node, l.label, count(*) AS n FROM sym s
              |  JOIN l2 l ON l.node = s.b GROUP BY 1, 2),
              |m3 AS (SELECT node, max(n) AS mx FROM c3 GROUP BY node),
              |l3 AS (SELECT c3.node, min(c3.label) AS label FROM c3
              |  JOIN m3 ON m3.node = c3.node AND c3.n = m3.mx GROUP BY c3.node)
              |SELECT node, label FROM l3 ORDER BY node""".stripMargin),
      (s, dir) => {
        val edges = graft.operators.Relevance.cooccurrencePairs(
          tp(s, dir, "documents", "doc_id"), "text", maxDist = 2, k = 100)
          .select(col("tok_a"), col("tok_b"))
        graft.operators.Components.labelPropagation(
          edges, "tok_a", "tok_b", rounds = 3)
          .orderBy("node")
      }),

    // ---- Kendall rank agreement between two scorers --------------
    // Do doc length (50-char buckets) and the model-seam score
    // (deciles) ORDER each source the same way? Exact cell-pair
    // C/D/tie counts; tau_a with the sign outside the integral
    // divide (q201 precedent — engines disagree on negative div).
    Q("q248_kendall_tau",
      Some(s"""WITH b AS (SELECT source, n_chars // 50 AS x,
              |  (${D.rollingHash("text")} % 1000) // 100 AS y FROM documents),
              |c AS (SELECT source, x, y, count(*)::BIGINT AS n FROM b GROUP BY 1, 2, 3),
              |p AS (SELECT a.source,
              |  sum(CASE WHEN a.x < b.x AND a.y < b.y THEN a.n * b.n ELSE 0 END)::BIGINT AS concordant,
              |  sum(CASE WHEN a.x < b.x AND a.y > b.y THEN a.n * b.n ELSE 0 END)::BIGINT AS discordant,
              |  sum(CASE WHEN a.x = b.x THEN a.n * b.n ELSE 0 END)::BIGINT AS tie_x,
              |  sum(CASE WHEN a.y = b.y AND a.x < b.x THEN a.n * b.n ELSE 0 END)::BIGINT AS tie_y
              |  FROM c a JOIN c b ON a.source = b.source
              |    AND (a.x < b.x OR (a.x = b.x AND a.y < b.y))
              |  GROUP BY a.source),
              |t AS (SELECT source, sum(n)::BIGINT AS n,
              |  sum(n * (n - 1) // 2)::BIGINT AS tie_xy FROM c GROUP BY source)
              |SELECT t.source, t.n,
              |  coalesce(p.concordant, 0)::BIGINT AS concordant,
              |  coalesce(p.discordant, 0)::BIGINT AS discordant,
              |  coalesce(p.tie_x, 0)::BIGINT AS tie_x,
              |  coalesce(p.tie_y, 0)::BIGINT AS tie_y, t.tie_xy,
              |  CASE WHEN t.n < 2 THEN NULL ELSE
              |    (CASE WHEN p.concordant > p.discordant THEN 1
              |          WHEN p.concordant < p.discordant THEN -1 ELSE 0 END *
              |     ((1000000 * abs(p.concordant - p.discordant)) //
              |      (t.n * (t.n - 1) // 2)))::BIGINT END AS tau_a_ppm
              |FROM t LEFT JOIN p USING (source) ORDER BY t.source""".stripMargin),
      (s, dir) => {
        val d = t(s, dir, "documents")
          .withColumn("__xq", expr("n_chars div 50L"))
          .withColumn("__yq",
            expr(s"(${TextHash.spark.rollingHash("text")} % 1000L) div 100L"))
        graft.operators.RobustStats.kendallTau(d, "__xq", "__yq", Seq("source"))
          .orderBy("source")
      }),

    // ---- vocabulary growth curve (Heaps' law) --------------------
    // Cumulative token mass vs cumulative distinct vocabulary at 10
    // doc-id checkpoints — vocab at ck = tokens whose FIRST owner is
    // ≤ ck (one token-keyed min; no ordered scan), mass by the same
    // bucket arithmetic. The oracle states the same points by direct
    // filtered sums.
    Q("q249_vocab_growth",
      Some(s"""WITH mx AS (SELECT max(doc_id)::BIGINT AS m FROM documents),
              |toks AS (SELECT doc_id, unnest($duckToks) AS tok FROM documents),
              |pd AS (SELECT doc_id, count(*)::BIGINT AS n FROM toks GROUP BY doc_id),
              |own AS (SELECT tok, min(doc_id)::BIGINT AS o FROM toks GROUP BY tok),
              |ck2 AS (SELECT ck_idx::BIGINT AS ck_idx, (ck_idx * m) // 10 AS ck_id
              |  FROM (SELECT unnest(range(1, 11)) AS ck_idx), mx),
              |mass AS (SELECT ck2.ck_idx,
              |  sum(CASE WHEN pd.doc_id <= ck2.ck_id THEN pd.n ELSE 0 END)::BIGINT AS cum_tokens
              |  FROM ck2, pd GROUP BY ck2.ck_idx),
              |voc AS (SELECT ck2.ck_idx,
              |  sum(CASE WHEN own.o <= ck2.ck_id THEN 1 ELSE 0 END)::BIGINT AS cum_vocab
              |  FROM ck2, own GROUP BY ck2.ck_idx)
              |SELECT ck2.ck_idx, ck2.ck_id::BIGINT AS ck_id,
              |  coalesce(mass.cum_tokens, 0)::BIGINT AS cum_tokens,
              |  coalesce(voc.cum_vocab, 0)::BIGINT AS cum_vocab
              |FROM ck2 LEFT JOIN mass USING (ck_idx) LEFT JOIN voc USING (ck_idx)
              |ORDER BY ck_idx""".stripMargin),
      (s, dir) =>
        TextOps.vocabGrowth(t(s, dir, "documents"), "doc_id", "text",
          buckets = 10)),

    // ---- per-source token-distribution entropy -------------------
    // q244's char surrogate lifted to the token distribution, per
    // source: Σ c·(bl(n)−bl(c)) over the vocabulary-bounded count
    // frame — template/boilerplate feeds score near 0.
    Q("q250_token_entropy",
      Some(s"""WITH tk AS (SELECT source, unnest($duckToks) AS tok FROM documents),
              |c AS (SELECT source, tok, count(*)::BIGINT AS c FROM tk GROUP BY 1, 2),
              |t AS (SELECT source, sum(c)::BIGINT AS n_tokens,
              |  count(*)::BIGINT AS n_distinct FROM c GROUP BY source),
              |e AS (SELECT c.source, sum(c.c * (length(bin(t.n_tokens)) -
              |  length(bin(c.c))))::BIGINT AS ent_sum
              |  FROM c JOIN t USING (source) GROUP BY c.source)
              |SELECT t.source, t.n_tokens, t.n_distinct, e.ent_sum
              |FROM t JOIN e USING (source) ORDER BY t.source""".stripMargin),
      (s, dir) =>
        TextOps.groupTokenEntropy(t(s, dir, "documents"), "text", "source")),

    // ---- joint length × score histogram (2-D heat map) -----------
    // The curation dashboard's first plot: doc length vs model-seam
    // score, 10×10 equi-width cells with the boundary-pinned floor
    // arithmetic on each axis; only non-empty cells emitted.
    Q("q251_histogram2d",
      Some(s"""WITH b AS (SELECT
              |  CASE WHEN n_chars::DOUBLE < 0.0 THEN 0
              |    WHEN n_chars::DOUBLE >= 1000.0 THEN 11
              |    ELSE floor((n_chars::DOUBLE - 0.0) / 100.0)::INT + 1 END AS x_bucket,
              |  CASE WHEN (${D.rollingHash("text")} % 1000)::DOUBLE < 0.0 THEN 0
              |    WHEN (${D.rollingHash("text")} % 1000)::DOUBLE >= 1000.0 THEN 11
              |    ELSE floor(((${D.rollingHash("text")} % 1000)::DOUBLE - 0.0) / 100.0)::INT + 1
              |  END AS y_bucket FROM documents)
              |SELECT x_bucket, y_bucket, count(*)::BIGINT AS n
              |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (s, dir) =>
        graft.operators.Profile.histogram2d(
          t(s, dir, "documents").withColumn("__score",
            expr(s"${TextHash.spark.rollingHash("text")} % 1000L")),
          "n_chars", 0.0, 1000.0, 10, "__score", 0.0, 1000.0, 10)),

    // ---- Hilbert clustering key (layout locality) ----------------
    // The Z-order sibling with unit-step locality (q155): per-doc
    // Hilbert index of (length, score) on a 2^8 grid, aggregated per
    // source. The oracle replays the IDENTICAL packed bit-level fold
    // via list_reduce — the whole transform is hash-checked, and the
    // Hamiltonian-walk property is spec-pinned on the full grid.
    Q("q257_hilbert_layout", {
      val bits = 8; val P = 1L << bits; val n1 = P - 1
      def xOf(a: String) = s"(($a // $P) % $P)"
      def yOf(a: String) = s"($a % $P)"
      def dOf(a: String) = s"($a // ${P * P})"
      val s_ = "(1::BIGINT << i)"
      val X = xOf("acc"); val Y = yOf("acc"); val Dd = dOf("acc")
      val rx = s"(($X // $s_) % 2)"
      val ry = s"(($Y // $s_) % 2)"
      val quad = s"(CASE WHEN $rx = 0 THEN $ry ELSE 3 - $ry END)"
      val d2 = s"($Dd + $s_ * $s_ * $quad)"
      val xr = s"(CASE WHEN $rx = 1 THEN $n1 - $X ELSE $X END)"
      val yr = s"(CASE WHEN $rx = 1 THEN $n1 - $Y ELSE $Y END)"
      val newx = s"(CASE WHEN $ry = 0 THEN $yr ELSE $X END)"
      val newy = s"(CASE WHEN $ry = 0 THEN $xr ELSE $Y END)"
      val body = s"(($d2 * $P + $newx) * $P + $newy)"
      Some(s"""WITH b AS (SELECT source, (n_chars % $P)::BIGINT AS x,
              |  (${D.rollingHash("text")} % $P)::BIGINT AS y FROM documents),
              |h AS (SELECT source, list_reduce(list_prepend(x * $P + y,
              |  list_transform(range(${bits - 1}, -1, -1), i -> i)),
              |  (acc, i) -> $body) AS packed FROM b),
              |v AS (SELECT source, ${dOf("packed")} AS hval FROM h)
              |SELECT source, count(*)::BIGINT AS n, sum(hval)::BIGINT AS sum_h,
              |  min(hval)::BIGINT AS min_h, max(hval)::BIGINT AS max_h
              |FROM v GROUP BY source ORDER BY source""".stripMargin)
    },
      (s, dir) => {
        val d = t(s, dir, "documents")
          .withColumn("__hx", expr("n_chars % 256L"))
          .withColumn("__hy",
            expr(s"${TextHash.spark.rollingHash("text")} % 256L"))
        graft.operators.Sequencing.withHilbertValue(d, "__hx", "__hy", bits = 8)
          .groupBy(col("source"))
          .agg(count(lit(1)).cast("bigint").as("n"),
            sum(col("hval")).cast("bigint").as("sum_h"),
            min(col("hval")).cast("bigint").as("min_h"),
            max(col("hval")).cast("bigint").as("max_h"))
          .orderBy("source")
      }),

    // ---- b-bit minhash estimation (Li & König 2010) --------------
    // Store only the low 4 bits of each signature component (16×
    // storage cut) and correct the collision inflation exactly:
    // Ĵ = max(0, (k·16 − 8)/(8·15)) in ppm — the full-width
    // agreement count and the compressed estimate side by side per
    // LSH candidate pair.
    Q("q263_bbit_minhash",
      Some(s"""$sigCte,
              |b AS (SELECT doc_id,
              |  m0::VARCHAR || '|' || m1::VARCHAR || '|' || m2::VARCHAR || '|' || m3::VARCHAR AS band0,
              |  m0, m1, m2, m3, m4, m5, m6, m7 FROM sig),
              |pairs AS (
              |  SELECT x.doc_id AS a_id, y.doc_id AS b_id,
              |    ((CASE WHEN x.m0 = y.m0 THEN 1 ELSE 0 END) + (CASE WHEN x.m1 = y.m1 THEN 1 ELSE 0 END) +
              |     (CASE WHEN x.m2 = y.m2 THEN 1 ELSE 0 END) + (CASE WHEN x.m3 = y.m3 THEN 1 ELSE 0 END) +
              |     (CASE WHEN x.m4 = y.m4 THEN 1 ELSE 0 END) + (CASE WHEN x.m5 = y.m5 THEN 1 ELSE 0 END) +
              |     (CASE WHEN x.m6 = y.m6 THEN 1 ELSE 0 END) + (CASE WHEN x.m7 = y.m7 THEN 1 ELSE 0 END)
              |    )::BIGINT AS k_full,
              |    ((CASE WHEN x.m0 % 16 = y.m0 % 16 THEN 1 ELSE 0 END) + (CASE WHEN x.m1 % 16 = y.m1 % 16 THEN 1 ELSE 0 END) +
              |     (CASE WHEN x.m2 % 16 = y.m2 % 16 THEN 1 ELSE 0 END) + (CASE WHEN x.m3 % 16 = y.m3 % 16 THEN 1 ELSE 0 END) +
              |     (CASE WHEN x.m4 % 16 = y.m4 % 16 THEN 1 ELSE 0 END) + (CASE WHEN x.m5 % 16 = y.m5 % 16 THEN 1 ELSE 0 END) +
              |     (CASE WHEN x.m6 % 16 = y.m6 % 16 THEN 1 ELSE 0 END) + (CASE WHEN x.m7 % 16 = y.m7 % 16 THEN 1 ELSE 0 END)
              |    )::BIGINT AS k_bbit
              |  FROM b x JOIN b y ON x.band0 = y.band0 AND x.doc_id < y.doc_id)
              |SELECT a_id, b_id, k_full, k_bbit,
              |  greatest(0, (1000000 * (k_bbit * 16 - 8)) // (8 * 15))::BIGINT AS jhat_bbit_ppm
              |FROM pairs ORDER BY a_id, b_id""".stripMargin),
      (s, dir) =>
        DedupOps.bbitJaccardEstimates(
          t(s, dir, "documents"), "doc_id", "text", bands = 2,
          rowsPerBand = 4, bBits = 4)
          .orderBy("a_id", "b_id")),

    // ---- mergeable histogram-percentile rollup -------------------
    // The quantile face of the sketch-rollup family: per-source
    // equi-width bin vectors (exactly mergeable integers), __ALL__
    // answered by MERGING the vectors; p50 estimate = lower edge of
    // the first bin reaching ceil(p·n/100). All integer cumulative +
    // pinned edge arithmetic.
    Q("q265_histogram_percentile",
      Some("""WITH b AS (SELECT source,
             |  CASE WHEN n_chars::DOUBLE < 0.0 THEN 0
             |    WHEN n_chars::DOUBLE >= 1000.0 THEN 21
             |    ELSE floor((n_chars::DOUBLE - 0.0) / 50.0)::INT + 1 END AS bkt
             |  FROM documents),
             |c AS (SELECT source, bkt, count(*)::BIGINT AS n FROM b GROUP BY 1, 2),
             |a AS (SELECT '__ALL__' AS source, bkt, sum(n)::BIGINT AS n FROM c GROUP BY bkt),
             |u AS (SELECT * FROM c UNION ALL SELECT * FROM a),
             |m AS (SELECT source, bkt, n,
             |  sum(n) OVER (PARTITION BY source ORDER BY bkt
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |  sum(n) OVER (PARTITION BY source) AS tot FROM u),
             |s AS (SELECT source, tot::BIGINT AS n, min(bkt)::INT AS p_bucket FROM m
             |  WHERE cum >= ceil((50 * tot) / 100.0)::BIGINT GROUP BY source, tot)
             |SELECT source, n, p_bucket,
             |  CASE WHEN p_bucket = 0 THEN 0.0 WHEN p_bucket = 21 THEN 1000.0
             |    ELSE 0.0 + (p_bucket - 1) * 50.0 END AS p_est
             |FROM s ORDER BY source""".stripMargin),
      (s, dir) =>
        graft.operators.Sketches.histogramPercentileRollup(
          t(s, dir, "documents"), "n_chars", "source",
          lo = 0.0, hi = 1000.0, nb = 20, pPercent = 50)),

    // ---- decile lift table (model-eval read) ---------------------
    // Docs ranked by the model-seam score (desc, doc_id tie-break)
    // through the bucket-decomposed global ordinals, cut into 10
    // deciles; per decile the positive rate and the lift vs the base
    // rate, DECIMAL-exact cross-multiplied. The classic "is the top
    // decile actually enriched" score-quality read.
    Q("q266_decile_lift",
      Some(s"""WITH s AS (SELECT doc_id, ${D.rollingHash("text")} % 1000 AS score,
              |  (lang = 'en') AS y FROM documents),
              |r AS (SELECT doc_id, y,
              |  row_number() OVER (ORDER BY (1000 - score), doc_id) AS ord FROM s),
              |t AS (SELECT count(*)::BIGINT AS n,
              |  sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS pos FROM s),
              |d AS (SELECT ((ord - 1) * 10) // n AS decile, y FROM r, t),
              |g AS (SELECT decile, count(*)::BIGINT AS n_d,
              |  sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS pos_d FROM d GROUP BY decile)
              |SELECT decile::BIGINT AS decile, n_d, pos_d,
              |  ((1000000 * pos_d) // n_d)::BIGINT AS rate_ppm,
              |  ((1000000::HUGEINT * pos_d * t.n) // (n_d * t.pos))::BIGINT AS lift_ppm
              |FROM g, t ORDER BY decile""".stripMargin),
      (s, dir) => {
        val d = t(s, dir, "documents")
          .withColumn("__score",
            expr(s"${TextHash.spark.rollingHash("text")} % 1000L"))
          .withColumn("__lab", col("lang") === "en")
          .withColumn("__rord", expr("1000L - __score"))
        val ranked = graft.operators.Sequencing.withGlobalOrdinals(
          d, "__rord", "doc_id")
        val tot = ranked.agg(count(lit(1)).cast("bigint").as("__n"),
          sum(when(col("__lab"), 1L).otherwise(0L)).cast("bigint").as("__pos"))
        ranked.crossJoin(broadcast(tot))
          .withColumn("decile", expr("((ordinal - 1) * 10) div __n"))
          .groupBy(col("decile"))
          .agg(count(lit(1)).cast("bigint").as("n_d"),
            sum(when(col("__lab"), 1L).otherwise(0L)).cast("bigint").as("pos_d"),
            first(col("__n")).as("__n"), first(col("__pos")).as("__pos"))
          .withColumn("rate_ppm", expr("(1000000L * pos_d) div n_d"))
          .withColumn("lift_ppm", expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * pos_d * __n) div " +
              "(CAST(n_d AS DECIMAL(38,0)) * __pos) AS BIGINT)"))
          .select("decile", "n_d", "pos_d", "rate_ppm", "lift_ppm")
          .orderBy("decile")
      }),

    // ---- k-core decomposition (graph cleanup) --------------------
    // The 3-core of the q176 collocation graph: peel degree-<3 nodes
    // until fixpoint. The oracle unrolls 8 simultaneous-peel rounds
    // — once the peel converges further rounds are idempotent, so
    // the unroll equals Spark's run-to-fixpoint (which raises loudly
    // if it ever needed more).
    Q("q260_kcore", {
      // each eN is referenced twice (degree + survivor join) — without
      // MATERIALIZED the inlining doubles per round and the base scan
      // explodes 2^8-fold ("too many open files")
      val peel = (1 to 8).map { r =>
        s"""d$r AS (SELECT a, count(*) AS dg FROM e${r - 1} GROUP BY a),
           |k$r AS (SELECT a FROM d$r WHERE dg >= 3),
           |e$r AS MATERIALIZED (SELECT e.a, e.b FROM e${r - 1} e
           |  JOIN k$r x ON e.a = x.a JOIN k$r y ON e.b = y.a)""".stripMargin
      }.mkString(",\n")
      Some(s"""WITH toks AS (SELECT $duckToks AS t FROM documents),
              |pr AS (
              |  SELECT unnest(list_transform(range(1, len(t)),
              |    i -> {'a': least(t[i], t[i+1]), 'b': greatest(t[i], t[i+1])})) AS p
              |  FROM toks
              |  UNION ALL
              |  SELECT unnest(list_transform(range(1, len(t) - 1),
              |    i -> {'a': least(t[i], t[i+2]), 'b': greatest(t[i], t[i+2])})) AS p
              |  FROM toks),
              |pc AS (SELECT p.a AS tok_a, p.b AS tok_b, count(*)::BIGINT AS n
              |  FROM pr GROUP BY 1, 2),
              |te AS (SELECT tok_a, tok_b FROM pc
              |  ORDER BY n DESC, tok_a, tok_b LIMIT 100),
              |e0 AS MATERIALIZED (SELECT DISTINCT a, b FROM (
              |  SELECT tok_a AS a, tok_b AS b FROM te
              |  UNION ALL SELECT tok_b, tok_a FROM te) WHERE a <> b),
              |$peel
              |SELECT a AS node, count(*)::BIGINT AS core_degree
              |FROM e8 GROUP BY a ORDER BY node""".stripMargin)
    },
      (s, dir) => {
        val edges = graft.operators.Relevance.cooccurrencePairs(
          tp(s, dir, "documents", "doc_id"), "text", maxDist = 2, k = 100)
          .select(col("tok_a"), col("tok_b"))
        graft.operators.Components.kCore(edges, "tok_a", "tok_b", k = 3)
          .orderBy("node")
      }),

    // ---- integer-bit bigram LM surprisal -------------------------
    // CCNet-style perplexity filtering without floats: add-one bigram
    // LM trained on even-id docs, odd-id docs scored in whole bits
    // (bitlen = length(bin(x)), the q244 integer log2 surrogate).
    // High avg bits = improbable under the corpus LM.
    Q("q344_bigram_lm",
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
             |  FROM documents),
             |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
             |    gi -> {'w1': t[gi], 'w2': t[gi + 1]})) AS b
             |  FROM toks WHERE len(t) >= 2),
             |e AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
             |tr AS (SELECT w1, w2 FROM e WHERE doc_id % 2 = 0),
             |c12 AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM tr
             |  GROUP BY w1, w2),
             |c1 AS (SELECT w1, count(*)::BIGINT AS c1 FROM tr GROUP BY w1),
             |v AS (SELECT count(DISTINCT w)::BIGINT AS vv FROM
             |  (SELECT unnest(t) AS w FROM toks WHERE doc_id % 2 = 0)),
             |sc AS (SELECT e.doc_id,
             |  length(bin(coalesce(c1.c1, 0) + v.vv))
             |    - length(bin(coalesce(c12.c12, 0) + 1)) AS bits
             |  FROM e LEFT JOIN c12 USING (w1, w2) LEFT JOIN c1 USING (w1)
             |  CROSS JOIN v WHERE e.doc_id % 2 = 1)
             |SELECT doc_id AS id, count(*)::BIGINT AS n_bigrams,
             |  sum(bits)::BIGINT AS sum_bits,
             |  ((100 * sum(bits)) // count(*))::BIGINT AS avg_bits_x100
             |FROM sc GROUP BY doc_id ORDER BY id""".stripMargin),
      (s, dir) =>
        TextOps.bigramLmSurprisal(t(s, dir, "documents"), "doc_id", "text")
          .orderBy("id")),

    // ---- truncated harmonic centrality ---------------------------
    // 3-hop harmonic centrality on the q260 top-100 collocation
    // graph: exact per-distance frontier sets (2-hop minus 1-hop,
    // 3-hop minus both), 10^6 div d per reached node.
    Q("q357_harmonic_centrality",
      Some(s"""WITH toks AS (SELECT $duckToks AS t FROM documents),
              |pr AS (
              |  SELECT unnest(list_transform(range(1, len(t)),
              |    i -> {'a': least(t[i], t[i+1]), 'b': greatest(t[i], t[i+1])})) AS p
              |  FROM toks
              |  UNION ALL
              |  SELECT unnest(list_transform(range(1, len(t) - 1),
              |    i -> {'a': least(t[i], t[i+2]), 'b': greatest(t[i], t[i+2])})) AS p
              |  FROM toks),
              |pc AS (SELECT p.a AS tok_a, p.b AS tok_b, count(*)::BIGINT AS n
              |  FROM pr GROUP BY 1, 2),
              |te AS (SELECT tok_a, tok_b FROM pc
              |  ORDER BY n DESC, tok_a, tok_b LIMIT 100),
              |e0 AS MATERIALIZED (SELECT DISTINCT a, b FROM (
              |  SELECT tok_a AS a, tok_b AS b FROM te
              |  UNION ALL SELECT tok_b, tok_a FROM te) WHERE a <> b),
              |r2 AS (SELECT DISTINCT x.a, y.b FROM e0 x
              |  JOIN e0 y ON x.b = y.a WHERE x.a <> y.b),
              |d2 AS MATERIALIZED (SELECT a, b FROM r2
              |  EXCEPT SELECT a, b FROM e0),
              |r3 AS (SELECT DISTINCT x.a, y.b FROM d2 x
              |  JOIN e0 y ON x.b = y.a WHERE x.a <> y.b),
              |d3 AS (SELECT a, b FROM r3 EXCEPT SELECT a, b FROM e0
              |  EXCEPT SELECT a, b FROM d2),
              |al AS (SELECT a, 1 AS d FROM e0
              |  UNION ALL SELECT a, 2 FROM d2
              |  UNION ALL SELECT a, 3 FROM d3)
              |SELECT a AS node,
              |  sum(CASE WHEN d = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
              |  sum(CASE WHEN d = 2 THEN 1 ELSE 0 END)::BIGINT AS n2,
              |  sum(CASE WHEN d = 3 THEN 1 ELSE 0 END)::BIGINT AS n3,
              |  sum(1000000 // d)::BIGINT AS harmonic_ppm
              |FROM al GROUP BY a ORDER BY node""".stripMargin),
      (s, dir) => {
        val edges = graft.operators.Relevance.cooccurrencePairs(
          tp(s, dir, "documents", "doc_id"), "text", maxDist = 2, k = 100)
          .select(col("tok_a"), col("tok_b"))
        graft.operators.Components.harmonicCentrality(edges, "tok_a", "tok_b")
          .orderBy("node")
      }),

    // ---- EXACT threshold Jaccard join ----------------------------
    // Every doc pair with token-set Jaccard >= 19/20 — lossless
    // (AllPairs prefix filtering), unlike the MinHash/SimHash
    // candidate routes. Oracle: brute force over pairs that share
    // any token (a 0-overlap pair cannot pass t > 0). Scoped to
    // doc_id < 600 so the oracle's token self-join stays bounded;
    // the synthetic corpus shares a small vocabulary, so only the
    // tight threshold separates true near-clones.
    Q("q358_exact_jaccard_join",
      Some("""WITH tk AS (SELECT doc_id,
             |  unnest(list_distinct(string_split(text, ' '))) AS w
             |  FROM documents WHERE doc_id < 600),
             |sz AS (SELECT doc_id, count(*)::BIGINT AS n FROM tk GROUP BY doc_id),
             |co AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*)::BIGINT AS c
             |  FROM tk x JOIN tk y ON x.w = y.w AND x.doc_id < y.doc_id
             |  GROUP BY 1, 2),
             |j AS (SELECT a, b, sa.n AS n_a, sb.n AS n_b, c
             |  FROM co JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b)
             |SELECT a AS a_id, b AS b_id, n_a, n_b, c AS n_common,
             |  ((1000000 * c) // (n_a + n_b - c))::BIGINT AS jacc_ppm
             |FROM j WHERE 20 * c >= 19 * (n_a + n_b - c)
             |ORDER BY a_id, b_id""".stripMargin),
      (s, dir) =>
        graft.operators.DedupOps.exactJaccardJoin(
          tp(s, dir, "documents", "doc_id").where(col("doc_id") < 600),
          "doc_id", "text", tNum = 19L, tDen = 20L)
          .orderBy("a_id", "b_id"))
    ,

    // ---- INCREMENTAL exact Jaccard join (streaming shape) --------
    // The corpus (doc_id % 5 != 0) is a standing prefix index built
    // under its OWN frozen token order; the batch (doc_id % 5 = 0)
    // arrives and must surface every qualifying pair it introduces —
    // batch×corpus AND batch-internal — with no recall loss and no
    // corpus×corpus revisit. Oracle: brute-force over shared-token
    // pairs restricted to batch-touching ones. Same q358 scope.
    Q("q379_incremental_jaccard",
      Some("""WITH tk AS (SELECT doc_id,
             |  unnest(list_distinct(string_split(text, ' '))) AS w
             |  FROM documents WHERE doc_id < 600),
             |sz AS (SELECT doc_id, count(*)::BIGINT AS n FROM tk GROUP BY doc_id),
             |co AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*)::BIGINT AS c
             |  FROM tk x JOIN tk y ON x.w = y.w AND x.doc_id < y.doc_id
             |  GROUP BY 1, 2),
             |j AS (SELECT a, b, sa.n AS n_a, sb.n AS n_b, c
             |  FROM co JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b)
             |SELECT a AS a_id, b AS b_id, n_a, n_b, c AS n_common,
             |  ((1000000 * c) // (n_a + n_b - c))::BIGINT AS jacc_ppm,
             |  ((CASE WHEN a % 5 = 0 THEN 1 ELSE 0 END)
             |   + (CASE WHEN b % 5 = 0 THEN 1 ELSE 0 END))::BIGINT AS new_sides
             |FROM j WHERE 20 * c >= 19 * (n_a + n_b - c)
             |  AND (a % 5 = 0 OR b % 5 = 0)
             |ORDER BY a_id, b_id""".stripMargin),
      (s, dir) => {
        val docs = tp(s, dir, "documents", "doc_id").where(col("doc_id") < 600)
        graft.operators.DedupOps.exactJaccardJoinIncremental(
          docs.where(col("doc_id") % 5 =!= 0),
          docs.where(col("doc_id") % 5 === 0),
          "doc_id", "text", tNum = 19L, tDen = 20L)
          .orderBy("a_id", "b_id")
      })
    ,

    // ---- STREAMED micro-batch fold of the incremental join -------
    // q379's operator driven the way a stream actually drives it:
    // the arriving docs (doc_id % 5 = 0) land in THREE sequential
    // micro-batches, each probed against the corpus-so-far (which
    // absorbs every earlier batch), outputs unioned. Exactly-once
    // across folds: every qualifying pair surfaces in precisely the
    // fold where its LATER side arrives — so the union must equal
    // the one-shot join restricted to batch-touching pairs (the
    // q379 oracle minus the per-fold new_sides label, which is
    // relative to fold boundaries). A duplicated or dropped pair
    // breaks the row-hash compare.
    Q("q403_streamed_jaccard_fold",
      Some("""WITH tk AS (SELECT doc_id,
             |  unnest(list_distinct(string_split(text, ' '))) AS w
             |  FROM documents WHERE doc_id < 600),
             |sz AS (SELECT doc_id, count(*)::BIGINT AS n FROM tk GROUP BY doc_id),
             |co AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*)::BIGINT AS c
             |  FROM tk x JOIN tk y ON x.w = y.w AND x.doc_id < y.doc_id
             |  GROUP BY 1, 2),
             |j AS (SELECT a, b, sa.n AS n_a, sb.n AS n_b, c
             |  FROM co JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b)
             |SELECT a AS a_id, b AS b_id, n_a, n_b, c AS n_common,
             |  ((1000000 * c) // (n_a + n_b - c))::BIGINT AS jacc_ppm
             |FROM j WHERE 20 * c >= 19 * (n_a + n_b - c)
             |  AND (a % 5 = 0 OR b % 5 = 0)
             |ORDER BY a_id, b_id""".stripMargin),
      (s, dir) => {
        val docs = tp(s, dir, "documents", "doc_id").where(col("doc_id") < 600)
        // pin the corpus between folds: fold k's corpus feeds the
        // bloom build, the semi-join AND the next fold's union — and
        // without the pin fold 2 recomputes fold 0+1's whole chain
        // (exactly how a real stream holds its state, too)
        var corpus = docs.where(col("doc_id") % 5 =!= 0).localCheckpoint()
        val folds = (0 to 2).map { kth =>
          val batch = docs.where(col("doc_id") % 5 === 0 &&
            (col("doc_id") / 5) % 3 === kth)
          val out = graft.operators.DedupOps.exactJaccardJoinIncremental(
            corpus, batch, "doc_id", "text", tNum = 19L, tDen = 20L)
            .drop("new_sides")
          corpus = corpus.unionByName(batch).localCheckpoint()
          out
        }
        folds.reduce(_ unionByName _).orderBy("a_id", "b_id")
      })
    ,

    // ---- CDC-chunk near-dup calibration curve --------------------
    // How well does CHUNK-set overlap (the cheap, resync-stable CDC
    // signal) predict exact token Jaccard >= 1/2? Candidate pairs =
    // docs sharing any content-defined chunk (equi-join on the chunk
    // hash — never all-pairs); each pair's chunk-Jaccard estimate is
    // binned by decile and scored against the exact token test — the
    // reliability diagram that calibrates a chunk-level dedup
    // threshold before a 100 TB run. Inner-join semantics: pairs
    // sharing zero chunks are absent (they carry no CDC signal).
    Q("q405_cdc_calibration",
      Some(s"""WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents WHERE doc_id < 200),
              |kh AS (SELECT doc_id, text, n, CASE WHEN n >= 9
              |  THEN ${D.kgramHashes("text", 8)} ELSE []::BIGINT[] END AS h FROM t),
              |cuts AS (SELECT doc_id, text, n, list_concat(list_concat(
              |  [1], CASE WHEN n >= 9 THEN list_filter(range(2, n - 6), p -> h[p] % 64 = 0)
              |       ELSE []::BIGINT[] END), [n + 1]) AS c FROM kh),
              |st AS (SELECT doc_id, text, n, flatten(list_transform(range(1, len(c)),
              |  j -> range(c[j], c[j + 1], 256))) AS s FROM cuts WHERE n > 0),
              |ch AS (SELECT doc_id, unnest(list_transform(range(1, len(s) + 1), j ->
              |  substring(text, s[j]::INT, ((CASE WHEN j + 1 <= len(s)
              |     THEN s[j + 1] ELSE n + 1 END) - s[j])::INT))) AS ctext FROM st),
              |hs AS (SELECT DISTINCT doc_id, ${D.rollingHash("ctext")} AS hh FROM ch),
              |csz AS (SELECT doc_id, count(*)::BIGINT AS n FROM hs GROUP BY doc_id),
              |cco AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*)::BIGINT AS c
              |  FROM hs x JOIN hs y ON x.hh = y.hh AND x.doc_id < y.doc_id
              |  GROUP BY 1, 2),
              |est AS (SELECT a, b,
              |  ((1000000 * c) // (sa.n + sb.n - c))::BIGINT AS est_ppm
              |  FROM cco JOIN csz sa ON sa.doc_id = a JOIN csz sb ON sb.doc_id = b),
              |tk AS (SELECT doc_id,
              |  unnest(list_distinct(string_split(text, ' '))) AS w FROM t),
              |tsz AS (SELECT doc_id, count(*)::BIGINT AS n FROM tk GROUP BY doc_id),
              |tco AS (SELECT e.a, e.b, count(*)::BIGINT AS tc FROM est e
              |  JOIN tk x ON x.doc_id = e.a JOIN tk y ON y.doc_id = e.b
              |    AND y.w = x.w
              |  GROUP BY e.a, e.b),
              |v AS (SELECT est.est_ppm // 100000 AS bin,
              |  CASE WHEN 2 * coalesce(tco.tc, 0) >= (ta.n + tb.n - coalesce(tco.tc, 0))
              |       THEN 1 ELSE 0 END AS y
              |  FROM est LEFT JOIN tco ON tco.a = est.a AND tco.b = est.b
              |  JOIN tsz ta ON ta.doc_id = est.a JOIN tsz tb ON tb.doc_id = est.b)
              |SELECT bin::BIGINT AS bin, count(*)::BIGINT AS n_pairs,
              |  sum(y)::BIGINT AS n_true,
              |  ((1000000 * sum(y)) // count(*))::BIGINT AS precision_ppm
              |FROM v GROUP BY bin ORDER BY bin""".stripMargin),
      (s, dir) => {
        import TextHash.{spark => H}
        val docs = tp(s, dir, "documents", "doc_id").where(col("doc_id") < 200)
        val hs = graft.operators.TextOps
          .cdcChunks(docs, "doc_id", "text", k = 8, mod = 64, maxLen = 256)
          .select(col("doc_id"), expr(H.rollingHash("chunk_text")).as("hh"))
          .distinct()
          .localCheckpoint() // feeds the size agg AND both pair sides
        val csz = hs.groupBy(col("doc_id"))
          .agg(count(lit(1)).cast("bigint").as("n"))
        val cco = hs.as("x")
          .join(hs.as("y"), col("x.hh") === col("y.hh") &&
            col("x.doc_id") < col("y.doc_id"))
          .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
          .agg(count(lit(1)).cast("bigint").as("c"))
        val est = cco
          .join(broadcast(csz.select(col("doc_id").as("a"), col("n").as("na"))),
            Seq("a"))
          .join(broadcast(csz.select(col("doc_id").as("b"), col("n").as("nb"))),
            Seq("b"))
          .select(col("a"), col("b"),
            expr("(1000000L * c) div (na + nb - c)").cast("bigint")
              .as("est_ppm"))
          .localCheckpoint() // feeds the token probe AND the bin agg
        val tk = docs
          .select(col("doc_id"),
            explode(array_distinct(split(col("text"), " "))).as("w"))
        val tsz = tk.groupBy(col("doc_id"))
          .agg(count(lit(1)).cast("bigint").as("n"))
        val tco = est.select(col("a"), col("b"))
          .join(tk.select(col("doc_id").as("a"), col("w")), Seq("a"))
          .join(tk.select(col("doc_id").as("b"), col("w")), Seq("b", "w"))
          .groupBy(col("a"), col("b"))
          .agg(count(lit(1)).cast("bigint").as("tc"))
        est
          .join(tco, Seq("a", "b"), "left")
          .join(broadcast(tsz.select(col("doc_id").as("a"), col("n").as("tna"))),
            Seq("a"))
          .join(broadcast(tsz.select(col("doc_id").as("b"), col("n").as("tnb"))),
            Seq("b"))
          .select(expr("est_ppm div 100000L").as("bin"),
            when(expr("2L * coalesce(tc, 0L) >= (tna + tnb - coalesce(tc, 0L))"),
              1L).otherwise(0L).as("y"))
          .groupBy(col("bin").cast("bigint").as("bin"))
          .agg(count(lit(1)).cast("bigint").as("n_pairs"),
            sum(col("y")).cast("bigint").as("n_true"))
          .withColumn("precision_ppm",
            expr("(1000000L * n_true) div n_pairs").cast("bigint"))
          .orderBy("bin")
      })
    ,

    // ---- capstone curation composition ---------------------------
    // Three round-7 operators end-to-end, oracle-exact through every
    // stage: (1) bigram-LM quality gate (scored odd-id docs with
    // avg surprisal <= 460 centibits survive), (2) EXACT Jaccard
    // clone removal at 19/20 (id-greedy: any doc that is the larger
    // id of a qualifying pair drops), (3) IPF raking of the survivor
    // source x lang grid to uniform margins (3 iterations). Scoped
    // to doc_id < 1000 to bound the oracle's brute-force pair join.
    Q("q370_curation_v3", {
      val steps = (1 to 6).map { i =>
        val prev = if (i == 1) "cells0" else s"s${i - 1}"
        val (key, den) = if (i % 2 == 1) ("r", "tt.rr") else ("c", "tt.cc")
        s"""m$i AS (SELECT $key, sum(n * w)::BIGINT AS x FROM $prev GROUP BY $key),
           |s$i AS (SELECT p.r, p.c, p.n,
           |  (p.w * ((1000000 * tt.nn) // $den)) // m$i.x AS w
           |  FROM $prev p JOIN m$i USING ($key) CROSS JOIN tt)""".stripMargin
      }.mkString(",\n")
      Some(s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
              |  FROM documents WHERE doc_id < 1000),
              |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
              |    gi -> {'w1': t[gi], 'w2': t[gi + 1]})) AS b
              |  FROM toks WHERE len(t) >= 2),
              |e AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
              |tr AS (SELECT w1, w2 FROM e WHERE doc_id % 2 = 0),
              |c12 AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM tr
              |  GROUP BY w1, w2),
              |c1 AS (SELECT w1, count(*)::BIGINT AS c1 FROM tr GROUP BY w1),
              |v AS (SELECT count(DISTINCT w)::BIGINT AS vv FROM
              |  (SELECT unnest(t) AS w FROM toks WHERE doc_id % 2 = 0)),
              |sc AS (SELECT e.doc_id,
              |  length(bin(coalesce(c1.c1, 0) + v.vv))
              |    - length(bin(coalesce(c12.c12, 0) + 1)) AS bits
              |  FROM e LEFT JOIN c12 USING (w1, w2) LEFT JOIN c1 USING (w1)
              |  CROSS JOIN v WHERE e.doc_id % 2 = 1),
              |lm AS (SELECT doc_id FROM sc GROUP BY doc_id
              |  HAVING (100 * sum(bits)) // count(*) <= 460),
              |kept AS (SELECT d.doc_id, d.text, d.source, d.lang
              |  FROM documents d JOIN lm USING (doc_id)),
              |tk AS (SELECT doc_id,
              |  unnest(list_distinct(string_split(text, ' '))) AS w FROM kept),
              |sz AS (SELECT doc_id, count(*)::BIGINT AS n FROM tk
              |  GROUP BY doc_id),
              |co AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*)::BIGINT AS cc
              |  FROM tk x JOIN tk y ON x.w = y.w AND x.doc_id < y.doc_id
              |  GROUP BY 1, 2),
              |drops AS (SELECT DISTINCT co.b AS doc_id FROM co
              |  JOIN sz sa ON sa.doc_id = co.a JOIN sz sb ON sb.doc_id = co.b
              |  WHERE 20 * cc >= 19 * (sa.n + sb.n - cc)),
              |surv AS (SELECT kept.* FROM kept
              |  WHERE doc_id NOT IN (SELECT doc_id FROM drops)),
              |cells0 AS (SELECT source AS r, lang AS c, count(*)::BIGINT AS n,
              |  1000000::BIGINT AS w FROM surv GROUP BY source, lang),
              |tt AS (SELECT sum(n)::BIGINT AS nn,
              |  count(DISTINCT r)::BIGINT AS rr,
              |  count(DISTINCT c)::BIGINT AS cc FROM cells0),
              |$steps
              |SELECT r AS row_key, c AS col_key, n, w::BIGINT AS w_ppm
              |FROM s6 ORDER BY row_key, col_key""".stripMargin)
    },
      (s, dir) => {
        val docs = tp(s, dir, "documents", "doc_id").where(col("doc_id") < 1000)
        val lm = TextOps.bigramLmSurprisal(docs, "doc_id", "text")
          .where(col("avg_bits_x100") <= 460L)
          .select(col("id").as("doc_id"))
        val kept = docs.join(lm, Seq("doc_id")).localCheckpoint()
        val drops = graft.operators.DedupOps
          .exactJaccardJoin(kept, "doc_id", "text", 19L, 20L)
          .select(col("b_id").as("doc_id")).distinct()
        val survivors = kept.join(drops, Seq("doc_id"), "left_anti")
        graft.operators.Mixing.ipfRaking(survivors, "source", "lang", iters = 3)
          .orderBy("row_key", "col_key")
      })
    ,

    // ---- Moore–Lewis cross-entropy-difference selection ----------
    // Which non-German docs look most German? In-domain bigram LM on
    // lang='de', general LM on the rest, Δ = whole-bit cost gap,
    // signed sign-split average, top 20 lowest.
    Q("q384_moore_lewis",
      Some("""WITH toks AS (SELECT doc_id,
             |  CASE WHEN lang = 'de' THEN 1 ELSE 0 END AS dom,
             |  string_split(text, ' ') AS t FROM documents),
             |bg AS (SELECT doc_id, dom, unnest(list_transform(range(1, len(t)),
             |    gi -> {'w1': t[gi], 'w2': t[gi + 1]})) AS b
             |  FROM toks WHERE len(t) >= 2),
             |e AS (SELECT doc_id, dom, b.w1 AS w1, b.w2 AS w2 FROM bg),
             |ci12 AS (SELECT w1, w2, count(*)::BIGINT AS ci12 FROM e
             |  WHERE dom = 1 GROUP BY 1, 2),
             |ci1 AS (SELECT w1, count(*)::BIGINT AS ci1 FROM e
             |  WHERE dom = 1 GROUP BY 1),
             |cg12 AS (SELECT w1, w2, count(*)::BIGINT AS cg12 FROM e
             |  WHERE dom = 0 GROUP BY 1, 2),
             |cg1 AS (SELECT w1, count(*)::BIGINT AS cg1 FROM e
             |  WHERE dom = 0 GROUP BY 1),
             |vi AS (SELECT count(DISTINCT w)::BIGINT AS vvi FROM
             |  (SELECT unnest(t) AS w FROM toks WHERE dom = 1)),
             |vg AS (SELECT count(DISTINCT w)::BIGINT AS vvg FROM
             |  (SELECT unnest(t) AS w FROM toks WHERE dom = 0)),
             |sc AS (SELECT e.doc_id,
             |  (length(bin(coalesce(ci1.ci1, 0) + vi.vvi))
             |     - length(bin(coalesce(ci12.ci12, 0) + 1)))
             |  - (length(bin(coalesce(cg1.cg1, 0) + vg.vvg))
             |     - length(bin(coalesce(cg12.cg12, 0) + 1))) AS d
             |  FROM e LEFT JOIN cg12 USING (w1, w2)
             |    LEFT JOIN cg1 USING (w1)
             |    LEFT JOIN ci12 USING (w1, w2) LEFT JOIN ci1 USING (w1)
             |  CROSS JOIN vi CROSS JOIN vg WHERE e.dom = 0),
             |ag AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams,
             |  sum(d)::BIGINT AS sd FROM sc GROUP BY 1)
             |SELECT doc_id AS id, n_bigrams,
             |  (CASE WHEN sd >= 0 THEN (100 * sd) // n_bigrams
             |   ELSE -((100 * (-sd)) // n_bigrams) END)::BIGINT AS delta_x100
             |FROM ag ORDER BY delta_x100, id LIMIT 20""".stripMargin),
      (s, dir) =>
        TextOps.mooreLewisSelect(tp(s, dir, "documents", "doc_id"), "doc_id", "text",
          col("lang") === "de", k = 20))
    ,

    // ---- banded-Hamming fingerprint pairs (Multimodal core) ------
    // The band/cap/verify pipeline behind nearDupImagePairs, driven
    // through its oracle-checkable entry (nearDupHashPairs) with a
    // 60-bit simhash standing in for the image dHash: 8 byte-bands,
    // two-phase hot-band cap (over-cap band values drop BEFORE the
    // self-join — this round's boundaryOverlapPairs idiom), exact
    // bit_count(xor) verification, pigeonhole-lossless at
    // hamming <= 6 < 8 bands.
    Q("q440_hash_band_pairs", {
      val branches = (0 until 8).map { b =>
        s"(sim // ${1L << (8 * b)}) % 256"
      }
      val bandsSql = branches.zipWithIndex.map { case (e, b) =>
        s"SELECT doc_id, sim, $b AS bk, $e AS bv FROM sim" }
        .mkString("\n    UNION ALL\n    ")
      Some(s"""WITH toks AS (SELECT doc_id, $duckToks AS t FROM documents
              |  WHERE doc_id < 2000),
              |hs AS (SELECT doc_id, ${D.tokenHashesWide("t", 60)} AS hashes FROM toks),
              |sim AS (SELECT doc_id, ${D.simhashN("hashes", 60)} AS sim FROM hs),
              |bands AS (
              |    $bandsSql),
              |cnts AS (SELECT bk, bv, count(*) AS n FROM bands GROUP BY 1, 2),
              |kept AS (SELECT bands.* FROM bands JOIN cnts USING (bk, bv)
              |  WHERE cnts.n <= 100),
              |pairs AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id,
              |    x.sim AS sa, y.sim AS sb
              |  FROM kept x JOIN kept y
              |    ON x.bk = y.bk AND x.bv = y.bv AND x.doc_id < y.doc_id)
              |SELECT bit_count(xor(sa, sb))::BIGINT AS hamming,
              |  count(*)::BIGINT AS n_pairs,
              |  min(a_id)::BIGINT AS min_a, max(b_id)::BIGINT AS max_b
              |FROM pairs WHERE bit_count(xor(sa, sb)) <= 6
              |GROUP BY 1 ORDER BY hamming""".stripMargin)
    },
      (s, dir) => {
        val docs = tp(s, dir, "documents", "doc_id")
          .where(col("doc_id") < 2000)
        val sims = TextOps.withSimhash(docs, "text", 60, "sim")
        graft.operators.Multimodal.nearDupHashPairs(
          sims, "doc_id", "sim", maxHamming = 6, bands = 8,
          maxBandFreq = 100L)
          .groupBy(col("hamming"))
          .agg(count(lit(1)).cast("bigint").as("n_pairs"),
            min(col("a_id")).cast("bigint").as("min_a"),
            max(col("b_id")).cast("bigint").as("max_b"))
          .orderBy(col("hamming"))
      })
  )
}
