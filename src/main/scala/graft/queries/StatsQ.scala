package graft.queries

import graft.functions.TextHash
import graft.operators.EvalStats
import org.apache.spark.sql.functions._

/** Driver-checkable witnesses for the evaluation-statistics family
  * ([[graft.operators.EvalStats]]): pairwise win rates, Poisson-
  * bootstrap CIs, rank distance, and the two-proportion z² test.
  * North-star extensions — the reference has no analytics operators
  * (SURVEY.md §0). All integer-exact, oracle-verifiable.
  */
object StatsQ {

  import Q.{t, tp}
  import TextHash.{duck => D}

  /** DuckDB rendering of [[graft.operators.TimeSeries.seriesCorrelation]]
    * over events.event_type daily counts at the given lag — the
    * moment sums, the spliced [[graft.util.ExactMath]] isqrt ladder,
    * and the sign-split ppm projection. */
  private def seriesCorrSql(lag: Int): String = {
    val pairPred = if (lag == 0) "a.k < b.k" else "a.k <> b.k"
    val ladder = graft.util.ExactMath.duckIsqrtSteps("rt").zipWithIndex
      .map { case (sel, i) =>
        val from = if (i == 0) "v" else s"i${i - 1}"
        s"i$i AS ($sel FROM $from)"
      }.mkString(",\n")
    s"""WITH e AS (SELECT event_type AS k,
       |  (epoch_us(ts) * 1000) // 86400000000000 AS b FROM events),
       |c AS (SELECT k, b, count(*)::BIGINT AS c FROM e GROUP BY 1, 2),
       |sp AS (SELECT min(b) AS bmin, max(b) AS bmax FROM e),
       |st AS (SELECT k,
       |  sum(CASE WHEN b <= bmax - $lag THEN c ELSE 0 END)::BIGINT AS sx,
       |  sum(CASE WHEN b <= bmax - $lag THEN c * c ELSE 0 END)::BIGINT AS sxx,
       |  sum(CASE WHEN b >= bmin + $lag THEN c ELSE 0 END)::BIGINT AS sy,
       |  sum(CASE WHEN b >= bmin + $lag THEN c * c ELSE 0 END)::BIGINT AS syy
       |  FROM c CROSS JOIN sp GROUP BY k),
       |xy AS (SELECT ca.k AS ka, cb.k AS kb, sum(ca.c * cb.c)::BIGINT AS sxy
       |  FROM c ca JOIN c cb ON ca.b = cb.b - $lag AND ca.k <> cb.k
       |  GROUP BY 1, 2),
       |p AS (SELECT a.k AS ka, b.k AS kb, a.sx, a.sxx, b.sy, b.syy,
       |  coalesce(xy.sxy, 0)::BIGINT AS sxy,
       |  (sp.bmax - sp.bmin + 1 - $lag)::BIGINT AS n
       |  FROM st a JOIN st b ON $pairPred
       |  LEFT JOIN xy ON xy.ka = a.k AND xy.kb = b.k
       |  CROSS JOIN sp),
       |v AS (SELECT ka, kb, n,
       |  (n::HUGEINT * sxy - sx::HUGEINT * sy) AS num,
       |  (n::HUGEINT * sxx - sx::HUGEINT * sx) AS vx,
       |  (n::HUGEINT * syy - sy::HUGEINT * sy) AS vy,
       |  ((n::HUGEINT * sxx - sx::HUGEINT * sx)
       |    * (n::HUGEINT * syy - sy::HUGEINT * sy)) AS x FROM p),
       |$ladder
       |SELECT ka AS key_a, kb AS key_b, n AS n_buckets,
       |  (CASE WHEN vx <= 0 OR vy <= 0 THEN NULL
       |   WHEN num >= 0 THEN (1000000::HUGEINT * num) // rt
       |   ELSE -((1000000::HUGEINT * -num) // rt) END)::BIGINT AS r_ppm
       |FROM i4 ORDER BY key_a, key_b""".stripMargin
  }

  val qs: Seq[Q] = Seq(

    // ---- pairwise model win-rate matrix --------------------------
    // "Models" = event types, "items" = users, score = the user's
    // micro-scaled value total for that type; ties count half.
    Q("q267_winrate_matrix",
      Some("""WITH s AS (SELECT event_type AS m, user_id AS i,
             |  sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS sc
             |  FROM events GROUP BY 1, 2),
             |p AS (SELECT a.m AS model_a, b.m AS model_b,
             |  count(*)::BIGINT AS n_common,
             |  sum(CASE WHEN a.sc > b.sc THEN 2 WHEN a.sc = b.sc THEN 1 ELSE 0 END)::BIGINT AS w2
             |  FROM s a JOIN s b ON a.i = b.i AND a.m < b.m GROUP BY 1, 2)
             |SELECT model_a, model_b, n_common,
             |  ((1000000 * w2) // (2 * n_common))::BIGINT AS win_ppm
             |FROM p ORDER BY model_a, model_b""".stripMargin),
      (s, dir) => {
        val scores = t(s, dir, "events")
          .groupBy(col("event_type"), col("user_id"))
          .agg(sum(expr("cast(floor(value * 1000000d + 0.5d) as bigint)"))
            .as("score"))
        EvalStats.winRateMatrix(scores, "event_type", "user_id", "score")
          .orderBy("model_a", "model_b")
      }),

    // ---- Copeland ranking from head-to-head majorities -----------
    // One total order over "models" (event types): a beats b when it
    // wins the MAJORITY of common users; score = 2*wins + ties.
    Q("q316_copeland",
      Some("""WITH s AS (SELECT event_type AS m, user_id AS i,
             |  sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS sc
             |  FROM events GROUP BY 1, 2),
             |p AS (SELECT a.m AS ma, b.m AS mb,
             |  sum(CASE WHEN a.sc > b.sc THEN 1 WHEN a.sc < b.sc THEN -1 ELSE 0 END) AS adv
             |  FROM s a JOIN s b ON a.i = b.i AND a.m <> b.m GROUP BY 1, 2),
             |c AS (SELECT ma AS model,
             |  sum(CASE WHEN adv > 0 THEN 1 ELSE 0 END)::BIGINT AS wins,
             |  sum(CASE WHEN adv = 0 THEN 1 ELSE 0 END)::BIGINT AS ties,
             |  sum(CASE WHEN adv < 0 THEN 1 ELSE 0 END)::BIGINT AS losses
             |  FROM p GROUP BY 1)
             |SELECT model, wins, ties, losses,
             |  (2 * wins + ties)::BIGINT AS copeland2
             |FROM c ORDER BY copeland2 DESC, model""".stripMargin),
      (s, dir) => {
        val scores = t(s, dir, "events")
          .groupBy(col("event_type"), col("user_id"))
          .agg(sum(expr("cast(floor(value * 1000000d + 0.5d) as bigint)"))
            .as("score"))
        EvalStats.copelandScores(scores, "event_type", "user_id", "score")
          .orderBy(col("copeland2").desc, col("model"))
      }),

    // ---- Poisson-bootstrap CI of mean doc length -----------------
    // 64 deterministic Poisson(1) replicates from the portable
    // rolling-hash family; nearest-rank 2.5/50/97.5 order statistics
    // of the replicate means.
    Q("q268_bootstrap_ci", {
      val u = EvalStats.uniformDuck("h", "b")
      val w = EvalStats.poissonWeightDuck("u")
      Some(s"""WITH hx AS (SELECT ${D.rollingHash("text")} AS h, n_chars AS x FROM documents),
              |e AS (SELECT h, x, unnest(range(0, 64)) AS b FROM hx),
              |uu AS (SELECT x, b, $u AS u FROM e),
              |w AS (SELECT b, x, $w AS w FROM uu),
              |m AS (SELECT b, sum(w * x)::BIGINT AS s, sum(w)::BIGINT AS n
              |  FROM w GROUP BY b),
              |mm AS (SELECT b, ((1000000 * s) // nullif(n, 0))::BIGINT AS mean_micro FROM m),
              |r AS (SELECT b, mean_micro,
              |  row_number() OVER (ORDER BY mean_micro, b) AS rk FROM mm)
              |SELECT CASE rk WHEN 2 THEN 'lo' WHEN 32 THEN 'med' ELSE 'hi' END AS stat,
              |  mean_micro
              |FROM r WHERE rk IN (2, 32, 63) ORDER BY mean_micro, stat""".stripMargin)
    },
      (s, dir) =>
        EvalStats.poissonBootstrapCi(
          t(s, dir, "documents"), "text", "n_chars", reps = 64)
          .orderBy("mean_micro", "stat")),

    // ---- Spearman footrule rank distance per language ------------
    // Length order vs hash-score order; ties via doubled average
    // ranks (2r + c - 1), normalized ppm against the n² maximum.
    Q("q269_footrule",
      Some(s"""WITH s AS (SELECT lang, n_chars AS x,
              |  ${D.rollingHash("text")} % 100000 AS y FROM documents),
              |r AS (SELECT lang,
              |  2 * rank() OVER (PARTITION BY lang ORDER BY x)
              |    + count(*) OVER (PARTITION BY lang, x) - 1 AS rx2,
              |  2 * rank() OVER (PARTITION BY lang ORDER BY y)
              |    + count(*) OVER (PARTITION BY lang, y) - 1 AS ry2
              |  FROM s),
              |g AS (SELECT lang, count(*)::BIGINT AS n,
              |  sum(abs(rx2 - ry2))::BIGINT AS footrule2 FROM r GROUP BY lang)
              |SELECT lang, n, footrule2,
              |  ((1000000 * footrule2) // (n * n))::BIGINT AS footrule_ppm
              |FROM g ORDER BY lang""".stripMargin),
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("lang"),
          col("n_chars").as("x"),
          expr(s"${TextHash.spark.rollingHash("text")} % 100000L").as("y"))
        EvalStats.spearmanFootrule(d, "lang", "x", "y").orderBy("lang")
      }),

    // ---- conjunctive (boolean-AND) retrieval ---------------------
    // Docs containing ALL of {spark, window, hash}, ranked by total
    // query-term frequency; term filter applies before any shuffle.
    Q("q271_boolean_topk",
      Some(s"""WITH tk AS (SELECT doc_id, unnest(${D.tokens("text")}) AS tok FROM documents),
              |f AS (SELECT doc_id, tok FROM tk WHERE tok IN ('spark', 'window', 'hash')),
              |g AS (SELECT doc_id, count(DISTINCT tok)::BIGINT AS nt,
              |  count(*)::BIGINT AS score FROM f GROUP BY doc_id)
              |SELECT doc_id, score FROM g WHERE nt = 3
              |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin),
      (s, dir) =>
        graft.operators.Relevance.conjunctiveTopK(
          t(s, dir, "documents"), "doc_id", "text",
          Seq("spark", "window", "hash"), k = 20)),

    // ---- cross-source quantile normalization ---------------------
    // Every source's length distribution mapped onto the pooled one:
    // rank rs of ns in-source -> pooled ordinal 1+((rs-1)(N-1))//(ns-1).
    Q("q272_quantile_normalize",
      Some("""WITH d AS (SELECT doc_id, source, n_chars FROM documents),
             |p AS (SELECT n_chars AS qnorm,
             |  row_number() OVER (ORDER BY n_chars, doc_id) AS tord FROM d),
             |t AS (SELECT count(*)::BIGINT AS N FROM d),
             |r AS (SELECT doc_id, source, n_chars,
             |  row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id)::BIGINT AS rs,
             |  count(*) OVER (PARTITION BY source)::BIGINT AS ns FROM d)
             |SELECT r.doc_id, r.source, r.n_chars, p.qnorm
             |FROM r CROSS JOIN t JOIN p ON p.tord =
             |  CASE WHEN r.ns > 1 THEN 1 + ((r.rs - 1) * (t.N - 1)) // (r.ns - 1)
             |       ELSE 1 + (t.N - 1) // 2 END
             |ORDER BY r.doc_id""".stripMargin),
      (s, dir) =>
        graft.operators.RobustStats.quantileNormalize(
          t(s, dir, "documents").select("doc_id", "source", "n_chars"),
          "n_chars", "source", "doc_id")
          .select("doc_id", "source", "n_chars", "qnorm")
          .orderBy("doc_id")),

    // ---- link prediction on the collocation graph ----------------
    // Common-neighbor + neighborhood-Jaccard scores for non-edges of
    // the q176/q260 token co-occurrence graph (top-100 edges, maxDist
    // 2). The operator's hub cap (maxDegree 10000) never binds here —
    // degrees are <= 99 — so the oracle omits it.
    Q("q273_link_prediction",
      Some(s"""WITH toks AS (SELECT ${D.tokens("text")} AS t FROM documents),
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
              |e AS (SELECT DISTINCT tok_a AS a, tok_b AS b FROM te WHERE tok_a <> tok_b),
              |adj AS (SELECT a AS w, b AS u FROM e UNION ALL SELECT b, a FROM e),
              |deg AS (SELECT w AS node, count(*)::BIGINT AS dg FROM adj GROUP BY 1),
              |cand AS (SELECT x.u AS u, y.u AS v, count(*)::BIGINT AS cn
              |  FROM adj x JOIN adj y ON x.w = y.w AND x.u < y.u GROUP BY 1, 2),
              |ne AS (SELECT c.u, c.v, c.cn FROM cand c
              |  LEFT JOIN e ON e.a = c.u AND e.b = c.v WHERE e.a IS NULL)
              |SELECT ne.u, ne.v, ne.cn, du.dg AS du, dv.dg AS dv,
              |  ((1000000 * ne.cn) // (du.dg + dv.dg - ne.cn))::BIGINT AS jaccard_ppm
              |FROM ne JOIN deg du ON du.node = ne.u JOIN deg dv ON dv.node = ne.v
              |ORDER BY ne.cn DESC, jaccard_ppm DESC, ne.u, ne.v LIMIT 30""".stripMargin),
      (s, dir) => {
        val edges = graft.operators.Relevance.cooccurrencePairs(
          tp(s, dir, "documents", "doc_id"), "text", maxDist = 2, k = 100)
          .select(col("tok_a"), col("tok_b"))
        graft.operators.Components.linkPrediction(edges, "tok_a", "tok_b", k = 30)
      }),

    // ---- autocorrelation of the hourly event-count series --------
    // Integer-exact ACF at lags 1..6 (centered values N·x−S clear the
    // mean's denominator; the N² scale cancels in the ratio).
    Q("q274_acf",
      Some("""WITH x AS (SELECT (epoch_us(ts) * 1000) // 3600000000000 AS h FROM events),
             |c AS (SELECT h, count(*)::BIGINT AS x FROM x GROUP BY h),
             |t AS (SELECT count(*)::BIGINT AS N, sum(x)::BIGINT AS S FROM c),
             |ce AS (SELECT h, (t.N * c.x - t.S)::HUGEINT AS cv FROM c, t),
             |d AS (SELECT sum(cv * cv) AS den FROM ce),
             |l AS (SELECT CAST(unnest([1, 2, 3, 4, 5, 6]) AS BIGINT) AS lag),
             |p AS (SELECT l.lag, a.cv AS ca, b.cv AS cb
             |  FROM ce a CROSS JOIN l JOIN ce b ON b.h = a.h + l.lag),
             |nm AS (SELECT lag, count(*)::BIGINT AS n_pairs, sum(ca * cb) AS num
             |  FROM p GROUP BY lag)
             |SELECT lag, n_pairs,
             |  (CASE WHEN d.den = 0 THEN NULL ELSE
             |    (CASE WHEN nm.num < 0 THEN -1 ELSE 1 END) *
             |    ((1000000 * abs(nm.num)) // d.den) END)::BIGINT AS acf_ppm
             |FROM nm, d ORDER BY lag""".stripMargin),
      (s, dir) =>
        graft.operators.TimeSeries.acf(
          t(s, dir, "events"), "ts", lags = Seq(1, 2, 3, 4, 5, 6),
          bucketSec = 3600L)),

    // ---- day-of-week seasonal profile ----------------------------
    // Phase = epoch-day mod 7 (pure integer; phase 0 = Thursday).
    Q("q275_seasonal_index",
      Some("""WITH x AS (SELECT ((epoch_us(ts) * 1000) // 86400000000000) % 7 AS phase FROM events),
             |c AS (SELECT phase::BIGINT AS phase, count(*)::BIGINT AS n FROM x GROUP BY 1),
             |t AS (SELECT sum(n)::BIGINT AS T FROM c)
             |SELECT phase, n, ((1000000 * n) // t.T)::BIGINT AS share_ppm,
             |  ((1000000 * 7 * n) // t.T)::BIGINT AS index_ppm
             |FROM c, t ORDER BY phase""".stripMargin),
      (s, dir) =>
        graft.operators.TimeSeries.seasonalIndex(
          t(s, dir, "events"), "ts", unitSec = 86400L, period = 7)),

    // ---- run-length layout diagnostics ---------------------------
    // RLE-friendliness of lineitem's flag columns under the natural
    // (l_orderkey, l_linenumber) order; adjacency via the global-
    // ordinal decomposition, not a single-reducer window.
    Q("q276_run_length",
      Some("""WITH o AS (SELECT l_returnflag, l_linestatus,
             |  lead(l_returnflag) OVER w AS nrf,
             |  lead(l_linestatus) OVER w AS nls
             |  FROM lineitem WINDOW w AS (ORDER BY l_orderkey, l_linenumber)),
             |a AS (SELECT count(*)::BIGINT AS n,
             |  (1 + sum(CASE WHEN nrf IS NOT NULL AND nrf <> l_returnflag THEN 1 ELSE 0 END))::BIGINT AS runs_rf,
             |  (1 + sum(CASE WHEN nls IS NOT NULL AND nls <> l_linestatus THEN 1 ELSE 0 END))::BIGINT AS runs_ls
             |  FROM o)
             |SELECT 'l_linestatus' AS column_name, n AS n_rows, runs_ls AS n_runs,
             |  ((1000000 * n) // runs_ls)::BIGINT AS avg_run_ppm FROM a
             |UNION ALL
             |SELECT 'l_returnflag', n, runs_rf, ((1000000 * n) // runs_rf)::BIGINT FROM a
             |ORDER BY column_name""".stripMargin),
      (s, dir) =>
        graft.operators.Sequencing.runLengthStats(
          t(s, dir, "lineitem"), "l_orderkey", "l_linenumber",
          Seq("l_returnflag", "l_linestatus"))),

    // ---- group-aware (leakage-safe) split ------------------------
    // All events of one user land in the same split (hash of the
    // GROUP key, not the row); the witness also counts cross-split
    // groups, which must be zero by construction.
    Q("q277_group_split", {
      val h = s"((${TextHash.MixA} * ${D.rollingHash("(user_id::VARCHAR)")} " +
        s"+ ${TextHash.MixB}) % ${TextHash.P})"
      Some(s"""WITH s AS (SELECT user_id,
              |  CASE WHEN $h % 1000 < 800 THEN 'train' ELSE 'eval' END AS split
              |  FROM events),
              |l AS (SELECT sum(CASE WHEN k > 1 THEN 1 ELSE 0 END)::BIGINT AS n_leaked
              |  FROM (SELECT user_id, count(DISTINCT split) AS k FROM s GROUP BY 1)),
              |g AS (SELECT split, count(*)::BIGINT AS n_rows,
              |  count(DISTINCT user_id)::BIGINT AS n_groups FROM s GROUP BY 1)
              |SELECT g.split, g.n_rows, g.n_groups, l.n_leaked
              |FROM g, l ORDER BY g.split""".stripMargin)
    },
      (s, dir) => {
        val sp = graft.operators.Mixing.groupSplit(
          t(s, dir, "events"), "user_id", trainPermille = 800)
        val leak = sp.groupBy(col("user_id"))
          .agg(countDistinct(col("split")).as("__k"))
          .agg(sum(when(col("__k") > 1, 1L).otherwise(0L)).cast("bigint")
            .as("n_leaked"))
        sp.groupBy(col("split"))
          .agg(count(lit(1)).cast("bigint").as("n_rows"),
            countDistinct(col("user_id")).cast("bigint").as("n_groups"))
          .crossJoin(broadcast(leak))
          .orderBy("split")
      }),

    // ---- functional-dependency audit -----------------------------
    // Does l_orderkey determine l_returnflag? (It doesn't — the
    // violation rate is the witness.)
    Q("q278_fd_check",
      Some("""WITH g AS (SELECT l_orderkey, count(DISTINCT l_returnflag)::BIGINT AS nd
             |  FROM lineitem GROUP BY 1),
             |a AS (SELECT count(*)::BIGINT AS n_keys,
             |  sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END)::BIGINT AS n_violating,
             |  max(nd)::BIGINT AS max_distinct FROM g)
             |SELECT n_keys, n_violating, max_distinct,
             |  (CASE WHEN n_keys = 0 THEN NULL
             |   ELSE (1000000 * n_violating) // n_keys END)::BIGINT AS violation_ppm
             |FROM a""".stripMargin),
      (s, dir) =>
        graft.operators.Validate.functionalDependency(
          t(s, dir, "lineitem"), Seq("l_orderkey"), "l_returnflag")),

    // ---- market-basket association rules -------------------------
    // Brand pairs co-purchased in the same order; support, both
    // confidences, and lift in ppm. The operator's degenerate-basket
    // cap (1000 items) never binds here (<= 25 brands per order).
    Q("q279_assoc_rules",
      Some("""WITH bi AS (SELECT DISTINCT l_orderkey AS bk, p_brand AS it
             |  FROM lineitem JOIN part ON l_partkey = p_partkey),
             |n AS (SELECT count(DISTINCT bk)::BIGINT AS N FROM bi),
             |isup AS (SELECT it, count(*)::BIGINT AS supp FROM bi GROUP BY 1),
             |p AS (SELECT x.it AS item_a, y.it AS item_b, count(*)::BIGINT AS n_ab
             |  FROM bi x JOIN bi y ON x.bk = y.bk AND x.it < y.it GROUP BY 1, 2
             |  HAVING count(*) >= 10)
             |SELECT item_a, item_b, n_ab, a.supp AS n_a, b.supp AS n_b,
             |  ((1000000 * n_ab) // a.supp)::BIGINT AS conf_ab_ppm,
             |  ((1000000 * n_ab) // b.supp)::BIGINT AS conf_ba_ppm,
             |  ((1000000::HUGEINT * n_ab * n.N) // (a.supp::HUGEINT * b.supp))::BIGINT AS lift_ppm
             |FROM p JOIN isup a ON a.it = item_a JOIN isup b ON b.it = item_b
             |CROSS JOIN n
             |ORDER BY n_ab DESC, lift_ppm DESC, item_a, item_b LIMIT 20""".stripMargin),
      (s, dir) => {
        val li = tp(s, dir, "lineitem", "l_orderkey")
          .join(broadcast(t(s, dir, "part").select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
        graft.operators.Associations.pairRules(
          li, "l_orderkey", "p_brand", minSupport = 10L, k = 20)
      }),

    // ---- incremental aggregate maintenance -----------------------
    // Spark maintains base ⊕ CDC-delta algebraically (O(delta), no
    // fact rescan); the oracle RECOMPUTES the final state from the
    // surviving facts — equality is the materialized-view identity.
    Q("q280_incremental_agg",
      Some("""WITH v AS (SELECT event_type, event_id,
             |  CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS mv FROM events),
             |f AS (SELECT event_type, mv FROM v
             |  WHERE (event_id % 10 <> 0 AND event_id % 3 <> 0) OR event_id % 10 = 0)
             |SELECT event_type, count(*)::BIGINT AS cnt, sum(mv)::BIGINT AS total
             |FROM f GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) => {
        val v = t(s, dir, "events")
          .withColumn("mv", expr("cast(floor(value * 1000000d + 0.5d) as bigint)"))
        val base = v.where(col("event_id") % 10 =!= 0)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).cast("bigint").as("cnt"),
            sum(col("mv")).cast("bigint").as("total"))
        val delta = v.where(col("event_id") % 10 === 0)
          .select(col("event_type"), lit("I").as("op"), col("mv"))
          .unionAll(v.where(col("event_id") % 10 =!= 0 && col("event_id") % 3 === 0)
            .select(col("event_type"), lit("D").as("op"), col("mv")))
        graft.operators.IncrementalAgg.maintainCountSum(
          base, delta, Seq("event_type"), "op", "mv")
          .orderBy("event_type")
      }),

    // ---- bounded-hop BFS from a seed token -----------------------
    // Hop distances from 'spark' on the q273 collocation graph,
    // maxHops 3; the oracle unrolls three frontier expansions and
    // takes the min hop per node.
    Q("q281_bfs_hops",
      Some(s"""WITH toks AS (SELECT ${D.tokens("text")} AS t FROM documents),
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
              |e AS (SELECT DISTINCT tok_a AS a, tok_b AS b FROM te WHERE tok_a <> tok_b),
              |adj AS (SELECT a AS w, b AS u FROM e UNION ALL SELECT b, a FROM e),
              |f0 AS (SELECT 'spark' AS node, 0 AS hop),
              |f1 AS (SELECT DISTINCT adj.u AS node, 1 AS hop FROM adj JOIN f0 ON adj.w = f0.node),
              |f2 AS (SELECT DISTINCT adj.u AS node, 2 AS hop FROM adj JOIN f1 ON adj.w = f1.node),
              |f3 AS (SELECT DISTINCT adj.u AS node, 3 AS hop FROM adj JOIN f2 ON adj.w = f2.node),
              |u AS (SELECT * FROM f0 UNION ALL SELECT * FROM f1
              |  UNION ALL SELECT * FROM f2 UNION ALL SELECT * FROM f3)
              |SELECT node, min(hop)::BIGINT AS hop FROM u GROUP BY node
              |ORDER BY hop, node""".stripMargin),
      (s, dir) => {
        val edges = graft.operators.Relevance.cooccurrencePairs(
          tp(s, dir, "documents", "doc_id"), "text", maxDist = 2, k = 100)
          .select(col("tok_a"), col("tok_b"))
        val seeds = s.createDataFrame(
          java.util.List.of(org.apache.spark.sql.Row("spark")),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("node",
              org.apache.spark.sql.types.StringType))))
        graft.operators.Components.bfsDistances(
          edges, "tok_a", "tok_b", seeds, "node", maxHops = 3)
          .orderBy("hop", "node")
      }),

    // ---- Gini information gain (feature selection) ---------------
    // How much does knowing the source reduce label (lang) impurity?
    Q("q282_gini_gain",
      Some("""WITH cells AS (SELECT source AS f, lang AS l, count(*)::BIGINT AS n
             |  FROM documents GROUP BY 1, 2),
             |pc AS (SELECT l, sum(n)::HUGEINT AS nc FROM cells GROUP BY l),
             |par AS (SELECT sum(nc)::BIGINT AS n, sum(nc * nc) AS sq FROM pc),
             |fv AS (SELECT f, sum(n)::BIGINT AS nv, sum(n::HUGEINT * n) AS sqv
             |  FROM cells GROUP BY f),
             |sv AS (SELECT ((1000000::HUGEINT * sqv) // nv) AS s FROM fv),
             |ch AS (SELECT sum(s) AS ssum FROM sv)
             |SELECT par.n,
             |  (1000000 - ((1000000::HUGEINT * par.sq) // (par.n::HUGEINT * par.n)))::BIGINT AS parent_gini_ppm,
             |  (1000000 - (ch.ssum // par.n))::BIGINT AS child_gini_ppm,
             |  ((1000000 - ((1000000::HUGEINT * par.sq) // (par.n::HUGEINT * par.n)))
             |   - (1000000 - (ch.ssum // par.n)))::BIGINT AS gain_ppm
             |FROM par, ch""".stripMargin),
      (s, dir) =>
        graft.operators.Profile.giniGain(
          t(s, dir, "documents"), "source", "lang")),

    // ---- Lorenz curve of user traffic concentration --------------
    // Users decile-bucketed ascending by total micro-value mass; each
    // decile's mass and cumulative share — where the skew lives.
    Q("q283_lorenz_curve",
      Some("""WITH m AS (SELECT user_id AS e,
             |  sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS mv
             |  FROM events GROUP BY 1),
             |r AS (SELECT mv, row_number() OVER (ORDER BY mv, e) AS rk FROM m),
             |t AS (SELECT count(*)::BIGINT AS n, sum(mv)::BIGINT AS tt FROM m),
             |b AS (SELECT ((rk - 1) * 10) // t.n AS bucket, mv FROM r, t),
             |g AS (SELECT bucket, count(*)::BIGINT AS n_entities,
             |  sum(mv)::BIGINT AS mass FROM b GROUP BY bucket),
             |c AS (SELECT bucket, n_entities, mass,
             |  sum(mass) OVER (ORDER BY bucket
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM g)
             |SELECT bucket::BIGINT AS bucket, n_entities, mass,
             |  ((1000000::HUGEINT * c.cum) // t.tt)::BIGINT AS cum_share_ppm
             |FROM c, t ORDER BY bucket""".stripMargin),
      (s, dir) => {
        val v = t(s, dir, "events")
          .withColumn("mv", expr("cast(floor(value * 1000000d + 0.5d) as bigint)"))
        graft.operators.Mixing.lorenzCurve(v, "user_id", "mv", nBuckets = 10)
      }),

    // ---- ECDF scoring against a reference distribution -----------
    // Where does each src0 document's length sit in the full-corpus
    // length distribution?
    Q("q284_ecdf_score",
      Some("""WITH c AS (SELECT n_chars AS v, count(*)::BIGINT AS c
             |  FROM documents GROUP BY 1),
             |cd AS (SELECT v, sum(c) OVER (ORDER BY v
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM c),
             |t AS (SELECT count(*)::BIGINT AS N FROM documents)
             |SELECT d.doc_id, d.n_chars,
             |  ((1000000 * cd.cum) // t.N)::BIGINT AS ecdf_ppm
             |FROM documents d JOIN cd ON cd.v = d.n_chars CROSS JOIN t
             |WHERE d.source = 'src0' ORDER BY d.doc_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        graft.operators.RobustStats.ecdfScore(
          docs.where(col("source") === "src0")
            .select(col("doc_id"), col("n_chars")),
          docs, "n_chars")
          .select("doc_id", "n_chars", "ecdf_ppm")
          .orderBy("doc_id")
      }),

    // ---- Herfindahl concentration of sources per language --------
    Q("q285_hhi",
      Some("""WITH c AS (SELECT lang, source, count(*)::BIGINT AS n
             |  FROM documents GROUP BY 1, 2),
             |g AS (SELECT lang, count(*)::BIGINT AS n_subgroups,
             |  sum(n)::BIGINT AS n_rows, sum(n::HUGEINT * n) AS sq
             |  FROM c GROUP BY lang)
             |SELECT lang, n_subgroups, n_rows,
             |  ((1000000::HUGEINT * sq) // (n_rows::HUGEINT * n_rows))::BIGINT AS hhi_ppm
             |FROM g ORDER BY lang""".stripMargin),
      (s, dir) =>
        graft.operators.Mixing.concentrationIndex(
          t(s, dir, "documents"), "lang", "source")
          .orderBy("lang")),

    // ---- ordered behavior motifs (sequence mining) ---------------
    // Per-user event-type trigrams, counted corpus-wide, top 20.
    Q("q286_motifs",
      Some("""WITH o AS (SELECT user_id,
             |  list(event_type ORDER BY ts, event_id) AS seq
             |  FROM events GROUP BY user_id),
             |m AS (SELECT unnest(list_transform(range(1, len(seq) - 1),
             |  i -> seq[i] || '>' || seq[i+1] || '>' || seq[i+2])) AS motif
             |  FROM o WHERE len(seq) >= 3)
             |SELECT motif, count(*)::BIGINT AS n FROM m GROUP BY motif
             |ORDER BY n DESC, motif LIMIT 20""".stripMargin),
      (s, dir) =>
        graft.operators.Funnel.motifCounts(
          t(s, dir, "events"), "user_id", "ts", "event_id", "event_type",
          len = 3, k = 20)),

    // ---- offline change-point (largest mean shift) ---------------
    // The daily-count split boundary maximizing |mean_l - mean_r|;
    // the offline partner of the q252 CUSUM drift statistic.
    Q("q287_changepoint",
      Some("""WITH x AS (SELECT (epoch_us(ts) * 1000) // 86400000000000 AS h FROM events),
             |c AS (SELECT h, count(*)::BIGINT AS x FROM x GROUP BY h),
             |t AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS S FROM c),
             |cu AS (SELECT h, row_number() OVER (ORDER BY h) AS i,
             |  sum(x) OVER (ORDER BY h
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs FROM c),
             |sc AS (SELECT h, i::BIGINT AS n_left, (t.n - i)::BIGINT AS n_right,
             |  ((1000000 * cs) // i)::BIGINT AS mean_left_micro,
             |  ((1000000 * (t.S - cs)) // (t.n - i))::BIGINT AS mean_right_micro,
             |  ((1000000::HUGEINT * abs(cs * (t.n - i) - (t.S - cs) * i)) //
             |   (i::HUGEINT * (t.n - i)))::BIGINT AS shift_micro
             |  FROM cu, t WHERE i < t.n)
             |SELECT h::BIGINT AS split_bucket, n_left, n_right,
             |  mean_left_micro, mean_right_micro, shift_micro
             |FROM sc ORDER BY shift_micro DESC, split_bucket LIMIT 1""".stripMargin),
      (s, dir) =>
        graft.operators.TimeSeries.bestMeanShift(
          t(s, dir, "events"), "ts", bucketSec = 86400L)),

    // ---- l-diversity privacy audit -------------------------------
    // Quasi-identifier (event_type, weekday) groups with fewer than 5
    // distinct users are linkable; report the mass at risk.
    Q("q288_l_diversity",
      Some("""WITH x AS (SELECT event_type,
             |  ((epoch_us(ts) * 1000) // 86400000000000) % 7 AS dow, user_id
             |  FROM events),
             |g AS (SELECT event_type, dow, count(DISTINCT user_id)::BIGINT AS nd,
             |  count(*)::BIGINT AS n FROM x GROUP BY 1, 2)
             |SELECT count(*)::BIGINT AS n_groups,
             |  sum(CASE WHEN nd < 5 THEN 1 ELSE 0 END)::BIGINT AS n_violating,
             |  min(nd)::BIGINT AS min_diversity,
             |  sum(CASE WHEN nd < 5 THEN n ELSE 0 END)::BIGINT AS rows_at_risk
             |FROM g""".stripMargin),
      (s, dir) =>
        graft.operators.Validate.lDiversity(
          t(s, dir, "events").withColumn("dow",
            expr("(ts div 86400000000000L) % 7L")),
          Seq("event_type", "dow"), "user_id", l = 5L)),

    // ---- k-anonymity small-cell suppression ----------------------
    // (lang, source) cells under 5 rows fold into one sentinel row;
    // the release still sums to the corpus.
    Q("q289_k_suppression",
      Some("""WITH c AS (SELECT lang, source, count(*)::BIGINT AS n
             |  FROM documents GROUP BY 1, 2),
             |m AS (SELECT CASE WHEN n >= 5 THEN lang ELSE '__suppressed__' END AS lang,
             |  CASE WHEN n >= 5 THEN source ELSE '__suppressed__' END AS source, n
             |  FROM c)
             |SELECT lang, source, sum(n)::BIGINT AS n FROM m
             |GROUP BY 1, 2 ORDER BY lang, source""".stripMargin),
      (s, dir) =>
        graft.operators.Validate.suppressSmallGroups(
          t(s, dir, "documents"), Seq("lang", "source"), k = 5L)
          .orderBy("lang", "source")),

    // ---- ingestion-order audit -----------------------------------
    // Per-user, did event time ever go backward against ingestion
    // (event_id) order? Decides watermark slack.
    Q("q290_ts_audit",
      Some("""WITH o AS (SELECT user_id, epoch_us(ts) * 1000 AS tn,
             |  lag(epoch_us(ts) * 1000) OVER (PARTITION BY user_id
             |    ORDER BY event_id) AS prev FROM events)
             |SELECT sum(CASE WHEN prev IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_pairs,
             |  sum(CASE WHEN prev > tn THEN 1 ELSE 0 END)::BIGINT AS n_inversions,
             |  (CASE WHEN sum(CASE WHEN prev IS NOT NULL THEN 1 ELSE 0 END) = 0 THEN NULL
             |   ELSE (1000000 * sum(CASE WHEN prev > tn THEN 1 ELSE 0 END)) //
             |        sum(CASE WHEN prev IS NOT NULL THEN 1 ELSE 0 END) END)::BIGINT AS inversion_ppm,
             |  coalesce(max(CASE WHEN prev > tn THEN prev - tn END), 0)::BIGINT AS max_backstep
             |FROM o""".stripMargin),
      (s, dir) =>
        graft.operators.Validate.timeOrderAudit(
          t(s, dir, "events"), "user_id", "event_id", "ts")),

    // ---- integer power iteration (top principal direction) -------
    // Three exact-integer mat-vec rounds on the globally-quantized
    // embedding matrix; the oracle unrolls the identical arithmetic
    // (sign-split truncated division — floor-vs-truncate on negatives
    // is the cross-engine trap).
    Q("q291_power_iteration", {
      def resc(x: String, m: String) =
        s"CASE WHEN $x < 0 THEN -((1000 * -$x) // $m) ELSE (1000 * $x) // $m END"
      val iters = (2 to 3).map { r =>
        s"""u$r AS (SELECT vec_id, sum(el.qx * v${r - 1}.v)::BIGINT AS u
           |  FROM el JOIN v${r - 1} USING (j) GROUP BY vec_id),
           |m$r AS (SELECT greatest(1, max(abs(u)))::BIGINT AS m FROM u$r),
           |s$r AS (SELECT vec_id, ${resc("u", "m")} AS us FROM u$r, m$r),
           |w$r AS (SELECT j, sum(el.qx * s$r.us)::BIGINT AS w
           |  FROM el JOIN s$r USING (vec_id) GROUP BY j),
           |mw$r AS (SELECT greatest(1, max(abs(w)))::BIGINT AS m FROM w$r),
           |v$r AS (SELECT j, ${resc("w", "m")} AS v FROM w$r, mw$r)""".stripMargin
      }.mkString(",\n")
      Some(s"""WITH q AS (SELECT vec_id, list_transform(embedding,
              |  x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT)) AS qv
              |  FROM embeddings),
              |e AS MATERIALIZED (SELECT vec_id, unnest(list_transform(
              |  range(1, len(qv) + 1), i -> {'j': i - 1, 'qx': qv[i]})) AS s FROM q),
              |el AS (SELECT vec_id, s.j AS j, s.qx AS qx FROM e),
              |u1 AS (SELECT vec_id, sum(qx * 1000)::BIGINT AS u FROM el GROUP BY vec_id),
              |m1 AS (SELECT greatest(1, max(abs(u)))::BIGINT AS m FROM u1),
              |s1 AS (SELECT vec_id, ${resc("u", "m")} AS us FROM u1, m1),
              |w1 AS (SELECT j, sum(el.qx * s1.us)::BIGINT AS w
              |  FROM el JOIN s1 USING (vec_id) GROUP BY j),
              |mw1 AS (SELECT greatest(1, max(abs(w)))::BIGINT AS m FROM w1),
              |v1 AS (SELECT j, ${resc("w", "m")} AS v FROM w1, mw1),
              |$iters
              |SELECT j::BIGINT AS dim, v::BIGINT AS v FROM v3 ORDER BY dim""".stripMargin)
    },
      (s, dir) =>
        graft.operators.SimilarityOps.powerIterationInt(
          t(s, dir, "embeddings"), "vec_id", "embedding",
          iters = 3, scale = 1000L)),

    // ---- longest shared passage (dedup evidence) -----------------
    // For single-minhash collision pairs, the longest contiguous run
    // of shared 3-token shingles — copied passages align on one
    // positional diagonal; scattered matches are just shared vocab.
    Q("q292_shared_run", {
      val (a0, b0) = TextHash.Seeds.head
      Some(s"""WITH toks AS (SELECT doc_id, text, ${D.tokens("text")} AS t FROM documents),
              |sh AS (SELECT doc_id, ${D.shingles3("t", "text")} AS shs FROM toks),
              |hs AS MATERIALIZED (SELECT doc_id, unnest(list_transform(
              |  range(1, len(shs) + 1),
              |  gi -> {'p': gi - 1, 'h': ${D.rollingHash("shs[gi]")}})) AS g FROM sh),
              |g AS (SELECT doc_id, g.p AS p, g.h AS h FROM hs),
              |sig AS (SELECT doc_id, ${D.minhash("shs", a0, b0)} AS m0 FROM sh),
              |pairs AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id
              |  FROM sig x JOIN sig y ON x.m0 = y.m0 AND x.doc_id < y.doc_id),
              |m AS (SELECT p.a_id, p.b_id, ga.p AS pa, gb.p AS pb
              |  FROM pairs p JOIN g ga ON ga.doc_id = p.a_id
              |  JOIN g gb ON gb.doc_id = p.b_id AND gb.h = ga.h),
              |r AS (SELECT a_id, b_id, pa - pb AS diag, pa,
              |  pa - row_number() OVER (PARTITION BY a_id, b_id, pa - pb
              |    ORDER BY pa) AS grp FROM m),
              |rr AS (SELECT a_id, b_id, diag, grp, count(*)::BIGINT AS run
              |  FROM r GROUP BY 1, 2, 3, 4),
              |agg AS (SELECT a_id, b_id, sum(run)::BIGINT AS n_shared,
              |  max(run)::BIGINT AS run_shingles FROM rr GROUP BY 1, 2)
              |SELECT p.a_id, p.b_id, coalesce(agg.n_shared, 0)::BIGINT AS n_shared,
              |  coalesce(agg.run_shingles, 0)::BIGINT AS run_shingles,
              |  (CASE WHEN agg.run_shingles IS NULL THEN 0
              |    ELSE agg.run_shingles + 2 END)::BIGINT AS run_tokens
              |FROM pairs p LEFT JOIN agg ON agg.a_id = p.a_id AND agg.b_id = p.b_id
              |ORDER BY p.a_id, p.b_id""".stripMargin)
    },
      (s, dir) => {
        import TextHash.{spark => H}
        val (a0, b0) = TextHash.Seeds.head
        val docs = tp(s, dir, "documents", "doc_id")
        val sig = graft.operators.TextOps.withTokens(
            docs.select(col("doc_id"), col("text")), "text", "__toks")
          .withColumn("m0", expr(H.minhashFromHashes(
            H.hashArray(H.shingles3("__toks", "text")), a0, b0)))
          .select(col("doc_id"), col("m0"))
        val pairs = sig.select(col("doc_id").as("a_id"), col("m0"))
          .join(sig.select(col("doc_id").as("b_id"), col("m0")), Seq("m0"))
          .where(col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"))
        graft.operators.DedupOps.longestSharedRun(
          docs, "doc_id", "text", pairs, "a_id", "b_id")
          .orderBy("a_id", "b_id")
      }),

    // ---- TPC-H Q7 shape: bilateral shipping volume ---------------
    // Revenue between nation pair (1, 2) in either direction, by
    // ship year; dims broadcast, the fact table shuffles once.
    Q("q296_nation_volume",
      Some("""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
             |  year(l_shipdate)::BIGINT AS l_year, count(*)::BIGINT AS n,
             |  (sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))))::DOUBLE AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation sn ON s_nationkey = sn.n_nationkey
             |JOIN nation cn ON c_nationkey = cn.n_nationkey
             |WHERE (sn.n_nationkey = 1 AND cn.n_nationkey = 2)
             |   OR (sn.n_nationkey = 2 AND cn.n_nationkey = 1)
             |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin),
      (s, dir) => {
        val nation = t(s, dir, "nation")
        t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, dir, "supplier")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nation.select(col("n_nationkey").as("sk"),
            col("n_name").as("supp_nation"))), col("s_nationkey") === col("sk"))
          .join(broadcast(nation.select(col("n_nationkey").as("ck"),
            col("n_name").as("cust_nation"))), col("c_nationkey") === col("ck"))
          .where((col("sk") === 1 && col("ck") === 2) ||
            (col("sk") === 2 && col("ck") === 1))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate").cast("timestamp")).cast("bigint").as("l_year"))
          .agg(count(lit(1)).cast("bigint").as("n"),
            sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
              .cast("decimal(18,6)")).cast("double").as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      }),

    // ---- TPC-H Q18 shape: large-volume orders --------------------
    // Orders whose total quantity clears a threshold, top 20 by
    // (quantity DESC, key): the HAVING-over-join reporting classic.
    Q("q297_large_orders",
      Some("""WITH big AS (SELECT l_orderkey, sum(l_quantity) AS total_qty
             |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150)
             |SELECT c_custkey, o_orderkey,
             |  (CAST(total_qty AS DECIMAL(18,2)))::DOUBLE AS total_qty
             |FROM big JOIN orders ON o_orderkey = l_orderkey
             |JOIN customer ON c_custkey = o_custkey
             |ORDER BY total_qty DESC, o_orderkey LIMIT 20""".stripMargin),
      (s, dir) => {
        val big = t(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity")).as("__tq"))
          .where(col("__tq") > 150)
        big.join(t(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
          .join(t(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
          .select(col("c_custkey"), col("o_orderkey"),
            col("__tq").cast("decimal(18,2)").cast("double").as("total_qty"))
          .orderBy(col("total_qty").desc, col("o_orderkey"))
          .limit(20)
      }),

    // ---- SCD Type 2 validity intervals ---------------------------
    // Per-user event-type change history collapsed into half-open
    // validity intervals (current value open-ended).
    Q("q298_scd2",
      Some("""WITH o AS (SELECT user_id, epoch_us(ts) * 1000 AS tn, event_id, event_type
             |  FROM events),
             |m AS (SELECT user_id, tn, event_id, event_type,
             |  CASE WHEN row_number() OVER w = 1 THEN 1
             |       WHEN lag(event_type) OVER w IS DISTINCT FROM event_type THEN 1
             |       ELSE 0 END AS chg
             |  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY tn, event_id)),
             |r AS (SELECT user_id, tn, event_type,
             |  sum(chg) OVER (PARTITION BY user_id ORDER BY tn, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run FROM m),
             |g AS (SELECT user_id, run, min(event_type) AS attr,
             |  min(tn)::BIGINT AS valid_from FROM r GROUP BY 1, 2)
             |SELECT user_id, attr, valid_from,
             |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY run) AS valid_to
             |FROM g ORDER BY user_id, valid_from""".stripMargin),
      (s, dir) =>
        graft.operators.TimeSeries.scd2Intervals(
          t(s, dir, "events"), "user_id", "ts", "event_id", "event_type")
          .orderBy("user_id", "valid_from")),

    // ---- KMV join-key overlap estimate ---------------------------
    // Bottom-256 hash sketches of customer keys vs order customer
    // keys; integer estimator with the exact count as calibration.
    Q("q299_kmv_overlap", {
      val h = s"((${TextHash.MixA} * (${D.rollingHash("(key::VARCHAR)")}) " +
        s"+ ${TextHash.MixB}) % ${TextHash.P})"
      Some(s"""WITH da AS (SELECT DISTINCT c_custkey AS key FROM customer),
              |db AS (SELECT DISTINCT o_custkey AS key FROM orders),
              |ha AS (SELECT DISTINCT $h AS h FROM da),
              |hb AS (SELECT DISTINCT $h AS h FROM db),
              |ba AS (SELECT h FROM ha ORDER BY h LIMIT 256),
              |bb AS (SELECT h FROM hb ORDER BY h LIMIT 256),
              |u0 AS (SELECT DISTINCT h FROM (SELECT h FROM ba UNION ALL SELECT h FROM bb)),
              |u AS (SELECT h FROM u0 ORDER BY h LIMIT 256),
              |ku AS (SELECT count(*)::BIGINT AS k_used, max(h)::BIGINT AS kth FROM u),
              |sh AS (SELECT count(*)::BIGINT AS n_shared FROM u
              |  WHERE h IN (SELECT h FROM ba) AND h IN (SELECT h FROM bb)),
              |eu AS (SELECT CASE WHEN ku.k_used < 256 THEN ku.k_used
              |  ELSE (255::BIGINT * 1000000007) // ku.kth END AS est_union FROM ku),
              |ex AS (SELECT count(*)::BIGINT AS exact_overlap
              |  FROM da JOIN db ON da.key = db.key)
              |SELECT ku.k_used, eu.est_union::BIGINT AS est_union,
              |  (CASE WHEN ku.k_used = 0 THEN 0
              |   ELSE (sh.n_shared * eu.est_union) // ku.k_used END)::BIGINT AS est_overlap,
              |  ex.exact_overlap
              |FROM ku, eu, sh, ex""".stripMargin)
    },
      (s, dir) =>
        graft.operators.Sketches.kmvOverlapEstimate(
          t(s, dir, "customer"), "c_custkey",
          t(s, dir, "orders"), "o_custkey", k = 256)),

    // ---- star-join revenue CUBE ----------------------------------
    // Region × nation × order-year revenue cube (all rollup levels)
    // over the TPC-H star shape; decimal-exact before the double
    // render; NULL dimension = "all" level.
    Q("q300_revenue_cube",
      Some("""WITH f AS (
             |  SELECT r_name, n_name, year(o_orderdate) AS o_year,
             |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS rev
             |  FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation ON c_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey)
             |SELECT r_name, n_name, o_year::BIGINT AS o_year,
             |  count(*)::BIGINT AS n, (sum(rev))::DOUBLE AS revenue
             |FROM f GROUP BY CUBE (r_name, n_name, o_year)
             |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST, o_year NULLS FIRST""".stripMargin),
      (s, dir) =>
        t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .withColumn("rev", (col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,6)"))
          .withColumn("o_year",
            year(col("o_orderdate").cast("timestamp")).cast("bigint"))
          .cube(col("r_name"), col("n_name"), col("o_year"))
          .agg(count(lit(1)).cast("bigint").as("n"),
            sum(col("rev")).cast("double").as("revenue"))
          .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first,
            col("o_year").asc_nulls_first)),

    // ---- fuzzy (edit-distance-1) term matching -------------------
    // SymSpell-style: corpus tokens and query terms both expand to
    // their single-deletion neighborhoods; an intersection means
    // edit distance <= 1 (up to the deletion-neighborhood contract:
    // delete-1 covers insert/delete/substitute-1 between the pair).
    // For the misspelled queries {spak, windw, hash}: which real
    // vocabulary tokens match, in how many docs?
    Q("q301_fuzzy_match",
      Some(s"""WITH tok AS (SELECT DISTINCT unnest(${D.tokens("text")}) AS tk FROM documents),
              |tv AS (SELECT tk, unnest(list_prepend(tk,
              |  list_transform(range(1, length(tk) + 1),
              |    di -> substr(tk, 1, di - 1) || substr(tk, di + 1)))) AS v FROM tok),
              |qq AS (SELECT unnest(['spak', 'windw', 'hash']) AS q),
              |qv AS (SELECT q, unnest(list_prepend(q,
              |  list_transform(range(1, length(q) + 1),
              |    di -> substr(q, 1, di - 1) || substr(q, di + 1)))) AS v FROM qq),
              |mm AS (SELECT DISTINCT qv.q, tv.tk FROM qv JOIN tv ON qv.v = tv.v),
              |dc AS (SELECT tk2.tk, count(DISTINCT doc_id)::BIGINT AS n_docs FROM (
              |  SELECT doc_id, unnest(${D.tokens("text")}) AS tk FROM documents) tk2
              |  JOIN (SELECT DISTINCT tk FROM mm) mt ON mt.tk = tk2.tk GROUP BY 1)
              |SELECT mm.q AS query, mm.tk AS matched_token, dc.n_docs
              |FROM mm JOIN dc ON dc.tk = mm.tk
              |ORDER BY query, matched_token""".stripMargin),
      (s, dir) =>
        graft.operators.Relevance.fuzzyTermMatch(
          tp(s, dir, "documents", "doc_id"), "doc_id", "text",
          Seq("spak", "windw", "hash"))),

    // ---- weekly percentile bands (nearest-rank, exact) -----------
    Q("q302_percentile_bands",
      Some("""WITH x AS (SELECT event_type,
             |  (epoch_us(ts) * 1000) // 604800000000000 AS wk,
             |  CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS mv, event_id
             |  FROM events),
             |r AS (SELECT event_type, wk, mv,
             |  row_number() OVER (PARTITION BY event_type, wk ORDER BY mv, event_id) AS r,
             |  count(*) OVER (PARTITION BY event_type, wk) AS n FROM x)
             |SELECT event_type, wk::BIGINT AS wk, count(*)::BIGINT AS n,
             |  max(CASE WHEN r = greatest(1, (500 * n + 999) // 1000) THEN mv END)::BIGINT AS p500,
             |  max(CASE WHEN r = greatest(1, (900 * n + 999) // 1000) THEN mv END)::BIGINT AS p900
             |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (s, dir) => {
        val x = t(s, dir, "events")
          .withColumn("wk", expr("ts div 604800000000000L"))
          .withColumn("mv", expr("cast(floor(value * 1000000d + 0.5d) as bigint)"))
        graft.operators.RobustStats.percentileBands(
          x, Seq("event_type", "wk"), "mv", "event_id", Seq(500, 900))
          .orderBy("event_type", "wk")
      }),

    // ---- additive seasonal decomposition (STL-lite) --------------
    // Daily counts = centered-week trend + per-weekday seasonal
    // component, milli-scaled integer arithmetic end to end.
    Q("q303_seasonal_decompose",
      Some("""WITH c0 AS (SELECT (epoch_us(ts) * 1000) // 86400000000000 AS h FROM events),
             |c AS (SELECT h, count(*)::BIGINT AS x FROM c0 GROUP BY h),
             |sp AS (SELECT unnest(range(mn, mx + 1)) AS h
             |  FROM (SELECT min(h) AS mn, max(h) AS mx FROM c)),
             |f AS (SELECT sp.h, coalesce(c.x, 0)::BIGINT AS x
             |  FROM sp LEFT JOIN c ON c.h = sp.h),
             |t AS (SELECT h, x,
             |  sum(x) OVER (ORDER BY h ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS ts_,
             |  count(*) OVER (ORDER BY h ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS tc
             |  FROM f),
             |d AS (SELECT h % 7 AS phase, 1000 * x - (1000 * ts_) // tc AS det FROM t),
             |g AS (SELECT phase::BIGINT AS phase, count(*)::BIGINT AS n_buckets,
             |  sum(det)::BIGINT AS sdet FROM d GROUP BY 1)
             |SELECT phase, n_buckets,
             |  (CASE WHEN sdet < 0 THEN -((-sdet) // n_buckets)
             |   ELSE sdet // n_buckets END)::BIGINT AS seasonal_milli
             |FROM g ORDER BY phase""".stripMargin),
      (s, dir) =>
        graft.operators.TimeSeries.seasonalDecompose(
          t(s, dir, "events"), "ts", bucketSec = 86400L, period = 7)),

    // ---- calibration reliability bins ----------------------------
    // Claimed probability (a capped linear score in ppm) vs observed
    // positive rate per decile bin — the reliability-diagram table,
    // integer-exact end to end.
    Q("q309_reliability_bins",
      Some("""WITH x AS (SELECT CAST(floor(value * 1000 + 0.5) AS BIGINT) AS mv FROM events),
             |s AS (SELECT least(1000000, greatest(0, mv * 5)) AS sc,
             |  CASE WHEN mv > 100000 THEN 1 ELSE 0 END AS y FROM x),
             |b AS (SELECT least(9, (greatest(0, sc) * 10) // 1000000) AS bin, sc, y FROM s),
             |g AS (SELECT bin::BIGINT AS bin, count(*)::BIGINT AS n,
             |  (sum(sc) // count(*))::BIGINT AS mean_score_ppm,
             |  ((1000000 * sum(y)) // count(*))::BIGINT AS rate_ppm
             |  FROM b GROUP BY 1)
             |SELECT bin, n, mean_score_ppm, rate_ppm,
             |  (mean_score_ppm - rate_ppm)::BIGINT AS gap_ppm
             |FROM g ORDER BY bin""".stripMargin),
      (s, dir) => {
        val x = t(s, dir, "events")
          .withColumn("mv", expr("cast(floor(value * 1000d + 0.5d) as bigint)"))
          .withColumn("score_ppm", expr("least(1000000L, greatest(0L, mv * 5))"))
        EvalStats.reliabilityBins(x, "score_ppm", col("mv") > 100000L, bins = 10)
      }),

    // ---- McNemar's paired-classifier test ------------------------
    // Classifier A = seeded hash parity of event_id (a coin-flip
    // baseline), B = a threshold rule; only discordant pairs count.
    Q("q310_mcnemar",
      Some("""WITH x AS (SELECT
             |  CAST(floor(value * 1000 + 0.5) AS BIGINT) AS mv,
             |  ((536870923 * event_id + 974711) % 1000000007) % 2 = 0 AS pa
             |  FROM events),
             |p AS (SELECT (pa = (mv > 100000)) AS ra,
             |  ((mv > 90000) = (mv > 100000)) AS rb FROM x),
             |g AS (SELECT count(*)::BIGINT AS n,
             |  sum(CASE WHEN ra AND NOT rb THEN 1 ELSE 0 END)::BIGINT AS b,
             |  sum(CASE WHEN NOT ra AND rb THEN 1 ELSE 0 END)::BIGINT AS c
             |  FROM p)
             |SELECT n, b, c,
             |  ((1000 * (b - c) * (b - c)) // nullif(b + c, 0))::BIGINT AS mcnemar_milli
             |FROM g""".stripMargin),
      (s, dir) => {
        val x = t(s, dir, "events")
          .withColumn("mv", expr("cast(floor(value * 1000d + 0.5d) as bigint)"))
        EvalStats.mcnemar(x,
          expr("((536870923L * event_id + 974711L) % 1000000007L) % 2 = 0"),
          col("mv") > 90000L,
          col("mv") > 100000L)
      }),

    // ---- jackknife leave-one-out mean bounds ---------------------
    // How far can one dropped observation move each event_type's mean?
    // Extremes come from dropping the max/min, so plain aggregates
    // suffice — the jackknife at corpus scale.
    Q("q311_jackknife",
      Some("""WITH x AS (SELECT event_type,
             |  CAST(floor(value * 1000 + 0.5) AS BIGINT) AS mv FROM events),
             |g AS (SELECT event_type, count(*)::BIGINT AS n,
             |  sum(mv)::HUGEINT AS s, min(mv) AS mn, max(mv) AS mx
             |  FROM x GROUP BY 1),
             |d AS (SELECT event_type, n,
             |  (CASE WHEN s < 0 THEN -((-(1000 * s)) // n)
             |   ELSE (1000 * s) // n END)::BIGINT AS mean_milli,
             |  (CASE WHEN n < 2 THEN NULL
             |   WHEN s - mx < 0 THEN -((-(1000 * (s - mx))) // (n - 1))
             |   ELSE (1000 * (s - mx)) // (n - 1) END)::BIGINT AS loo_min_milli,
             |  (CASE WHEN n < 2 THEN NULL
             |   WHEN s - mn < 0 THEN -((-(1000 * (s - mn))) // (n - 1))
             |   ELSE (1000 * (s - mn)) // (n - 1) END)::BIGINT AS loo_max_milli
             |  FROM g)
             |SELECT event_type, n, mean_milli, loo_min_milli, loo_max_milli,
             |  (loo_max_milli - loo_min_milli)::BIGINT AS influence_span_milli
             |FROM d ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val x = t(s, dir, "events")
          .withColumn("mv", expr("cast(floor(value * 1000d + 0.5d) as bigint)"))
        EvalStats.jackknifeMeanBounds(x, Seq("event_type"), "mv")
          .orderBy("event_type")
      }),

    // ---- degree assortativity of the collocation graph -----------
    // Hubs-to-hubs (r>0) or hubs-to-leaves (r<0)? Newman's r over the
    // directed edge image collapses to an EXACT rational (Σx = Σy by
    // symmetry, so no sqrt) — integer ppm via sign-split division.
    Q("q306_assortativity",
      Some(s"""WITH toks AS (SELECT ${D.tokens("text")} AS t FROM documents),
              |pr AS (
              |  SELECT unnest(list_transform(range(1, len(t)),
              |    gi -> {'a': least(t[gi], t[gi+1]), 'b': greatest(t[gi], t[gi+1])})) AS p
              |  FROM toks
              |  UNION ALL
              |  SELECT unnest(list_transform(range(1, len(t) - 1),
              |    gi -> {'a': least(t[gi], t[gi+2]), 'b': greatest(t[gi], t[gi+2])})) AS p
              |  FROM toks),
              |pc AS (SELECT p.a AS tok_a, p.b AS tok_b, count(*)::BIGINT AS n
              |  FROM pr GROUP BY 1, 2),
              |e AS (SELECT tok_a, tok_b FROM pc
              |  ORDER BY n DESC, tok_a, tok_b LIMIT 100),
              |dirn AS (SELECT tok_a AS a, tok_b AS b FROM e
              |  UNION ALL SELECT tok_b, tok_a FROM e),
              |deg AS (SELECT a, count(*)::BIGINT AS d FROM dirn GROUP BY 1),
              |j AS (SELECT dx.d AS x, dy.d AS y FROM dirn
              |  JOIN deg dx ON dx.a = dirn.a JOIN deg dy ON dy.a = dirn.b),
              |g AS (SELECT count(*)::HUGEINT AS m, sum(x::HUGEINT * y) AS sxy,
              |  sum(x::HUGEINT) AS s1, sum(x::HUGEINT * x) AS s2 FROM j)
              |SELECT (m // 2)::BIGINT AS n_edges,
              |  (CASE WHEN m * s2 - s1 * s1 = 0 THEN NULL
              |   WHEN m * sxy - s1 * s1 < 0
              |     THEN -((1000000::HUGEINT * (s1 * s1 - m * sxy)) // (m * s2 - s1 * s1))
              |   ELSE (1000000::HUGEINT * (m * sxy - s1 * s1)) // (m * s2 - s1 * s1)
              |   END)::BIGINT AS r_ppm
              |FROM g""".stripMargin),
      (s, dir) => {
        val edges = graft.operators.Relevance.cooccurrencePairs(
          tp(s, dir, "documents", "doc_id"), "text", maxDist = 2, k = 100)
        graft.operators.Components.degreeAssortativity(edges, "tok_a", "tok_b")
      }),

    // ---- per-node clustering coefficient -------------------------
    // The global coefficient (q176 family) says "clique-like or not";
    // this says WHICH nodes sit in cliques vs star centers. Exact ppm.
    Q("q307_local_clustering",
      Some(s"""WITH toks AS (SELECT ${D.tokens("text")} AS t FROM documents),
              |pr AS (
              |  SELECT unnest(list_transform(range(1, len(t)),
              |    gi -> {'a': least(t[gi], t[gi+1]), 'b': greatest(t[gi], t[gi+1])})) AS p
              |  FROM toks
              |  UNION ALL
              |  SELECT unnest(list_transform(range(1, len(t) - 1),
              |    gi -> {'a': least(t[gi], t[gi+2]), 'b': greatest(t[gi], t[gi+2])})) AS p
              |  FROM toks),
              |pc AS (SELECT p.a AS tok_a, p.b AS tok_b, count(*)::BIGINT AS n
              |  FROM pr GROUP BY 1, 2),
              |e AS (SELECT tok_a, tok_b FROM pc
              |  ORDER BY n DESC, tok_a, tok_b LIMIT 100),
              |tri AS (SELECT e1.tok_a AS x, e1.tok_b AS y, e2.tok_b AS z
              |  FROM e e1 JOIN e e2 ON e1.tok_b = e2.tok_a
              |  JOIN e e3 ON e3.tok_a = e1.tok_a AND e3.tok_b = e2.tok_b),
              |tpn AS (SELECT v, count(*)::BIGINT AS n_tri FROM (
              |  SELECT x AS v FROM tri UNION ALL SELECT y FROM tri
              |  UNION ALL SELECT z FROM tri) GROUP BY 1),
              |deg AS (SELECT v, count(*)::BIGINT AS degree FROM (
              |  SELECT tok_a AS v FROM e UNION ALL SELECT tok_b FROM e) GROUP BY 1)
              |SELECT deg.v AS node, degree,
              |  coalesce(n_tri, 0)::BIGINT AS n_tri,
              |  ((2000000 * coalesce(n_tri, 0)) // (degree * (degree - 1)))::BIGINT AS lcc_ppm
              |FROM deg LEFT JOIN tpn ON tpn.v = deg.v
              |WHERE degree >= 2
              |ORDER BY lcc_ppm DESC, node LIMIT 15""".stripMargin),
      (s, dir) => {
        val edges = graft.operators.Relevance.cooccurrencePairs(
          tp(s, dir, "documents", "doc_id"), "text", maxDist = 2, k = 100)
        graft.operators.Components.localClustering(edges, "tok_a", "tok_b")
          .orderBy(col("lcc_ppm").desc, col("node"))
          .limit(15)
      }),

    // ---- reciprocity of the directed bigram graph ----------------
    // How often is word order free ("data processing" AND "processing
    // data")? Distinct directed arcs, self-loops out, exact ppm.
    Q("q308_reciprocity",
      Some(s"""WITH toks AS (SELECT ${D.tokens("text")} AS t FROM documents),
              |a AS (SELECT DISTINCT p.s AS src, p.d AS dst FROM (
              |  SELECT unnest(list_transform(range(1, len(t)),
              |    gi -> {'s': t[gi], 'd': t[gi+1]})) AS p FROM toks)
              |  WHERE p.s <> p.d),
              |c AS (SELECT count(*)::BIGINT AS n_arcs FROM a),
              |m AS (SELECT count(*)::BIGINT AS n_mutual
              |  FROM a f JOIN a r ON f.src = r.dst AND f.dst = r.src)
              |SELECT n_arcs, n_mutual,
              |  (CASE WHEN n_arcs = 0 THEN NULL
              |   ELSE (1000000 * n_mutual) // n_arcs END)::BIGINT AS reciprocity_ppm
              |FROM c, m""".stripMargin),
      (s, dir) => {
        val arcs = graft.operators.TextOps.withTokens(
          tp(s, dir, "documents", "doc_id").select(col("text")), "text", "__toks")
          .withColumn("__p", explode(expr(
            "zip_with(slice(__toks, 1, greatest(size(__toks) - 1, 0)), " +
              "slice(__toks, 2, greatest(size(__toks) - 1, 0)), " +
              "(x, y) -> struct(x AS s, y AS d))")))
          .select(col("__p.s").as("src"), col("__p.d").as("dst"))
        graft.operators.Components.reciprocity(arcs, "src", "dst")
      }),

    // ---- rolling distinct actives (DAU/WAU + stickiness) ---------
    // Exact distinct-over-sliding-window via the presence-explode
    // trick: distinct (day, user) rows each cover 7 target days —
    // no windowed distinct, no window function at all.
    Q("q317_rolling_active",
      Some("""WITH x AS (SELECT DISTINCT
             |  (epoch_us(ts) * 1000) // 86400000000000 AS b, user_id AS e FROM events),
             |lim AS (SELECT min(b) AS mn, max(b) AS mx FROM x),
             |d AS (SELECT b, count(*)::BIGINT AS n_bucket FROM x GROUP BY b),
             |tg AS (SELECT unnest(range(b, b + 7)) AS t, e FROM x),
             |w AS (SELECT t, count(DISTINCT e)::BIGINT AS n_window FROM tg GROUP BY t)
             |SELECT w.t::BIGINT AS bucket,
             |  coalesce(d.n_bucket, 0)::BIGINT AS n_bucket, w.n_window,
             |  ((1000000 * coalesce(d.n_bucket, 0)) // nullif(w.n_window, 0))::BIGINT AS stickiness_ppm
             |FROM w LEFT JOIN d ON d.b = w.t, lim
             |WHERE w.t BETWEEN mn AND mx ORDER BY bucket""".stripMargin),
      (s, dir) =>
        graft.operators.TimeSeries.rollingActive(
          t(s, dir, "events"), "ts", "user_id",
          bucketSec = 86400L, windowBuckets = 7)),

    // ---- 2-D Pareto skyline --------------------------------------
    // Parts on the size-vs-price frontier: no other part is at least
    // as large AND at least as expensive (one strictly). Sort-based
    // skyline over the per-size max, bucket-decomposed running max.
    Q("q312_skyline",
      Some("""WITH p AS (SELECT p_size::BIGINT AS x,
             |  CAST(floor(p_retailprice * 1000 + 0.5) AS BIGINT) AS y FROM part),
             |m AS (SELECT x, max(y) AS y FROM p GROUP BY x),
             |r AS (SELECT x, y, max(y) OVER (ORDER BY x DESC
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS rm FROM m)
             |SELECT x, y::BIGINT AS y FROM r
             |WHERE rm IS NULL OR y > rm ORDER BY x""".stripMargin),
      (s, dir) => {
        val p = t(s, dir, "part")
          .withColumn("y", expr("cast(floor(p_retailprice * 1000d + 0.5d) as bigint)"))
        graft.operators.RobustStats.skyline2D(p, "p_size", "y")
      }),

    // ---- per-user h-index ----------------------------------------
    // Largest h such that the user has >= h events of value >= h —
    // the rank-robust engagement summary; tie-invariant by design.
    Q("q313_h_index",
      Some("""WITH x AS (SELECT user_id,
             |  greatest(0, CAST(floor(value) AS BIGINT)) AS c FROM events),
             |r AS (SELECT user_id, c,
             |  row_number() OVER (PARTITION BY user_id ORDER BY c DESC) AS rn FROM x),
             |g AS (SELECT user_id, count(*)::BIGINT AS n,
             |  sum(CASE WHEN rn <= c THEN 1 ELSE 0 END)::BIGINT AS h_index
             |  FROM r GROUP BY 1)
             |SELECT user_id, n, h_index FROM g
             |ORDER BY h_index DESC, user_id LIMIT 15""".stripMargin),
      (s, dir) => {
        val x = t(s, dir, "events")
          .withColumn("c", expr("greatest(0L, cast(floor(value) as bigint))"))
        graft.operators.Profile.hIndex(x, "user_id", "c")
          .orderBy(col("h_index").desc, col("user_id")).limit(15)
      }),

    // ---- integer HITS on the directed bigram graph ---------------
    // Hubs point at authorities; two full rounds with exact integer
    // max-rescaling per half-step (the float-free normalization both
    // engines replay bitwise).
    Q("q314_hits",
      Some(s"""WITH toks AS (SELECT ${D.tokens("text")} AS t FROM documents),
              |ac AS (SELECT p.s AS src, p.d AS dst, count(*)::BIGINT AS n FROM (
              |  SELECT unnest(list_transform(range(1, len(t)),
              |    gi -> {'s': t[gi], 'd': t[gi+1]})) AS p FROM toks)
              |  WHERE p.s <> p.d GROUP BY 1, 2),
              |e AS (SELECT src, dst FROM ac ORDER BY n DESC, src, dst LIMIT 100),
              |nodes AS (SELECT DISTINCT v FROM (
              |  SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
              |h0 AS (SELECT v, 1000000::BIGINT AS h FROM nodes),
              |a1r AS (SELECT n.v, coalesce(sum(h0.h), 0)::BIGINT AS r FROM nodes n
              |  LEFT JOIN e ON e.dst = n.v LEFT JOIN h0 ON h0.v = e.src GROUP BY n.v),
              |a1m AS (SELECT max(r) AS m FROM a1r),
              |a1 AS (SELECT v, (CASE WHEN m = 0 THEN 0
              |  ELSE (r * 1000000) // m END)::BIGINT AS a FROM a1r, a1m),
              |h1r AS (SELECT n.v, coalesce(sum(a1.a), 0)::BIGINT AS r FROM nodes n
              |  LEFT JOIN e ON e.src = n.v LEFT JOIN a1 ON a1.v = e.dst GROUP BY n.v),
              |h1m AS (SELECT max(r) AS m FROM h1r),
              |h1 AS (SELECT v, (CASE WHEN m = 0 THEN 0
              |  ELSE (r * 1000000) // m END)::BIGINT AS h FROM h1r, h1m),
              |a2r AS (SELECT n.v, coalesce(sum(h1.h), 0)::BIGINT AS r FROM nodes n
              |  LEFT JOIN e ON e.dst = n.v LEFT JOIN h1 ON h1.v = e.src GROUP BY n.v),
              |a2m AS (SELECT max(r) AS m FROM a2r),
              |a2 AS (SELECT v, (CASE WHEN m = 0 THEN 0
              |  ELSE (r * 1000000) // m END)::BIGINT AS a FROM a2r, a2m),
              |h2r AS (SELECT n.v, coalesce(sum(a2.a), 0)::BIGINT AS r FROM nodes n
              |  LEFT JOIN e ON e.src = n.v LEFT JOIN a2 ON a2.v = e.dst GROUP BY n.v),
              |h2m AS (SELECT max(r) AS m FROM h2r),
              |h2 AS (SELECT v, (CASE WHEN m = 0 THEN 0
              |  ELSE (r * 1000000) // m END)::BIGINT AS h FROM h2r, h2m)
              |SELECT a2.v AS node, h2.h AS hub_ppm, a2.a AS auth_ppm
              |FROM a2 JOIN h2 ON h2.v = a2.v
              |ORDER BY auth_ppm DESC, node LIMIT 10""".stripMargin),
      (s, dir) => {
        val arcs = graft.operators.TextOps.withTokens(
          tp(s, dir, "documents", "doc_id").select(col("text")), "text", "__toks")
          .withColumn("__p", explode(expr(
            "zip_with(slice(__toks, 1, greatest(size(__toks) - 1, 0)), " +
              "slice(__toks, 2, greatest(size(__toks) - 1, 0)), " +
              "(x, y) -> struct(x AS s, y AS d))")))
          .select(col("__p.s").as("src"), col("__p.d").as("dst"))
          .where(col("src") =!= col("dst"))
          .groupBy("src", "dst").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("src"), col("dst")).limit(100)
          .select("src", "dst")
        graft.operators.Components.hits(arcs, "src", "dst", iters = 2)
          .orderBy(col("auth_ppm").desc, col("node")).limit(10)
      }),

    // ---- two-proportion z² (A/B test) ----------------------------
    // Arms split by event-id parity; "conversion" = value > 100.
    Q("q270_ab_ztest",
      Some("""WITH x AS (SELECT (event_id % 2 = 0) AS a, (value > 100) AS c FROM events),
             |g AS (SELECT
             |  sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT AS n_a,
             |  sum(CASE WHEN NOT a THEN 1 ELSE 0 END)::BIGINT AS n_b,
             |  sum(CASE WHEN a AND c THEN 1 ELSE 0 END)::BIGINT AS conv_a,
             |  sum(CASE WHEN NOT a AND c THEN 1 ELSE 0 END)::BIGINT AS conv_b
             |  FROM x)
             |SELECT n_a, n_b, conv_a, conv_b,
             |  ((1000000 * conv_a) // n_a)::BIGINT AS rate_a_ppm,
             |  ((1000000 * conv_b) // n_b)::BIGINT AS rate_b_ppm,
             |  ((1000000::HUGEINT * (conv_a*n_b - conv_b*n_a) * (conv_a*n_b - conv_b*n_a) * (n_a + n_b)) //
             |   (n_a::HUGEINT * n_b * nullif(conv_a + conv_b, 0) * nullif(n_a + n_b - conv_a - conv_b, 0)))::BIGINT AS z2_micro
             |FROM g""".stripMargin),
      (s, dir) =>
        EvalStats.abZSquared(t(s, dir, "events"),
          col("event_id") % 2 === 0, col("value") > 100)),

    // ---- Mann–Whitney U rank-sum test ----------------------------
    // Did arm A's VALUES shift up vs arm B (not just its pass rate —
    // that's q270)? Arms split by seeded event-id hash parity; all
    // rank quantities doubled so midpoint tie-ranks stay integral.
    Q("q318_mann_whitney",
      Some("""WITH x AS (SELECT CAST(floor(value * 1000 + 0.5) AS BIGINT) AS mv,
             |  ((536870923 * event_id + 974711) % 1000000007) % 2 = 0 AS a FROM events),
             |g AS (SELECT mv, sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT AS na,
             |  count(*)::BIGINT AS t FROM x GROUP BY 1),
             |c AS (SELECT na, t, coalesce(sum(t) OVER (ORDER BY mv
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS clt
             |  FROM g),
             |s AS (SELECT sum(na)::HUGEINT AS sa, sum(t - na)::HUGEINT AS sb,
             |  sum(na::HUGEINT * (2 * clt + t + 1)) AS r12,
             |  sum(t::HUGEINT * t * t - t) AS tie FROM c),
             |u AS (SELECT sa, sb, tie, (r12 - sa * (sa + 1)) AS u2a,
             |  (2 * sa * sb - (r12 - sa * (sa + 1))) AS u2b FROM s)
             |SELECT sa::BIGINT AS n_a, sb::BIGINT AS n_b,
             |  u2a::BIGINT AS u2_a, u2b::BIGINT AS u2_b,
             |  tie::BIGINT AS tie_term,
             |  (CASE WHEN sa = 0 OR sb = 0 THEN NULL
             |   WHEN u2a < u2b THEN -((1000000 * (u2b - u2a)) // (2 * sa * sb))
             |   ELSE (1000000 * (u2a - u2b)) // (2 * sa * sb) END)::BIGINT AS cliffs_delta_ppm
             |FROM u""".stripMargin),
      (s, dir) => {
        val x = t(s, dir, "events")
          .withColumn("mv", expr("cast(floor(value * 1000d + 0.5d) as bigint)"))
        EvalStats.mannWhitneyU(x,
          expr("((536870923L * event_id + 974711L) % 1000000007L) % 2 = 0"),
          "mv")
      }),

    // ---- per-user burstiness (Fano factor) -----------------------
    // Which users dump their events in bursts vs spread them out?
    // Index of dispersion of daily counts over each user's own
    // calendar span (silent days included arithmetically). ≫1000
    // milli = bursty, ~0 = metronomic. Top 20, tie-broken on entity.
    Q("q319_burstiness",
      Some("""WITH x AS (SELECT user_id AS entity,
             |  (epoch_us(ts) * 1000) // 86400000000000 AS b FROM events),
             |c AS (SELECT entity, b, count(*)::BIGINT AS c FROM x GROUP BY 1, 2),
             |g AS (SELECT entity, (max(b) - min(b) + 1)::BIGINT AS span_buckets,
             |  count(*)::BIGINT AS active_buckets,
             |  sum(c)::BIGINT AS n_events, sum(c * c)::HUGEINT AS q
             |  FROM c GROUP BY 1),
             |f AS (SELECT entity, span_buckets, active_buckets, n_events,
             |  ((1000 * (span_buckets * q - n_events::HUGEINT * n_events)) //
             |   (span_buckets::HUGEINT * n_events))::BIGINT AS fano_milli FROM g)
             |SELECT entity, span_buckets, active_buckets, n_events, fano_milli
             |FROM f ORDER BY fano_milli DESC, entity LIMIT 20""".stripMargin),
      (s, dir) =>
        graft.operators.TimeSeries.burstiness(
          t(s, dir, "events"), "ts", "user_id")
          .orderBy(col("fano_milli").desc, col("entity")).limit(20)),

    // ---- weighted shortest paths (bounded Bellman–Ford) ----------
    // Cheapest association paths from 'spark' over the q273/q281
    // collocation graph, where strong collocations are cheap to
    // traverse (cost = 1 + 1000 // n); 3 relaxation rounds = exact
    // shortest distance over paths of ≤ 3 edges. The oracle unrolls
    // the same three relax+min-combine rounds.
    Q("q320_weighted_paths",
      Some(s"""WITH toks AS (SELECT ${D.tokens("text")} AS t FROM documents),
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
              |te AS (SELECT tok_a, tok_b, n FROM pc
              |  ORDER BY n DESC, tok_a, tok_b LIMIT 100),
              |e AS (SELECT tok_a AS a, tok_b AS b, (1 + 1000 // n)::BIGINT AS c
              |  FROM te WHERE tok_a <> tok_b),
              |adj AS (SELECT a AS w, u, c FROM (
              |  SELECT a, b AS u, c FROM e UNION ALL SELECT b AS a, a AS u, c FROM e) s),
              |d0 AS (SELECT 'spark' AS node, 0::BIGINT AS dist),
              |d1 AS (SELECT node, min(dist) AS dist FROM (
              |  SELECT * FROM d0 UNION ALL
              |  SELECT adj.u, d0.dist + adj.c FROM d0 JOIN adj ON adj.w = d0.node) s
              |  GROUP BY node),
              |d2 AS (SELECT node, min(dist) AS dist FROM (
              |  SELECT * FROM d1 UNION ALL
              |  SELECT adj.u, d1.dist + adj.c FROM d1 JOIN adj ON adj.w = d1.node) s
              |  GROUP BY node),
              |d3 AS (SELECT node, min(dist) AS dist FROM (
              |  SELECT * FROM d2 UNION ALL
              |  SELECT adj.u, d2.dist + adj.c FROM d2 JOIN adj ON adj.w = d2.node) s
              |  GROUP BY node)
              |SELECT node, dist::BIGINT AS dist FROM d3
              |ORDER BY dist, node""".stripMargin),
      (s, dir) => {
        val edges = graft.operators.Relevance.cooccurrencePairs(
          tp(s, dir, "documents", "doc_id"), "text", maxDist = 2, k = 100)
          .where(col("tok_a") =!= col("tok_b"))
          .withColumn("cost", expr("1L + 1000L div n"))
        val seeds = s.createDataFrame(
          java.util.List.of(org.apache.spark.sql.Row("spark")),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("node",
              org.apache.spark.sql.types.StringType))))
        graft.operators.Components.weightedShortestPaths(
          edges, "tok_a", "tok_b", "cost", seeds, "node", maxRounds = 3)
          .orderBy("dist", "node")
      }),

    // ---- Theil–Sen robust trend per user -------------------------
    // Median pairwise slope of each user's daily micro-value totals
    // (ppm per day) — the outlier-immune alternative to per-group
    // OLS. Pair fan-out is calendar-bounded (30-day span → ≤ 435
    // pairs/user), never volume-bounded. Top 20 rising users.
    Q("q321_theil_sen",
      Some("""WITH x AS (SELECT user_id AS entity,
             |  (epoch_us(ts) * 1000) // 86400000000000 AS b,
             |  CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS mv FROM events),
             |p AS (SELECT entity, b, sum(mv)::BIGINT AS y FROM x GROUP BY 1, 2),
             |pr AS (SELECT a.entity,
             |  CASE WHEN b.y >= a.y THEN ((b.y - a.y) * 1000000) // (b.b - a.b)
             |    ELSE -(((a.y - b.y) * 1000000) // (b.b - a.b)) END AS s
             |  FROM p a JOIN p b ON a.entity = b.entity AND a.b < b.b),
             |r AS (SELECT entity, s,
             |  row_number() OVER (PARTITION BY entity ORDER BY s) AS rn,
             |  count(*) OVER (PARTITION BY entity) AS n FROM pr)
             |SELECT entity, n::BIGINT AS n_pairs, s::BIGINT AS sen_slope_ppm
             |FROM r WHERE rn = (n + 1) // 2
             |ORDER BY sen_slope_ppm DESC, entity LIMIT 20""".stripMargin),
      (s, dir) => {
        val x = t(s, dir, "events")
          .withColumn("mv", expr("cast(floor(value * 1000000d + 0.5d) as bigint)"))
          .withColumn("b", expr("ts div 86400000000000L"))
        graft.operators.RobustStats.theilSenSlope(x, "user_id", "b", "mv")
          .orderBy(col("sen_slope_ppm").desc, col("entity")).limit(20)
      }),

    // ---- Kaplan–Meier time-to-first-error curve ------------------
    // Product-limit survival of days from each user's first event to
    // their first 'error'; users who never error are right-censored
    // at the corpus edge. Each step floors to ppm, so the whole
    // curve is integer-exact; the oracle chains the same fold over
    // bigint-packed (n, d) steps.
    Q("q322_kaplan_meier",
      Some("""WITH x AS (SELECT user_id AS e,
             |  (epoch_us(ts) * 1000) // 86400000000000 AS b, event_type
             |  FROM events),
             |f AS (SELECT e, min(b) AS fb FROM x GROUP BY e),
             |fe AS (SELECT e, min(b) AS eb FROM x
             |  WHERE event_type = 'error' GROUP BY e),
             |mx AS (SELECT max(b) AS bl FROM x),
             |lt AS (SELECT CASE WHEN fe.eb IS NULL THEN mx.bl - f.fb
             |    ELSE fe.eb - f.fb END AS t,
             |  (fe.eb IS NULL) AS cen
             |  FROM f LEFT JOIN fe USING (e) CROSS JOIN mx),
             |h AS (SELECT t, count(*)::BIGINT AS m,
             |  sum(CASE WHEN cen THEN 0 ELSE 1 END)::BIGINT AS d FROM lt GROUP BY t),
             |tot AS (SELECT sum(m)::BIGINT AS total FROM h),
             |hr AS (SELECT t, d, (total - coalesce(sum(m) OVER (ORDER BY t
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))::BIGINT AS n
             |  FROM h, tot),
             |st AS (SELECT t, d, n FROM hr WHERE d > 0),
             |arr AS (SELECT list(n * 10000000 + d ORDER BY t) AS pk,
             |  list({'t': t, 'd': d, 'n': n} ORDER BY t) AS sl FROM st),
             |ks AS (SELECT sl, pk, unnest(range(1, len(sl) + 1)) AS kk FROM arr)
             |SELECT sl[kk].t::BIGINT AS t, sl[kk].n::BIGINT AS n_at_risk,
             |  sl[kk].d::BIGINT AS deaths,
             |  list_reduce(list_prepend(1000000::BIGINT, pk[1:kk]),
             |    (acc, p) -> (acc * ((p // 10000000) - (p % 10000000)))
             |      // (p // 10000000))::BIGINT AS surv_ppm
             |FROM ks ORDER BY t""".stripMargin),
      (s, dir) => {
        val x = t(s, dir, "events")
          .withColumn("b", expr("ts div 86400000000000L"))
        val f = x.groupBy(col("user_id")).agg(min(col("b")).as("fb"))
        val fe = x.where(col("event_type") === "error")
          .groupBy(col("user_id")).agg(min(col("b")).as("eb"))
        val mx = x.agg(max(col("b")).as("bl"))
        val lt = f.join(fe, Seq("user_id"), "left")
          .crossJoin(broadcast(mx))
          .select(
            when(col("eb").isNull, col("bl") - col("fb"))
              .otherwise(col("eb") - col("fb")).as("t"),
            col("eb").isNull.as("cen"))
        graft.operators.TimeSeries.kaplanMeier(lt, "t", "cen").orderBy("t")
      }),

    // ---- exact isotonic calibration (minimax PAVA) ---------------
    // Claimed-confidence decile (props.k // 10) vs observed purchase
    // rate, isotonic-fitted to the best monotone curve — the
    // recalibration map. Both renderings run the identical
    // cross-multiplied rational minimax, so the fit is exact.
    Q("q323_isotonic_fit",
      Some("""WITH x AS (SELECT
             |  regexp_extract(props, '([0-9]+)', 1)::BIGINT // 10 AS xb,
             |  (event_type = 'purchase') AS y FROM events),
             |g AS (SELECT xb, count(*)::BIGINT AS w,
             |  sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS s FROM x GROUP BY xb),
             |packed AS (SELECT list({'x': xb, 'w': w, 's': s} ORDER BY xb) AS st FROM g),
             |pre AS (SELECT st,
             |  list_transform(range(0, len(st) + 1), kp -> list_reduce(
             |    list_prepend(0::BIGINT, list_transform(st[1:kp], e -> e.w)),
             |    (a, b) -> a + b)) AS pw,
             |  list_transform(range(0, len(st) + 1), kp -> list_reduce(
             |    list_prepend(0::BIGINT, list_transform(st[1:kp], e -> e.s)),
             |    (a, b) -> a + b)) AS ps
             |  FROM packed),
             |iso AS (SELECT st,
             |  list_transform(range(1, len(st) + 1), fi ->
             |    list_reduce(
             |      list_transform(range(1, fi + 1), fj ->
             |        list_reduce(
             |          list_transform(range(fi, len(st) + 1), fk ->
             |            {'nu': ps[fk + 1] - ps[fj], 'de': pw[fk + 1] - pw[fj]}),
             |          (a, b) -> CASE WHEN b.nu * a.de < a.nu * b.de THEN b ELSE a END)),
             |      (a, b) -> CASE WHEN b.nu * a.de > a.nu * b.de THEN b ELSE a END)) AS f
             |  FROM pre),
             |r AS (SELECT unnest(list_transform(range(1, len(st) + 1), fi ->
             |  {'bucket': st[fi].x, 'n': st[fi].w, 'successes': st[fi].s,
             |   'raw_ppm': (1000000 * st[fi].s) // st[fi].w,
             |   'iso_ppm': (1000000 * f[fi].nu) // f[fi].de})) AS r FROM iso)
             |SELECT r.bucket::BIGINT AS bucket, r.n::BIGINT AS n,
             |  r.successes::BIGINT AS successes, r.raw_ppm::BIGINT AS raw_ppm,
             |  r.iso_ppm::BIGINT AS iso_ppm
             |FROM r ORDER BY bucket""".stripMargin),
      (s, dir) => {
        val x = t(s, dir, "events")
          .withColumn("xb",
            expr("cast(get_json_object(props, '$.k') as bigint) div 10L"))
          .withColumn("y", col("event_type") === "purchase")
        EvalStats.isotonicFit(x, "xb", "y").orderBy("bucket")
      }),

    // ---- Wilson score intervals per slice ------------------------
    // 95% conversion-rate CIs per event type, exact to the ppm via
    // the integer-sqrt chain (double-seeded, DECIMAL-pinned) — both
    // engines run the identical correction ladder.
    Q("q324_wilson_interval",
      Some("""WITH g AS (SELECT event_type AS grp, count(*)::BIGINT AS n,
             |  sum(CASE WHEN value > 100 THEN 1 ELSE 0 END)::BIGINT AS successes
             |  FROM events GROUP BY 1),
             |c AS (SELECT grp, n, successes,
             |  3841600::HUGEINT * (4::HUGEINT * n * successes * (n - successes)
             |    * 1000000 + n::HUGEINT * n * 3841600) AS x,
             |  2::HUGEINT * n * (1000000::HUGEINT * n + 3841600) AS den,
             |  2000000::HUGEINT * n * successes + n::HUGEINT * 3841600 AS ctr
             |  FROM g),
             |t0 AS (SELECT *, floor(sqrt(x::DOUBLE))::HUGEINT AS s0 FROM c),
             |t1 AS (SELECT *, s0 - CASE WHEN s0 * s0 > x THEN 1 ELSE 0 END AS s1 FROM t0),
             |t2 AS (SELECT *, s1 - CASE WHEN s1 * s1 > x THEN 1 ELSE 0 END AS s2 FROM t1),
             |t3 AS (SELECT *, s2 + CASE WHEN (s2 + 1) * (s2 + 1) <= x THEN 1 ELSE 0 END AS s3 FROM t2),
             |t4 AS (SELECT *, s3 + CASE WHEN (s3 + 1) * (s3 + 1) <= x THEN 1 ELSE 0 END AS rt FROM t3)
             |SELECT grp, n, successes,
             |  ((1000000 * successes) // n)::BIGINT AS rate_ppm,
             |  ((1000000::HUGEINT * (ctr - rt)) // den)::BIGINT AS wilson_lo_ppm,
             |  ((1000000::HUGEINT * (ctr + rt)) // den)::BIGINT AS wilson_hi_ppm
             |FROM t4 ORDER BY grp""".stripMargin),
      (s, dir) =>
        EvalStats.wilsonBounds(
          t(s, dir, "events").withColumn("succ", col("value") > 100),
          "event_type", "succ")
          .orderBy("grp")),

    // ---- split-conformal coverage audit --------------------------
    // Calibrate |value − median| on even event-ids per type (α=0.1,
    // nearest-rank q̂), then audit the conformal ±q̂ band's empirical
    // coverage on the odd half. Exchangeability says ≥ 90%.
    Q("q325_conformal",
      Some("""WITH x AS (SELECT event_type AS grp,
             |  CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v,
             |  (event_id % 2 = 0) AS cal FROM events),
             |calx AS (SELECT grp, v FROM x WHERE cal),
             |mr AS (SELECT grp, v,
             |  row_number() OVER (PARTITION BY grp ORDER BY v) AS rn,
             |  count(*) OVER (PARTITION BY grp) AS nc FROM calx),
             |med AS (SELECT grp, v AS med FROM mr WHERE rn = (nc + 1) // 2),
             |conf AS (SELECT c.grp, abs(c.v - m.med) AS cv, m.med
             |  FROM calx c JOIN med m ON c.grp = m.grp),
             |cr AS (SELECT grp, cv, med,
             |  row_number() OVER (PARTITION BY grp ORDER BY cv) AS rn,
             |  count(*) OVER (PARTITION BY grp) AS nc FROM conf),
             |qh AS (SELECT grp, nc::BIGINT AS n_cal, med,
             |  CASE WHEN (9 * (nc + 1) + 9) // 10 > nc THEN NULL ELSE cv END AS qhat
             |  FROM cr WHERE rn = least((9 * (nc + 1) + 9) // 10, nc)),
             |tst AS (SELECT x.grp, x.v, q.n_cal, q.med, q.qhat
             |  FROM x JOIN qh q ON x.grp = q.grp WHERE NOT x.cal),
             |agg AS (SELECT grp, n_cal, qhat, count(*)::BIGINT AS n_test,
             |  sum(CASE WHEN qhat IS NULL OR abs(v - med) <= qhat
             |    THEN 1 ELSE 0 END)::BIGINT AS covered
             |  FROM tst GROUP BY grp, n_cal, qhat)
             |SELECT grp, n_cal, n_test, qhat::BIGINT AS qhat, covered,
             |  ((1000000 * covered) // n_test)::BIGINT AS coverage_ppm
             |FROM agg ORDER BY grp""".stripMargin),
      (s, dir) => {
        val x = t(s, dir, "events")
          .withColumn("mv", expr("cast(floor(value * 1000000d + 0.5d) as bigint)"))
          .withColumn("cal", col("event_id") % 2 === 0)
        EvalStats.splitConformal(x, "event_type", "mv", "cal")
          .orderBy("grp")
      }),

    // ---- daily co-movement matrix --------------------------------
    // Pearson r (ppm, isqrt-exact) between event types' daily count
    // series, silent days as arithmetic zeros — which activity
    // streams rise and fall together.
    Q("q326_comovement",
      Some(seriesCorrSql(lag = 0)),
      (s, dir) =>
        graft.operators.TimeSeries.seriesCorrelation(
          t(s, dir, "events"), "ts", "event_type", bucketSec = 86400L,
          lag = 0)
          .orderBy("key_a", "key_b")),

    // ---- lead–lag cross-correlation ------------------------------
    // Same machinery at lag 1: r(x_t, y_{t+1}) for ORDERED type
    // pairs — does today's x activity foreshadow tomorrow's y?
    Q("q327_lead_lag",
      Some(seriesCorrSql(lag = 1)),
      (s, dir) =>
        graft.operators.TimeSeries.seriesCorrelation(
          t(s, dir, "events"), "ts", "event_type", bucketSec = 86400L,
          lag = 1)
          .orderBy("key_a", "key_b")),

    // ---- exact binomial sign test per user -----------------------
    // Is a user's daily value total drifting UP beyond coin-flip
    // chance? Exact tail P[Binom(n,1/2) ≥ k] in ppm via integer
    // binomial folds — no normal approximation. 20 most significant.
    Q("q328_sign_test",
      Some("""WITH x AS (SELECT user_id AS entity,
             |  (epoch_us(ts) * 1000) // 86400000000000 AS b,
             |  CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS mv FROM events),
             |d AS (SELECT entity, b, sum(mv)::BIGINT AS y FROM x GROUP BY 1, 2),
             |l AS (SELECT entity, y,
             |  lag(y) OVER (PARTITION BY entity ORDER BY b) AS prev FROM d),
             |g AS (SELECT entity, count(*)::BIGINT AS n_changes,
             |  sum(CASE WHEN y > prev THEN 1 ELSE 0 END)::BIGINT AS n_up
             |  FROM l WHERE prev IS NOT NULL AND y <> prev GROUP BY entity),
             |p AS (SELECT entity, n_changes, n_up,
             |  (CASE WHEN n_changes = 0 THEN 1000000
             |  ELSE (1000000::HUGEINT * list_reduce(list_prepend(0::HUGEINT,
             |    list_transform(range(n_up, n_changes + 1), gi ->
             |      CASE WHEN gi = 0 THEN 1::HUGEINT
             |      ELSE list_reduce(list_prepend(1::HUGEINT, range(1, gi + 1)),
             |        (c, gj) -> (c * (n_changes - gj + 1)) // gj) END)),
             |    (a, bb) -> a + bb))
             |  // list_reduce(list_prepend(1::HUGEINT, range(1, n_changes + 1)),
             |    (pp, gz) -> pp * 2) END)::BIGINT AS p_up_ppm
             |  FROM g)
             |SELECT entity, n_changes, n_up, p_up_ppm FROM p
             |ORDER BY p_up_ppm, entity LIMIT 20""".stripMargin),
      (s, dir) => {
        val x = tp(s, dir, "events", "event_id")
          .withColumn("mv", expr("cast(floor(value * 1000000d + 0.5d) as bigint)"))
          .withColumn("b", expr("ts div 86400000000000L"))
        EvalStats.signTest(x, "user_id", "b", "mv")
          .orderBy("p_up_ppm", "entity").limit(20)
      }),

    // ---- Benjamini–Hochberg FDR gate over the drift family -------
    // The q328 per-user p-values as one test FAMILY: BH step-up at
    // q=0.10 with the exact integer comparison p·m ≤ q·rank — the
    // multiple-testing correction before alerting on drift.
    Q("q329_bh_fdr",
      Some("""WITH x AS (SELECT user_id AS entity,
             |  (epoch_us(ts) * 1000) // 86400000000000 AS b,
             |  CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS mv FROM events),
             |d AS (SELECT entity, b, sum(mv)::BIGINT AS y FROM x GROUP BY 1, 2),
             |l AS (SELECT entity, y,
             |  lag(y) OVER (PARTITION BY entity ORDER BY b) AS prev FROM d),
             |g AS (SELECT entity, count(*)::BIGINT AS n_changes,
             |  sum(CASE WHEN y > prev THEN 1 ELSE 0 END)::BIGINT AS n_up
             |  FROM l WHERE prev IS NOT NULL AND y <> prev GROUP BY entity),
             |p AS (SELECT entity, n_changes, n_up,
             |  (CASE WHEN n_changes = 0 THEN 1000000
             |  ELSE (1000000::HUGEINT * list_reduce(list_prepend(0::HUGEINT,
             |    list_transform(range(n_up, n_changes + 1), gi ->
             |      CASE WHEN gi = 0 THEN 1::HUGEINT
             |      ELSE list_reduce(list_prepend(1::HUGEINT, range(1, gi + 1)),
             |        (c, gj) -> (c * (n_changes - gj + 1)) // gj) END)),
             |    (a, bb) -> a + bb))
             |  // list_reduce(list_prepend(1::HUGEINT, range(1, n_changes + 1)),
             |    (pp, gz) -> pp * 2) END)::BIGINT AS p_up_ppm
             |  FROM g),
             |m AS (SELECT count(*)::BIGINT AS m FROM p),
             |r AS (SELECT entity AS id, p_up_ppm AS p_ppm,
             |  row_number() OVER (ORDER BY p_up_ppm, entity)::BIGINT AS rank FROM p),
             |ok AS (SELECT coalesce(max(rank), 0)::BIGINT AS istar
             |  FROM r, m WHERE p_ppm * m <= 100000 * rank)
             |SELECT id, rank, p_ppm,
             |  ((100000 * rank) // m)::BIGINT AS thresh_ppm,
             |  (rank <= istar) AS rejected
             |FROM r, m, ok ORDER BY rank LIMIT 25""".stripMargin),
      (s, dir) => {
        val x = tp(s, dir, "events", "event_id")
          .withColumn("mv", expr("cast(floor(value * 1000000d + 0.5d) as bigint)"))
          .withColumn("b", expr("ts div 86400000000000L"))
        EvalStats.bhAdjust(
          EvalStats.signTest(x, "user_id", "b", "mv"), "entity", "p_up_ppm")
          .orderBy("rank").limit(25)
      }),

    // ---- vocabulary novelty curve (Heaps audit) ------------------
    // Trigram vocabulary growth across 10 id-ordinal corpus slices:
    // how much NEW language does each additional tranche contribute?
    Q("q330_novelty_curve",
      Some(s"""WITH toks AS (SELECT doc_id, text, ${D.tokens("text")} AS t
              |  FROM documents),
              |tri AS (SELECT doc_id, unnest(${D.shingles3("t", "text")}) AS sh
              |  FROM toks),
              |ext AS (SELECT max(doc_id)::BIGINT AS maxid FROM documents),
              |b AS (SELECT doc_id, doc_id // ((maxid // 10) + 1) AS bkt, sh
              |  FROM tri CROSS JOIN ext),
              |occ AS (SELECT bkt, count(*)::BIGINT AS occurrences,
              |  count(DISTINCT doc_id)::BIGINT AS n_docs FROM b GROUP BY bkt),
              |nv AS (SELECT min(bkt) AS bkt FROM b GROUP BY sh),
              |nt AS (SELECT bkt, count(*)::BIGINT AS new_types FROM nv GROUP BY bkt),
              |j AS (SELECT occ.bkt, occ.n_docs, occ.occurrences,
              |  coalesce(nt.new_types, 0)::BIGINT AS new_types
              |  FROM occ LEFT JOIN nt ON occ.bkt = nt.bkt)
              |SELECT bkt::BIGINT AS bucket, n_docs, occurrences, new_types,
              |  sum(new_types) OVER (ORDER BY bkt
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_types,
              |  ((1000000 * new_types) // occurrences)::BIGINT AS novelty_ppm
              |FROM j ORDER BY bucket""".stripMargin),
      (s, dir) =>
        graft.operators.Relevance.noveltyCurve(
          t(s, dir, "documents"), "doc_id", "text", nBuckets = 10)
          .orderBy("bucket")),

    // ---- difference-in-differences -------------------------------
    // Even vs odd user ids, pre vs post day 15: the exact 2×2 DiD
    // over one common DECIMAL denominator — no rounded-mean
    // arithmetic anywhere.
    Q("q331_diff_in_diff",
      Some("""WITH e AS (SELECT user_id,
             |  (epoch_us(ts) * 1000) // 86400000000000 AS b,
             |  CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v FROM events),
             |m AS (SELECT min(b) AS b0 FROM e),
             |x AS (SELECT (user_id % 2 = 0) AS a, (b - b0 >= 15) AS p, v
             |  FROM e CROSS JOIN m),
             |c AS (SELECT a, p, count(*)::BIGINT AS n, sum(v)::BIGINT AS s
             |  FROM x GROUP BY a, p),
             |g AS (SELECT
             |  max(CASE WHEN a AND p THEN n END) AS n_a_post,
             |  max(CASE WHEN a AND p THEN s END) AS s_ap,
             |  max(CASE WHEN a AND NOT p THEN n END) AS n_a_pre,
             |  max(CASE WHEN a AND NOT p THEN s END) AS s_aq,
             |  max(CASE WHEN NOT a AND p THEN n END) AS n_b_post,
             |  max(CASE WHEN NOT a AND p THEN s END) AS s_bp,
             |  max(CASE WHEN NOT a AND NOT p THEN n END) AS n_b_pre,
             |  max(CASE WHEN NOT a AND NOT p THEN s END) AS s_bq FROM c),
             |f AS (SELECT *,
             |  (s_ap::HUGEINT * n_a_pre * n_b_post * n_b_pre
             |   - s_aq::HUGEINT * n_a_post * n_b_post * n_b_pre
             |   - s_bp::HUGEINT * n_a_post * n_a_pre * n_b_pre
             |   + s_bq::HUGEINT * n_a_post * n_a_pre * n_b_post) AS num,
             |  (n_a_post::HUGEINT * n_a_pre * n_b_post * n_b_pre) AS den FROM g)
             |SELECT n_a_post::BIGINT AS n_a_post, n_a_pre::BIGINT AS n_a_pre,
             |  n_b_post::BIGINT AS n_b_post, n_b_pre::BIGINT AS n_b_pre,
             |  (s_ap // n_a_post)::BIGINT AS mean_a_post,
             |  (s_aq // n_a_pre)::BIGINT AS mean_a_pre,
             |  (s_bp // n_b_post)::BIGINT AS mean_b_post,
             |  (s_bq // n_b_pre)::BIGINT AS mean_b_pre,
             |  (CASE WHEN num >= 0 THEN num // den
             |    ELSE -((-num) // den) END)::BIGINT AS dd
             |FROM f""".stripMargin),
      (s, dir) => {
        val e = t(s, dir, "events")
          .withColumn("b", expr("ts div 86400000000000L"))
          .withColumn("mv", expr("cast(floor(value * 1000000d + 0.5d) as bigint)"))
        val m = e.agg(min(col("b")).as("b0"))
        val x = e.crossJoin(broadcast(m))
          .select((col("user_id") % 2 === 0).as("a"),
            (col("b") - col("b0") >= 15).as("p"), col("mv"))
        EvalStats.diffInDiff(x, "a", "p", "mv")
      }),

    // ---- Mantel–Haenszel stratified odds ratio -------------------
    // Arm (even user id) vs conversion (value > 100), stratified by
    // event type: the confounder-adjusted pooled OR next to the
    // crude OR, both exact over the Πn common denominator via
    // prefix × suffix DECIMAL products.
    Q("q332_mantel_haenszel",
      Some("""WITH x AS (SELECT event_type AS st, (user_id % 2 = 0) AS e,
             |  (value > 100) AS o FROM events),
             |c AS (SELECT st,
             |  sum(CASE WHEN e AND o THEN 1 ELSE 0 END)::BIGINT AS a,
             |  sum(CASE WHEN e AND NOT o THEN 1 ELSE 0 END)::BIGINT AS b,
             |  sum(CASE WHEN NOT e AND o THEN 1 ELSE 0 END)::BIGINT AS c,
             |  sum(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END)::BIGINT AS d
             |  FROM x GROUP BY st),
             |l AS (SELECT list({'s': st, 'a': a, 'b': b, 'c': c, 'd': d,
             |  'n': a + b + c + d} ORDER BY st) AS sl FROM c),
             |pp AS (SELECT sl,
             |  list_transform(range(0, len(sl) + 1), gk ->
             |    list_reduce(list_prepend(1::HUGEINT,
             |      list_transform(sl[1:gk], ge -> ge.n)), (p, q) -> p * q)) AS pre,
             |  list_transform(range(0, len(sl) + 1), gk ->
             |    list_reduce(list_prepend(1::HUGEINT,
             |      list_transform(sl[len(sl) - gk + 1:len(sl)], ge -> ge.n)),
             |      (p, q) -> p * q)) AS suf
             |  FROM l),
             |f AS (SELECT sl,
             |  list_reduce(list_prepend(0::HUGEINT,
             |    list_transform(range(1, len(sl) + 1), gi ->
             |      (sl[gi].a::HUGEINT * sl[gi].d) * pre[gi]
             |        * suf[len(sl) - gi + 1])), (aa, bb) -> aa + bb) AS num,
             |  list_reduce(list_prepend(0::HUGEINT,
             |    list_transform(range(1, len(sl) + 1), gi ->
             |      (sl[gi].b::HUGEINT * sl[gi].c) * pre[gi]
             |        * suf[len(sl) - gi + 1])), (aa, bb) -> aa + bb) AS den,
             |  list_reduce(list_prepend(0::BIGINT,
             |    list_transform(sl, ge -> ge.a)), (aa, bb) -> aa + bb) AS ta,
             |  list_reduce(list_prepend(0::BIGINT,
             |    list_transform(sl, ge -> ge.b)), (aa, bb) -> aa + bb) AS tb,
             |  list_reduce(list_prepend(0::BIGINT,
             |    list_transform(sl, ge -> ge.c)), (aa, bb) -> aa + bb) AS tc,
             |  list_reduce(list_prepend(0::BIGINT,
             |    list_transform(sl, ge -> ge.d)), (aa, bb) -> aa + bb) AS td
             |  FROM pp)
             |SELECT len(sl)::BIGINT AS n_strata,
             |  (CASE WHEN tb * tc = 0 THEN NULL
             |   ELSE (1000000::HUGEINT * ta * td) // (tb::HUGEINT * tc) END)::BIGINT
             |    AS or_crude_micro,
             |  (CASE WHEN den <= 0 THEN NULL
             |   ELSE (1000000::HUGEINT * num) // den END)::BIGINT AS or_mh_micro
             |FROM f""".stripMargin),
      (s, dir) => {
        val x = t(s, dir, "events")
          .withColumn("arm", col("user_id") % 2 === 0)
          .withColumn("conv", col("value") > 100)
        EvalStats.mantelHaenszel(x, "event_type", "arm", "conv")
      }),

    // ---- distribution-free median CI per user --------------------
    // Exact binomial order-statistic bracket for each user's daily-
    // total median (α/2 = 1/40 per side, compared as pure integers:
    // 40·ΣC(n,i) ≤ 2ⁿ). First 20 users.
    Q("q333_median_ci",
      Some("""WITH x AS (SELECT user_id AS entity,
             |  (epoch_us(ts) * 1000) // 86400000000000 AS b,
             |  CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS mv FROM events),
             |d AS (SELECT entity, b, sum(mv)::BIGINT AS y FROM x GROUP BY 1, 2),
             |r AS (SELECT entity, y,
             |  row_number() OVER (PARTITION BY entity ORDER BY y) AS rn,
             |  count(*) OVER (PARTITION BY entity) AS n FROM d),
             |st AS (SELECT DISTINCT entity, n FROM r),
             |ks AS (SELECT entity, n, unnest(range(0, (n + 1) // 2)) AS i
             |  FROM st),
             |cb AS (SELECT entity, n, i,
             |  CASE WHEN i = 0 THEN 1::HUGEINT
             |  ELSE list_reduce(list_prepend(1::HUGEINT, range(1, i + 1)),
             |    (c, gj) -> (c * (n - gj + 1)) // gj) END AS binom FROM ks),
             |sc AS (SELECT entity, n, i, sum(binom) OVER (PARTITION BY entity
             |  ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
             |  FROM cb),
             |lsel AS (SELECT entity, any_value(n) AS n,
             |  coalesce(max(CASE WHEN 40 * s <= (1::BIGINT << n) THEN i + 1 END),
             |    0) AS l
             |  FROM sc GROUP BY entity),
             |cc AS (SELECT ls.entity, ls.n, ls.l,
             |  CASE WHEN ls.l = 0 THEN NULL ELSE
             |    ((1000000::HUGEINT * ((1::BIGINT << ls.n) - 2 * sc.s))
             |      // (1::BIGINT << ls.n))::BIGINT END AS conf_ppm
             |  FROM lsel ls LEFT JOIN sc
             |    ON sc.entity = ls.entity AND sc.i = ls.l - 1),
             |pv AS (SELECT r.entity,
             |  max(r.n)::BIGINT AS n_days,
             |  max(CASE WHEN rn = cc.l AND cc.l > 0 THEN y END) AS lo,
             |  max(CASE WHEN rn = (r.n + 1) // 2 THEN y END) AS median,
             |  max(CASE WHEN rn = r.n + 1 - cc.l AND cc.l > 0 THEN y END) AS hi,
             |  max(conf_ppm) AS conf_ppm
             |  FROM r JOIN cc ON r.entity = cc.entity GROUP BY r.entity)
             |SELECT entity, n_days, lo, median, hi, conf_ppm FROM pv
             |ORDER BY entity LIMIT 20""".stripMargin),
      (s, dir) => {
        val x = t(s, dir, "events")
          .withColumn("mv", expr("cast(floor(value * 1000000d + 0.5d) as bigint)"))
          .withColumn("b", expr("ts div 86400000000000L"))
        EvalStats.medianCI(x, "user_id", "b", "mv")
          .orderBy("entity").limit(20)
      }),

    // ---- Good–Turing unseen mass + Chao1 richness ----------------
    // Per source: how much token-type probability mass is still
    // unseen (V1/N) and how many types exist in total (Chao1) —
    // exact integer ratios, the coverage companion to q330.
    Q("q334_species_richness",
      Some(s"""WITH tok AS (SELECT source AS grp,
              |  unnest(${D.tokens("text")}) AS w FROM documents),
              |tc AS (SELECT grp, w, count(*)::BIGINT AS c FROM tok GROUP BY 1, 2),
              |g AS (SELECT grp, sum(c)::BIGINT AS n_tokens,
              |  count(*)::BIGINT AS types,
              |  sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS singletons,
              |  sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)::BIGINT AS doubletons
              |  FROM tc GROUP BY grp)
              |SELECT grp, n_tokens, types, singletons, doubletons,
              |  ((1000000 * singletons) // n_tokens)::BIGINT AS unseen_ppm,
              |  (CASE WHEN doubletons > 0
              |    THEN types + (singletons * singletons) // (2 * doubletons)
              |    ELSE types + (singletons * (singletons - 1)) // 2 END)::BIGINT
              |    AS chao1
              |FROM g ORDER BY grp""".stripMargin),
      (s, dir) =>
        graft.operators.Relevance.speciesRichness(
          t(s, dir, "documents"), "source", "text")
          .orderBy("grp")),

    // ---- Luhn-validated card-number screening --------------------
    // Synthetic 16-digit runs derived from event ids, screened by
    // the exact mod-10 Luhn fold — the PII false-positive filter;
    // ~1 in 10 random numbers validates.
    Q("q335_luhn_screen",
      Some("""WITH x AS (SELECT event_type,
             |  'card ' || lpad(((event_id * 48271) % 100000000)::VARCHAR, 8, '0')
             |    || lpad(((event_id * 16807 + 12345) % 100000000)::VARCHAR, 8, '0')
             |    || ' end' AS s
             |  FROM events),
             |r AS (SELECT event_type, unnest(list_filter(
             |  regexp_extract_all(s, '[0-9]+'),
             |  rr -> length(rr) BETWEEN 13 AND 19)) AS run FROM x),
             |v AS (SELECT event_type,
             |  list_reduce(list_prepend(0::BIGINT,
             |    list_transform(range(1, length(run) + 1), gi ->
             |      CASE WHEN gi % 2 = 0 THEN
             |        CASE WHEN (ascii(run[length(run) + 1 - gi]) - 48) * 2 > 9
             |          THEN (ascii(run[length(run) + 1 - gi]) - 48) * 2 - 9
             |          ELSE (ascii(run[length(run) + 1 - gi]) - 48) * 2 END
             |      ELSE ascii(run[length(run) + 1 - gi]) - 48 END)),
             |    (aa, bb) -> aa + bb) % 10 = 0 AS ok
             |  FROM r)
             |SELECT event_type, count(*)::BIGINT AS n_candidates,
             |  sum(CASE WHEN ok THEN 1 ELSE 0 END)::BIGINT AS n_valid,
             |  ((1000000 * sum(CASE WHEN ok THEN 1 ELSE 0 END)) // count(*))::BIGINT
             |    AS valid_ppm
             |FROM v GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val x = t(s, dir, "events").withColumn("card_text", expr(
          "concat('card ', lpad(cast((event_id * 48271L) % 100000000L as string), 8, '0'), " +
            "lpad(cast((event_id * 16807L + 12345L) % 100000000L as string), 8, '0'), ' end')"))
        graft.operators.TextOps.withLuhnStats(x, "card_text")
          .groupBy(col("event_type"))
          .agg(sum(col("luhn_candidates")).cast("bigint").as("n_candidates"),
            sum(col("luhn_valid")).cast("bigint").as("n_valid"))
          .withColumn("valid_ppm",
            expr("(1000000L * n_valid) div n_candidates").cast("bigint"))
          .orderBy("event_type")
      }),

    // ---- peak detection with prominence --------------------------
    // Strict local maxima of per-type daily counts whose topographic
    // prominence (height above the higher separating valley) is ≥ 3
    // — real spikes, not ripples. The engine uses latched packed-
    // bigint folds; the oracle is a pure window/join rendering (no
    // lambdas — the DuckDB lambda-vectorization hazard, SURVEY §9.4,
    // reproduced here even at two nesting levels).
    Q("q340_peaks",
      Some("""WITH x AS (SELECT event_type AS key,
             |  (epoch_us(ts) * 1000) // 86400000000000 AS b FROM events),
             |c AS (SELECT key, b, count(*)::BIGINT AS c FROM x GROUP BY 1, 2),
             |sp AS (SELECT min(b) AS bmin, max(b) AS bmax FROM x),
             |ks AS (SELECT DISTINCT key FROM c),
             |grid AS (SELECT key, bmin + g AS b FROM (
             |  SELECT key, bmin, bmax, unnest(range(0, bmax - bmin + 1)) AS g
             |  FROM ks CROSS JOIN sp) s),
             |dy AS (SELECT grid.key, grid.b, coalesce(c.c, 0)::BIGINT AS y
             |  FROM grid LEFT JOIN c ON c.key = grid.key AND c.b = grid.b),
             |pks AS (SELECT key, b, y FROM (
             |  SELECT key, b, y,
             |    lag(y) OVER (PARTITION BY key ORDER BY b) AS py,
             |    lead(y) OVER (PARTITION BY key ORDER BY b) AS ny FROM dy) w
             |  WHERE py IS NOT NULL AND ny IS NOT NULL AND y > py AND y > ny),
             |pj AS (SELECT p.key, p.b, p.y, d.b AS ob, d.y AS oy
             |  FROM pks p JOIN dy d ON d.key = p.key AND d.b <> p.b),
             |stops AS (SELECT key, b, y,
             |  max(CASE WHEN ob < b AND oy > y THEN ob END) AS lstop,
             |  min(CASE WHEN ob > b AND oy > y THEN ob END) AS rstop
             |  FROM pj GROUP BY 1, 2, 3),
             |vals AS (SELECT pj.key, pj.b, pj.y,
             |  min(CASE WHEN pj.ob < pj.b
             |    AND pj.ob > coalesce(st.lstop, -4611686018427387904)
             |    THEN pj.oy END) AS lv,
             |  min(CASE WHEN pj.ob > pj.b
             |    AND pj.ob < coalesce(st.rstop, 4611686018427387904)
             |    THEN pj.oy END) AS rv
             |  FROM pj JOIN stops st ON st.key = pj.key AND st.b = pj.b
             |  GROUP BY 1, 2, 3)
             |SELECT key, b AS bucket, y,
             |  (y - greatest(lv, rv))::BIGINT AS prominence
             |FROM vals WHERE y - greatest(lv, rv) >= 3
             |ORDER BY key, bucket""".stripMargin),
      (s, dir) =>
        graft.operators.TimeSeries.detectPeaks(
          t(s, dir, "events"), "ts", "event_type",
          bucketSec = 86400L, minProminence = 3L)
          .orderBy("key", "bucket")),

    // ---- AUC with DeLong 95% CI ----------------------------------
    // Does the milli-value "score" separate high-k events (props.k ≥
    // 50)? Exact rational AUC plus the DeLong standard error from
    // integer placement-variance aggregates; CI at the exact
    // rational 1.96 = 49/25.
    Q("q342_auc_delong", {
      val ladder = graft.util.ExactMath.duckIsqrtSteps("rt").zipWithIndex
        .map { case (sel, i) =>
          val from = if (i == 0) "f" else s"i${i - 1}"
          s"i$i AS ($sel FROM $from)"
        }.mkString(",\n")
      Some(s"""WITH x AS (SELECT CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v,
              |  (regexp_extract(props, '([0-9]+)', 1)::BIGINT >= 50) AS p
              |  FROM events),
              |g AS (SELECT v, sum(CASE WHEN p THEN 1 ELSE 0 END)::BIGINT AS na,
              |  count(*)::BIGINT AS t FROM x GROUP BY v),
              |c AS (SELECT v, na, t - na AS nb,
              |  coalesce(sum(t - na) OVER (ORDER BY v
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cnb,
              |  coalesce(sum(na) OVER (ORDER BY v
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cna
              |  FROM g),
              |tp AS (SELECT sum(na)::HUGEINT AS ta FROM g),
              |s AS (SELECT sum(na)::HUGEINT AS sa, sum(nb)::HUGEINT AS sb,
              |  sum(na::HUGEINT * (2 * cnb + nb)) AS u2,
              |  sum(na::HUGEINT * (2 * cnb + nb) * (2 * cnb + nb)) AS sc2,
              |  sum(nb::HUGEINT * (2 * (tp.ta - cna - na) + na)
              |    * (2 * (tp.ta - cna - na) + na)) AS sd2
              |  FROM c CROSS JOIN tp),
              |f AS (SELECT sa, sb, u2,
              |  (1000000::HUGEINT * 1000000 *
              |    ((sa * sc2 - u2 * u2) * (sb - 1)
              |     + (sb * sd2 - u2 * u2) * (sa - 1)))
              |  // ((sa - 1) * (sb - 1)) AS x FROM s),
              |$ladder
              |SELECT sa::BIGINT AS n_pos, sb::BIGINT AS n_neg,
              |  ((1000000::HUGEINT * u2) // (2 * sa * sb))::BIGINT AS auc_micro,
              |  (rt // (2 * sa * sb))::BIGINT AS se_micro,
              |  (((1000000::HUGEINT * u2) // (2 * sa * sb))
              |    - (49 * (rt // (2 * sa * sb))) // 25)::BIGINT AS ci_lo_micro,
              |  (((1000000::HUGEINT * u2) // (2 * sa * sb))
              |    + (49 * (rt // (2 * sa * sb))) // 25)::BIGINT AS ci_hi_micro
              |FROM i4""".stripMargin)
    },
      (s, dir) => {
        val x = t(s, dir, "events")
          .withColumn("mv", expr("cast(floor(value * 1000d + 0.5d) as bigint)"))
          .withColumn("hit",
            expr("cast(get_json_object(props, '$.k') as bigint) >= 50L"))
        EvalStats.aucDeLong(x, "mv", "hit")
      }),

    // ---- Neyman variance-optimal sampling allocation -------------
    // How should a 10k-sample audit budget split across event types?
    // ∝ N_h·S_h (size × spread) with the exact isqrt SD and
    // largest-remainder rounding — quotas sum to the budget exactly.
    Q("q343_neyman_alloc", {
      val ladder = graft.util.ExactMath.duckIsqrtSteps("sdr").zipWithIndex
        .map { case (sel, i) =>
          val from = if (i == 0) "fx" else s"i${i - 1}"
          s"i$i AS ($sel FROM $from)"
        }.mkString(",\n")
      Some(s"""WITH x AS (SELECT event_type AS stratum,
              |  CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v FROM events),
              |g AS (SELECT stratum, count(*)::BIGINT AS n_rows,
              |  sum(v)::HUGEINT AS s, sum(v::HUGEINT * v) AS ss
              |  FROM x GROUP BY stratum),
              |vv AS (SELECT stratum, n_rows,
              |  (n_rows::HUGEINT * ss - s * s) AS varnum,
              |  (n_rows::HUGEINT * (n_rows - 1)) AS vden FROM g),
              |fx AS (SELECT stratum, n_rows,
              |  CASE WHEN vden = 0 THEN NULL ELSE varnum // vden END AS x
              |  FROM vv),
              |$ladder,
              |w AS (SELECT stratum, n_rows, coalesce(sdr, 0)::BIGINT AS sd_floor,
              |  (n_rows * coalesce(sdr, 0))::BIGINT AS weight FROM i4),
              |tw AS (SELECT sum(weight)::HUGEINT AS tot FROM w),
              |h AS (SELECT w.*, ((weight::HUGEINT * 10000) // tot)::BIGINT AS qf,
              |  (weight::HUGEINT * 10000
              |    - ((weight::HUGEINT * 10000) // tot) * tot) AS rem
              |  FROM w CROSS JOIN tw),
              |lo AS (SELECT (10000 - sum(qf))::BIGINT AS r FROM h),
              |rk AS (SELECT h.*, row_number() OVER (ORDER BY rem DESC, stratum)
              |  AS rk FROM h)
              |SELECT stratum, n_rows, sd_floor, weight,
              |  (qf + CASE WHEN rk <= lo.r THEN 1 ELSE 0 END)::BIGINT AS quota
              |FROM rk CROSS JOIN lo ORDER BY stratum""".stripMargin)
    },
      (s, dir) => {
        val x = t(s, dir, "events")
          .withColumn("mv", expr("cast(floor(value * 1000000d + 0.5d) as bigint)"))
        graft.operators.Mixing.neymanAllocation(x, "event_type", "mv", 10000L)
          .orderBy("stratum")
      }),

    // ---- Nelson–Aalen cumulative hazard --------------------------
    // Same survival frame as q322 (time to first 'error', censored at
    // horizon); additive hazard instead of the product-limit curve.
    // Each step adds the exact (1e6·d) // n integer; cumulative sum.
    Q("q348_nelson_aalen",
      Some("""WITH x AS (SELECT user_id AS e,
             |  (epoch_us(ts) * 1000) // 86400000000000 AS b, event_type
             |  FROM events),
             |f AS (SELECT e, min(b) AS fb FROM x GROUP BY e),
             |fe AS (SELECT e, min(b) AS eb FROM x
             |  WHERE event_type = 'error' GROUP BY e),
             |mx AS (SELECT max(b) AS bl FROM x),
             |lt AS (SELECT CASE WHEN fe.eb IS NULL THEN mx.bl - f.fb
             |    ELSE fe.eb - f.fb END AS t,
             |  (fe.eb IS NULL) AS cen
             |  FROM f LEFT JOIN fe USING (e) CROSS JOIN mx),
             |h AS (SELECT t, count(*)::BIGINT AS m,
             |  sum(CASE WHEN cen THEN 0 ELSE 1 END)::BIGINT AS d FROM lt GROUP BY t),
             |tot AS (SELECT sum(m)::BIGINT AS total FROM h),
             |hr AS (SELECT t, d, (total - coalesce(sum(m) OVER (ORDER BY t
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))::BIGINT AS n
             |  FROM h, tot),
             |st AS (SELECT t, d, n, (1000000 * d) // n AS term
             |  FROM hr WHERE d > 0)
             |SELECT t::BIGINT AS t, n::BIGINT AS n_at_risk, d::BIGINT AS deaths,
             |  sum(term) OVER (ORDER BY t
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
             |    AS hazard_ppm
             |FROM st ORDER BY t""".stripMargin),
      (s, dir) => {
        val x = t(s, dir, "events")
          .withColumn("b", expr("ts div 86400000000000L"))
        val f = x.groupBy(col("user_id")).agg(min(col("b")).as("fb"))
        val fe = x.where(col("event_type") === "error")
          .groupBy(col("user_id")).agg(min(col("b")).as("eb"))
        val mx = x.agg(max(col("b")).as("bl"))
        val lt = f.join(fe, Seq("user_id"), "left")
          .crossJoin(broadcast(mx))
          .select(
            when(col("eb").isNull, col("bl") - col("fb"))
              .otherwise(col("eb") - col("fb")).as("t"),
            col("eb").isNull.as("cen"))
        graft.operators.TimeSeries.nelsonAalen(lt, "t", "cen").orderBy("t")
      }),

    // ---- two-group log-rank curve --------------------------------
    // Do even- and odd-id user cohorts reach their first error at the
    // same rate? Hypergeometric O−E and variance per death time, both
    // as running ppm integers (sign-split truncating div on O−E).
    Q("q345_logrank",
      Some("""WITH x AS (SELECT user_id AS e,
             |  (epoch_us(ts) * 1000) // 86400000000000 AS b, event_type
             |  FROM events),
             |f AS (SELECT e, min(b) AS fb FROM x GROUP BY e),
             |fe AS (SELECT e, min(b) AS eb FROM x
             |  WHERE event_type = 'error' GROUP BY e),
             |mx AS (SELECT max(b) AS bl FROM x),
             |lt AS (SELECT CASE WHEN fe.eb IS NULL THEN mx.bl - f.fb
             |    ELSE fe.eb - f.fb END AS t,
             |  (fe.eb IS NULL) AS cen, (f.e % 2 = 0) AS g
             |  FROM f LEFT JOIN fe USING (e) CROSS JOIN mx),
             |h AS (SELECT t,
             |  sum(CASE WHEN g THEN 1 ELSE 0 END)::BIGINT AS m1,
             |  sum(CASE WHEN g THEN 0 ELSE 1 END)::BIGINT AS m2,
             |  sum(CASE WHEN g AND NOT cen THEN 1 ELSE 0 END)::BIGINT AS d1,
             |  sum(CASE WHEN (NOT g) AND NOT cen THEN 1 ELSE 0 END)::BIGINT AS d2
             |  FROM lt GROUP BY t),
             |tt AS (SELECT sum(m1)::BIGINT AS t1, sum(m2)::BIGINT AS t2 FROM h),
             |r AS (SELECT t, d1, d2,
             |  (t1 - coalesce(sum(m1) OVER (ORDER BY t
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))::BIGINT AS n1,
             |  (t2 - coalesce(sum(m2) OVER (ORDER BY t
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))::BIGINT AS n2
             |  FROM h CROSS JOIN tt),
             |s AS (SELECT t, n1, n2, d1, d2, d1 + d2 AS d, n1 + n2 AS n
             |  FROM r WHERE d1 + d2 > 0),
             |terms AS (SELECT *,
             |  CASE WHEN 1000000 * (d1 * n - d * n1) >= 0
             |    THEN (1000000 * (d1 * n - d * n1)) // n
             |    ELSE -((1000000 * (d * n1 - d1 * n)) // n) END AS oet,
             |  CASE WHEN n > 1
             |    THEN (1000000 * d * n1 * n2 * (n - d)) // (n * n * (n - 1))
             |    ELSE 0 END AS vt
             |  FROM s)
             |SELECT t::BIGINT AS t, n1, n2, d1, d2,
             |  sum(oet) OVER (ORDER BY t
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS oe_ppm,
             |  sum(vt) OVER (ORDER BY t
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS var_ppm
             |FROM terms ORDER BY t""".stripMargin),
      (s, dir) => {
        val x = t(s, dir, "events")
          .withColumn("b", expr("ts div 86400000000000L"))
        val f = x.groupBy(col("user_id")).agg(min(col("b")).as("fb"))
        val fe = x.where(col("event_type") === "error")
          .groupBy(col("user_id")).agg(min(col("b")).as("eb"))
        val mx = x.agg(max(col("b")).as("bl"))
        val lt = f.join(fe, Seq("user_id"), "left")
          .crossJoin(broadcast(mx))
          .select(
            when(col("eb").isNull, col("bl") - col("fb"))
              .otherwise(col("eb") - col("fb")).as("t"),
            col("eb").isNull.as("cen"),
            (col("user_id") % 2 === 0).as("g"))
        graft.operators.TimeSeries.logRankCurve(lt, "t", "cen", col("g"))
          .orderBy("t")
      }),

    // ---- Brier score Murphy decomposition ------------------------
    // Claimed-confidence decile (props.k // 10, denominator 10) vs
    // observed purchase: exact brier_ppm; rel/res quantized one
    // floor-div per bin.
    Q("q346_brier_decomposition",
      Some("""WITH e AS (SELECT
             |  regexp_extract(props, '([0-9]+)', 1)::BIGINT // 10 AS k,
             |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS o
             |  FROM events),
             |b AS (SELECT k, count(*)::BIGINT AS nb, sum(o)::BIGINT AS ob
             |  FROM e GROUP BY k),
             |t2 AS (SELECT sum(nb)::BIGINT AS n, sum(ob)::BIGINT AS np FROM b),
             |z AS (SELECT b.k, b.nb, b.ob, t2.n, t2.np,
             |  (1000000 * b.k) // 10 AS p_ppm,
             |  (1000000 * b.ob) // b.nb AS ob_ppm,
             |  (1000000 * t2.np) // t2.n AS obar_ppm
             |  FROM b CROSS JOIN t2)
             |SELECT max(n)::BIGINT AS n, max(np)::BIGINT AS n_pos,
             |  ((1000000 * sum(k * k * nb - 20 * k * ob + 100 * ob))
             |    // (100 * max(n)))::BIGINT AS brier_ppm,
             |  sum((nb * (p_ppm - ob_ppm) * (p_ppm - ob_ppm))
             |    // (1000000 * n))::BIGINT AS rel_ppm,
             |  sum((nb * (ob_ppm - obar_ppm) * (ob_ppm - obar_ppm))
             |    // (1000000 * n))::BIGINT AS res_ppm,
             |  max((obar_ppm * (1000000 - obar_ppm)) // 1000000)::BIGINT AS unc_ppm
             |FROM z""".stripMargin),
      (s, dir) =>
        EvalStats.brierDecomposition(
          t(s, dir, "events").withColumn("xb",
            expr("cast(get_json_object(props, '$.k') as bigint) div 10L")),
          "xb", col("event_type") === "purchase", forecastDen = 10L)),

    // ---- SPRT quality monitors -----------------------------------
    // Ten user-cohort streams ordered by event_id, success = 'view',
    // H0: rate 0.2 vs H1: rate 0.4, ±4000 milli-bit boundaries. The
    // integer weights below are the operator's own quantization
    // (sprtWeights), spliced so both engines walk identical integers.
    Q("q347_sprt", {
      val (wS, wF) = graft.operators.TimeSeries.sprtWeights(0.2, 0.4)
      Some(s"""WITH e AS (SELECT user_id % 10 AS g, event_id,
              |  CASE WHEN event_type = 'view' THEN ${wS} ELSE ${wF} END AS w
              |  FROM events),
              |w2 AS (SELECT g, event_id, w,
              |  sum(w) OVER (PARTITION BY g ORDER BY event_id
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS llr,
              |  row_number() OVER (PARTITION BY g ORDER BY event_id) AS rn
              |  FROM e),
              |cr AS (SELECT g, min(rn) AS stop_n FROM w2
              |  WHERE llr >= 4000 OR llr <= -4000 GROUP BY g),
              |crv AS (SELECT w2.g, w2.llr AS stop_llr, cr.stop_n
              |  FROM cr JOIN w2 ON w2.g = cr.g AND w2.rn = cr.stop_n),
              |tot AS (SELECT g, count(*)::BIGINT AS n_obs, sum(w)::BIGINT AS fin
              |  FROM w2 GROUP BY g)
              |SELECT tot.g::BIGINT AS group_id, n_obs,
              |  CASE WHEN stop_llr IS NULL THEN 'continue'
              |       WHEN stop_llr >= 4000 THEN 'accept_h1'
              |       ELSE 'accept_h0' END AS decision,
              |  coalesce(stop_n, n_obs)::BIGINT AS n_at_decision,
              |  coalesce(stop_llr, fin)::BIGINT AS llr_mbits
              |FROM tot LEFT JOIN crv USING (g) ORDER BY group_id""".stripMargin)
    },
      (s, dir) =>
        graft.operators.TimeSeries.sprtMonitor(
          t(s, dir, "events").withColumn("g", expr("user_id % 10L")),
          "g", "event_id", col("event_type") === "view",
          p0 = 0.2, p1 = 0.4, thresholdMbits = 4000L)
          .orderBy("group_id")),

    // ---- propensity-strata treated-vs-control contrast -----------
    // Effect of 'signup' on total purchase value, stratified by view
    // activity (nv // 10): decimal-exact sums per arm; att_diff is
    // the only IEEE value (two divides + subtract on scalars).
    Q("q349_propensity_strata",
      Some("""WITH p AS (SELECT user_id,
             |  sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS nv,
             |  max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS tr,
             |  coalesce(sum(CASE WHEN event_type = 'purchase'
             |    THEN value::DECIMAL(18,2) END), 0::DECIMAL(18,2)) AS y
             |  FROM events GROUP BY user_id),
             |s AS (SELECT nv // 10 AS stratum, tr, y FROM p),
             |g AS (SELECT stratum,
             |  sum(CASE WHEN tr = 1 THEN 1 ELSE 0 END)::BIGINT AS n_treat,
             |  sum(CASE WHEN tr = 0 THEN 1 ELSE 0 END)::BIGINT AS n_ctrl,
             |  coalesce(sum(CASE WHEN tr = 1 THEN y END), 0::DECIMAL(18,2)) AS st,
             |  coalesce(sum(CASE WHEN tr = 0 THEN y END), 0::DECIMAL(18,2)) AS sc
             |  FROM s GROUP BY stratum)
             |SELECT stratum::BIGINT AS stratum, n_treat, n_ctrl,
             |  st::DOUBLE AS sum_treat, sc::DOUBLE AS sum_ctrl,
             |  CASE WHEN n_treat > 0 AND n_ctrl > 0
             |    THEN st::DOUBLE / n_treat::DOUBLE - sc::DOUBLE / n_ctrl::DOUBLE
             |  END AS att_diff
             |FROM g ORDER BY stratum""".stripMargin),
      (s, dir) => {
        val per = t(s, dir, "events").groupBy(col("user_id"))
          .agg(
            sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("nv"),
            max(when(col("event_type") === "signup", 1L).otherwise(0L)).as("tr"),
            coalesce(
              sum(when(col("event_type") === "purchase",
                col("value").cast("decimal(18,2)"))),
              lit(0).cast("decimal(18,2)")).as("y"))
          .withColumn("stratum", expr("nv div 10L"))
        EvalStats.stratifiedContrast(per, "stratum", col("tr") === 1L, "y")
          .select(col("stratum").cast("bigint").as("stratum"),
            col("n_treat"), col("n_ctrl"),
            col("sum_treat").cast("double").as("sum_treat"),
            col("sum_ctrl").cast("double").as("sum_ctrl"),
            col("att_diff"))
          .orderBy("stratum")
      }),

    // ---- Cochran's Q ---------------------------------------------
    // Do view / click / purchase have the same per-user marginal
    // reach? k=3 repeated binary measures on the same subjects.
    Q("q350_cochran_q",
      Some("""WITH p AS (SELECT user_id,
             |  max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c0,
             |  max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
             |  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
             |  FROM events GROUP BY user_id),
             |a AS (SELECT count(*)::BIGINT AS n,
             |  sum(c0)::BIGINT AS s0, sum(c1)::BIGINT AS s1, sum(c2)::BIGINT AS s2,
             |  sum(c0 + c1 + c2)::BIGINT AS tt,
             |  sum((c0 + c1 + c2) * (c0 + c1 + c2))::BIGINT AS r2 FROM p)
             |SELECT n AS n_subjects, 3::BIGINT AS k,
             |  (CASE WHEN 3 * tt - r2 > 0 THEN
             |    (1000000 * 2 * ((3 * s0 - tt) * (3 * s0 - tt)
             |      + (3 * s1 - tt) * (3 * s1 - tt)
             |      + (3 * s2 - tt) * (3 * s2 - tt)))
             |    // (3 * (3 * tt - r2)) ELSE NULL END)::BIGINT AS q_ppm
             |FROM a""".stripMargin),
      (s, dir) => {
        val per = t(s, dir, "events").groupBy(col("user_id"))
          .agg(
            max(when(col("event_type") === "view", 1L).otherwise(0L)).as("v"),
            max(when(col("event_type") === "click", 1L).otherwise(0L)).as("c"),
            max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
        EvalStats.cochranQ(per,
          Seq(col("v") === 1L, col("c") === 1L, col("p") === 1L))
      }),

    // ---- Friedman rank test --------------------------------------
    // Blocks = users, treatments = the 5 event types, value = the
    // user's count of that type (complete grid, zeros filled).
    // Midranks as doubled integers; sign-split final div.
    Q("q351_friedman",
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
             |ty AS (SELECT unnest(['view','click','purchase','signup','error']) AS et),
             |c AS (SELECT user_id, event_type AS et, count(*)::BIGINT AS v
             |  FROM events GROUP BY user_id, event_type),
             |g AS (SELECT u.user_id, ty.et, coalesce(c.v, 0) AS v
             |  FROM u CROSS JOIN ty LEFT JOIN c USING (user_id, et)),
             |rk AS (SELECT et,
             |  2 * (rank() OVER (PARTITION BY user_id ORDER BY v) - 1)
             |    + count(*) OVER (PARTITION BY user_id, v) + 1 AS r2 FROM g),
             |rj AS (SELECT et, sum(r2)::BIGINT AS rj2, count(*)::BIGINT AS nb
             |  FROM rk GROUP BY et),
             |a AS (SELECT count(*)::BIGINT AS k, max(nb)::BIGINT AS n,
             |  sum(rj2 * rj2)::BIGINT AS s2 FROM rj)
             |SELECT n AS n_blocks, k,
             |  (CASE WHEN (3000000 * s2) // (k * n * (k + 1)) >= 3000000 * n * (k + 1)
             |    THEN (3000000 * s2) // (k * n * (k + 1)) - 3000000 * n * (k + 1)
             |    ELSE -(3000000 * n * (k + 1) - (3000000 * s2) // (k * n * (k + 1)))
             |  END)::BIGINT AS fr_ppm
             |FROM a""".stripMargin),
      (s, dir) => {
        val ev = t(s, dir, "events")
        val users = ev.select(col("user_id")).distinct()
        val ty = ev.sparkSession.range(1).select(explode(array(
          Seq("view", "click", "purchase", "signup", "error")
            .map(lit): _*)).as("et"))
        val cnt = ev.groupBy(col("user_id"), col("event_type").as("et"))
          .agg(count(lit(1)).cast("bigint").as("v"))
        val grid = users.crossJoin(broadcast(ty))
          .join(cnt, Seq("user_id", "et"), "left")
          .withColumn("v", coalesce(col("v"), lit(0L)))
        EvalStats.friedmanRanks(grid, "user_id", "et", "v")
      }),

    // ---- Chapman capture–recapture -------------------------------
    // Two cheap duplicate detectors (exact rolling-hash fingerprint
    // vs (n_chars, 32-char prefix) key) each catch a set of docs;
    // Chapman estimates the total duplicate population from the
    // overlap — the detector-coverage audit.
    Q("q352_capture_recapture",
      Some(s"""WITH fa AS (SELECT doc_id, ${D.rollingHash("text")} AS fp
              |  FROM documents),
              |qa AS (SELECT doc_id FROM (SELECT doc_id,
              |  count(*) OVER (PARTITION BY fp) AS c FROM fa) WHERE c > 1),
              |fb AS (SELECT doc_id, n_chars, substring(text, 1, 32) AS p32
              |  FROM documents),
              |qb AS (SELECT doc_id FROM (SELECT doc_id,
              |  count(*) OVER (PARTITION BY n_chars, p32) AS c FROM fb)
              |  WHERE c > 1),
              |a AS (SELECT count(DISTINCT doc_id)::BIGINT AS na FROM qa),
              |b AS (SELECT count(DISTINCT doc_id)::BIGINT AS nb FROM qb),
              |m AS (SELECT count(*)::BIGINT AS m FROM
              |  (SELECT DISTINCT doc_id FROM qa) x
              |  JOIN (SELECT DISTINCT doc_id FROM qb) y USING (doc_id))
              |SELECT na AS n_a, nb AS n_b, m AS n_both,
              |  (((na + 1) * (nb + 1)) // (m + 1) - 1)::BIGINT AS chapman_est,
              |  (CASE WHEN m > 0 THEN (na * nb) // m
              |   ELSE NULL END)::BIGINT AS lincoln_est
              |FROM a CROSS JOIN b CROSS JOIN m""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val d = t(s, dir, "documents")
        val detA = d
          .withColumn("fp", expr(TextHash.spark.rollingHash("text")))
          .withColumn("c", count(lit(1)).over(Window.partitionBy(col("fp"))))
          .where(col("c") > 1).select(col("doc_id"))
        val detB = d
          .withColumn("p32", expr("substring(text, 1, 32)"))
          .withColumn("c", count(lit(1))
            .over(Window.partitionBy(col("n_chars"), col("p32"))))
          .where(col("c") > 1).select(col("doc_id"))
        EvalStats.captureRecapture(detA, detB, "doc_id")
      }),

    // ---- Bradley–Terry arena ranking -----------------------------
    // Pairwise games: within each user's complete 5-type count grid,
    // the type with more events wins (zero-zero and exact ties are
    // not games). 3 ppm-integer MM iterations, normalized to sum
    // 5e6 — the oracle replays the identical integer updates.
    Q("q353_bradley_terry", {
      val it = (1 to 3).map { i =>
        val prev = if (i == 1) "st0" else s"st${i - 1}"
        s"""d$i AS (SELECT s.i, sum((s.n * 1000000000000) // (si.s + sj.s))::BIGINT AS dd
           |  FROM sym s JOIN $prev si ON s.i = si.i
           |  JOIN $prev sj ON s.j = sj.i GROUP BY s.i),
           |st$i AS (SELECT tt.i, (1000000000000 * tt.w) // d$i.dd AS s
           |  FROM tot tt JOIN d$i ON tt.i = d$i.i)""".stripMargin
      }.mkString(",\n")
      Some(s"""WITH u AS (SELECT DISTINCT user_id FROM events),
              |ty AS (SELECT unnest(['view','click','purchase','signup','error']) AS et),
              |cnt AS (SELECT user_id, event_type AS et, count(*)::BIGINT AS c
              |  FROM events GROUP BY user_id, event_type),
              |g AS (SELECT u.user_id, ty.et, coalesce(cnt.c, 0) AS c
              |  FROM u CROSS JOIN ty LEFT JOIN cnt USING (user_id, et)),
              |pr AS (SELECT x.et AS a, y.et AS b,
              |  sum(CASE WHEN x.c > y.c THEN 1 ELSE 0 END)::BIGINT AS wa,
              |  sum(CASE WHEN y.c > x.c THEN 1 ELSE 0 END)::BIGINT AS wb
              |  FROM g x JOIN g y ON x.user_id = y.user_id AND x.et < y.et
              |  GROUP BY x.et, y.et),
              |sym AS (SELECT a AS i, b AS j, wa + wb AS n, wa AS w FROM pr
              |  WHERE wa + wb > 0
              |  UNION ALL
              |  SELECT b, a, wa + wb, wb FROM pr WHERE wa + wb > 0),
              |tot AS (SELECT i, sum(n)::BIGINT AS nn, sum(w)::BIGINT AS w
              |  FROM sym GROUP BY i),
              |st0 AS (SELECT i, 1000000::BIGINT AS s FROM tot),
              |$it,
              |nrm AS (SELECT sum(s)::BIGINT AS sm, count(*)::BIGINT AS k FROM st3)
              |SELECT st3.i AS player, tot.nn AS n_games, tot.w AS n_wins,
              |  ((st3.s * nrm.k * 1000000) // nrm.sm)::BIGINT AS strength_ppm
              |FROM st3 JOIN tot ON st3.i = tot.i CROSS JOIN nrm
              |ORDER BY player""".stripMargin)
    },
      (s, dir) => {
        val ev = t(s, dir, "events")
        val users = ev.select(col("user_id")).distinct()
        val ty = ev.sparkSession.range(1).select(explode(array(
          Seq("view", "click", "purchase", "signup", "error")
            .map(lit): _*)).as("et"))
        val cnt = ev.groupBy(col("user_id"), col("event_type").as("et"))
          .agg(count(lit(1)).cast("bigint").as("c"))
        val grid = users.crossJoin(broadcast(ty))
          .join(cnt, Seq("user_id", "et"), "left")
          .withColumn("c", coalesce(col("c"), lit(0L)))
        val pairs = grid.as("x")
          .join(grid.as("y"),
            col("x.user_id") === col("y.user_id") && col("x.et") < col("y.et"))
          .groupBy(col("x.et").as("a"), col("y.et").as("b"))
          .agg(
            sum(when(col("x.c") > col("y.c"), 1L).otherwise(0L)).as("wa"),
            sum(when(col("y.c") > col("x.c"), 1L).otherwise(0L)).as("wb"))
        EvalStats.bradleyTerry(pairs, "a", "b", "wa", "wb", iters = 3)
          .orderBy("player")
      }),

    // ---- Shapley vocabulary attribution --------------------------
    // 5 source buckets (srcN -> N % 5); utility = distinct tokens
    // covered by a bucket union. phi_x120 = 5!·φ exactly (efficiency:
    // Σ = 120·v(full)).
    Q("q354_vocab_shapley",
      Some("""WITH d AS (SELECT
             |  cast(regexp_extract(source, '([0-9]+)', 1) AS BIGINT) % 5 AS p,
             |  string_split(text, ' ') AS t FROM documents),
             |tk AS (SELECT p, unnest(t) AS w FROM d),
             |mk AS (SELECT w, bit_or((1::BIGINT << p)) AS m FROM tk GROUP BY w),
             |mc AS (SELECT m, count(*)::BIGINT AS cm FROM mk GROUP BY m),
             |ss AS (SELECT unnest(range(0, 32)) AS sid),
             |v AS (SELECT sid,
             |  coalesce(sum(CASE WHEN (mc.m & ss.sid) != 0 THEN mc.cm END), 0)::BIGINT AS v
             |  FROM ss CROSS JOIN mc GROUP BY sid),
             |pl AS (SELECT unnest(range(0, 5)) AS i),
             |ph AS (SELECT pl.i,
             |  sum((CASE bit_count(vS.sid) WHEN 0 THEN 24 WHEN 1 THEN 6
             |       WHEN 2 THEN 4 WHEN 3 THEN 6 WHEN 4 THEN 24 END)
             |    * (vSi.v - vS.v))::BIGINT AS phi
             |  FROM pl JOIN v vS ON ((1::BIGINT << pl.i) & vS.sid) = 0
             |  JOIN v vSi ON vSi.sid = (vS.sid | (1::BIGINT << pl.i))
             |  GROUP BY pl.i)
             |SELECT ph.i::BIGINT AS player, phi AS phi_xkfact,
             |  vsolo.v AS solo_coverage,
             |  (vfull.v - vrest.v)::BIGINT AS marginal_vs_rest
             |FROM ph
             |JOIN v vsolo ON vsolo.sid = (1::BIGINT << ph.i)
             |JOIN v vrest ON vrest.sid = 31 - (1::BIGINT << ph.i)
             |JOIN v vfull ON vfull.sid = 31
             |ORDER BY player""".stripMargin),
      (s, dir) =>
        graft.operators.Mixing.vocabShapley(
          t(s, dir, "documents").withColumn("p",
            expr("cast(regexp_extract(source, '([0-9]+)', 1) as bigint) % 5L")),
          "p", "text", k = 5)
          .orderBy("player")),

    // ---- IPF raking to uniform margins ---------------------------
    // Rebalance the source × lang grid so every source and every
    // language carries equal weighted mass: 3 full row+col scaling
    // iterations in ppm integers; the oracle unrolls the identical
    // six floored-division steps.
    Q("q355_ipf_raking", {
      val steps = (1 to 6).map { i =>
        val prev = if (i == 1) "cells0" else s"s${i - 1}"
        val (key, den) = if (i % 2 == 1) ("r", "tt.rr") else ("c", "tt.cc")
        s"""m$i AS (SELECT $key, sum(n * w)::BIGINT AS x FROM $prev GROUP BY $key),
           |s$i AS (SELECT p.r, p.c, p.n,
           |  (p.w * ((1000000 * tt.nn) // $den)) // m$i.x AS w
           |  FROM $prev p JOIN m$i USING ($key) CROSS JOIN tt)""".stripMargin
      }.mkString(",\n")
      Some(s"""WITH cells0 AS (SELECT source AS r, lang AS c,
              |  count(*)::BIGINT AS n, 1000000::BIGINT AS w
              |  FROM documents GROUP BY source, lang),
              |tt AS (SELECT sum(n)::BIGINT AS nn,
              |  count(DISTINCT r)::BIGINT AS rr,
              |  count(DISTINCT c)::BIGINT AS cc FROM cells0),
              |$steps
              |SELECT r AS row_key, c AS col_key, n, w::BIGINT AS w_ppm
              |FROM s6 ORDER BY row_key, col_key""".stripMargin)
    },
      (s, dir) =>
        graft.operators.Mixing.ipfRaking(
          t(s, dir, "documents"), "source", "lang", iters = 3)
          .orderBy("row_key", "col_key"))
    ,

    // ---- Aalen–Johansen competing risks --------------------------
    // First 'error' (cause 1) vs first 'purchase' (cause 2) per
    // user, same-day tie -> cause 1; censored at horizon. Surv via
    // the q322 product-limit fold; CIFs from the LAGGED survival,
    // one floored div per step.
    Q("q356_aalen_johansen",
      Some("""WITH x AS (SELECT user_id AS e,
             |  (epoch_us(ts) * 1000) // 86400000000000 AS b, event_type
             |  FROM events),
             |f AS (SELECT e, min(b) AS fb FROM x GROUP BY e),
             |fe AS (SELECT e, min(b) AS eb FROM x
             |  WHERE event_type = 'error' GROUP BY e),
             |fp AS (SELECT e, min(b) AS pb FROM x
             |  WHERE event_type = 'purchase' GROUP BY e),
             |mx AS (SELECT max(b) AS bl FROM x),
             |lt AS (SELECT
             |  CASE WHEN eb IS NULL AND pb IS NULL THEN bl - fb
             |       WHEN pb IS NULL OR (eb IS NOT NULL AND eb <= pb) THEN eb - fb
             |       ELSE pb - fb END AS t,
             |  CASE WHEN eb IS NULL AND pb IS NULL THEN 0
             |       WHEN pb IS NULL OR (eb IS NOT NULL AND eb <= pb) THEN 1
             |       ELSE 2 END AS k
             |  FROM f LEFT JOIN fe USING (e) LEFT JOIN fp USING (e)
             |  CROSS JOIN mx),
             |h AS (SELECT t, count(*)::BIGINT AS m,
             |  sum(CASE WHEN k = 1 THEN 1 ELSE 0 END)::BIGINT AS d1,
             |  sum(CASE WHEN k = 2 THEN 1 ELSE 0 END)::BIGINT AS d2
             |  FROM lt GROUP BY t),
             |tot AS (SELECT sum(m)::BIGINT AS total FROM h),
             |hr AS (SELECT t, d1, d2, d1 + d2 AS d,
             |  (total - coalesce(sum(m) OVER (ORDER BY t
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))::BIGINT AS n
             |  FROM h CROSS JOIN tot),
             |st AS (SELECT t, d1, d2, d, n FROM hr WHERE d > 0),
             |arr AS (SELECT list(n * 10000000 + d ORDER BY t) AS pk,
             |  list({'t': t, 'd1': d1, 'd2': d2, 'n': n} ORDER BY t) AS sl
             |  FROM st),
             |ks AS (SELECT sl, pk, unnest(range(1, len(sl) + 1)) AS kk FROM arr),
             |sv AS (SELECT sl[kk].t AS t, sl[kk].n AS n,
             |  sl[kk].d1 AS d1, sl[kk].d2 AS d2,
             |  list_reduce(list_prepend(1000000::BIGINT, pk[1:kk]),
             |    (acc, p) -> (acc * ((p // 10000000) - (p % 10000000)))
             |      // (p // 10000000))::BIGINT AS surv
             |  FROM ks),
             |aj AS (SELECT t, n, d1, d2, surv,
             |  lag(surv, 1, 1000000) OVER (ORDER BY t) AS sprev FROM sv),
             |tm AS (SELECT t, n, d1, d2, surv,
             |  (sprev * d1) // n AS t1, (sprev * d2) // n AS t2 FROM aj)
             |SELECT t::BIGINT AS t, n::BIGINT AS n_at_risk, d1, d2,
             |  surv::BIGINT AS surv_ppm,
             |  sum(t1) OVER (ORDER BY t
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
             |    AS cif1_ppm,
             |  sum(t2) OVER (ORDER BY t
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
             |    AS cif2_ppm
             |FROM tm ORDER BY t""".stripMargin),
      (s, dir) => {
        val x = t(s, dir, "events")
          .withColumn("b", expr("ts div 86400000000000L"))
        val f = x.groupBy(col("user_id")).agg(min(col("b")).as("fb"))
        val fe = x.where(col("event_type") === "error")
          .groupBy(col("user_id")).agg(min(col("b")).as("eb"))
        val fp = x.where(col("event_type") === "purchase")
          .groupBy(col("user_id")).agg(min(col("b")).as("pb"))
        val mx = x.agg(max(col("b")).as("bl"))
        val lt = f.join(fe, Seq("user_id"), "left")
          .join(fp, Seq("user_id"), "left")
          .crossJoin(broadcast(mx))
          .select(
            when(col("eb").isNull && col("pb").isNull, col("bl") - col("fb"))
              .when(col("pb").isNull ||
                (col("eb").isNotNull && col("eb") <= col("pb")),
                col("eb") - col("fb"))
              .otherwise(col("pb") - col("fb")).as("t"),
            when(col("eb").isNull && col("pb").isNull, 0L)
              .when(col("pb").isNull ||
                (col("eb").isNotNull && col("eb") <= col("pb")), 1L)
              .otherwise(2L).as("k"))
        graft.operators.TimeSeries.aalenJohansen(lt, "t", "k").orderBy("t")
      }),

    // ---- Spearman rank correlation -------------------------------
    // Do per-user view and click volumes move together? Doubled
    // midranks from value histograms, exact integer moments, isqrt-
    // pinned denominator, sign-split ppm.
    Q("q359_spearman", {
      val ladder = graft.util.ExactMath.duckIsqrtSteps("rt").zipWithIndex
        .map { case (sel, i) =>
          val from = if (i == 0) "q2" else s"i${i - 1}"
          s"i$i AS ($sel FROM $from)"
        }.mkString(",\n")
      Some(s"""WITH p AS (SELECT user_id,
              |  sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS x,
              |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS y
              |  FROM events GROUP BY user_id),
              |hx AS (SELECT x AS v, count(*)::BIGINT AS cnt FROM p GROUP BY x),
              |rx AS (SELECT v, 2 * coalesce(sum(cnt) OVER (ORDER BY v
              |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cnt + 1 AS u
              |  FROM hx),
              |hy AS (SELECT y AS v, count(*)::BIGINT AS cnt FROM p GROUP BY y),
              |ry AS (SELECT v, 2 * coalesce(sum(cnt) OVER (ORDER BY v
              |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cnt + 1 AS w
              |  FROM hy),
              |r AS (SELECT rx.u AS u, ry.w AS w FROM p
              |  JOIN rx ON p.x = rx.v JOIN ry ON p.y = ry.v),
              |m AS (SELECT count(*)::HUGEINT AS n, sum(u)::HUGEINT AS su,
              |  sum(w)::HUGEINT AS sw, sum(u * u)::HUGEINT AS suu,
              |  sum(w * w)::HUGEINT AS sww, sum(u * w)::HUGEINT AS suw FROM r),
              |q AS (SELECT n, n * suw - su * sw AS num,
              |  n * suu - su * su AS vx, n * sww - sw * sw AS vy FROM m),
              |q2 AS (SELECT *, vx * vy AS x FROM q),
              |$ladder
              |SELECT n::BIGINT AS n,
              |  (CASE WHEN vx <= 0 OR vy <= 0 THEN NULL
              |   WHEN num >= 0 THEN (1000000 * num) // rt
              |   ELSE -((1000000 * -num) // rt) END)::BIGINT AS rho_ppm
              |FROM i4""".stripMargin)
    },
      (s, dir) => {
        val per = t(s, dir, "events").groupBy(col("user_id"))
          .agg(
            sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("x"),
            sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("y"))
        graft.operators.RobustStats.spearmanRho(per, "x", "y")
      }),

    // ---- Mann–Kendall trend per event type -----------------------
    // Is each event type's daily volume monotonically drifting? Exact
    // S, tie-corrected 18x variance, continuity-corrected z in ppm.
    Q("q360_mann_kendall", {
      val ladder = graft.util.ExactMath.duckIsqrtSteps("rt").zipWithIndex
        .map { case (sel, i) =>
          val from = if (i == 0) "q2" else s"i${i - 1}"
          s"i$i AS ($sel FROM $from)"
        }.mkString(",\n")
      Some(s"""WITH c AS (SELECT event_type AS k,
              |  (epoch_us(ts) * 1000) // 86400000000000 AS b,
              |  count(*)::BIGINT AS y
              |  FROM events GROUP BY 1, 2),
              |s AS (SELECT x.k, sum(CASE WHEN y.y > x.y THEN 1
              |    WHEN y.y < x.y THEN -1 ELSE 0 END)::BIGINT AS s
              |  FROM c x JOIN c y ON x.k = y.k AND x.b < y.b GROUP BY x.k),
              |nk AS (SELECT k, count(*)::BIGINT AS n FROM c GROUP BY k),
              |ti AS (SELECT k, sum(t * (t - 1) * (2 * t + 5))::BIGINT AS tc
              |  FROM (SELECT k, y, count(*)::BIGINT AS t FROM c GROUP BY k, y)
              |  GROUP BY k),
              |j AS (SELECT s.k, s.s, nk.n, ti.tc,
              |  (nk.n * (nk.n - 1) * (2 * nk.n + 5) - ti.tc)::BIGINT AS var18
              |  FROM s JOIN nk USING (k) JOIN ti USING (k)),
              |q2 AS (SELECT *, (18 * var18)::HUGEINT AS x FROM j),
              |$ladder
              |SELECT k AS key, n AS n_buckets, s AS s_stat, var18 AS var_x18,
              |  (CASE WHEN var18 <= 0 THEN NULL
              |   WHEN s > 1 THEN (18000000 * (s - 1)::HUGEINT) // rt
              |   WHEN s < -1 THEN -((18000000 * (-s - 1)::HUGEINT) // rt)
              |   ELSE 0 END)::BIGINT AS z_ppm
              |FROM i4 ORDER BY key""".stripMargin)
    },
      (s, dir) => {
        val c = t(s, dir, "events")
          .withColumn("b", expr("ts div 86400000000000L"))
          .groupBy(col("event_type"), col("b"))
          .agg(count(lit(1)).cast("bigint").as("y"))
        graft.operators.RobustStats.mannKendall(c, "event_type", "b", "y")
          .orderBy("key")
      }),

    // ---- Jonckheere–Terpstra ordered trend -----------------------
    // Does doc length shift up across source buckets 0..4 taken in
    // order? Doubled MWU counts over (group, value) cells; no-tie
    // variance; one floored div + one isqrt for z.
    Q("q361_jonckheere", {
      val ladder = graft.util.ExactMath.duckIsqrtSteps("rt").zipWithIndex
        .map { case (sel, i) =>
          val from = if (i == 0) "q2" else s"i${i - 1}"
          s"i$i AS ($sel FROM $from)"
        }.mkString(",\n")
      Some(s"""WITH d AS (SELECT
              |  cast(regexp_extract(source, '([0-9]+)', 1) AS BIGINT) % 5 AS g,
              |  n_chars AS v FROM documents),
              |cells AS (SELECT g, v, count(*)::BIGINT AS n FROM d GROUP BY g, v),
              |ps AS (SELECT
              |  sum(CASE WHEN b.v > a.v THEN a.n * b.n ELSE 0 END)::BIGINT AS gt,
              |  sum(CASE WHEN b.v = a.v THEN a.n * b.n ELSE 0 END)::BIGINT AS eq,
              |  sum(a.n * b.n)::BIGINT AS mean2
              |  FROM cells a JOIN cells b ON a.g < b.g),
              |sz AS (SELECT sum(ni)::BIGINT AS nn,
              |  sum(ni * ni * (2 * ni + 3))::BIGINT AS corr FROM
              |  (SELECT g, sum(n)::BIGINT AS ni FROM cells GROUP BY g)),
              |j AS (SELECT 2 * gt + eq AS j2, mean2,
              |  nn * nn * (2 * nn + 3) - corr AS var72, nn
              |  FROM ps CROSS JOIN sz),
              |q2 AS (SELECT *, (CASE WHEN var72 > 0 THEN
              |  (18000000000000::HUGEINT * (j2 - mean2) * (j2 - mean2)) // var72
              |  ELSE 0::HUGEINT END) AS x FROM j),
              |$ladder
              |SELECT nn AS n_total, j2 AS j_x2, mean2 AS mean_x2,
              |  var72 AS var_x72,
              |  (CASE WHEN var72 <= 0 THEN NULL
              |   WHEN j2 - mean2 >= 0 THEN rt ELSE -rt END)::BIGINT AS z_ppm
              |FROM i4""".stripMargin)
    },
      (s, dir) =>
        graft.operators.RobustStats.jonckheereTerpstra(
          t(s, dir, "documents").withColumn("g",
            expr("cast(regexp_extract(source, '([0-9]+)', 1) as bigint) % 5L")),
          "g", "n_chars")),

    // ---- modularity of the LPA communities -----------------------
    // Quality of q245's 3-round label-propagation partition on the
    // top-100 collocation graph: Q·4m² exact, sign-split ppm.
    Q("q362_modularity",
      Some(s"""WITH toks AS (SELECT ${D.tokens("text")} AS t FROM documents),
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
              |  JOIN m3 ON m3.node = c3.node AND c3.n = m3.mx GROUP BY c3.node),
              |ed AS (SELECT DISTINCT tok_a AS a, tok_b AS b FROM e
              |  WHERE tok_a <> tok_b),
              |mm AS (SELECT count(*)::BIGINT AS m FROM ed),
              |bth AS (SELECT ed.a, ed.b, la.label AS la2, lb.label AS lb2
              |  FROM ed JOIN l3 la ON la.node = ed.a
              |  JOIN l3 lb ON lb.node = ed.b),
              |intra AS (SELECT la2 AS c, count(*)::BIGINT AS e FROM bth
              |  WHERE la2 = lb2 GROUP BY la2),
              |deg AS (SELECT c, count(*)::BIGINT AS d FROM
              |  (SELECT la2 AS c FROM bth UNION ALL SELECT lb2 FROM bth)
              |  GROUP BY c),
              |fin AS (SELECT
              |  sum(4::HUGEINT * mm.m * coalesce(intra.e, 0)
              |    - deg.d::HUGEINT * deg.d) AS num,
              |  max(mm.m)::BIGINT AS m, count(*)::BIGINT AS nc
              |  FROM deg LEFT JOIN intra ON intra.c = deg.c CROSS JOIN mm)
              |SELECT m AS m_edges, nc AS n_communities,
              |  (CASE WHEN m = 0 THEN NULL
              |   WHEN num >= 0 THEN (1000000::HUGEINT * num)
              |     // (4::HUGEINT * m * m)
              |   ELSE -((1000000::HUGEINT * -num) // (4::HUGEINT * m * m))
              |  END)::BIGINT AS q_ppm
              |FROM fin""".stripMargin),
      (s, dir) => {
        // one materialization — labels AND modularity both consume
        // the top-100 edge frame; without it the whole co-occurrence
        // pipeline would run twice
        val edges = graft.operators.Relevance.cooccurrencePairs(
          tp(s, dir, "documents", "doc_id"), "text", maxDist = 2, k = 100)
          .select(col("tok_a"), col("tok_b"))
          .localCheckpoint()
        val labels = graft.operators.Components.labelPropagation(
          edges, "tok_a", "tok_b", rounds = 3)
        graft.operators.Components.modularity(
          edges, "tok_a", "tok_b", labels, "node", "label")
      }),

    // ---- Wald–Wolfowitz runs test --------------------------------
    // Are each event type's day-over-day ups and downs random? Ties
    // dropped, exact run counting via sign-change flags.
    Q("q363_runs_test", {
      val ladder = graft.util.ExactMath.duckIsqrtSteps("rt").zipWithIndex
        .map { case (sel, i) =>
          val from = if (i == 0) "q2" else s"i${i - 1}"
          s"i$i AS ($sel FROM $from)"
        }.mkString(",\n")
      Some(s"""WITH c AS (SELECT event_type AS k,
              |  (epoch_us(ts) * 1000) // 86400000000000 AS b,
              |  count(*)::BIGINT AS y FROM events GROUP BY 1, 2),
              |s AS (SELECT k, b, y,
              |  lag(y) OVER (PARTITION BY k ORDER BY b) AS p FROM c),
              |sg AS (SELECT k, b, CASE WHEN y > p THEN 1 ELSE -1 END AS s
              |  FROM s WHERE p IS NOT NULL AND y <> p),
              |r AS (SELECT k, b, s,
              |  lag(s) OVER (PARTITION BY k ORDER BY b) AS sp FROM sg),
              |agg AS (SELECT k,
              |  sum(CASE WHEN s = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
              |  sum(CASE WHEN s = -1 THEN 1 ELSE 0 END)::BIGINT AS n2,
              |  sum(CASE WHEN sp IS NULL OR s <> sp THEN 1 ELSE 0 END)::BIGINT AS r
              |  FROM r GROUP BY k),
              |j AS (SELECT k, n1, n2, r, n1 + n2 AS nn,
              |  2 * n1 * n2 * (2 * n1 * n2 - (n1 + n2)) AS den,
              |  r * (n1 + n2) - (n1 + n2) - 2 * n1 * n2 AS d FROM agg),
              |q2 AS (SELECT *, (CASE WHEN den > 0 AND nn > 1 THEN
              |  (1000000000000::HUGEINT * d * d * (nn - 1)) // den
              |  ELSE 0::HUGEINT END) AS x FROM j),
              |$ladder
              |SELECT k AS key, n1 AS n_up, n2 AS n_down, r AS n_runs,
              |  (CASE WHEN den <= 0 OR nn <= 1 THEN NULL
              |   WHEN d >= 0 THEN rt ELSE -rt END)::BIGINT AS z_ppm
              |FROM i4 ORDER BY key""".stripMargin)
    },
      (s, dir) => {
        val c = t(s, dir, "events")
          .withColumn("b", expr("ts div 86400000000000L"))
          .groupBy(col("event_type"), col("b"))
          .agg(count(lit(1)).cast("bigint").as("y"))
        graft.operators.RobustStats.runsTest(c, "event_type", "b", "y")
          .orderBy("key")
      }),

    // ---- Kruskal–Wallis k-group rank test ------------------------
    // Do the five event types draw per-user volumes from the same
    // distribution? Global doubled midranks from the value
    // histogram; tie-adjusted H in ppm.
    Q("q364_kruskal_wallis",
      Some("""WITH c AS (SELECT event_type AS g, count(*)::BIGINT AS v
             |  FROM events GROUP BY user_id, event_type),
             |hist AS (SELECT v, count(*)::BIGINT AS cnt FROM c GROUP BY v),
             |hu AS (SELECT v, 2 * coalesce(sum(cnt) OVER (ORDER BY v
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |  + cnt + 1 AS u FROM hist),
             |r AS (SELECT c.g, hu.u FROM c JOIN hu ON c.v = hu.v),
             |pg AS (SELECT g, count(*)::BIGINT AS nj, sum(u)::BIGINT AS r2
             |  FROM r GROUP BY g),
             |tt AS (SELECT sum(nj)::BIGINT AS nn, count(*)::BIGINT AS k FROM pg),
             |ts AS (SELECT coalesce(sum(cnt * cnt * cnt - cnt), 0)::BIGINT
             |  AS tsum FROM hist),
             |tm AS (SELECT ((3000000::HUGEINT * r2 * r2)
             |  // (nj::HUGEINT * nn * (nn + 1)))::BIGINT AS term, nn, k
             |  FROM pg CROSS JOIN tt),
             |ag AS (SELECT max(nn)::BIGINT AS nn, max(k)::BIGINT AS k,
             |  sum(term)::BIGINT AS hraw FROM tm),
             |fin AS (SELECT nn, k, hraw - 3000000 * (nn + 1) AS h,
             |  (nn * nn * nn - nn) - ts.tsum AS cden FROM ag CROSS JOIN ts)
             |SELECT nn AS n_total, k, h::BIGINT AS h_ppm,
             |  (CASE WHEN cden <= 0 THEN NULL
             |   WHEN h >= 0 THEN (h::HUGEINT * (nn::HUGEINT * nn * nn - nn)) // cden
             |   ELSE -(((-h)::HUGEINT * (nn::HUGEINT * nn * nn - nn)) // cden)
             |  END)::BIGINT AS h_adj_ppm
             |FROM fin""".stripMargin),
      (s, dir) => {
        val c = t(s, dir, "events")
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).cast("bigint").as("v"))
        graft.operators.RobustStats.kruskalWallis(c, "event_type", "v")
      }),

    // ---- Page's L ordered trend ----------------------------------
    // Does per-user volume DECREASE along the funnel order view ->
    // click -> purchase -> signup -> error? (z's sign answers.)
    // Complete grid, doubled midranks, exact integer L.
    Q("q365_page_trend", {
      val ladder = graft.util.ExactMath.duckIsqrtSteps("rt").zipWithIndex
        .map { case (sel, i) =>
          val from = if (i == 0) "q2" else s"i${i - 1}"
          s"i$i AS ($sel FROM $from)"
        }.mkString(",\n")
      Some(s"""WITH u AS (SELECT DISTINCT user_id FROM events),
              |ty AS (SELECT unnest(['view','click','purchase','signup','error']) AS et,
              |  unnest([0, 1, 2, 3, 4]) AS j),
              |c AS (SELECT user_id, event_type AS et, count(*)::BIGINT AS v
              |  FROM events GROUP BY user_id, event_type),
              |g AS (SELECT u.user_id, ty.j, coalesce(c.v, 0) AS v
              |  FROM u CROSS JOIN ty LEFT JOIN c
              |  ON c.user_id = u.user_id AND c.et = ty.et),
              |rk AS (SELECT j,
              |  2 * (rank() OVER (PARTITION BY user_id ORDER BY v) - 1)
              |    + count(*) OVER (PARTITION BY user_id, v) + 1 AS r2 FROM g),
              |pt AS (SELECT j, sum(r2)::BIGINT AS r2j, count(*)::BIGINT AS nb
              |  FROM rk GROUP BY j),
              |a AS (SELECT count(*)::BIGINT AS k, max(nb)::BIGINT AS n,
              |  sum((j + 1) * r2j)::BIGINT AS l2 FROM pt),
              |f AS (SELECT n, k, l2,
              |  (n * k * (k + 1) * (k + 1)) // 2 AS mean2,
              |  n * k * k * (k + 1) * (k * k - 1) AS den FROM a),
              |q2 AS (SELECT *, (CASE WHEN den > 0 THEN
              |  (36000000000000::HUGEINT * (l2 - mean2) * (l2 - mean2)) // den
              |  ELSE 0::HUGEINT END) AS x FROM f),
              |$ladder
              |SELECT n AS n_blocks, k, l2 AS l_x2, mean2 AS mean_x2,
              |  (CASE WHEN den <= 0 THEN NULL
              |   WHEN l2 - mean2 >= 0 THEN rt ELSE -rt END)::BIGINT AS z_ppm
              |FROM i4""".stripMargin)
    },
      (s, dir) => {
        val ev = t(s, dir, "events")
        val users = ev.select(col("user_id")).distinct()
        val ty = ev.sparkSession.range(1).select(explode(array(
          Seq(("view", 0), ("click", 1), ("purchase", 2), ("signup", 3),
            ("error", 4)).map { case (n, j) =>
            struct(lit(n).as("et"), lit(j.toLong).as("j"))
          }: _*)).as("s"))
          .select(col("s.et").as("et"), col("s.j").as("j"))
        val cnt = ev.groupBy(col("user_id"), col("event_type").as("et"))
          .agg(count(lit(1)).cast("bigint").as("v"))
        val grid = users.crossJoin(broadcast(ty))
          .join(cnt, Seq("user_id", "et"), "left")
          .withColumn("v", coalesce(col("v"), lit(0L)))
        graft.operators.RobustStats.pageTrend(grid, "user_id", "j", "v")
      }),

    // ---- Fleiss' kappa across three detectors --------------------
    // Do three cheap "long document" detectors agree beyond chance?
    // Exact rational kappa on DECIMAL/HUGEINT products.
    Q("q366_fleiss_kappa",
      Some("""WITH p AS (SELECT
             |  CASE WHEN n_chars > 400 THEN 1 ELSE 0 END +
             |  CASE WHEN len(string_split(text, ' ')) > 60 THEN 1 ELSE 0 END +
             |  CASE WHEN position(' the ' IN text) > 0 THEN 1 ELSE 0 END AS a
             |  FROM documents),
             |ag AS (SELECT count(*)::BIGINT AS nn, sum(a)::BIGINT AS sa,
             |  sum(a * a + (3 - a) * (3 - a) - 3)::BIGINT AS s1 FROM p),
             |f AS (SELECT nn, nn * 3 AS nr, sa, s1,
             |  (sa::HUGEINT * sa + (nn * 3 - sa)::HUGEINT * (nn * 3 - sa)) AS s2
             |  FROM ag),
             |g AS (SELECT nn, s1::HUGEINT * nr * nr - s2 * nn * 3 * 2 AS num,
             |  nn::HUGEINT * 3 * 2 * (nr::HUGEINT * nr - s2) AS den FROM f)
             |SELECT nn AS n_items, 3::BIGINT AS n_raters,
             |  (CASE WHEN den <= 0 THEN NULL
             |   WHEN num >= 0 THEN (1000000 * num) // den
             |   ELSE -((1000000 * -num) // den) END)::BIGINT AS kappa_ppm
             |FROM g""".stripMargin),
      (s, dir) =>
        EvalStats.fleissKappa(t(s, dir, "documents"), Seq(
          col("n_chars") > 400L,
          expr("size(split(text, ' ')) > 60"),
          col("text").contains(" the ")))),

    // ---- Hodges–Lehmann shift ------------------------------------
    // Robust location shift between English and non-English doc
    // lengths: weighted lower median of all pairwise differences,
    // computed on value cells.
    Q("q367_hodges_lehmann",
      Some("""WITH b0 AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS arm,
             |  n_chars AS v FROM documents),
             |cells AS (SELECT arm, v, count(*)::BIGINT AS n FROM b0
             |  GROUP BY arm, v),
             |a AS (SELECT v AS va, n AS na FROM cells WHERE arm = 0),
             |b AS (SELECT v AS vb, n AS nb FROM cells WHERE arm = 1),
             |d AS (SELECT vb - va AS d, sum(na * nb)::BIGINT AS w
             |  FROM a CROSS JOIN b GROUP BY vb - va),
             |t2 AS (SELECT sum(w)::BIGINT AS tw FROM d),
             |c2 AS (SELECT d, w, sum(w) OVER (ORDER BY d
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM d),
             |pick AS (SELECT d FROM c2 CROSS JOIN t2
             |  WHERE cum >= (tw + 1) // 2 ORDER BY d LIMIT 1),
             |na2 AS (SELECT count(*)::BIGINT AS qa FROM b0 WHERE arm = 0),
             |nb2 AS (SELECT count(*)::BIGINT AS qb FROM b0 WHERE arm = 1)
             |SELECT qa AS n_a, qb AS n_b, tw AS n_pairs, d::BIGINT AS hl_shift
             |FROM pick CROSS JOIN t2 CROSS JOIN na2 CROSS JOIN nb2""".stripMargin),
      (s, dir) =>
        graft.operators.RobustStats.hodgesLehmann(
          t(s, dir, "documents"), col("lang") === "en", "n_chars")),

    // ---- Cramér's V ----------------------------------------------
    // Effect size of the source × lang association: full-grid chi2
    // (structural zeros included), per-cell floors, isqrt-pinned V.
    Q("q368_cramers_v", {
      val ladder = graft.util.ExactMath.duckIsqrtSteps("rt").zipWithIndex
        .map { case (sel, i) =>
          val from = if (i == 0) "q2" else s"i${i - 1}"
          s"i$i AS ($sel FROM $from)"
        }.mkString(",\n")
      Some(s"""WITH cells AS (SELECT source AS r, lang AS c,
              |  count(*)::BIGINT AS o FROM documents GROUP BY 1, 2),
              |rm AS (SELECT r, sum(o)::BIGINT AS rm FROM cells GROUP BY r),
              |cm AS (SELECT c, sum(o)::BIGINT AS cm FROM cells GROUP BY c),
              |tt AS (SELECT sum(o)::BIGINT AS nn,
              |  count(DISTINCT r)::BIGINT AS nr,
              |  count(DISTINCT c)::BIGINT AS nc FROM cells),
              |grid AS (SELECT rm.r, cm.c, rm.rm, cm.cm,
              |  coalesce(cells.o, 0) AS o FROM rm CROSS JOIN cm
              |  LEFT JOIN cells ON cells.r = rm.r AND cells.c = cm.c),
              |tm AS (SELECT ((1000000::HUGEINT
              |  * (o::HUGEINT * tt.nn - rm::HUGEINT * cm)
              |  * (o::HUGEINT * tt.nn - rm::HUGEINT * cm))
              |  // (tt.nn::HUGEINT * rm * cm))::BIGINT AS term,
              |  tt.nn, tt.nr, tt.nc FROM grid CROSS JOIN tt),
              |ag AS (SELECT max(nn)::BIGINT AS nn, max(nr)::BIGINT AS nr,
              |  max(nc)::BIGINT AS nc, sum(term)::BIGINT AS chi2 FROM tm),
              |f AS (SELECT nn, nr, nc, chi2,
              |  CASE WHEN nr - 1 < nc - 1 THEN nr - 1 ELSE nc - 1 END AS m
              |  FROM ag),
              |q2 AS (SELECT *, (CASE WHEN m > 0 THEN
              |  (1000000::HUGEINT * chi2) // (nn::HUGEINT * m)
              |  ELSE 0::HUGEINT END) AS x FROM f),
              |$ladder
              |SELECT nn AS n, nr AS n_rows, nc AS n_cols, chi2 AS chi2_ppm,
              |  (CASE WHEN m <= 0 THEN NULL ELSE rt END)::BIGINT AS v_ppm
              |FROM i4""".stripMargin)
    },
      (s, dir) =>
        EvalStats.cramersV(t(s, dir, "documents"), "source", "lang")),

    // ---- Horvitz–Thompson stratified estimation ------------------
    // Estimate each event type's total value (cents) from a 25-row
    // deterministic hash sample per stratum, with the finite-
    // population-corrected SE — the estimation step completing the
    // allocation (q343) / selection (q63) survey pipeline.
    Q("q371_horvitz_thompson", {
      import graft.functions.TextHash.{MixA, MixB, P}
      val ladder = graft.util.ExactMath.duckIsqrtSteps("rt").zipWithIndex
        .map { case (sel, i) =>
          val from = if (i == 0) "q2" else s"i${i - 1}"
          s"i$i AS ($sel FROM $from)"
        }.mkString(",\n")
      val dh = graft.functions.TextHash.duck
        .rollingHash("CAST(event_id AS VARCHAR)")
      Some(s"""WITH b AS (SELECT event_type AS s,
              |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
              |  (($MixA * $dh + $MixB) % $P) AS h,
              |  event_id AS k FROM events),
              |pop AS (SELECT s, count(*)::BIGINT AS np FROM b GROUP BY s),
              |r AS (SELECT s, v,
              |  row_number() OVER (PARTITION BY s ORDER BY h, k) AS rn FROM b),
              |m AS (SELECT s, count(*)::BIGINT AS n, sum(v)::BIGINT AS sm,
              |  sum(v::HUGEINT * v) AS ss FROM r WHERE rn <= 25 GROUP BY s),
              |j AS (SELECT m.s, m.n, m.sm, m.ss, pop.np FROM m
              |  JOIN pop USING (s)),
              |f AS (SELECT s, np, n, sm,
              |  (CASE WHEN np::HUGEINT * sm >= 0 THEN (np::HUGEINT * sm) // n
              |   ELSE -((np::HUGEINT * -sm) // n) END)::BIGINT AS est,
              |  (n::HUGEINT * ss - sm::HUGEINT * sm) AS s2num FROM j),
              |q2 AS (SELECT *, (CASE WHEN n >= 2 AND np > n THEN
              |  (np::HUGEINT * (np - n) * s2num)
              |    // (n::HUGEINT * (n - 1) * n)
              |  ELSE 0::HUGEINT END) AS x FROM f),
              |$ladder
              |SELECT s AS stratum, np AS n_pop, n AS n_sample,
              |  sm AS sum_sample, est AS est_total,
              |  (CASE WHEN n < 2 THEN NULL ELSE rt END)::BIGINT AS se
              |FROM i4 ORDER BY stratum""".stripMargin)
    },
      (s, dir) =>
        graft.operators.Mixing.horvitzThompson(
          t(s, dir, "events")
            .withColumn("cents", expr("cast(floor(value * 100d + 0.5d) as bigint)")),
          "event_type", "cents", "event_id", nPerStratum = 25L)
          .orderBy("stratum")),

    // ---- ratio estimator -----------------------------------------
    // Estimate total value (cents) using the props payload length as
    // the population-known auxiliary: est = X_total * sum_y / sum_x
    // over the same deterministic 25-row hash sample as q371.
    Q("q372_ratio_estimator", {
      import graft.functions.TextHash.{MixA, MixB, P}
      val dh = graft.functions.TextHash.duck
        .rollingHash("CAST(event_id AS VARCHAR)")
      Some(s"""WITH b AS (SELECT event_type AS s,
              |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS y,
              |  length(props)::BIGINT AS x,
              |  (($MixA * $dh + $MixB) % $P) AS h,
              |  event_id AS k FROM events),
              |pop AS (SELECT s, count(*)::BIGINT AS np, sum(x)::BIGINT AS xt
              |  FROM b GROUP BY s),
              |r AS (SELECT s, x, y,
              |  row_number() OVER (PARTITION BY s ORDER BY h, k) AS rn FROM b),
              |m AS (SELECT s, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
              |  sum(y)::BIGINT AS sy FROM r WHERE rn <= 25 GROUP BY s)
              |SELECT m.s AS stratum, pop.np AS n_pop, m.n AS n_sample,
              |  pop.xt AS x_pop_total, m.sx AS sum_x_sample,
              |  m.sy AS sum_y_sample,
              |  (CASE WHEN m.sx <= 0 THEN NULL
              |   WHEN pop.xt::HUGEINT * m.sy >= 0
              |     THEN (pop.xt::HUGEINT * m.sy) // m.sx
              |   ELSE -((pop.xt::HUGEINT * -m.sy) // m.sx)
              |  END)::BIGINT AS est_total
              |FROM m JOIN pop USING (s) ORDER BY stratum""".stripMargin)
    },
      (s, dir) =>
        graft.operators.Mixing.ratioEstimator(
          t(s, dir, "events")
            .withColumn("cents", expr("cast(floor(value * 100d + 0.5d) as bigint)"))
            .withColumn("plen", expr("cast(length(props) as bigint)")),
          "event_type", "cents", "plen", "event_id", nPerStratum = 25L)
          .orderBy("stratum")),

    // ---- gamma + Somers' D ---------------------------------------
    // The q248 ordinal machinery extended with the tie-ignoring
    // gamma and the y-dependent Somers' D, per source: length
    // buckets (x) vs hash deciles (y), sign-split floored ppm.
    Q("q373_gamma_somers", {
      val dh = graft.functions.TextHash.duck.rollingHash("text")
      Some(s"""WITH b AS (SELECT source, n_chars // 50 AS x,
              |  ($dh % 1000) // 100 AS y FROM documents),
              |c AS (SELECT source, x, y, count(*)::BIGINT AS n FROM b
              |  GROUP BY 1, 2, 3),
              |p AS (SELECT a.source,
              |  sum(CASE WHEN a.x < b.x AND a.y < b.y THEN a.n * b.n ELSE 0 END)::BIGINT AS concordant,
              |  sum(CASE WHEN a.x < b.x AND a.y > b.y THEN a.n * b.n ELSE 0 END)::BIGINT AS discordant,
              |  sum(CASE WHEN a.y = b.y AND a.x < b.x THEN a.n * b.n ELSE 0 END)::BIGINT AS tie_y
              |  FROM c a JOIN c b ON a.source = b.source
              |    AND (a.x < b.x OR (a.x = b.x AND a.y < b.y))
              |  GROUP BY a.source),
              |t AS (SELECT source, sum(n)::BIGINT AS n FROM c GROUP BY source),
              |j AS (SELECT t.source, t.n,
              |  coalesce(p.concordant, 0)::BIGINT AS cc,
              |  coalesce(p.discordant, 0)::BIGINT AS dd,
              |  coalesce(p.tie_y, 0)::BIGINT AS ty
              |  FROM t LEFT JOIN p USING (source))
              |SELECT source, n, cc AS concordant, dd AS discordant,
              |  ty AS tie_y,
              |  (CASE WHEN cc + dd <= 0 THEN NULL
              |   WHEN cc - dd >= 0 THEN (1000000 * (cc - dd)) // (cc + dd)
              |   ELSE -((1000000 * (dd - cc)) // (cc + dd))
              |  END)::BIGINT AS gamma_ppm,
              |  (CASE WHEN cc + dd + ty <= 0 THEN NULL
              |   WHEN cc - dd >= 0 THEN (1000000 * (cc - dd)) // (cc + dd + ty)
              |   ELSE -((1000000 * (dd - cc)) // (cc + dd + ty))
              |  END)::BIGINT AS somers_d_ppm
              |FROM j ORDER BY source""".stripMargin)
    },
      (s, dir) => {
        val d = t(s, dir, "documents")
          .withColumn("__xq", expr("n_chars div 50L"))
          .withColumn("__yq", expr(
            s"(${graft.functions.TextHash.spark.rollingHash("text")} % 1000L) div 100L"))
        graft.operators.RobustStats
          .ordinalAssociation(d, "__xq", "__yq", Seq("source"))
          .select(col("source"), col("n"), col("concordant"),
            col("discordant"), col("tie_y"), col("gamma_ppm"),
            col("somers_d_ppm"))
          .orderBy("source")
      }),

    // ---- Ansari–Bradley scale test -------------------------------
    // Do English and non-English doc lengths have the same SPREAD?
    // Both-ends position scores with exact tie-group series sums,
    // one floor per distinct value; even/odd-N null moments.
    Q("q374_ansari_bradley", {
      val ladder = graft.util.ExactMath.duckIsqrtSteps("rt").zipWithIndex
        .map { case (sel, i) =>
          val from = if (i == 0) "q2" else s"i${i - 1}"
          s"i$i AS ($sel FROM $from)"
        }.mkString(",\n")
      Some(s"""WITH b0 AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS arm,
              |  n_chars AS v FROM documents WHERE n_chars IS NOT NULL),
              |hist AS (SELECT v, count(*)::BIGINT AS t, sum(arm)::BIGINT AS a
              |  FROM b0 GROUP BY v),
              |h2 AS (SELECT v, t, a, coalesce(sum(t) OVER (ORDER BY v
              |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
              |  AS bef FROM hist),
              |tt AS (SELECT sum(t)::BIGINT AS nn, sum(a)::BIGINT AS nb FROM hist),
              |s AS (SELECT a, t, bef + 1 AS lo, bef + t AS hi,
              |  (nn + 1) // 2 AS hh, nn FROM h2 CROSS JOIN tt),
              |sv AS (SELECT a, t,
              |  (CASE WHEN least(hi, hh) >= lo
              |    THEN ((lo + least(hi, hh)) * (least(hi, hh) - lo + 1)) // 2
              |    ELSE 0 END) +
              |  (CASE WHEN hi >= greatest(lo, hh + 1)
              |    THEN (((nn + 1 - greatest(lo, hh + 1)) + (nn + 1 - hi))
              |          * (hi - greatest(lo, hh + 1) + 1)) // 2
              |    ELSE 0 END) AS sc FROM s),
              |w2 AS (SELECT sum((1000000 * a * sc) // t)::BIGINT AS w FROM sv),
              |f AS (SELECT tt.nn, tt.nb, tt.nn - tt.nb AS na, w2.w,
              |  (CASE WHEN tt.nn % 2 = 0
              |    THEN (1000000 * tt.nb * (tt.nn + 2)) // 4
              |    ELSE (1000000 * tt.nb * (tt.nn + 1) * (tt.nn + 1))
              |      // (4 * tt.nn) END) AS mn,
              |  (CASE WHEN tt.nn % 2 = 0
              |    THEN (tt.nn - tt.nb)::HUGEINT * tt.nb * (tt.nn + 2) * (tt.nn - 2)
              |    ELSE (tt.nn - tt.nb)::HUGEINT * tt.nb * (tt.nn + 1)
              |      * (3 + tt.nn * tt.nn) END) AS varnum,
              |  (CASE WHEN tt.nn % 2 = 0 THEN 48 * (tt.nn - 1)
              |    ELSE 48 * tt.nn * tt.nn END) AS varden
              |  FROM tt CROSS JOIN w2),
              |q2 AS (SELECT *, (CASE WHEN varnum > 0 THEN
              |  ((w - mn)::HUGEINT * (w - mn) * varden) // varnum
              |  ELSE 0::HUGEINT END) AS x FROM f),
              |$ladder
              |SELECT na AS n_a, nb AS n_b, w AS w_ppm, mn AS mean_ppm,
              |  (CASE WHEN varnum <= 0 THEN NULL
              |   WHEN w - mn >= 0 THEN rt ELSE -rt END)::BIGINT AS z_ppm
              |FROM i4""".stripMargin)
    },
      (s, dir) =>
        graft.operators.RobustStats.ansariBradley(
          t(s, dir, "documents"), col("lang") === "en", "n_chars")),

    // ---- Kendall's W (coefficient of concordance) ----------------
    // How strongly do the user-blocks agree on the event-type
    // ordering? W = Fr / (n·(k−1)) with midrank ties — derived from
    // the q351 Friedman machinery; W ∈ [0,1] in ppm (sign-split for
    // the tie-floor edge where Fr dips a ppm negative).
    Q("q375_kendall_w",
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
             |ty AS (SELECT unnest(['view','click','purchase','signup','error']) AS et),
             |c AS (SELECT user_id, event_type AS et, count(*)::BIGINT AS v
             |  FROM events GROUP BY user_id, event_type),
             |g AS (SELECT u.user_id, ty.et, coalesce(c.v, 0) AS v
             |  FROM u CROSS JOIN ty LEFT JOIN c USING (user_id, et)),
             |rk AS (SELECT et,
             |  2 * (rank() OVER (PARTITION BY user_id ORDER BY v) - 1)
             |    + count(*) OVER (PARTITION BY user_id, v) + 1 AS r2 FROM g),
             |rj AS (SELECT et, sum(r2)::BIGINT AS rj2, count(*)::BIGINT AS nb
             |  FROM rk GROUP BY et),
             |a AS (SELECT count(*)::BIGINT AS k, max(nb)::BIGINT AS n,
             |  sum(rj2 * rj2)::BIGINT AS s2 FROM rj),
             |f AS (SELECT n, k,
             |  (CASE WHEN (3000000 * s2) // (k * n * (k + 1)) >= 3000000 * n * (k + 1)
             |    THEN (3000000 * s2) // (k * n * (k + 1)) - 3000000 * n * (k + 1)
             |    ELSE -(3000000 * n * (k + 1) - (3000000 * s2) // (k * n * (k + 1)))
             |  END)::BIGINT AS fr FROM a)
             |SELECT n AS n_blocks, k, fr AS fr_ppm,
             |  (CASE WHEN fr >= 0 THEN fr // (n * (k - 1))
             |   ELSE -((-fr) // (n * (k - 1))) END)::BIGINT AS w_ppm
             |FROM f""".stripMargin),
      (s, dir) => {
        val ev = t(s, dir, "events")
        val users = ev.select(col("user_id")).distinct()
        val ty = ev.sparkSession.range(1).select(explode(array(
          Seq("view", "click", "purchase", "signup", "error")
            .map(lit): _*)).as("et"))
        val cnt = ev.groupBy(col("user_id"), col("event_type").as("et"))
          .agg(count(lit(1)).cast("bigint").as("v"))
        val grid = users.crossJoin(broadcast(ty))
          .join(cnt, Seq("user_id", "et"), "left")
          .withColumn("v", coalesce(col("v"), lit(0L)))
        EvalStats.friedmanRanks(grid, "user_id", "et", "v")
          .select(col("n_blocks"), col("k"), col("fr_ppm"),
            expr("""CASE WHEN fr_ppm >= 0
                   |  THEN fr_ppm div (n_blocks * (k - 1L))
                   |  ELSE -((-fr_ppm) div (n_blocks * (k - 1L)))
                   |END""".stripMargin).cast("bigint").as("w_ppm"))
      }),

    // ---- Kendall tau-b -------------------------------------------
    // The both-margin tie-corrected tau over the q248 cells; the
    // geometric-mean denominator pinned by the exact isqrt.
    Q("q376_tau_b", {
      val ladder = graft.util.ExactMath.duckIsqrtSteps("rt").zipWithIndex
        .map { case (sel, i) =>
          val from = if (i == 0) "q2" else s"i${i - 1}"
          s"i$i AS ($sel FROM $from)"
        }.mkString(",\n")
      val dh = graft.functions.TextHash.duck.rollingHash("text")
      Some(s"""WITH b AS (SELECT source, n_chars // 50 AS x,
              |  ($dh % 1000) // 100 AS y FROM documents),
              |c AS (SELECT source, x, y, count(*)::BIGINT AS n FROM b
              |  GROUP BY 1, 2, 3),
              |p AS (SELECT a.source,
              |  sum(CASE WHEN a.x < b.x AND a.y < b.y THEN a.n * b.n ELSE 0 END)::BIGINT AS cc,
              |  sum(CASE WHEN a.x < b.x AND a.y > b.y THEN a.n * b.n ELSE 0 END)::BIGINT AS dd,
              |  sum(CASE WHEN a.x = b.x THEN a.n * b.n ELSE 0 END)::BIGINT AS tx,
              |  sum(CASE WHEN a.y = b.y AND a.x < b.x THEN a.n * b.n ELSE 0 END)::BIGINT AS ty
              |  FROM c a JOIN c b ON a.source = b.source
              |    AND (a.x < b.x OR (a.x = b.x AND a.y < b.y))
              |  GROUP BY a.source),
              |t AS (SELECT source, sum(n)::BIGINT AS n FROM c GROUP BY source),
              |j AS (SELECT t.source, t.n,
              |  coalesce(p.cc, 0)::BIGINT AS cc, coalesce(p.dd, 0)::BIGINT AS dd,
              |  coalesce(p.tx, 0)::BIGINT AS tx, coalesce(p.ty, 0)::BIGINT AS ty
              |  FROM t LEFT JOIN p USING (source)),
              |q2 AS (SELECT *,
              |  ((cc + dd + ty)::HUGEINT * (cc + dd + tx)) AS x FROM j),
              |$ladder
              |SELECT source, n, cc AS concordant, dd AS discordant,
              |  (CASE WHEN rt <= 0 THEN NULL
              |   WHEN cc - dd >= 0 THEN (1000000 * (cc - dd)::HUGEINT) // rt
              |   ELSE -((1000000 * (dd - cc)::HUGEINT) // rt)
              |  END)::BIGINT AS tau_b_ppm
              |FROM i4 ORDER BY source""".stripMargin)
    },
      (s, dir) => {
        val d = t(s, dir, "documents")
          .withColumn("__xq", expr("n_chars div 50L"))
          .withColumn("__yq", expr(
            s"(${graft.functions.TextHash.spark.rollingHash("text")} % 1000L) div 100L"))
        graft.operators.RobustStats
          .ordinalAssociation(d, "__xq", "__yq", Seq("source"))
          .select(col("source"), col("n"), col("concordant"),
            col("discordant"), col("tau_b_ppm"))
          .orderBy("source")
      }),

    // ---- relative effect + Cliff's delta -------------------------
    // How much do English doc lengths stochastically dominate the
    // rest? Exact pair-count ratios on value cells.
    Q("q377_relative_effect",
      Some("""WITH b0 AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS arm,
             |  n_chars AS v FROM documents),
             |cells AS (SELECT arm, v, count(*)::BIGINT AS n FROM b0
             |  GROUP BY arm, v),
             |a AS (SELECT v AS va, n AS na FROM cells WHERE arm = 0),
             |b AS (SELECT v AS vb, n AS nb FROM cells WHERE arm = 1),
             |p AS (SELECT
             |  coalesce(sum(CASE WHEN vb > va THEN na * nb END), 0)::BIGINT AS gt,
             |  coalesce(sum(CASE WHEN vb < va THEN na * nb END), 0)::BIGINT AS lt,
             |  coalesce(sum(CASE WHEN vb = va THEN na * nb END), 0)::BIGINT AS eq
             |  FROM a CROSS JOIN b),
             |na2 AS (SELECT count(*)::BIGINT AS qa FROM b0 WHERE arm = 0),
             |nb2 AS (SELECT count(*)::BIGINT AS qb FROM b0 WHERE arm = 1)
             |SELECT qa AS n_a, qb AS n_b,
             |  (CASE WHEN qa = 0 OR qb = 0 THEN NULL
             |   ELSE (1000000 * (2 * gt + eq)) // (2 * qa * qb) END)::BIGINT
             |    AS p_hat_ppm,
             |  (CASE WHEN qa = 0 OR qb = 0 THEN NULL
             |   WHEN gt >= lt THEN (1000000 * (gt - lt)) // (qa * qb)
             |   ELSE -((1000000 * (lt - gt)) // (qa * qb)) END)::BIGINT
             |    AS cliffs_delta_ppm
             |FROM p CROSS JOIN na2 CROSS JOIN nb2""".stripMargin),
      (s, dir) =>
        graft.operators.RobustStats.relativeEffect(
          t(s, dir, "documents"), col("lang") === "en", "n_chars"))
    ,

    // ---- distribution drift: exact 1-D Wasserstein + TV ----------
    // Did German docs' length distribution MOVE relative to English?
    // W1 on the value cells (ordered: a +1 shift of every value costs
    // exactly 1e6) next to the ordering-blind total variation — both
    // single floored divs over integer cumulative/histogram cross
    // products. Pure single-level window SQL in the oracle.
    Q("q381_distribution_drift",
      Some("""WITH d AS (SELECT CASE WHEN lang = 'de' THEN 1 ELSE 0 END AS arm,
             |  n_chars AS v FROM documents WHERE lang IN ('en', 'de')),
             |cells AS (SELECT v,
             |  sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::HUGEINT AS ha,
             |  sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::HUGEINT AS hb
             |  FROM d GROUP BY v),
             |tot AS (SELECT sum(ha)::HUGEINT AS na, sum(hb)::HUGEINT AS nb,
             |  count(*)::BIGINT AS nv FROM cells),
             |st AS (SELECT v, ha, hb,
             |  sum(ha) OVER (ORDER BY v)::HUGEINT AS ca,
             |  sum(hb) OVER (ORDER BY v)::HUGEINT AS cb,
             |  (lead(v) OVER (ORDER BY v) - v)::HUGEINT AS gap FROM cells),
             |agg AS (SELECT
             |  sum(abs(ca * nb - cb * na) * coalesce(gap, 0))::HUGEINT AS w1n,
             |  sum(abs(ha * nb - hb * na))::HUGEINT AS tvn FROM st, tot)
             |SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b, nv AS n_values,
             |  (CASE WHEN na = 0 OR nb = 0 THEN NULL
             |   ELSE (1000000 * w1n) // (na * nb) END)::BIGINT AS w1_x_ppm,
             |  (CASE WHEN na = 0 OR nb = 0 THEN NULL
             |   ELSE (1000000 * tvn) // (2 * na * nb) END)::BIGINT AS tv_ppm
             |FROM agg, tot""".stripMargin),
      (s, dir) =>
        graft.operators.RobustStats.distributionDrift(
          t(s, dir, "documents").where(col("lang").isin("en", "de")),
          col("lang") === "de", "n_chars"))
    ,

    // ---- Cramér–von Mises squared-ECDF drift ---------------------
    // The everywhere-sensitive companion of q381's W1/TV on a
    // different arm pair (en vs fr): per-cell ppm-quantized
    // (F_A−F_B)² weighted by pooled cell mass — three floors, each
    // mirrored verbatim, so no row guard is needed at any N.
    Q("q382_cvm_drift",
      Some("""WITH d AS (SELECT CASE WHEN lang = 'fr' THEN 1 ELSE 0 END AS arm,
             |  n_chars AS v FROM documents WHERE lang IN ('en', 'fr')),
             |cells AS (SELECT v,
             |  sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::HUGEINT AS ha,
             |  sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::HUGEINT AS hb
             |  FROM d GROUP BY v),
             |tot AS (SELECT sum(ha)::HUGEINT AS na, sum(hb)::HUGEINT AS nb,
             |  count(*)::BIGINT AS nv FROM cells),
             |st AS (SELECT ha, hb,
             |  sum(ha) OVER (ORDER BY v)::HUGEINT AS ca,
             |  sum(hb) OVER (ORDER BY v)::HUGEINT AS cb FROM cells),
             |per AS (SELECT ha, hb,
             |  (CASE WHEN na = 0 OR nb = 0 THEN 0::HUGEINT
             |   ELSE (1000000::HUGEINT * abs(ca * nb - cb * na)) // (na * nb)
             |   END) AS dppm FROM st, tot),
             |agg AS (SELECT sum((ha + hb) * dppm * dppm)::HUGEINT AS num
             |  FROM per)
             |SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b, nv AS n_values,
             |  (CASE WHEN na = 0 OR nb = 0 THEN NULL
             |   ELSE (na * nb * (num // (na + nb)))
             |     // (1000000::HUGEINT * (na + nb)) END)::BIGINT AS t_x_ppm,
             |  (CASE WHEN na = 0 OR nb = 0 THEN NULL
             |   ELSE (1000000::HUGEINT * (na + nb + 1)) // (6 * (na + nb))
             |   END)::BIGINT AS t_mean_x_ppm
             |FROM agg, tot""".stripMargin),
      (s, dir) =>
        graft.operators.RobustStats.cramerVonMises(
          t(s, dir, "documents").where(col("lang").isin("en", "fr")),
          col("lang") === "fr", "n_chars"))
    ,

    // ---- Cochran–Armitage ordered trend --------------------------
    // Does the finished-order rate trend with priority tier (score =
    // the tier's leading digit)? Score-cell scalars, N-normalized
    // ppm/ppb quantization, exact isqrt — unbounded-N budget.
    Q("q383_trend_test", {
      val ladder = graft.util.ExactMath.duckIsqrtSteps("rt").zipWithIndex
        .map { case (sel, i) =>
          val from = if (i == 0) "q3" else s"i${i - 1}"
          s"i$i AS ($sel FROM $from)"
        }.mkString(",\n")
      Some(s"""WITH d AS (SELECT
              |  cast(regexp_extract(o_orderpriority, '([0-9]+)', 1) AS BIGINT)
              |    AS w,
              |  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS s
              |  FROM orders),
              |g AS (SELECT w, count(*)::HUGEINT AS n, sum(s)::HUGEINT AS r
              |  FROM d GROUP BY w),
              |t AS (SELECT sum(n)::HUGEINT AS nn, sum(r)::HUGEINT AS rr,
              |  sum(w * n)::HUGEINT AS swn, sum(w * r)::HUGEINT AS swr,
              |  sum(w * w * n)::HUGEINT AS sw2n FROM g),
              |q2 AS (SELECT nn, rr,
              |  (nn * sw2n - swn * swn) AS b,
              |  (CASE WHEN nn * swr - rr * swn >= 0
              |   THEN (1000000::HUGEINT * (nn * swr - rr * swn)) // nn
              |   ELSE -((1000000::HUGEINT * (rr * swn - nn * swr)) // nn)
              |   END) AS abar,
              |  ((1000000::HUGEINT * (nn * sw2n - swn * swn)) // nn) AS bbar,
              |  ((1000000000::HUGEINT * rr) // nn) AS rbar,
              |  ((1000000000::HUGEINT * (nn - rr)) // nn) AS rcbar FROM t),
              |q3 AS (SELECT *, (rbar * rcbar * bbar) AS x FROM q2),
              |$ladder
              |SELECT nn::BIGINT AS n_total, rr::BIGINT AS n_success,
              |  abar::BIGINT AS trend_ppm,
              |  (CASE WHEN b <= 0 OR rr <= 0 OR rr >= nn OR rt <= 0 THEN NULL
              |   WHEN abar >= 0 THEN (1000000000000::HUGEINT * abar) // rt
              |   ELSE -((1000000000000::HUGEINT * (-abar)) // rt)
              |   END)::BIGINT AS z_ppm
              |FROM i4""".stripMargin)
    },
      (s, dir) =>
        graft.operators.RobustStats.cochranArmitage(
          t(s, dir, "orders").withColumn("__w", expr(
            "cast(regexp_extract(o_orderpriority, '([0-9]+)', 1) as bigint)")),
          col("o_orderstatus") === "F", "__w"))
    ,

    // ---- Anderson–Darling tail-weighted drift --------------------
    // Did Chinese docs' length distribution move vs English IN THE
    // TAILS? Scholz–Stephens tie-adjusted midpoint A² (k=2) on the
    // value cells — each squared ECDF gap weighted by 1/(H(1−H)).
    Q("q385_anderson_darling",
      Some("""WITH d AS (SELECT CASE WHEN lang = 'zh' THEN 1 ELSE 0 END AS arm,
             |  n_chars AS v FROM documents WHERE lang IN ('en', 'zh')),
             |cells AS (SELECT v,
             |  sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::HUGEINT AS ha,
             |  sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::HUGEINT AS hb
             |  FROM d GROUP BY v),
             |tot AS (SELECT sum(ha)::HUGEINT AS na, sum(hb)::HUGEINT AS nb,
             |  sum(ha + hb)::HUGEINT AS nt, count(*)::BIGINT AS nv
             |  FROM cells),
             |st AS (SELECT ha, hb, ha + hb AS h,
             |  sum(ha) OVER (ORDER BY v)::HUGEINT AS ca,
             |  sum(hb) OVER (ORDER BY v)::HUGEINT AS cb FROM cells),
             |p1 AS (SELECT ha, hb, h, ca, cb, na, nb, nt,
             |  2 * (ca + cb) - h AS b2 FROM st, tot),
             |p2 AS (SELECT *, b2 * (2 * nt - b2) - nt * h AS hden FROM p1),
             |p3 AS (SELECT h,
             |  (CASE WHEN na = 0 OR nb = 0 THEN 0::HUGEINT
             |   ELSE (1000000::HUGEINT * abs(nt * (2 * ca - ha) - na * b2))
             |     // (2 * nt * na) END) AS da,
             |  (CASE WHEN na = 0 OR nb = 0 THEN 0::HUGEINT
             |   ELSE (1000000::HUGEINT * abs(nt * (2 * cb - hb) - nb * b2))
             |     // (2 * nt * nb) END) AS db,
             |  (CASE WHEN hden > 0 THEN (4000000::HUGEINT * nt * nt) // hden
             |   ELSE 0::HUGEINT END) AS w FROM p2),
             |ag AS (SELECT sum(h * da * da * w)::HUGEINT AS sa,
             |  sum(h * db * db * w)::HUGEINT AS sb FROM p3)
             |SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b, nv AS n_values,
             |  (CASE WHEN na = 0 OR nb = 0 THEN NULL
             |   ELSE ((nt - 1) * (na * (sa // (nt * nt))
             |                     + nb * (sb // (nt * nt))))
             |     // 1000000000000::HUGEINT END)::BIGINT AS a2_x_ppm
             |FROM ag, tot""".stripMargin),
      (s, dir) =>
        graft.operators.RobustStats.andersonDarling(
          t(s, dir, "documents").where(col("lang").isin("en", "zh")),
          col("lang") === "zh", "n_chars"))
    ,

    // ---- energy distance (metric drift) --------------------------
    // How far apart are Spanish vs English doc-length distributions
    // in VALUE units? Székely V-statistic energy distance via the
    // sorted-cumulative pair-sum identity — one floored div per
    // expectation, nothing pairwise ever materializes.
    Q("q386_energy_distance",
      Some("""WITH d AS (SELECT CASE WHEN lang = 'es' THEN 1 ELSE 0 END AS arm,
             |  n_chars AS v FROM documents WHERE lang IN ('en', 'es')),
             |cells AS (SELECT v,
             |  sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::HUGEINT AS ha,
             |  sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::HUGEINT AS hb
             |  FROM d GROUP BY v),
             |st AS (SELECT v, ha, hb,
             |  coalesce(sum(ha) OVER w1, 0)::HUGEINT AS cal,
             |  coalesce(sum(hb) OVER w1, 0)::HUGEINT AS cbl,
             |  coalesce(sum(v * ha) OVER w1, 0)::HUGEINT AS sal,
             |  coalesce(sum(v * hb) OVER w1, 0)::HUGEINT AS sbl
             |  FROM cells WINDOW w1 AS (ORDER BY v
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
             |tot AS (SELECT sum(ha)::HUGEINT AS na, sum(hb)::HUGEINT AS nb,
             |  count(*)::BIGINT AS nv FROM cells),
             |ag AS (SELECT
             |  sum(ha * (v * cbl - sbl) + hb * (v * cal - sal))::HUGEINT AS sxy,
             |  sum(ha * (v * cal - sal))::HUGEINT AS sxx,
             |  sum(hb * (v * cbl - sbl))::HUGEINT AS syy FROM st),
             |ag2 AS (SELECT na, nb, nv,
             |  (CASE WHEN na = 0 OR nb = 0 THEN NULL
             |   ELSE (2000000::HUGEINT * sxy) // (na * nb) END) AS a,
             |  (CASE WHEN na = 0 THEN NULL
             |   ELSE (2000000::HUGEINT * sxx) // (na * na) END) AS b,
             |  (CASE WHEN nb = 0 THEN NULL
             |   ELSE (2000000::HUGEINT * syy) // (nb * nb) END) AS c
             |  FROM ag, tot)
             |SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b, nv AS n_values,
             |  (a - b - c)::BIGINT AS e_x_ppm, a::BIGINT AS cross_x2_ppm,
             |  b::BIGINT AS within_a_x2_ppm, c::BIGINT AS within_b_x2_ppm
             |FROM ag2""".stripMargin),
      (s, dir) =>
        graft.operators.RobustStats.energyDistance(
          t(s, dir, "documents").where(col("lang").isin("en", "es")),
          col("lang") === "es", "n_chars"))
    ,

    // ---- Kuiper cyclic-safe drift --------------------------------
    // V = D⁺ + D⁻ over en-vs-zh n_chars: catches the above-then-below
    // ECDF crossing of a median-preserving spread change that KS's
    // single max can halve. Exact gap numerators on the value
    // histogram; one floor per rendered statistic (v_ppm floors the
    // SUM of exact numerators, not the sum of floors).
    Q("q388_kuiper_drift",
      Some("""WITH d AS (SELECT CASE WHEN lang = 'zh' THEN 1 ELSE 0 END AS arm,
             |  n_chars AS v FROM documents WHERE lang IN ('en', 'zh')),
             |cells AS (SELECT v,
             |  sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::HUGEINT AS ha,
             |  sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::HUGEINT AS hb
             |  FROM d GROUP BY v),
             |tot AS (SELECT sum(ha)::HUGEINT AS na, sum(hb)::HUGEINT AS nb,
             |  count(*)::BIGINT AS nv FROM cells),
             |st AS (SELECT
             |  (sum(ha) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)) * nb
             |  - (sum(hb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)) * na
             |    AS dn FROM cells, tot),
             |mx AS (SELECT greatest(max(dn), 0)::HUGEINT AS dp,
             |  greatest(-min(dn), 0)::HUGEINT AS dm FROM st)
             |SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b, nv AS n_values,
             |  (CASE WHEN na = 0 OR nb = 0 THEN NULL
             |   ELSE (1000000 * dp) // (na * nb) END)::BIGINT AS d_plus_ppm,
             |  (CASE WHEN na = 0 OR nb = 0 THEN NULL
             |   ELSE (1000000 * dm) // (na * nb) END)::BIGINT AS d_minus_ppm,
             |  (CASE WHEN na = 0 OR nb = 0 THEN NULL
             |   ELSE (1000000 * (dp + dm)) // (na * nb) END)::BIGINT AS v_ppm
             |FROM mx, tot""".stripMargin),
      (s, dir) =>
        graft.operators.RobustStats.kuiperDrift(
          t(s, dir, "documents").where(col("lang").isin("en", "zh")),
          col("lang") === "zh", "n_chars"))
    ,

    // ---- Wilcoxon signed-rank on pooled daily deltas -------------
    // The magnitude-aware companion of q328's sign test: rank the
    // nonzero per-user day-over-day value changes by |d| (midrank
    // ties, doubled units) and test whether positive changes carry
    // more than half the rank mass. One isqrt floor in z (the q360
    // convention), everything upstream exact integer.
    Q("q389_signed_rank", {
      val ladder = graft.util.ExactMath.duckIsqrtSteps("rt").zipWithIndex
        .map { case (sel, i) =>
          val from = if (i == 0) "q2" else s"i${i - 1}"
          s"i$i AS ($sel FROM $from)"
        }.mkString(",\n")
      Some(s"""WITH x AS (SELECT user_id AS entity,
              |  (epoch_us(ts) * 1000) // 86400000000000 AS b,
              |  CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS mv FROM events),
              |d0 AS (SELECT entity, b, sum(mv)::BIGINT AS y FROM x GROUP BY 1, 2),
              |l AS (SELECT entity, y,
              |  lag(y) OVER (PARTITION BY entity ORDER BY b) AS prev FROM d0),
              |dd AS (SELECT (y - prev)::BIGINT AS d FROM l
              |  WHERE prev IS NOT NULL AND y <> prev),
              |cells AS (SELECT abs(d)::BIGINT AS a, count(*)::BIGINT AS t,
              |  sum(CASE WHEN d > 0 THEN 1 ELSE 0 END)::BIGINT AS p
              |  FROM dd GROUP BY 1),
              |st AS (SELECT t, p, coalesce(sum(t) OVER (ORDER BY a
              |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
              |    AS cb FROM cells),
              |ag AS (SELECT sum(t)::BIGINT AS n,
              |  sum(p::HUGEINT * (2 * cb + t + 1))::HUGEINT AS w2p,
              |  sum(t::HUGEINT * t * t - t)::HUGEINT AS tie FROM st),
              |j AS (SELECT n, w2p, tie,
              |  (n::HUGEINT * (n + 1)) // 2 AS mean2,
              |  (2::HUGEINT * n * (n + 1) * (2 * n + 1) - tie)::HUGEINT AS v12
              |  FROM ag),
              |q2 AS (SELECT *, (12::HUGEINT * v12)::HUGEINT AS x FROM j),
              |$ladder
              |SELECT coalesce(n, 0)::BIGINT AS n_pairs, w2p::BIGINT AS w2_plus,
              |  mean2::BIGINT AS w2_mean, tie::BIGINT AS tie_term,
              |  (CASE WHEN n IS NULL OR n = 0 OR v12 <= 0 THEN NULL
              |   WHEN w2p >= mean2 THEN (12000000::HUGEINT * (w2p - mean2)) // rt
              |   ELSE -((12000000::HUGEINT * (mean2 - w2p)) // rt)
              |   END)::BIGINT AS z_ppm
              |FROM i4""".stripMargin)
    },
      (s, dir) => {
        val x = t(s, dir, "events")
          .withColumn("mv", expr("cast(floor(value * 1000000d + 0.5d) as bigint)"))
          .withColumn("b", expr("ts div 86400000000000L"))
        graft.operators.RobustStats.wilcoxonSignedRank(x, "user_id", "b", "mv")
      })
    ,

    // ---- t-closeness privacy audit -------------------------------
    // Completes the release-gate trio (q288 l-diversity, q289
    // k-suppression): per (lang, source) group, normalized exact
    // EMD of the n_chars distribution vs the table-wide one — a
    // group can be l-diverse yet sit entirely in one tail, and only
    // a distributional distance sees it. Threshold t = 0.15.
    Q("q390_t_closeness",
      Some("""WITH cells AS (SELECT lang, source, n_chars::BIGINT AS v,
             |  count(*)::BIGINT AS h FROM documents
             |  WHERE n_chars IS NOT NULL GROUP BY 1, 2, 3),
             |gl AS (SELECT v, sum(h)::BIGINT AS hg FROM cells GROUP BY 1),
             |g2 AS (SELECT v, sum(hg) OVER (ORDER BY v)::BIGINT AS cg,
             |  (lead(v) OVER (ORDER BY v) - v)::BIGINT AS gap FROM gl),
             |tot AS (SELECT sum(hg)::HUGEINT AS N,
             |  (max(v) - min(v))::HUGEINT AS rng FROM gl),
             |grp AS (SELECT lang, source, sum(h)::BIGINT AS ng
             |  FROM cells GROUP BY 1, 2),
             |grid AS (SELECT g.lang, g.source, g.ng, s.v, s.cg, s.gap,
             |  coalesce(c.h, 0)::BIGINT AS h
             |  FROM grp g CROSS JOIN g2 s LEFT JOIN cells c
             |  ON c.lang = g.lang AND c.source = g.source AND c.v = s.v),
             |cum AS (SELECT lang, source, ng, cg, gap,
             |  sum(h) OVER (PARTITION BY lang, source ORDER BY v
             |    ROWS UNBOUNDED PRECEDING)::HUGEINT AS c FROM grid),
             |pg AS (SELECT lang, source, max(ng)::HUGEINT AS ng,
             |  sum(abs(c * N - cg::HUGEINT * ng) * coalesce(gap, 0))::HUGEINT
             |    AS w1n FROM cum, tot GROUP BY 1, 2),
             |tp AS (SELECT ng, (CASE WHEN rng = 0 THEN 0
             |  ELSE (1000000::HUGEINT * w1n) // (ng * N * rng) END) AS tppm
             |  FROM pg, tot)
             |SELECT count(*)::BIGINT AS n_groups,
             |  sum(CASE WHEN tppm > 150000 THEN 1 ELSE 0 END)::BIGINT
             |    AS n_violating,
             |  max(tppm)::BIGINT AS max_t_ppm,
             |  sum(CASE WHEN tppm > 150000 THEN ng ELSE 0 END)::BIGINT
             |    AS rows_at_risk
             |FROM tp""".stripMargin),
      (s, dir) =>
        graft.operators.Validate.tCloseness(
          t(s, dir, "documents"), Seq("lang", "source"), "n_chars",
          tPpm = 150000L))
    ,

    // ---- Watson's U² circular drift ------------------------------
    // Did purchases shift in HOUR-OF-DAY vs all other events? CvM
    // (q382) depends on where the 24h circle is cut at midnight;
    // Watson's U² subtracts the mean ECDF gap and is rotation-
    // invariant — the right drift test for circular values. Exact
    // integers end to end; one ppm floor.
    Q("q391_watson_u2",
      Some("""WITH d AS (SELECT ((epoch_us(ts) // 3600000000) % 24)::BIGINT AS v,
             |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS arm
             |  FROM events),
             |cells AS (SELECT v, count(*)::HUGEINT AS t,
             |  sum(arm)::HUGEINT AS hb FROM d GROUP BY v),
             |tot AS (SELECT sum(t - hb)::HUGEINT AS m, sum(hb)::HUGEINT AS n2,
             |  sum(t)::HUGEINT AS nn FROM cells),
             |st AS (SELECT t,
             |  (sum(t - hb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)) * n2
             |  - (sum(hb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)) * m AS e
             |  FROM cells, tot),
             |ag AS (SELECT sum(t * e)::HUGEINT AS s1,
             |  sum(t * e * e)::HUGEINT AS s2, count(*)::BIGINT AS nv FROM st)
             |SELECT m::BIGINT AS n_a, n2::BIGINT AS n_b, nv AS n_values,
             |  (CASE WHEN m = 0 OR n2 = 0 THEN NULL
             |   ELSE (1000000::HUGEINT * (nn * s2 - s1 * s1))
             |        // (m * n2 * nn * nn * nn) END)::BIGINT AS u2_ppm
             |FROM ag, tot""".stripMargin),
      (s, dir) => {
        val e = t(s, dir, "events")
          .withColumn("__hr", expr("(ts div 3600000000000L) % 24L"))
        graft.operators.RobustStats.watsonU2Drift(
          e, col("event_type") === "purchase", "__hr")
      }),

    // ---- Cucconi joint location-scale test -----------------------
    // Do English doc lengths differ from the rest in shift AND/OR
    // spread, in ONE statistic? Squared ranks from both ends of the
    // pooled ordering, coupled through the exact null correlation —
    // the one-shot alternative to running Wilcoxon + Ansari-Bradley
    // separately (q393 composes those instead). Five documented
    // micro floors, mirrored by the oracle cell for cell.
    Q("q392_cucconi",
      Some("""WITH d AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS arm,
             |  n_chars::BIGINT AS v FROM documents WHERE n_chars IS NOT NULL),
             |cells AS (SELECT v, count(*)::BIGINT AS t, sum(arm)::BIGINT AS b
             |  FROM d GROUP BY v),
             |st AS (SELECT t, b, coalesce(sum(t) OVER (ORDER BY v
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
             |    AS bef FROM cells),
             |tt AS (SELECT sum(t)::HUGEINT AS nn FROM cells),
             |ag AS (SELECT sum(b)::HUGEINT AS nb,
             |  sum(b::HUGEINT * (2 * bef + t + 1) * (2 * bef + t + 1))
             |    ::HUGEINT AS t2,
             |  sum(b::HUGEINT * (2 * nn + 2 - (2 * bef + t + 1))
             |      * (2 * nn + 2 - (2 * bef + t + 1)))::HUGEINT AS t2c
             |  FROM st, tt),
             |f AS (SELECT nn, nb, nn - nb AS na,
             |  3::HUGEINT * t2 - 2::HUGEINT * nb * (nn + 1) * (2 * nn + 1)
             |    AS nu2,
             |  3::HUGEINT * t2c - 2::HUGEINT * nb * (nn + 1) * (2 * nn + 1)
             |    AS nv2,
             |  4::HUGEINT * (nn - nb) * nb * (nn + 1) * (2 * nn + 1)
             |    * (8 * nn + 11) AS k4,
             |  ((2 * nn + 1) * (8 * nn + 11))::HUGEINT AS q,
             |  (14::HUGEINT * nn * nn + 30 * nn + 19)::HUGEINT AS p
             |  FROM ag, tt),
             |g AS (SELECT *,
             |  CASE WHEN k4 > 0 THEN (5000000::HUGEINT * nu2 * nu2) // k4
             |    ELSE NULL END AS u2u,
             |  CASE WHEN k4 > 0 THEN (5000000::HUGEINT * nv2 * nv2) // k4
             |    ELSE NULL END AS v2u,
             |  CASE WHEN k4 <= 0 THEN NULL
             |    WHEN nu2 * nv2 >= 0 THEN (5000000::HUGEINT * nu2 * nv2) // k4
             |    ELSE -((5000000::HUGEINT * (-(nu2 * nv2))) // k4) END AS uvu
             |  FROM f),
             |h AS (SELECT *, CASE WHEN uvu IS NULL THEN NULL
             |    WHEN uvu >= 0 THEN (2::HUGEINT * p * uvu) // q
             |    ELSE -((2::HUGEINT * p * (-uvu)) // q) END AS rterm FROM g),
             |i AS (SELECT *, (u2u + v2u + rterm)::HUGEINT * q * q AS cnum,
             |  120::HUGEINT * (nn - 2) * (nn + 2) * (nn + 1) * (nn + 1)
             |    AS cden FROM h)
             |SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
             |  u2u::BIGINT AS u2_micro, v2u::BIGINT AS v2_micro,
             |  uvu::BIGINT AS uv_micro,
             |  (CASE WHEN na <= 0 OR nb <= 0 OR nn < 3 OR cden <= 0 THEN NULL
             |   WHEN cnum >= 0 THEN cnum // cden
             |   ELSE -((-cnum) // cden) END)::BIGINT AS c_micro
             |FROM i""".stripMargin),
      (s, dir) =>
        graft.operators.RobustStats.cucconi(
          t(s, dir, "documents"), col("lang") === "en", "n_chars")),

    // ---- Lepage location+scale omnibus ---------------------------
    // The classical composition q392 replaces: L = z_W² + z_AB²,
    // squared standardized Wilcoxon rank-sum (location) plus squared
    // standardized Ansari-Bradley (scale), here asking whether
    // Chinese doc lengths differ from the rest in EITHER moment.
    // Each component carries its own single isqrt floor; L is their
    // documented micro composition.
    Q("q393_lepage", {
      val ladW = graft.util.ExactMath.duckIsqrtSteps("wrt").zipWithIndex
        .map { case (sel, i) =>
          val from = if (i == 0) "q2" else s"w${i - 1}"
          s"w$i AS ($sel FROM $from)"
        }.mkString(",\n")
      val ladA = graft.util.ExactMath.duckIsqrtSteps("art").zipWithIndex
        .map { case (sel, i) =>
          val from = if (i == 0) "aq2" else s"a${i - 1}"
          s"a$i AS ($sel FROM $from)"
        }.mkString(",\n")
      Some(s"""WITH d AS (SELECT CASE WHEN lang = 'zh' THEN 1 ELSE 0 END AS arm,
              |  n_chars::BIGINT AS v FROM documents WHERE n_chars IS NOT NULL),
              |cells AS (SELECT v, count(*)::BIGINT AS t, sum(arm)::BIGINT AS b
              |  FROM d GROUP BY v),
              |st AS (SELECT t, b, coalesce(sum(t) OVER (ORDER BY v
              |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
              |    AS bef FROM cells),
              |ag AS (SELECT sum(t)::HUGEINT AS nn, sum(b)::HUGEINT AS nb,
              |  sum(b::HUGEINT * (2 * bef + t + 1))::HUGEINT AS w2,
              |  sum(t::HUGEINT * t * t - t)::HUGEINT AS tie FROM st),
              |f AS (SELECT nn, nb, nn - nb AS na, w2, tie,
              |  nb * (nn + 1) AS mean2,
              |  3::HUGEINT * nn * (nn - 1) AS k,
              |  nn * (nn * nn - 1) - tie AS xx FROM ag),
              |q2 AS (SELECT *, (CASE WHEN na > 0 AND nb > 0 AND xx > 0
              |  THEN k * na * nb * xx ELSE 0::HUGEINT END) AS x FROM f),
              |$ladW,
              |zw AS (SELECT na, nb, (CASE WHEN wrt <= 0 THEN NULL
              |  WHEN w2 - mean2 >= 0
              |    THEN (1000000::HUGEINT * k * (w2 - mean2)) // wrt
              |  ELSE -((1000000::HUGEINT * k * (mean2 - w2)) // wrt)
              |  END)::BIGINT AS zw_ppm FROM w4),
              |ah2 AS (SELECT t, b AS a, bef FROM st),
              |att AS (SELECT nn::BIGINT AS nn, nb::BIGINT AS nb FROM ag),
              |sgrid AS (SELECT a, t, bef + 1 AS lo, bef + t AS hi,
              |  (nn + 1) // 2 AS hh, nn FROM ah2 CROSS JOIN att),
              |asv AS (SELECT a, t,
              |  (CASE WHEN least(hi, hh) >= lo
              |    THEN ((lo + least(hi, hh)) * (least(hi, hh) - lo + 1)) // 2
              |    ELSE 0 END) +
              |  (CASE WHEN hi >= greatest(lo, hh + 1)
              |    THEN (((nn + 1 - greatest(lo, hh + 1)) + (nn + 1 - hi))
              |          * (hi - greatest(lo, hh + 1) + 1)) // 2
              |    ELSE 0 END) AS sc FROM sgrid),
              |aw AS (SELECT sum((1000000 * a * sc) // t)::BIGINT AS w FROM asv),
              |af AS (SELECT att.nn, att.nb, aw.w,
              |  (CASE WHEN att.nn % 2 = 0
              |    THEN (1000000 * att.nb * (att.nn + 2)) // 4
              |    ELSE (1000000 * att.nb * (att.nn + 1) * (att.nn + 1))
              |      // (4 * att.nn) END) AS mn,
              |  (CASE WHEN att.nn % 2 = 0
              |    THEN (att.nn - att.nb)::HUGEINT * att.nb * (att.nn + 2)
              |      * (att.nn - 2)
              |    ELSE (att.nn - att.nb)::HUGEINT * att.nb * (att.nn + 1)
              |      * (3 + att.nn * att.nn) END) AS varnum,
              |  (CASE WHEN att.nn % 2 = 0 THEN 48 * (att.nn - 1)
              |    ELSE 48 * att.nn * att.nn END) AS varden
              |  FROM att CROSS JOIN aw),
              |aq2 AS (SELECT *, (CASE WHEN varnum > 0 THEN
              |  ((w - mn)::HUGEINT * (w - mn) * varden) // varnum
              |  ELSE 0::HUGEINT END) AS x FROM af),
              |$ladA,
              |zab AS (SELECT (CASE WHEN varnum <= 0 THEN NULL
              |  WHEN w - mn >= 0 THEN art ELSE -art END)::BIGINT AS zab_ppm
              |  FROM a4)
              |SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b, zw_ppm, zab_ppm,
              |  (CASE WHEN zw_ppm IS NULL OR zab_ppm IS NULL THEN NULL
              |   ELSE (zw_ppm::HUGEINT * zw_ppm + zab_ppm::HUGEINT * zab_ppm)
              |        // 1000000 END)::BIGINT AS l_micro
              |FROM zw CROSS JOIN zab""".stripMargin)
    },
      (s, dir) =>
        graft.operators.RobustStats.lepage(
          t(s, dir, "documents"), col("lang") === "zh", "n_chars"))
    ,

    // ---- Krippendorff's alpha (nominal, missing-tolerant) --------
    // Three pseudo-annotators class docs short/mid/long from
    // different cues; annotators 2 and 3 ABSTAIN on id-modulo slices
    // — exactly the incomplete design Fleiss (q366) can't take.
    // Exact per-unit weights via lcm(1..R-1); one documented floor.
    Q("q394_krippendorff",
      Some("""WITH r1 AS (SELECT doc_id AS u,
             |  CASE WHEN n_chars > 400 THEN 'long'
             |    WHEN n_chars > 200 THEN 'mid' ELSE 'short' END AS c
             |  FROM documents),
             |r2 AS (SELECT doc_id AS u,
             |  CASE WHEN len(string_split(text, ' ')) > 60 THEN 'long'
             |    WHEN len(string_split(text, ' ')) > 30 THEN 'mid'
             |    ELSE 'short' END AS c
             |  FROM documents WHERE doc_id % 5 <> 0),
             |r3 AS (SELECT doc_id AS u,
             |  CASE WHEN position(' the ' IN text) > 0 AND n_chars > 300
             |    THEN 'long'
             |    WHEN position(' the ' IN text) > 0 THEN 'mid'
             |    ELSE 'short' END AS c
             |  FROM documents WHERE doc_id % 3 <> 0),
             |rt AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2
             |  UNION ALL SELECT * FROM r3),
             |uc AS (SELECT u, c, count(*)::BIGINT AS o FROM rt GROUP BY 1, 2),
             |um AS (SELECT u, sum(o)::BIGINT AS m FROM uc GROUP BY 1
             |  HAVING sum(o) >= 2),
             |kept AS (SELECT uc.u, uc.c, uc.o, um.m FROM uc JOIN um USING (u)),
             |tt AS (SELECT sum(o)::BIGINT AS n,
             |  count(DISTINCT u)::BIGINT AS units,
             |  count(DISTINCT c)::BIGINT AS k,
             |  sum((2 // (m - 1))::HUGEINT * o * (m - o))::HUGEINT AS do_l
             |  FROM kept),
             |de AS (SELECT sum(nc::HUGEINT * (tt.n - nc))::HUGEINT AS de_s
             |  FROM (SELECT c, sum(o)::BIGINT AS nc FROM kept GROUP BY c) x,
             |  tt)
             |SELECT units AS n_units, n AS n_ratings, k AS n_categories,
             |  (CASE WHEN de_s IS NULL OR de_s <= 0 OR n < 2 THEN NULL
             |   ELSE 1000000 - (1000000::HUGEINT * (n - 1) * do_l)
             |        // (2 * de_s) END)::BIGINT AS alpha_ppm
             |FROM tt, de""".stripMargin),
      (s, dir) => {
        val d = tp(s, dir, "documents", "doc_id")
        val lenClass = when(col("n_chars") > 400L, "long")
          .when(col("n_chars") > 200L, "mid").otherwise("short")
        val wcClass = when(expr("size(split(text, ' '))") > 60, "long")
          .when(expr("size(split(text, ' '))") > 30, "mid")
          .otherwise("short")
        val theClass = when(col("text").contains(" the ")
            && col("n_chars") > 300L, "long")
          .when(col("text").contains(" the "), "mid").otherwise("short")
        val ratings = d.select(col("doc_id").as("u"), lenClass.as("c"))
          .unionAll(d.where(col("doc_id") % 5 =!= 0)
            .select(col("doc_id").as("u"), wcClass.as("c")))
          .unionAll(d.where(col("doc_id") % 3 =!= 0)
            .select(col("doc_id").as("u"), theClass.as("c")))
        graft.operators.EvalStats.krippendorffAlpha(
          ratings, "u", "c", maxRatersPerUnit = 3)
      }),

    // ---- Lin's concordance correlation ---------------------------
    // Per language: does the 6-chars-per-word proxy REPRODUCE the
    // true char count? CCC punishes the location and scale bias that
    // Pearson's r forgives — pure integer moment sums, no sqrt.
    Q("q395_lin_ccc",
      Some("""WITH b AS (SELECT lang, n_chars::BIGINT AS x,
             |  (6 * len(string_split(text, ' ')))::BIGINT AS y
             |  FROM documents WHERE n_chars IS NOT NULL),
             |m AS (SELECT lang, count(*)::BIGINT AS n,
             |  sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
             |  sum(x::HUGEINT * x)::HUGEINT AS sxx,
             |  sum(y::HUGEINT * y)::HUGEINT AS syy,
             |  sum(x::HUGEINT * y)::HUGEINT AS sxy
             |  FROM b GROUP BY lang),
             |f AS (SELECT lang, n, 2::HUGEINT * (n * sxy - sx * sy) AS num,
             |  (n * sxx - sx * sx + n * syy - sy * sy
             |   + (sx - sy) * (sx - sy))::HUGEINT AS den FROM m)
             |SELECT lang, n,
             |  (CASE WHEN den <= 0 THEN NULL
             |   WHEN num >= 0 THEN (1000000 * num) // den
             |   ELSE -((1000000 * -num) // den) END)::BIGINT AS ccc_ppm
             |FROM f ORDER BY lang""".stripMargin),
      (s, dir) =>
        graft.operators.EvalStats.concordanceCorrelation(
          tp(s, dir, "documents", "doc_id")
            .where(col("n_chars").isNotNull)
            .withColumn("y", expr("6L * size(split(text, ' '))")),
          "n_chars", "y", Seq("lang"))
          .orderBy("lang")),

    // ---- Mood's median test --------------------------------------
    // Do the five languages share a median doc length? The
    // outlier-immune cross-check of Kruskal-Wallis (q364): split at
    // the pooled lower median, chi-square the 5x2 table; k
    // documented per-group floors.
    Q("q396_mood_median",
      Some("""WITH b AS (SELECT lang AS g, n_chars::BIGINT AS v
             |  FROM documents WHERE n_chars IS NOT NULL),
             |cells AS (SELECT g, v, count(*)::BIGINT AS t FROM b GROUP BY 1, 2),
             |hist AS (SELECT v, sum(t)::BIGINT AS h FROM cells GROUP BY 1),
             |tot AS (SELECT sum(h)::BIGINT AS N FROM hist),
             |cum AS (SELECT v, sum(h) OVER (ORDER BY v
             |  ROWS UNBOUNDED PRECEDING) AS c FROM hist),
             |med AS (SELECT min(v)::BIGINT AS m FROM cum, tot
             |  WHERE c >= (N + 1) // 2),
             |grp AS (SELECT g,
             |  sum(CASE WHEN v > m THEN t ELSE 0 END)::BIGINT AS a,
             |  sum(t)::BIGINT AS ng FROM cells, med GROUP BY g),
             |ab AS (SELECT sum(a)::BIGINT AS ta, sum(ng)::BIGINT AS N2,
             |  count(*)::BIGINT AS k FROM grp),
             |tm AS (SELECT (CASE WHEN ta <= 0 OR ta >= N2 THEN NULL
             |  ELSE (1000000::HUGEINT * (N2::HUGEINT * a - ng::HUGEINT * ta)
             |    * (N2::HUGEINT * a - ng::HUGEINT * ta))
             |    // (ta::HUGEINT * (N2 - ta) * ng) END) AS term
             |  FROM grp, ab)
             |SELECT ab.k, ab.N2 AS n_total, med.m AS median,
             |  ab.ta AS n_above,
             |  (SELECT sum(term) FROM tm)::BIGINT AS chi2_ppm
             |FROM ab, med""".stripMargin),
      (s, dir) =>
        graft.operators.RobustStats.moodMedianTest(
          t(s, dir, "documents"), "lang", "n_chars"))
    ,

    // ---- Quade test (block-weighted Friedman) --------------------
    // q351's question — do users order the five event types the same
    // way? — but heavy users (wide count ranges) carry more evidence
    // than near-flat ones: within-block ranks weighted by the rank
    // of the block range, everything in exact x4 doubled-midrank
    // units, one ppm floor.
    Q("q397_quade",
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
             |ty AS (SELECT unnest(['view','click','purchase','signup','error']) AS et),
             |c AS (SELECT user_id, event_type AS et, count(*)::BIGINT AS v
             |  FROM events GROUP BY user_id, event_type),
             |g AS (SELECT u.user_id, ty.et, coalesce(c.v, 0) AS v
             |  FROM u CROSS JOIN ty LEFT JOIN c USING (user_id, et)),
             |rk AS (SELECT user_id, et,
             |  2 * (rank() OVER (PARTITION BY user_id ORDER BY v) - 1)
             |    + count(*) OVER (PARTITION BY user_id, v) + 1 AS r2 FROM g),
             |rg AS (SELECT user_id, (max(v) - min(v))::BIGINT AS rgv
             |  FROM g GROUP BY 1),
             |qq AS (SELECT user_id,
             |  2 * (rank() OVER (ORDER BY rgv) - 1)
             |    + count(*) OVER (PARTITION BY rgv) + 1 AS q2 FROM rg),
             |s4 AS (SELECT rk.et, (qq.q2 * (rk.r2 - 6))::BIGINT AS s4
             |  FROM rk JOIN qq USING (user_id)),
             |pt AS (SELECT et, sum(s4::HUGEINT)::HUGEINT AS s4j
             |  FROM s4 GROUP BY et),
             |ag AS (SELECT (SELECT count(*) FROM u)::BIGINT AS b,
             |  count(*)::BIGINT AS k, sum(s4j * s4j)::HUGEINT AS b16 FROM pt),
             |a2 AS (SELECT sum(s4::HUGEINT * s4)::HUGEINT AS a16 FROM s4)
             |SELECT b AS n_blocks, k, a16::BIGINT AS a_x16,
             |  b16::BIGINT AS b_x16,
             |  (CASE WHEN b * a16 - b16 <= 0 THEN NULL
             |   ELSE (1000000::HUGEINT * (b - 1) * b16)
             |        // (b * a16 - b16) END)::BIGINT AS f_ppm
             |FROM ag, a2""".stripMargin),
      (s, dir) => {
        val ev = t(s, dir, "events")
        val users = ev.select(col("user_id")).distinct()
        val ty = ev.sparkSession.range(1).select(explode(array(
          Seq("view", "click", "purchase", "signup", "error")
            .map(lit): _*)).as("et"))
        val cnt = ev.groupBy(col("user_id"), col("event_type").as("et"))
          .agg(count(lit(1)).cast("bigint").as("v"))
        val grid = users.crossJoin(broadcast(ty))
          .join(cnt, Seq("user_id", "et"), "left")
          .withColumn("v", coalesce(col("v"), lit(0L)))
        graft.operators.RobustStats.quadeTest(grid, "user_id", "et", "v")
      }),

    // ---- Gwet's AC1 (paradox-resistant agreement) ----------------
    // The q366 detector trio re-scored with the chance term that
    // does NOT collapse under skewed prevalence — kappa vs AC1
    // divergence flags a prevalence problem, not a rater problem.
    Q("q398_gwet_ac1",
      Some("""WITH p AS (SELECT
             |  CASE WHEN n_chars > 400 THEN 1 ELSE 0 END +
             |  CASE WHEN len(string_split(text, ' ')) > 60 THEN 1 ELSE 0 END +
             |  CASE WHEN position(' the ' IN text) > 0 THEN 1 ELSE 0 END AS a
             |  FROM documents),
             |ag AS (SELECT count(*)::BIGINT AS nn, sum(a)::BIGINT AS sa,
             |  sum(a * a + (3 - a) * (3 - a) - 3)::BIGINT AS s1 FROM p),
             |f AS (SELECT nn, nn * 3 AS nr, sa, s1,
             |  2::HUGEINT * sa * (nn * 3 - sa) AS pe2 FROM ag),
             |g AS (SELECT nn, s1::HUGEINT * nr * nr - pe2 * nr * 2 AS num,
             |  nr::HUGEINT * 2 * (nr::HUGEINT * nr - pe2) AS den FROM f)
             |SELECT nn AS n_items, 3::BIGINT AS n_raters,
             |  (CASE WHEN den <= 0 THEN NULL
             |   WHEN num >= 0 THEN (1000000 * num) // den
             |   ELSE -((1000000 * -num) // den) END)::BIGINT AS ac1_ppm
             |FROM g""".stripMargin),
      (s, dir) =>
        graft.operators.EvalStats.gwetAC1(t(s, dir, "documents"), Seq(
          col("n_chars") > 400L,
          expr("size(split(text, ' ')) > 60"),
          col("text").contains(" the "))))
    ,

    // ---- Brunner-Munzel generalized Wilcoxon ---------------------
    // Are French doc lengths stochastically larger than the rest,
    // WITHOUT assuming equal spreads? Placements off the value
    // histogram, per-arm placement variances, the q360-convention
    // floored-div-inside-isqrt studentization.
    Q("q399_brunner_munzel", {
      val ladder = graft.util.ExactMath.duckIsqrtSteps("rt").zipWithIndex
        .map { case (sel, i) =>
          val from = if (i == 0) "q2" else s"i${i - 1}"
          s"i$i AS ($sel FROM $from)"
        }.mkString(",\n")
      Some(s"""WITH d AS (SELECT CASE WHEN lang = 'fr' THEN 1 ELSE 0 END AS arm,
              |  n_chars::BIGINT AS v FROM documents WHERE n_chars IS NOT NULL),
              |cells AS (SELECT v,
              |  sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS ta,
              |  sum(arm)::BIGINT AS tb FROM d GROUP BY v),
              |tot AS (SELECT sum(ta)::BIGINT AS m, sum(tb)::BIGINT AS n
              |  FROM cells),
              |st AS (SELECT ta, tb,
              |  2 * coalesce(sum(tb) OVER (ORDER BY v
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              |    + tb AS ux,
              |  2 * coalesce(sum(ta) OVER (ORDER BY v
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              |    + ta AS uy FROM cells),
              |ag AS (SELECT sum(ta::HUGEINT * ux)::HUGEINT AS sux,
              |  sum(ta::HUGEINT * ux * ux)::HUGEINT AS sux2,
              |  sum(tb::HUGEINT * uy)::HUGEINT AS suy,
              |  sum(tb::HUGEINT * uy * uy)::HUGEINT AS suy2 FROM st),
              |f AS (SELECT m, n, suy,
              |  (m * sux2 - sux * sux)::HUGEINT AS vx,
              |  (n * suy2 - suy * suy)::HUGEINT AS vy FROM ag, tot),
              |g AS (SELECT m, n, suy,
              |  (vx * (n - 1) + vy * (m - 1))::HUGEINT AS kk,
              |  (suy - m::HUGEINT * n)::HUGEINT AS dd FROM f),
              |q2 AS (SELECT *, (CASE WHEN kk > 0
              |  THEN (1000000000000::HUGEINT * dd * dd * ((m - 1) * (n - 1)))
              |       // kk ELSE 0::HUGEINT END) AS x FROM g),
              |$ladder
              |SELECT m::BIGINT AS n_a, n::BIGINT AS n_b,
              |  (CASE WHEN m = 0 OR n = 0 THEN NULL
              |   ELSE (1000000::HUGEINT * suy) // (2 * m::HUGEINT * n)
              |   END)::BIGINT AS p_hat_ppm,
              |  (CASE WHEN kk <= 0 THEN NULL
              |   WHEN dd >= 0 THEN rt ELSE -rt END)::BIGINT AS t_ppm
              |FROM i4""".stripMargin)
    },
      (s, dir) =>
        graft.operators.RobustStats.brunnerMunzel(
          t(s, dir, "documents"), col("lang") === "fr", "n_chars")),

    // ---- exact decision-threshold sweep --------------------------
    // Where should the purchase-score filter cut? Every distinct
    // score as a candidate threshold via suffix sums on the score
    // histogram; Youden's J picks the operating point (ties to the
    // most permissive cutoff), F1 rides along.
    Q("q400_threshold_sweep",
      Some("""WITH b AS (SELECT CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS s,
             |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
             |  FROM events),
             |h AS (SELECT s, sum(p)::BIGINT AS tp0,
             |  (count(*) - sum(p))::BIGINT AS tn0 FROM b GROUP BY s),
             |tot AS (SELECT sum(tp0)::BIGINT AS np, sum(tn0)::BIGINT AS nn,
             |  count(*)::BIGINT AS nt FROM h),
             |st AS (SELECT s,
             |  np - coalesce(sum(tp0) OVER (ORDER BY s
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tp,
             |  nn - coalesce(sum(tn0) OVER (ORDER BY s
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS fp,
             |  np, nn FROM h, tot),
             |j AS (SELECT s, tp, fp,
             |  (CASE WHEN np = 0 OR nn = 0 THEN NULL
             |   ELSE (1000000::HUGEINT * tp) // np
             |      - (1000000::HUGEINT * fp) // nn END) AS jv,
             |  (CASE WHEN tp + fp + np = 0 THEN NULL
             |   ELSE (2000000::HUGEINT * tp) // (tp + fp + np) END) AS f1
             |  FROM st),
             |top AS (SELECT * FROM j ORDER BY jv DESC NULLS LAST, s LIMIT 1)
             |SELECT np::BIGINT AS n_pos, nn::BIGINT AS n_neg,
             |  nt AS n_thresholds,
             |  (CASE WHEN np = 0 OR nn = 0 THEN NULL ELSE s END)::BIGINT
             |    AS best_threshold,
             |  jv::BIGINT AS j_ppm,
             |  (CASE WHEN np = 0 OR nn = 0 THEN NULL ELSE f1 END)::BIGINT
             |    AS f1_ppm
             |FROM top, tot""".stripMargin),
      (s, dir) =>
        graft.operators.EvalStats.thresholdSweep(
          tp(s, dir, "events", "event_id")
            .withColumn("mv", expr(
              "cast(floor(value * 1000000d + 0.5d) as bigint)")),
          "mv", col("event_type") === "purchase"))
  )
}
