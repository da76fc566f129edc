package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation statistics: pairwise win rates, Poisson-bootstrap
  * confidence intervals, rank-distance (Spearman footrule), and a
  * two-proportion z² test — the aggregate layer an eval harness needs
  * once per-example scores exist (see [[Scoring]] for the scoring
  * seam itself).
  *
  * Not in the reference (polario is dataset I/O only — SURVEY.md §0);
  * north-star extension family.
  *
  * Everything here is integer-exact (micro/ppm scaling, BIGINT /
  * DECIMAL(38,0) division) so results are bitwise-comparable against
  * an independent SQL engine — the same discipline as the rest of the
  * repo (no float accumulation order to disagree on).
  */
object EvalStats {

  private val P = graft.functions.TextHash.P

  /** Pairwise win-rate matrix between models scored on shared items.
    *
    * Input: one row per (model, item) with an integer score. Output:
    * one row per unordered model pair `(model_a < model_b)` with the
    * number of co-scored items and `win_ppm` = parts-per-million win
    * rate of `model_a` (ties count half — the standard Condorcet /
    * AlpacaEval convention), computed as
    * `(1e6 * (2*wins + ties)) div (2*n)` — exact integer.
    *
    * Scale shape: one shuffle keyed on the ITEM column (the join that
    * pairs each item's scores), then a model-pair aggregation whose
    * cardinality is models² — models are a small dimension, so the
    * second aggregation is map-side-combined down to almost nothing.
    * No model×model data blowup: the per-item self-join multiplies
    * each item row by (models scored on it − 1), bounded by the model
    * count, not the corpus.
    */
  def winRateMatrix(df: DataFrame, modelCol: String, itemCol: String,
                    scoreCol: String): DataFrame = {
    val s = df.select(col(modelCol).as("__m"), col(itemCol).as("__i"),
      col(scoreCol).cast("bigint").as("__s"))
    val a = s.select(col("__m").as("model_a"), col("__i"), col("__s").as("__sa"))
    val b = s.select(col("__m").as("model_b"), col("__i"), col("__s").as("__sb"))
    a.join(b, Seq("__i"))
      .where(col("model_a") < col("model_b"))
      .groupBy(col("model_a"), col("model_b"))
      .agg(
        count(lit(1)).cast("bigint").as("n_common"),
        sum(when(col("__sa") > col("__sb"), 2L)
          .when(col("__sa") === col("__sb"), 1L)
          .otherwise(0L)).cast("bigint").as("w2"))
      .withColumn("win_ppm", expr("(1000000L * w2) div (2L * n_common)"))
      .select("model_a", "model_b", "n_common", "win_ppm")
  }

  /** Poisson(1) inverse-CDF thresholds, scaled 1e6: P(X<=k) for
    * k = 0..5 (floor'd); a uniform draw u in [0, 1e6) maps to the
    * smallest k with u < cdf[k], else 6. */
  private val PoissonCdfMicro = Seq(367879L, 735758L, 919698L, 981011L, 996340L, 999405L)

  private def poissonWeightSql(u: String): String =
    PoissonCdfMicro.zipWithIndex
      .map { case (t, k) => s"WHEN $u < ${t}L THEN ${k}L" }
      .mkString("CASE ", " ", s" ELSE ${PoissonCdfMicro.size}L END")

  /** DuckDB rendering of the same weight CASE (for oracle authors). */
  def poissonWeightDuck(u: String): String =
    PoissonCdfMicro.zipWithIndex
      .map { case (t, k) => s"WHEN $u < $t THEN ${k}::BIGINT" }
      .mkString("CASE ", " ", s" ELSE ${PoissonCdfMicro.size}::BIGINT END")

  /** Per-(row, replicate) deterministic uniform draw in [0, 1e6),
    * derived from an already-computed base hash `h` in [0, P) and the
    * replicate index `b`: fold b into the rolling hash then remix —
    * all mod-P integer ops, overflow-free, identical in any engine. */
  private def uniformSql(h: String, b: String): String = {
    val (ma, mb) = (graft.functions.TextHash.MixA, graft.functions.TextHash.MixB)
    s"((${ma}L * (($h * 31L + $b) % ${P}L) + ${mb}L) % ${P}L) % 1000000L"
  }

  /** Same draw in DuckDB SQL. */
  def uniformDuck(h: String, b: String): String = {
    val (ma, mb) = (graft.functions.TextHash.MixA, graft.functions.TextHash.MixB)
    s"(($ma * (($h * 31 + $b) % $P) + $mb) % $P) % 1000000"
  }

  /** Poisson-bootstrap confidence interval for the MEAN of an integer
    * column, the resampling scheme that actually works on massive
    * data: instead of drawing n rows with replacement (which needs a
    * global sample per replicate), every row independently receives a
    * Poisson(1) weight per replicate — one streaming pass, B partial
    * aggregations, no materialized resamples. Replicate means are
    * `mean_micro = (1e6 * Σ w·x) div Σ w`; the CI is the nearest-rank
    * (ceil(q·B)) order statistic of the B means — lo/med/hi at
    * 2.5% / 50% / 97.5%.
    *
    * Determinism: the per-(row, replicate) weight comes from the
    * repo's portable rolling-hash family over `hashTextCol` (u =
    * remix(h·31 + b) mod P mod 1e6 → Poisson inverse-CDF), so any SQL
    * engine reproduces the exact resamples bit-for-bit.
    *
    * Scale shape: the corpus is read ONCE; the B-fold explode feeds
    * straight into a partial (map-side) aggregation keyed by the
    * replicate index, so the shuffle carries only B rows per task.
    * The final rank-over-B step is a B-row sort on one reducer —
    * B is a constant (default 64).
    */
  def poissonBootstrapCi(df: DataFrame, hashTextCol: String,
                         valueCol: String, reps: Int = 64): DataFrame = {
    require(reps >= 4, "need at least 4 replicates for a 2.5/97.5 CI")
    val h = graft.functions.TextHash.spark.rollingHash(hashTextCol)
    val w = poissonWeightSql(uniformSql("__h", "b"))
    val means = df
      .select(expr(h).as("__h"), col(valueCol).cast("bigint").as("__x"))
      .select(col("__h"), col("__x"),
        explode(expr(s"sequence(0L, ${reps - 1}L)")).as("b"))
      .withColumn("__w", expr(w))
      .groupBy(col("b"))
      .agg(sum(expr("__w * __x")).cast("bigint").as("__s"),
        sum(col("__w")).cast("bigint").as("__n"))
      .withColumn("mean_micro", expr("(1000000L * __s) div nullif(__n, 0L)"))
    val ranked = means.withColumn("__r",
      row_number().over(Window.orderBy(col("mean_micro"), col("b"))))
    def at(q: Double) = math.ceil(q * reps).toLong
    ranked
      .withColumn("stat",
        when(col("__r") === at(0.025), "lo")
          .when(col("__r") === at(0.5), "med")
          .when(col("__r") === at(0.975), "hi"))
      .where(col("stat").isNotNull)
      .select(col("stat"), col("mean_micro"))
  }

  /** Spearman footrule distance per group between two rank orders:
    * rank the rows by `xCol` and by `yCol` (ties take the average
    * rank; kept integer by DOUBLING ranks — avg of ranks r..r+c−1,
    * doubled, is `2r + c − 1`), then `footrule2 = Σ|rx2 − ry2|`, with
    * `footrule_ppm = (1e6 · footrule2) div n²` (the doubled footrule's
    * maximum over n items is exactly n² − (n mod 2), so ppm is
    * normalized to [0, 1e6] up to the odd-n floor). Diaconis–Graham:
    * footrule is within a factor 2 of Kendall distance — the cheap
    * rank-agreement diagnostic next to the exact tau in
    * [[RobustStats.kendallTau]] (which is O(n²) pairs; this is a
    * sort).
    *
    * Scale shape: two rank windows and one aggregation, all shuffled
    * on `groupCol` once — exact in-group ranking's unavoidable shape
    * (same note as [[RobustStats.withCalibratedRank]]): a group too
    * big for one task's sort moves to the
    * [[Sequencing.withGlobalOrdinals]] bucket decomposition per group.
    */
  def spearmanFootrule(df: DataFrame, groupCol: String, xCol: String,
                       yCol: String): DataFrame = {
    def ranks2(c: String, out: String) = {
      val wOrd = Window.partitionBy(col(groupCol)).orderBy(col(c))
      val wTie = Window.partitionBy(col(groupCol), col(c))
      (r: DataFrame) => r.withColumn(out,
        lit(2L) * rank().over(wOrd) + count(lit(1)).over(wTie) - 1L)
    }
    df.transform(ranks2(xCol, "__rx2"))
      .transform(ranks2(yCol, "__ry2"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(abs(col("__rx2") - col("__ry2"))).cast("bigint").as("footrule2"))
      // footrule2 ≤ n² — DECIMAL(38,0) so 10⁶·n² cannot wrap int64
      // for groups past ~3M rows
      .withColumn("footrule_ppm", expr(
        "(cast(1000000 as decimal(38,0)) * footrule2) " +
          "div (cast(n as decimal(38,0)) * n)"))
      .select(col(groupCol), col("n"), col("footrule2"), col("footrule_ppm"))
  }

  /** Two-proportion z² statistic (the square of the pooled two-sample
    * z test — z² is χ²(1), so z² ≥ 3.84 is the familiar p < 0.05),
    * kept fully rational: with arm counts (n₁, c₁), (n₂, c₂),
    * N = n₁+n₂, C = c₁+c₂,
    * `z² = (c₁n₂ − c₂n₁)² · N / (n₁ n₂ C (N − C))`,
    * emitted micro-scaled through DECIMAL(38,0) floor division.
    * One row: per-arm counts, per-arm rate_ppm, and z2_micro.
    *
    * Scale shape: a single full-pass conditional aggregation (two
    * arms folded map-side); the final arithmetic runs on one 1-row
    * frame. Nothing shuffles but two partial-agg rows per task.
    */
  def abZSquared(df: DataFrame, armACond: org.apache.spark.sql.Column,
                 convCond: org.apache.spark.sql.Column): DataFrame =
    df.agg(
      sum(when(armACond, 1L).otherwise(0L)).cast("bigint").as("n_a"),
      sum(when(!armACond, 1L).otherwise(0L)).cast("bigint").as("n_b"),
      sum(when(armACond && convCond, 1L).otherwise(0L)).cast("bigint").as("conv_a"),
      sum(when(!armACond && convCond, 1L).otherwise(0L)).cast("bigint").as("conv_b"))
      .withColumn("rate_a_ppm", expr("(1000000L * conv_a) div n_a"))
      .withColumn("rate_b_ppm", expr("(1000000L * conv_b) div n_b"))
      .withColumn("z2_micro", expr(
        "CAST((CAST(1000000 AS DECIMAL(38,0)) * (conv_a*n_b - conv_b*n_a) * (conv_a*n_b - conv_b*n_a) * (n_a + n_b)) div " +
          "(CAST(n_a AS DECIMAL(38,0)) * n_b * nullif(conv_a + conv_b, 0L) * " +
          "nullif(n_a + n_b - conv_a - conv_b, 0L)) AS BIGINT)"))
      .select("n_a", "n_b", "conv_a", "conv_b", "rate_a_ppm", "rate_b_ppm", "z2_micro")

  /** Copeland ranking from per-(model, item) scores: model `a` "beats"
    * model `b` when it wins on MORE common items than it loses
    * (majority of head-to-head comparisons), and the Copeland score
    * is 2·pairwise-wins + pairwise-ties — the voting-theory
    * aggregate that, unlike [[winRateMatrix]]'s per-pair rates,
    * produces one total order over models and is immune to a single
    * lopsided opponent dominating the average. Model pairs with no
    * common items simply contribute nothing (both engines agree).
    *
    * Scale shape: one item-keyed self-join (the same shuffle as
    * [[winRateMatrix]]) → a models²-bounded pair aggregate → a
    * models-bounded final aggregate; everything after the join is
    * dimension-sized. */
  def copelandScores(df: DataFrame, modelCol: String, itemCol: String,
                     scoreCol: String): DataFrame = {
    val s = df.select(col(modelCol).as("__m"), col(itemCol).as("__i"),
      col(scoreCol).cast("bigint").as("__sc"))
    val b = s.select(col("__m").as("__mb"), col("__i"),
      col("__sc").as("__scb"))
    val pairAdv = s.join(b, Seq("__i"))
      .where(col("__m") =!= col("__mb"))
      .groupBy(col("__m"), col("__mb"))
      .agg(sum(when(col("__sc") > col("__scb"), 1L)
        .when(col("__sc") < col("__scb"), -1L)
        .otherwise(0L)).as("__adv"))
    pairAdv.groupBy(col("__m").as("model"))
      .agg(
        sum(when(col("__adv") > 0, 1L).otherwise(0L)).cast("bigint").as("wins"),
        sum(when(col("__adv") === 0, 1L).otherwise(0L)).cast("bigint").as("ties"),
        sum(when(col("__adv") < 0, 1L).otherwise(0L)).cast("bigint").as("losses"))
      .withColumn("copeland2", (lit(2L) * col("wins") + col("ties")).cast("bigint"))
  }

  /** Calibration reliability bins: partition a ppm-scaled model score
    * into `bins` equal-width buckets and compare the mean CLAIMED
    * probability against the OBSERVED positive rate per bin — the
    * reliability-diagram table (plus the signed gap, which is the
    * per-bin calibration error a temperature-scaling pass would
    * shrink). All arithmetic exact: mean score and rate are truncated
    * ppm divisions of non-negative sums; the gap is a subtraction of
    * those two already-truncated values, so no sign-split is needed.
    *
    * Scale shape: ONE aggregation keyed on the bin ordinal (≤ `bins`
    * groups, map-side combined) — the cheapest possible shape; no
    * window, no join. */
  def reliabilityBins(df: DataFrame, scorePpmCol: String,
                      labelCond: org.apache.spark.sql.Column,
                      bins: Int = 10): DataFrame = {
    require(bins >= 2, "need at least 2 bins")
    df.select(
      expr(s"least(CAST(${bins - 1} AS BIGINT), " +
        s"(greatest(0L, CAST($scorePpmCol AS BIGINT)) * $bins) div 1000000)")
        .cast("bigint").as("bin"),
      col(scorePpmCol).cast("bigint").as("__s"),
      when(labelCond, 1L).otherwise(0L).as("__y"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).cast("bigint").as("n"),
        sum(col("__s")).as("__ss"),
        sum(col("__y")).as("__sy"))
      .select(
        col("bin"),
        col("n"),
        expr("__ss div n").cast("bigint").as("mean_score_ppm"),
        expr("(1000000L * __sy) div n").cast("bigint").as("rate_ppm"))
      .withColumn("gap_ppm",
        (col("mean_score_ppm") - col("rate_ppm")).cast("bigint"))
      .orderBy("bin")
  }

  /** McNemar's paired test for two classifiers evaluated on the SAME
    * examples: only the discordant pairs carry signal — `b` = A right
    * where B is wrong, `c` = B right where A is wrong, statistic
    * `(b−c)²/(b+c)` (χ², 1 df), emitted milli-scaled exact
    * (`1000·(b−c)² div (b+c)`; the square kills the sign, so plain
    * truncated division is already engine-portable). NULL when there
    * are no discordant pairs (no evidence either way).
    *
    * Scale shape: one scalar aggregation, map-side combined. */
  def mcnemar(df: DataFrame, predACond: org.apache.spark.sql.Column,
              predBCond: org.apache.spark.sql.Column,
              labelCond: org.apache.spark.sql.Column): DataFrame =
    df.select(
      (predACond === labelCond).as("__ra"),
      (predBCond === labelCond).as("__rb"))
      .agg(
        count(lit(1)).cast("bigint").as("n"),
        sum(when(col("__ra") && !col("__rb"), 1L).otherwise(0L))
          .cast("bigint").as("b"),
        sum(when(!col("__ra") && col("__rb"), 1L).otherwise(0L))
          .cast("bigint").as("c"))
      .withColumn("mcnemar_milli", expr(
        "CAST((1000 * (b - c) * (b - c)) div nullif(b + c, 0L) AS BIGINT)"))

  /** Jackknife leave-one-out sensitivity of a per-group mean: how far
    * can the group mean move if any single observation is dropped?
    * The extreme LOO means are reached by dropping the max (downward)
    * and the min (upward), so min/max/sum/count aggregates suffice —
    * no per-row re-aggregation, which is what makes the jackknife
    * feasible at corpus scale. Emitted milli-scaled exact with
    * sign-split truncated division (values may be negative);
    * `influence_span_milli` = loo_max − loo_mean_min bounds any
    * single row's leverage on the reported mean (the robustness
    * red-flag for metric gaming: one outlier document moving a
    * source-level quality mean). Groups with n < 2 yield NULL bounds.
    *
    * Scale shape: ONE aggregation keyed on the group columns —
    * min/max/sum/count are all map-side combined. */
  def jackknifeMeanBounds(df: DataFrame, groupCols: Seq[String],
                          valueCol: String): DataFrame = {
    def sdiv(num: String, den: String) =
      s"CASE WHEN $num < 0 THEN -CAST((-($num)) div ($den) AS BIGINT) " +
        s"ELSE CAST(($num) div ($den) AS BIGINT) END"
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).cast("bigint").as("n"),
        sum(col(valueCol).cast("decimal(38,0)")).as("__s"),
        min(col(valueCol).cast("bigint")).as("__mn"),
        max(col(valueCol).cast("bigint")).as("__mx"))
      .withColumn("mean_milli", expr(sdiv("1000 * __s", "n")))
      .withColumn("loo_min_milli", expr(
        s"CASE WHEN n < 2 THEN NULL ELSE ${sdiv("1000 * (__s - __mx)", "n - 1")} END"))
      .withColumn("loo_max_milli", expr(
        s"CASE WHEN n < 2 THEN NULL ELSE ${sdiv("1000 * (__s - __mn)", "n - 1")} END"))
      .withColumn("influence_span_milli",
        (col("loo_max_milli") - col("loo_min_milli")).cast("bigint"))
      .drop("__s", "__mn", "__mx")
  }

  /** Mann–Whitney U rank-sum test between two arms — the
    * distribution-free "did arm A's values shift up vs arm B"
    * comparison (the nonparametric counterpart of [[abZSquared]],
    * which only compares pass RATES). Emitted as EXACT integers: all
    * rank quantities are doubled so midpoint tie-ranks stay integral
    * (`u2_a` = 2·U_A, `u2_b` = 2·U_B; `u2_a + u2_b = 2·n_a·n_b`
    * always), plus the tie-correction term `tie_term = Σ(t³−t)`
    * needed for the variance — the caller can form
    * z = (U_A − n_a·n_b/2) / sqrt(var) downstream; keeping sqrt out
    * of the witness keeps it bitwise-comparable cross-engine. Also
    * emits Cliff's delta — the U test's effect size,
    * `δ = (#(a>b) − #(a<b)) / (n_a·n_b) = (u2_a − u2_b)/(2·n_a·n_b)`
    * — as sign-split exact ppm (+1e6 = complete separation upward).
    *
    * Ranks come from the VALUE-GROUPED frame: per distinct value,
    * `t` = tie count and `c_lt` = rows strictly below, so each arm-A
    * row at that value carries double-rank `2·c_lt + t + 1` (twice
    * the midpoint rank). `c_lt` is the bucket-decomposed running
    * total ([[Sequencing.runningTotalsBefore]]) over distinct values
    * — no single-reducer window; the cumulative frame's size is the
    * VALUE cardinality, not the corpus.
    *
    * Scale shape: one groupBy on the value (map-side combined), a
    * quantile-bucketed prefix sum over the distinct-value frame, one
    * scalar aggregation. Sums accumulate in DECIMAL(38,0); per-value
    * products are formed in BIGINT, which bounds the safe corpus at
    * ~3·10⁹ rows per call (na·2·rank ≲ 2n² < 2⁶³) — shard larger
    * corpora by stratum and merge the per-stratum integer components
    * (they are plain sums, hence mergeable).
    */
  def mannWhitneyU(df: DataFrame, armACond: org.apache.spark.sql.Column,
                   valueCol: String, buckets: Int = 32): DataFrame = {
    val g = df.select(
        col(valueCol).cast("bigint").as("__v"),
        when(armACond, 1L).otherwise(0L).as("__a"))
      .groupBy(col("__v"))
      .agg(sum(col("__a")).cast("bigint").as("__na"),
        count(lit(1)).cast("bigint").as("__t"))
    val (cum, _) = Sequencing.runningTotalsBefore(
      g, "__v", "__v", Seq("__t"), buckets, "mannWhitneyU")
    cum.agg(
        sum(col("__na").cast("decimal(38,0)")).as("__sa"),
        sum((col("__t") - col("__na")).cast("decimal(38,0)")).as("__sb"),
        sum((col("__na") * (lit(2L) * col("__cum___t") + col("__t") + lit(1L)))
          .cast("decimal(38,0)")).as("__r12"),
        sum((col("__t") * col("__t") * col("__t") - col("__t"))
          .cast("decimal(38,0)")).as("__tie"))
      .select(
        col("__sa").cast("bigint").as("n_a"),
        col("__sb").cast("bigint").as("n_b"),
        (col("__r12") - col("__sa") * (col("__sa") + lit(1L)))
          .cast("bigint").as("u2_a"),
        (lit(2L) * col("__sa") * col("__sb")
          - (col("__r12") - col("__sa") * (col("__sa") + lit(1L))))
          .cast("bigint").as("u2_b"),
        col("__tie").cast("bigint").as("tie_term"))
      // 10⁶·(u2 diff) reaches 2·10⁶·n_a·n_b — DECIMAL(38,0), since
      // int64 would wrap once the arm product passes ~4.6e12 (~2M×2M)
      .withColumn("cliffs_delta_ppm", expr(
        "CASE WHEN n_a = 0 OR n_b = 0 THEN NULL " +
          "WHEN u2_a < u2_b THEN " +
          "-CAST((cast(1000000 as decimal(38,0)) * (u2_b - u2_a)) " +
          "div (cast(2 as decimal(38,0)) * n_a * n_b) AS BIGINT) " +
          "ELSE CAST((cast(1000000 as decimal(38,0)) * (u2_a - u2_b)) " +
          "div (cast(2 as decimal(38,0)) * n_a * n_b) AS BIGINT) END"))
  }

  /** AUC with DeLong confidence interval, EXACT: the ROC AUC as the
    * rational `U₂/(2·n₊·n₋)` (doubled Mann–Whitney counts — ties at
    * half, q318's convention) and the DeLong (1988) standard error
    * from the placement-value variances, which collapse to pure
    * integer VALUE-GROUP aggregates: for score group v with a_v
    * positives, b_v negatives, doubled placements `c_v = 2·B₍<v₎ +
    * b_v` (per positive) and `d_v = 2·A₍>v₎ + a_v` (per negative),
    *
    *   Var·(2n₊n₋)² = (n₊Σa_vc_v² − U₂²)/(n₊−1)
    *               + (n₋Σb_vd_v² − U₂²)/(n₋−1)
    *
    * so `se_micro = isqrt((10¹²·num) div den) div (2n₊n₋)` via the
    * [[graft.util.ExactMath]] ladder, and the 95% CI uses the exact
    * rational 1.96 = 49/25. One output row: `(n_pos, n_neg,
    * auc_micro, se_micro, ci_lo_micro, ci_hi_micro)`; se/CI NULL
    * when either class has < 2 members.
    *
    * Scale shape (100 TB): one value-keyed aggregation, the
    * [[Sequencing.runningTotalsBefore]] bucket decomposition for the
    * strictly-below cumulative (never a single-reducer window), one
    * scalar aggregate. DECIMAL(38,0) holds the variance numerator
    * through ~10⁵ rows per class; subsample beyond. */
  def aucDeLong(df: DataFrame, scoreCol: String, posCol: String,
                buckets: Int = 32): DataFrame = {
    val g = df.select(col(scoreCol).cast("bigint").as("__v"),
        when(col(posCol).cast("boolean"), 1L).otherwise(0L).as("__p"))
      .groupBy(col("__v"))
      .agg(sum(col("__p")).cast("bigint").as("__na"),
        count(lit(1)).cast("bigint").as("__t"))
      .withColumn("__nb", col("__t") - col("__na"))
    val (cum, totals) = Sequencing.runningTotalsBefore(
      g, "__v", "__v", Seq("__nb", "__na"), buckets, "aucDeLong")
    val nA = totals("__na")
    val d1 = "cast(1 as decimal(38,0))"
    cum
      .agg(
        sum(col("__na").cast("decimal(38,0)")).as("__sa"),
        sum(col("__nb").cast("decimal(38,0)")).as("__sb"),
        sum(expr(s"$d1 * __na * (2L * __cum___nb + __nb)")).as("__u2"),
        sum(expr(s"$d1 * __na * (2L * __cum___nb + __nb) " +
          "* (2L * __cum___nb + __nb)")).as("__sc2"),
        sum(expr(s"$d1 * __nb * (2L * (${nA}L - __cum___na - __na) + __na) " +
          s"* (2L * (${nA}L - __cum___na - __na) + __na)")).as("__sd2"))
      // exact floor division in DECIMAL: (a - a % b) / b — Spark's
      // `div` would route the quotient through BIGINT (overflows
      // here) and a decimal CAST rounds half-up instead of flooring
      .withColumn("__num", expr(
        s"cast(1000000 as decimal(38,0)) * 1000000 * " +
          "((__sa * __sc2 - __u2 * __u2) * (__sb - 1) " +
          "+ (__sb * __sd2 - __u2 * __u2) * (__sa - 1))"))
      .withColumn("__den", expr("nullif((__sa - 1) * (__sb - 1), 0)"))
      .withColumn("__x", expr("(__num - __num % __den) / __den"))
      .transform(graft.util.ExactMath.withIsqrt(_, "__x", "__rt"))
      .select(
        col("__sa").cast("bigint").as("n_pos"),
        col("__sb").cast("bigint").as("n_neg"),
        expr(s"CASE WHEN __sa = 0 OR __sb = 0 THEN NULL ELSE " +
          s"(cast(1000000 as decimal(38,0)) * __u2) div (2 * __sa * __sb) END")
          .cast("bigint").as("auc_micro"),
        expr("CASE WHEN __sa < 2 OR __sb < 2 THEN NULL ELSE " +
          "__rt div (2 * __sa * __sb) END").cast("bigint").as("se_micro"))
      .withColumn("ci_lo_micro",
        expr("auc_micro - (49L * se_micro) div 25L").cast("bigint"))
      .withColumn("ci_hi_micro",
        expr("auc_micro + (49L * se_micro) div 25L").cast("bigint"))
  }

  /** Mantel–Haenszel pooled odds ratio across strata — the
    * confounder-adjusted effect estimate for a 2×2×K design (arm ×
    * outcome × stratum), next to the CRUDE odds ratio so Simpson-
    * paradox reversals are visible in one row. EXACT:
    * `OR_MH = Σᵢ aᵢdᵢ/nᵢ ÷ Σᵢ bᵢcᵢ/nᵢ` is evaluated over the common
    * denominator `Πnᵢ` — each term scales by the exact integer
    * `Πn div nᵢ` — in DECIMAL(38,0), floored to micro only at the
    * end. Output: `(n_strata, or_crude_micro, or_mh_micro)`; NULL
    * when a denominator is zero.
    *
    * Scale shape (100 TB): one map-side-combinable 4-cell count per
    * stratum; the fold runs over the collected K-row stratum array
    * on a single row (K is a dimension). `Πnᵢ` must fit
    * DECIMAL(38,0): fine for e.g. K ≤ 5 strata of ≤ 10⁷ rows each —
    * subsample strata counts proportionally beyond that. */
  def mantelHaenszel(df: DataFrame, stratumCol: String, armCol: String,
                     outcomeCol: String): DataFrame = {
    val cells = df.select(col(stratumCol).as("__st"),
        col(armCol).cast("boolean").as("__e"),
        col(outcomeCol).cast("boolean").as("__o"))
      .groupBy(col("__st"))
      .agg(
        sum(when(col("__e") && col("__o"), 1L).otherwise(0L)).as("a"),
        sum(when(col("__e") && !col("__o"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("__e") && col("__o"), 1L).otherwise(0L)).as("c"),
        sum(when(!col("__e") && !col("__o"), 1L).otherwise(0L)).as("d"))
      .withColumn("n", expr("a + b + c + d"))
      .where(col("n") > 0)
    val d1 = "cast(1 as decimal(38,0))"
    cells
      .agg(sort_array(collect_list(struct(col("__st").cast("string").as("s"),
        col("a"), col("b"), col("c"), col("d"), col("n")))).as("st"))
      // Π_{j≠i} n_j via prefix × suffix product arrays — stays in
      // DECIMAL throughout (a Πn div nᵢ integral-divide would route
      // through BIGINT and overflow long before DECIMAL(38,0) does)
      .withColumn("__pre", expr(
        s"transform(sequence(0, size(st)), k -> " +
          s"aggregate(slice(st, 1, k), $d1, (p, e) -> p * e.n))"))
      .withColumn("__suf", expr(
        s"transform(sequence(0, size(st)), k -> " +
          s"aggregate(slice(st, size(st) - k + 1, k), $d1, (p, e) -> p * e.n))"))
      .withColumn("__num", expr(
        s"aggregate(sequence(1, size(st)), $d1 - 1, (s, i) -> " +
          s"s + ($d1 * element_at(st, i).a * element_at(st, i).d) " +
          "* element_at(__pre, i) * element_at(__suf, size(st) - i + 1))"))
      .withColumn("__den", expr(
        s"aggregate(sequence(1, size(st)), $d1 - 1, (s, i) -> " +
          s"s + ($d1 * element_at(st, i).b * element_at(st, i).c) " +
          "* element_at(__pre, i) * element_at(__suf, size(st) - i + 1))"))
      .withColumn("__ta", expr("aggregate(st, 0L, (s, e) -> s + e.a)"))
      .withColumn("__tb", expr("aggregate(st, 0L, (s, e) -> s + e.b)"))
      .withColumn("__tc", expr("aggregate(st, 0L, (s, e) -> s + e.c)"))
      .withColumn("__td", expr("aggregate(st, 0L, (s, e) -> s + e.d)"))
      .select(
        expr("size(st)").cast("bigint").as("n_strata"),
        expr(s"CASE WHEN __tb * __tc = 0 THEN NULL ELSE " +
          s"(cast(1000000 as decimal(38,0)) * __ta * __td) div ($d1 * __tb * __tc) END")
          .cast("bigint").as("or_crude_micro"),
        expr("CASE WHEN __den <= 0 THEN NULL ELSE " +
          "(cast(1000000 as decimal(38,0)) * __num) div __den END")
          .cast("bigint").as("or_mh_micro"))
  }

  /** Distribution-free (order-statistic) confidence interval for the
    * per-entity MEDIAN of bucket totals: ranks `l` and `n+1−l` with
    * `l = max{k : 40·P[Binom(n,½) ≤ k−1] ≤ 2ⁿ·(1/40·40)}` — i.e. the
    * exact binomial 95% bracket (α/2 = 1/40 per side, compared as
    * `40·Σ_{i<k} C(n,i) ≤ 2ⁿ` — pure integers, no approximation).
    * Emits the bracket values, the nearest-rank median, and the
    * achieved coverage `(10⁶·(2ⁿ − 2S)) div 2ⁿ` ppm. Entities with
    * n < 6 have no valid 95% bracket (l = 0): bounds and coverage
    * are NULL, the median still reports.
    *
    * Scale shape (100 TB): one (entity, bucket) pre-aggregation, one
    * entity-keyed rank window, and O(n³) integer fold work per
    * ENTITY ROW with n calendar-bounded (≤ span buckets; SQL div's
    * BIGINT quotient caps n at 66 — wider spans raise loudly,
    * coarsen the bucket unit). Entities scale out. */
  def medianCI(df: DataFrame, entityCol: String, bucketCol: String,
               valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "cast(1 as decimal(38,0))"
    def coef(n: String, i: String) =
      s"CASE WHEN $i = 0 THEN $d38 ELSE aggregate(sequence(1L, $i), $d38, " +
        s"(c, j) -> cast((c * ($n - j + 1)) div j as decimal(38,0))) END"
    def prefix(n: String, k: String) =
      s"CASE WHEN $k < 0 THEN $d38 - 1 ELSE aggregate(sequence(0L, $k), " +
        s"$d38 - 1, (s, i) -> s + ${coef(n, "i")}) END"
    def pow2(n: String) =
      s"CASE WHEN $n = 0 THEN $d38 ELSE aggregate(sequence(1L, $n), $d38, " +
        "(p, z) -> p * 2) END"
    val daily = df
      .select(col(entityCol).as("entity"),
        col(bucketCol).cast("bigint").as("__b"),
        col(valueCol).cast("bigint").as("__v"))
      .groupBy(col("entity"), col("__b")).agg(sum(col("__v")).as("__y"))
    val ranked = daily
      .withColumn("__rn",
        row_number().over(Window.partitionBy(col("entity")).orderBy(col("__y"))))
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy(col("entity"))))
    val stats = ranked.select(col("entity"), col("__n")).distinct()
      // same BIGINT-quotient line as signTest: the binomial fold's
      // `div` wraps silently past C(67,33) — refuse loudly instead
      .withColumn("__n", expr(
        "CASE WHEN __n > 66 THEN cast(raise_error(" +
          "'medianCI: entity spans more than 66 buckets — the exact " +
          "binomial quotients overflow BIGINT; coarsen the bucket " +
          "unit') as bigint) ELSE __n END"))
      .withColumn("__l", expr(
        "aggregate(sequence(1L, (__n + 1L) div 2L), 0L, (best, k) -> " +
          s"CASE WHEN 40 * ${prefix("__n", "(k - 1)")} <= ${pow2("__n")} " +
          "THEN k ELSE best END)"))
      .withColumn("conf_ppm", expr(
        s"CASE WHEN __l = 0 THEN NULL ELSE cast((cast(1000000 as decimal(38,0)) * " +
          s"(${pow2("__n")} - 2 * ${prefix("__n", "(__l - 1)")})) " +
          s"div ${pow2("__n")} as bigint) END"))
    ranked.join(stats.select(col("entity"), col("__l"), col("conf_ppm")),
        Seq("entity"))
      .groupBy(col("entity"))
      .agg(
        max(col("__n")).cast("bigint").as("n_days"),
        max(when(col("__rn") === col("__l") && col("__l") > 0, col("__y")))
          .as("lo"),
        max(when(col("__rn") === expr("(__n + 1L) div 2L"), col("__y")))
          .as("median"),
        max(when(col("__rn") === col("__n") + 1 - col("__l")
          && col("__l") > 0, col("__y"))).as("hi"),
        max(col("conf_ppm")).as("conf_ppm"))
  }

  /** Difference-in-differences estimate, EXACT: for a 2×2 design
    * (arm × pre/post), the causal workhorse
    * `dd = (ȳ_{A,post} − ȳ_{A,pre}) − (ȳ_{B,post} − ȳ_{B,pre})`
    * computed as ONE rational over the common denominator
    * `n_{A,post}·n_{A,pre}·n_{B,post}·n_{B,pre}` in DECIMAL(38,0),
    * floored to the value column's own unit only at the end
    * (sign-split — graft division discipline). The four cell means
    * are also emitted individually (each floored) for inspection;
    * the dd is NOT derived from those rounded means. NULL if any
    * cell is empty.
    *
    * Scale shape (100 TB): one map-side-combinable 4-cell aggregate;
    * the rational arithmetic runs on a single row. Cell sums ×
    * cubed counts must fit DECIMAL(38,0) — fine through ~10⁹ rows of
    * ~10⁹-unit values per cell. */
  def diffInDiff(df: DataFrame, armCol: String, postCol: String,
                 valueCol: String): DataFrame = {
    val cells = df.select(
        col(armCol).cast("boolean").as("__a"),
        col(postCol).cast("boolean").as("__p"),
        col(valueCol).cast("bigint").as("__v"))
      .groupBy(col("__a"), col("__p"))
      .agg(count(lit(1)).cast("bigint").as("__n"), sum(col("__v")).as("__s"))
      .agg(
        sum(when(col("__a") && col("__p"), col("__n"))).as("n_a_post"),
        sum(when(col("__a") && col("__p"), col("__s"))).as("__s_ap"),
        sum(when(col("__a") && !col("__p"), col("__n"))).as("n_a_pre"),
        sum(when(col("__a") && !col("__p"), col("__s"))).as("__s_aq"),
        sum(when(!col("__a") && col("__p"), col("__n"))).as("n_b_post"),
        sum(when(!col("__a") && col("__p"), col("__s"))).as("__s_bp"),
        sum(when(!col("__a") && !col("__p"), col("__n"))).as("n_b_pre"),
        sum(when(!col("__a") && !col("__p"), col("__s"))).as("__s_bq"))
    val d = "cast(1 as decimal(38,0))"
    cells
      .withColumn("__num", expr(
        s"$d * __s_ap * n_a_pre * n_b_post * n_b_pre " +
          s"- $d * __s_aq * n_a_post * n_b_post * n_b_pre " +
          s"- $d * __s_bp * n_a_post * n_a_pre * n_b_pre " +
          s"+ $d * __s_bq * n_a_post * n_a_pre * n_b_post"))
      .withColumn("__den", expr(
        s"$d * n_a_post * n_a_pre * n_b_post * n_b_pre"))
      .select(
        col("n_a_post"), col("n_a_pre"), col("n_b_post"), col("n_b_pre"),
        expr("__s_ap div n_a_post").cast("bigint").as("mean_a_post"),
        expr("__s_aq div n_a_pre").cast("bigint").as("mean_a_pre"),
        expr("__s_bp div n_b_post").cast("bigint").as("mean_b_post"),
        expr("__s_bq div n_b_pre").cast("bigint").as("mean_b_pre"),
        expr("CASE WHEN n_a_post IS NULL OR n_a_pre IS NULL " +
          "OR n_b_post IS NULL OR n_b_pre IS NULL THEN NULL " +
          "WHEN __num >= 0 THEN __num div __den " +
          "ELSE -((-__num) div __den) END").cast("bigint").as("dd"))
  }

  /** EXACT one-sided binomial sign test per entity: across an
    * entity's consecutive ACTIVE buckets, count value increases `k`
    * out of `n` non-tie changes and report the exact tail
    * probability `P[Binom(n, 1/2) ≥ k] = Σ_{i≥k} C(n,i) / 2ⁿ` in ppm
    * (floored). Small p = the entity's metric is drifting UP beyond
    * coin-flip chance. No normal approximation anywhere: binomials
    * come from the integer-exact multiplicative fold
    * `C(n,j) = C(n,j−1)·(n−j+1)/j` (each partial IS a binomial, so
    * the division is exact), summed and divided in DECIMAL(38,0).
    * Ties contribute nothing (the standard sign-test treatment);
    * `n = 0` reports p = 10⁶.
    *
    * Scale shape (100 TB): one (entity, bucket) pre-aggregation, one
    * entity-keyed lag window, one entity-keyed count — then the
    * binomial tail is O(n) integer ops per ENTITY ROW: C(n,k) once
    * via the multiplicative fold, then each next term by the SAME
    * exact recurrence C(n,i) = C(n,i−1)·(n−i+1)/i carried as running
    * state (never per-term from scratch). n is calendar-bounded
    * (≤ span buckets); the binding arithmetic limit is SQL `div`,
    * whose quotient is a BIGINT that silently wraps past 2⁶³ even
    * under ANSI — every intermediate C(n,j) walks through the
    * central binomial, and C(67,33) is the first to overflow — so
    * spans past 66 changed buckets raise loudly (coarsen the bucket
    * unit) instead of returning silently wrong values. Entities
    * scale out. */
  def signTest(df: DataFrame, entityCol: String, bucketCol: String,
               valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = df
      .select(col(entityCol).as("entity"), col(bucketCol).cast("bigint").as("__b"),
        col(valueCol).cast("bigint").as("__v"))
      .groupBy(col("entity"), col("__b")).agg(sum(col("__v")).as("__y"))
    val w = Window.partitionBy(col("entity")).orderBy(col("__b"))
    val d38 = "cast(1 as decimal(38,0))"
    // C(n_changes, n_up), exact: every prefix of the fold is itself a
    // binomial, so each `div` is exact.
    val c0 = s"CASE WHEN n_up = 0 THEN $d38 ELSE " +
      s"aggregate(sequence(1L, n_up), $d38, " +
      "(c, j) -> cast((c * (n_changes - j + 1)) div j as decimal(38,0))) END"
    // Tail Σ_{i≥n_up} C(n,i): start at __c0 and walk i upward with the
    // running-coefficient recurrence — the duplicated div in the two
    // struct fields is the price of a single O(n) pass.
    val step = "cast((a.c * (n_changes - i + 1)) div i as decimal(38,0))"
    val tail = "CASE WHEN n_up >= n_changes THEN __c0 ELSE " +
      "aggregate(sequence(n_up + 1L, n_changes), " +
      "named_struct('c', __c0, 's', __c0), " +
      s"(a, i) -> named_struct('c', $step, " +
      s"'s', cast(a.s + $step as decimal(38,0))), a -> a.s) END"
    daily
      .withColumn("__prev", lag(col("__y"), 1).over(w))
      .where(col("__prev").isNotNull && col("__y") =!= col("__prev"))
      .groupBy(col("entity"))
      .agg(count(lit(1)).cast("bigint").as("n_changes"),
        sum(when(col("__y") > col("__prev"), 1L).otherwise(0L))
          .cast("bigint").as("n_up"))
      .withColumn("__c0", expr(c0))
      .withColumn("p_up_ppm", expr(
        // SQL div truncates its quotient to BIGINT and WRAPS silently
        // past 2^63 (ANSI included — verified empirically): the
        // binomial recurrences walk through C(n, n/2), so n = 67 is
        // the first silently-wrong span. Refuse loudly at the line.
        "CASE WHEN n_changes > 66 THEN cast(raise_error(" +
          "'signTest: entity spans more than 66 changed buckets — " +
          "the exact binomial quotients overflow BIGINT; coarsen " +
          "the bucket unit') as bigint) " +
          "WHEN n_changes = 0 THEN 1000000L ELSE cast(" +
          s"(cast(1000000 as decimal(38,0)) * ($tail)) " +
          s"div aggregate(sequence(1L, n_changes), $d38, (p, z) -> p * 2) " +
          "as bigint) END"))
      .drop("__c0")
  }

  /** Benjamini–Hochberg step-up FDR correction over a family of
    * per-test p-values (ppm): rank tests by ascending p, find the
    * largest rank `i*` with `p_i · m ≤ q · i` (EXACT integer
    * comparison — no division), and reject every rank ≤ i*. Emits
    * `(id, rank, p_ppm, thresh_ppm, rejected)` with `thresh_ppm =
    * (q·rank) div m` for inspection. This is the multiple-testing
    * gate you run over per-slice drift tests before alerting.
    *
    * Scale shape (100 TB): the input is one row per TEST — a
    * dimension frame, not data — so the single global rank window
    * and the broadcast `i*` scalar are bounded by the test-family
    * size, never by corpus volume. */
  def bhAdjust(df: DataFrame, idCol: String, pCol: String,
               qPpm: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qPpm > 0 && qPpm <= 1000000L, "qPpm must be in (0, 1e6]")
    val x = df.select(col(idCol).as("id"), col(pCol).cast("bigint").as("p_ppm"))
    val m = x.agg(count(lit(1)).cast("bigint").as("__m"))
    val ranked = x.crossJoin(broadcast(m))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("p_ppm"), col("id"))).cast("bigint"))
      .withColumn("__ok", col("p_ppm") * col("__m") <= lit(qPpm) * col("rank"))
    val istar = ranked.where(col("__ok"))
      .agg(coalesce(max(col("rank")), lit(0L)).as("__istar"))
    ranked.crossJoin(broadcast(istar))
      .select(col("id"), col("rank"), col("p_ppm"),
        expr(s"(${qPpm}L * rank) div __m").cast("bigint").as("thresh_ppm"),
        (col("rank") <= col("__istar")).as("rejected"))
  }

  /** Wilson score interval per group — the proportion CI that stays
    * inside [0,1] and behaves at small n (what you quote for per-slice
    * pass rates instead of the Wald interval). Computed EXACTLY in
    * integer arithmetic: with `Z2M = z²·10⁶`, the bounds are
    *
    *   (2·10⁶·n·s + n·Z2M ± isqrt(Z2M·(4·n·s·(n−s)·10⁶ + n²·Z2M)))
    *     · 10⁶ / (2n·(10⁶·n + Z2M))
    *
    * where `isqrt` is the exact integer square root: seeded from the
    * IEEE double sqrt (correctly rounded, so deterministic across
    * engines and within ±2 of truth even after the >2⁵³ cast error)
    * and pinned by two down- and two up-corrections against exact
    * DECIMAL squaring. All operands non-negative, so floor =
    * truncate on both engines. Default `z2Micro` = 3 841 600 =
    * 1.96² · 10⁶ (the 95% interval).
    *
    * Scale shape (100 TB): one map-side-combinable count/sum per
    * group; the sqrt chain runs on the group-cardinality frame only.
    * Inner products stay within DECIMAL(38,0) up to ~10⁹-row groups. */
  def wilsonBounds(df: DataFrame, groupCol: String, successCol: String,
                   z2Micro: Long = 3841600L): DataFrame = {
    require(z2Micro > 0, "z2Micro must be positive")
    val d38 = "decimal(38,0)"
    df.select(col(groupCol).as("grp"),
        when(col(successCol).cast("boolean"), 1L).otherwise(0L).as("__y"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(col("__y")).cast("bigint").as("successes"))
      .withColumn("__x", expr(
        s"cast($z2Micro as $d38) * (cast(4 as $d38) * n * successes * " +
          s"(n - successes) * 1000000 + cast(n as $d38) * n * $z2Micro)"))
      .transform(graft.util.ExactMath.withIsqrt(_, "__x", "__rt"))
      .withColumn("__den", expr(
        s"cast(2 as $d38) * n * (cast(1000000 as $d38) * n + $z2Micro)"))
      .withColumn("__ctr", expr(
        s"cast(2000000 as $d38) * n * successes + cast(n as $d38) * $z2Micro"))
      .select(col("grp"), col("n"), col("successes"),
        expr("(1000000L * successes) div n").cast("bigint").as("rate_ppm"),
        expr("(cast(1000000 as decimal(38,0)) * (__ctr - __rt)) div __den")
          .cast("bigint").as("wilson_lo_ppm"),
        expr("(cast(1000000 as decimal(38,0)) * (__ctr + __rt)) div __den")
          .cast("bigint").as("wilson_hi_ppm"))
  }

  /** Split-conformal calibration per group: from a CALIBRATION slice,
    * learn a center (the nearest-rank median) and the conformal
    * quantile `q̂` = the `⌈(1−α)(n_cal+1)⌉`-th smallest absolute
    * nonconformity; then measure on the TEST slice the fraction of
    * values landing inside `center ± q̂` — which the conformal
    * guarantee says is ≥ 1−α on exchangeable data. Everything is
    * nearest-rank on integer values, so both renderings are exact.
    * When `⌈(1−α)(n_cal+1)⌉ > n_cal` the finite-sample bound is
    * vacuous (`q̂ = ∞`): q̂ is NULL and coverage 10⁶ by convention.
    *
    * Scale shape (100 TB): two group-keyed rank windows (median and
    * q̂) on the calibration slice and one keyed join + aggregate on
    * the test slice — all partitioned by group; no global ordering
    * anywhere. The rank windows sort whole groups of the CALIBRATION
    * slice in one task each: calibration is a sample by construction
    * (the conformal contract), so keep it sample-sized per group; a
    * corpus-sized calibration group needs the
    * [[graft.operators.RobustStats.quantileNormalize]]-style
    * value-bucket rank decomposition instead. */
  def splitConformal(df: DataFrame, groupCol: String, valueCol: String,
                     calCol: String, alphaNumer: Int = 1,
                     alphaDenom: Int = 10): DataFrame = {
    require(alphaDenom > alphaNumer && alphaNumer > 0,
      "alpha must be in (0, 1)")
    import org.apache.spark.sql.expressions.Window
    val x = df.select(col(groupCol).as("grp"),
      col(valueCol).cast("bigint").as("__v"),
      col(calCol).cast("boolean").as("__cal"))
    val cal = x.where(col("__cal"))
    val wMed = Window.partitionBy(col("grp")).orderBy(col("__v"))
    val med = cal
      .withColumn("__rn", row_number().over(wMed))
      .withColumn("__nc", count(lit(1)).over(Window.partitionBy(col("grp"))))
      .where(col("__rn") === expr("(__nc + 1L) div 2L"))
      .select(col("grp"), col("__v").as("__med"))
    val conf = cal.join(med, Seq("grp"))
      .withColumn("__c", abs(col("__v") - col("__med")))
    val wC = Window.partitionBy(col("grp")).orderBy(col("__c"))
    val qhat = conf
      .withColumn("__rn", row_number().over(wC))
      .withColumn("__nc", count(lit(1)).over(Window.partitionBy(col("grp"))))
      .withColumn("__k", expr(
        s"(${alphaDenom - alphaNumer}L * (__nc + 1L) + ${alphaDenom - 1}L) " +
          s"div ${alphaDenom}L"))
      .where(col("__rn") === least(col("__k"), col("__nc")))
      .select(col("grp"), col("__nc").cast("bigint").as("n_cal"),
        col("__med"),
        when(col("__k") > col("__nc"), lit(null).cast("bigint"))
          .otherwise(col("__c")).as("qhat"))
    x.where(!col("__cal"))
      .join(qhat, Seq("grp"))
      .groupBy(col("grp"), col("n_cal"), col("qhat"))
      .agg(count(lit(1)).cast("bigint").as("n_test"),
        sum(when(col("qhat").isNull ||
            abs(col("__v") - col("__med")) <= col("qhat"), 1L)
          .otherwise(0L)).cast("bigint").as("covered"))
      .select(col("grp"), col("n_cal"), col("n_test"), col("qhat"),
        col("covered"),
        expr("(1000000L * covered) div n_test").cast("bigint")
          .as("coverage_ppm"))
  }

  /** EXACT weighted isotonic regression of a boolean outcome rate on
    * an ordered score bucket — the monotone calibration map behind
    * Platt/isotonic recalibration, computed via the closed-form
    * minimax characterization of the L2 isotonic fit:
    * `fit_i = max_{j ≤ i} min_{k ≥ i} mean(y on buckets j..k)`
    * (equivalent to pool-adjacent-violators, but loop-free). Every
    * candidate mean is kept as an integer RATIONAL `(successes,
    * weight)` and compared by cross-multiplication, so the fit is
    * exact; only the final projection floors to ppm. Output per
    * bucket: `(bucket, n, successes, raw_ppm, iso_ppm)` with
    * `iso_ppm` non-decreasing in bucket by construction.
    *
    * Scale shape (100 TB): the only data-sized work is the one
    * bucket-keyed count/sum aggregation (map-side combinable); the
    * minimax runs as a per-row HOF over the collected BUCKET array —
    * `O(m³)` integer ops for `m` buckets (m is a calibration-grid
    * constant, ~10–20), on a single one-row frame. Cross-multiplied
    * operands stay in BIGINT for success totals ≤ ~10⁹ per bucket
    * range product; widen to DECIMAL at the marked struct fields
    * beyond that. */
  def isotonicFit(df: DataFrame, bucketCol: String,
                  outcomeCol: String): DataFrame = {
    val g = df
      .select(col(bucketCol).cast("bigint").as("__x"),
        when(col(outcomeCol).cast("boolean"), 1L).otherwise(0L).as("__y"))
      .where(col("__x").isNotNull)
      .groupBy(col("__x"))
      .agg(count(lit(1)).cast("bigint").as("__w"),
        sum(col("__y")).cast("bigint").as("__s"))
    val rat = "struct<nu: bigint, de: bigint>"
    val isoExpr =
      "transform(sequence(1, size(st)), fi -> " +
        s"aggregate(transform(sequence(1, fi), fj -> " +
        s"aggregate(transform(sequence(fi, size(st)), fk -> " +
        "named_struct('nu', element_at(ps, fk + 1) - element_at(ps, fj), " +
        "'de', element_at(pw, fk + 1) - element_at(pw, fj))), " +
        s"cast(null as $rat), (bm, c) -> CASE WHEN bm IS NULL " +
        "OR c.nu * bm.de < bm.nu * c.de THEN c ELSE bm END)), " +
        s"cast(null as $rat), (best, c) -> CASE WHEN best IS NULL " +
        "OR c.nu * best.de > best.nu * c.de THEN c ELSE best END))"
    g.agg(sort_array(collect_list(struct(col("__x").as("x"),
        col("__w").as("w"), col("__s").as("s")))).as("st"))
      .withColumn("pw", expr("transform(sequence(0, size(st)), kp -> " +
        "aggregate(slice(st, 1, kp), 0L, (a, e) -> a + e.w))"))
      .withColumn("ps", expr("transform(sequence(0, size(st)), kp -> " +
        "aggregate(slice(st, 1, kp), 0L, (a, e) -> a + e.s))"))
      .withColumn("iso", expr(isoExpr))
      .select(explode(expr(
        "transform(sequence(1, size(st)), fi -> struct(" +
          "element_at(st, fi).x AS bucket, " +
          "element_at(st, fi).w AS n, " +
          "element_at(st, fi).s AS successes, " +
          "(1000000L * element_at(st, fi).s) div element_at(st, fi).w AS raw_ppm, " +
          "(1000000L * element_at(iso, fi).nu) div element_at(iso, fi).de AS iso_ppm))"))
        .as("__r"))
      .select(col("__r.bucket").as("bucket"), col("__r.n").as("n"),
        col("__r.successes").as("successes"),
        col("__r.raw_ppm").as("raw_ppm"), col("__r.iso_ppm").as("iso_ppm"))
  }

  /** Murphy decomposition of the Brier score — reliability (is the
    * claimed probability right?), resolution (do the bins separate
    * outcomes?), uncertainty (base-rate entropy term) — for binned
    * binary forecasts: `forecastNumCol` is the claimed probability as
    * an integer numerator over `forecastDen` (e.g. decile 0–10 over
    * 10). One summary row: `(n, n_pos, brier_ppm, rel_ppm, res_ppm,
    * unc_ppm)`.
    *
    * Exactness: `brier_ppm` is EXACT — `Σ(p−o)²` expands per bin to
    * the integer `k²·n_b − 2·k·D·o_b + D²·o_b` (D = `forecastDen`),
    * summed as integers and divided once. rel/res quantize each
    * bin's mean to ppm first (`p_ppm`, `obar_ppm` integers), then
    * one floor-div per bin — deterministic on both engines, error
    * ≤ #bins ppm. The per-bin products `n_b·(p_ppm−ob_ppm)²` reach
    * `n_b·10¹²` (int64 would wrap at ~9.2M rows per bin), so they —
    * and the 10⁶-scaled Brier numerator — ride on DECIMAL(38,0):
    * headroom to ~10²⁶ rows.
    *
    * Scale shape (100 TB): one map-side-combinable groupBy on the
    * forecast bin (cardinality ≤ D+1), then scalar algebra on that
    * tiny frame — nothing else shuffles. */
  def brierDecomposition(df: DataFrame, forecastNumCol: String,
                         outcomeCond: org.apache.spark.sql.Column,
                         forecastDen: Long = 10L): DataFrame = {
    require(forecastDen >= 1, "forecastDen must be positive")
    val bins = df.select(col(forecastNumCol).cast("bigint").as("__k"),
        when(outcomeCond, 1L).otherwise(0L).as("__o"))
      .withColumn("__k", expr(
        s"CASE WHEN __k >= 0 AND __k <= $forecastDen THEN __k ELSE " +
          s"raise_error(concat('brierDecomposition: forecast numerator ', " +
          s"CAST(__k AS STRING), ' outside [0, $forecastDen]')) END"))
      .groupBy(col("__k"))
      .agg(count(lit(1)).cast("bigint").as("__nb"),
        sum(col("__o")).cast("bigint").as("__ob"))
    val tot = bins.agg(sum(col("__nb")).as("__n"), sum(col("__ob")).as("__np"))
    bins.crossJoin(broadcast(tot))
      .withColumn("__p_ppm", expr(s"(1000000L * __k) div $forecastDen"))
      .withColumn("__ob_ppm", expr("(1000000L * __ob) div __nb"))
      .withColumn("__obar_ppm", expr("(1000000L * __np) div __n"))
      .agg(
        max(col("__n")).cast("bigint").as("n"),
        max(col("__np")).cast("bigint").as("n_pos"),
        // exact: Σ over bins of (k²·n_b − 2kD·o_b + D²·o_b), one div
        sum(expr(s"__k * __k * __nb - 2L * __k * $forecastDen * __ob + " +
          s"$forecastDen * $forecastDen * __ob")).as("__brier_num"),
        sum(expr("(cast(__nb as decimal(38,0)) * (__p_ppm - __ob_ppm) " +
          "* (__p_ppm - __ob_ppm)) div (cast(1000000 as decimal(38,0)) * __n)"))
          .as("__rel_ppm_raw"),
        sum(expr("(cast(__nb as decimal(38,0)) * (__ob_ppm - __obar_ppm) " +
          "* (__ob_ppm - __obar_ppm)) div (cast(1000000 as decimal(38,0)) * __n)"))
          .as("__res_ppm_raw"),
        max(expr("(__obar_ppm * (1000000L - __obar_ppm)) div 1000000L"))
          .as("__unc_ppm"))
      .select(col("n"), col("n_pos"),
        expr(s"(cast(1000000 as decimal(38,0)) * __brier_num) " +
          s"div ($forecastDen * $forecastDen * n)")
          .cast("bigint").as("brier_ppm"),
        col("__rel_ppm_raw").cast("bigint").as("rel_ppm"),
        col("__res_ppm_raw").cast("bigint").as("res_ppm"),
        col("__unc_ppm").cast("bigint").as("unc_ppm"))
  }

  /** Cochran's Q over per-subject binary responses to k treatments —
    * "do these k binary detectors/treatments have the same marginal
    * rate on the SAME subjects?" (the k-treatment generalization of
    * [[mcnemar]]). Input: one row per subject with k boolean columns.
    * One output row: `(n_subjects, k, q_ppm)` where with column
    * totals C_j, row totals R_i, grand total T:
    * `Q = (k−1)·Σ_j(k·C_j − T)² / (k·(k·T − Σ_i R_i²))`, emitted as
    * the exact floored ppm integer; a zero denominator (every subject
    * answers identically on all treatments) yields NULL, not a fake
    * 0.
    *
    * Scale shape (100 TB): one pass — a single global aggregation
    * computing k column sums, ΣR_i and ΣR_i² map-side; no shuffle
    * beyond the final combine. */
  def cochranQ(df: DataFrame,
               treatmentConds: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val k = treatmentConds.size
    require(k >= 2, "cochranQ needs at least two treatments")
    val flags = df.select(
      treatmentConds.zipWithIndex.map { case (c, i) =>
        when(c, 1L).otherwise(0L).as(s"__c$i")
      }: _*)
      .withColumn("__r",
        treatmentConds.indices.map(i => col(s"__c$i")).reduce(_ + _))
    val colSums = (0 until k).map(i =>
      sum(col(s"__c$i")).cast("bigint").as(s"__C$i"))
    val agged = flags.agg(colSums.head,
      (colSums.tail :+ count(lit(1)).cast("bigint").as("__n")
        :+ sum(col("__r")).cast("bigint").as("__T")
        :+ sum(col("__r") * col("__r")).cast("bigint").as("__R2")): _*)
    // each squared term reaches (k·n)², so the 10⁶·(k−1)-scaled sum is
    // ~10⁶·k³·n² — int64 would wrap near n ≈ 10⁶ subjects at k = 5;
    // DECIMAL(38,0) holds it to n ≈ 10¹⁴
    val numTerms = (0 until k)
      .map(i => s"(cast(${k} as decimal(38,0)) * __C$i - __T) " +
        s"* (cast(${k} as decimal(38,0)) * __C$i - __T)")
      .mkString(" + ")
    agged.select(col("__n").as("n_subjects"),
      lit(k.toLong).as("k"),
      expr(s"CASE WHEN ${k}L * __T - __R2 > 0 THEN " +
        s"(cast(1000000 as decimal(38,0)) * ${k - 1}L * ($numTerms)) div " +
        s"(${k}L * (${k}L * __T - __R2)) ELSE NULL END")
        .cast("bigint").as("q_ppm"))
  }

  /** Friedman rank test over complete blocks — "averaged over blocks
    * (subjects/prompts), do the k systems rank the same?": the
    * nonparametric k-system eval when scores are only comparable
    * WITHIN a block. Input: one row per (block, treatment) with an
    * integer value; every block must carry all k treatments (build
    * the complete grid with zeros first — [[cochranQ]]-style). Ranks
    * use the standard midrank tie treatment, carried as the integer
    * DOUBLED rank `r2 = 2·cnt_less + cnt_eq + 1` (counts over the
    * block; `cnt_eq` includes the row itself). One row:
    * `(n_blocks, k, fr_ppm)` = ppm-floored
    * `12·ΣR_j²/(n·k·(k+1)) − 3·n·(k+1)` with `R_j = Σr_j` folded
    * through the doubled form (`3·ΣR2_j² / (n·k·(k+1)) − 3·n·(k+1)`,
    * one floor) — can be slightly negative under heavy ties (the
    * untied statistic is ≥ 0); sign-split div keeps both engines
    * truncating identically.
    *
    * Scale shape (100 TB): ranks come from one window partitioned by
    * block (k rows each); R_j sums are a k-cardinality keyed
    * aggregation — map-side-combined, no data blowup. */
  def friedmanRanks(df: DataFrame, blockCol: String, treatmentCol: String,
                    valueCol: String): DataFrame = {
    val base = df.select(col(blockCol).as("__b"), col(treatmentCol).as("__tr"),
      col(valueCol).cast("bigint").as("__v"))
    val wB = Window.partitionBy(col("__b"))
    // midrank via counts: r2 = 2*|{v' < v}| + |{v'' = v}| + 1 (self
    // included in the equal count supplies the +1 … +cnt_eq run)
    val ranked = base
      .withColumn("__r2",
        expr("2L").multiply(coalesce(count(lit(1)).over(
          wB.orderBy(col("__v")).rangeBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
          .plus(count(lit(1)).over(
            wB.orderBy(col("__v")).rangeBetween(0, 0)))
          .plus(lit(1L)))
    val perTreatment = ranked.groupBy(col("__tr"))
      .agg(sum(col("__r2")).cast("bigint").as("__R2j"),
        count(lit(1)).cast("bigint").as("__nb"))
    val k = perTreatment.agg(count(lit(1)).as("__k"),
      max(col("__nb")).as("__nmax"), min(col("__nb")).as("__nmin"))
    perTreatment.crossJoin(broadcast(k))
      .withColumn("__nmin", expr(
        "CASE WHEN __nmin = __nmax THEN __nmin ELSE raise_error(" +
          "'friedmanRanks: blocks are incomplete — build the full " +
          "block x treatment grid first') END"))
      .agg(max(col("__nmin")).cast("bigint").as("n_blocks"),
        max(col("__k")).cast("bigint").as("k"),
        sum(expr("__R2j * __R2j")).as("__sumR2sq"),
        max(expr("__k * __nmin * (__k + 1)")).as("__den"))
      .select(col("n_blocks"), col("k"),
        expr(
          """CASE WHEN 3000000L * __sumR2sq div __den
            |          >= 3000000L * n_blocks * (k + 1L)
            |  THEN (3000000L * __sumR2sq) div __den
            |       - 3000000L * n_blocks * (k + 1L)
            |  ELSE -(3000000L * n_blocks * (k + 1L)
            |       - (3000000L * __sumR2sq) div __den)
            |END""".stripMargin).cast("bigint").as("fr_ppm"))
  }

  /** Fleiss' kappa for n binary raters on shared items — "do these
    * detectors/annotators agree beyond chance?" (the multi-rater
    * generalization of Cohen's κ). With per-item positive counts
    * `a_i` out of `n` raters: `P̄ = Σ(a² + (n−a)² − n) / (N·n·(n−1))`
    * and `P̄_e = ((Σa)² + (Nn−Σa)²) / (Nn)²`; κ emitted as the exact
    * sign-split ppm of
    * `(S1·(Nn)² − S2·N·n·(n−1)) / (N·n·(n−1)·((Nn)² − S2))` on
    * DECIMAL(38,0) — perfect chance-agreement (denominator 0) yields
    * NULL. One row: `(n_items, n_raters, kappa_ppm)`.
    *
    * Scale shape (100 TB): one pass — the rater conditions evaluate
    * per row, a single global aggregation collects the three sums. */
  def fleissKappa(df: DataFrame,
                  raterConds: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val n = raterConds.size
    require(n >= 2, "fleissKappa needs at least two raters")
    val a = raterConds.map(c => when(c, 1L).otherwise(0L)).reduce(_ + _)
    df.select(a.as("__a"))
      .agg(count(lit(1)).cast("bigint").as("__N"),
        sum(col("__a")).cast("bigint").as("__SA"),
        sum(expr(s"__a * __a + (${n}L - __a) * (${n}L - __a) - ${n}L"))
          .cast("bigint").as("__S1"))
      .withColumn("__Nn", expr(s"__N * ${n}L"))
      .withColumn("__S2", expr(
        "cast(__SA as decimal(38,0)) * __SA + " +
          "(cast(__Nn as decimal(38,0)) - __SA) * (__Nn - __SA)"))
      .withColumn("__num", expr(
        s"cast(__S1 as decimal(38,0)) * __Nn * __Nn " +
          s"- __S2 * __N * ${n}L * ${n - 1}L"))
      .withColumn("__den", expr(
        s"cast(__N as decimal(38,0)) * ${n}L * ${n - 1}L " +
          "* (cast(__Nn as decimal(38,0)) * __Nn - __S2)"))
      .select(col("__N").as("n_items"), lit(n.toLong).as("n_raters"),
        expr("CASE WHEN __den <= 0 THEN NULL " +
          "WHEN __num >= 0 THEN cast((1000000 * __num) div __den as bigint) " +
          "ELSE -cast((1000000 * -__num) div __den as bigint) END")
          .cast("bigint").as("kappa_ppm"))
  }

  /** Cramér's V over a two-way contingency — the [0,1] effect size
    * the χ² p-value can't give you ("HOW associated are source and
    * language?"). The FULL grid (observed cells plus structural
    * zeros — a zero cell still contributes its expectation) feeds
    * per-cell quantized terms
    * `10⁶·(O·N − r·c)² div (N·r·c)` (one floor each, DECIMAL
    * products), and `v_ppm = isqrt((10⁶·χ²_ppm) div (N·min(R−1,
    * C−1)))`. One row: `(n, n_rows, n_cols, chi2_ppm, v_ppm)`;
    * single-row or single-column tables yield NULL V.
    *
    * Scale shape (100 TB): one keyed aggregation to cells, margins
    * from the cell frame, the R×C grid cross is dimension-sized. */
  def cramersV(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val cells = df.groupBy(col(rowCol).as("__r"), col(colCol).as("__c"))
      .agg(count(lit(1)).cast("bigint").as("__o"))
      .localCheckpoint()
    val rows = cells.groupBy(col("__r")).agg(sum(col("__o")).cast("bigint").as("__rm"))
    val cols_ = cells.groupBy(col("__c")).agg(sum(col("__o")).cast("bigint").as("__cm"))
    val tot = cells.agg(sum(col("__o")).cast("bigint").as("__N"),
      countDistinct(col("__r")).cast("bigint").as("__nr"),
      countDistinct(col("__c")).cast("bigint").as("__nc"))
    rows.crossJoin(cols_)
      .join(cells, Seq("__r", "__c"), "left")
      .withColumn("__o", coalesce(col("__o"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("__term", expr(
        "cast((1000000 * (cast(__o as decimal(38,0)) * __N - " +
          "cast(__rm as decimal(38,0)) * __cm) * " +
          "(cast(__o as decimal(38,0)) * __N - " +
          "cast(__rm as decimal(38,0)) * __cm)) div " +
          "(cast(__N as decimal(38,0)) * __rm * __cm) as bigint)"))
      .agg(max(col("__N")).as("__N"), max(col("__nr")).as("__nr"),
        max(col("__nc")).as("__nc"),
        sum(col("__term")).cast("bigint").as("__chi2"))
      .withColumn("__m", expr(
        "CASE WHEN __nr - 1L < __nc - 1L THEN __nr - 1L ELSE __nc - 1L END"))
      .withColumn("__q", expr(
        "CASE WHEN __m > 0 THEN (cast(1000000 as decimal(38,0)) * __chi2) " +
          "div (cast(__N as decimal(38,0)) * __m) ELSE cast(0 as decimal(38,0)) END"))
      .transform(graft.util.ExactMath.withIsqrt(_, "__q", "__v"))
      .select(col("__N").cast("bigint").as("n"),
        col("__nr").cast("bigint").as("n_rows"),
        col("__nc").cast("bigint").as("n_cols"),
        col("__chi2").as("chi2_ppm"),
        expr("CASE WHEN __m <= 0 THEN NULL ELSE cast(__v as bigint) END")
          .cast("bigint").as("v_ppm"))
  }

  /** Bradley–Terry strengths from aggregated pairwise outcomes — the
    * arena-style model ranking: given per-pair game counts and wins,
    * run `iters` minorize–maximize updates
    * `π_i ← W_i / Σ_j n_ij/(π_i+π_j)` in ppm integer arithmetic
    * (strengths start at 10⁶; each pair term is one floored div
    * `(n_ij·10¹²) div (s_i+s_j)`, each update one more), then
    * normalize to make strengths sum to k·10⁶. Deterministic to the
    * ppm on any engine; MM converges geometrically so small `iters`
    * (default 3) lands within quantization noise of the MLE ORDER —
    * the ranking, not the asymptote, is the product.
    *
    * Input: one row per unordered pair `(a, b, winsA, winsB)`
    * (decisive games only — drop ties upstream or split them as half
    * wins beforehand). Output per player: `(player, n_games, n_wins,
    * strength_ppm)`.
    *
    * Scale shape (100 TB): the pair frame is players² — a dimension.
    * Every iteration is two broadcast joins + one keyed aggregation
    * on that dimension frame; the corpus-sized work (building the
    * pair outcomes) happens upstream, once. */
  def bradleyTerry(pairs: DataFrame, aCol: String, bCol: String,
                   winsACol: String, winsBCol: String,
                   iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 10, "iters must be in [1, 10]")
    val sym = pairs.select(col(aCol).as("__i"), col(bCol).as("__j"),
        (col(winsACol) + col(winsBCol)).cast("bigint").as("__n"),
        col(winsACol).cast("bigint").as("__w"))
      .unionAll(pairs.select(col(bCol).as("__i"), col(aCol).as("__j"),
        (col(winsACol) + col(winsBCol)).cast("bigint").as("__n"),
        col(winsBCol).cast("bigint").as("__w")))
      .where(col("__n") > 0)
      .localCheckpoint()
    val totals = sym.groupBy(col("__i"))
      .agg(sum(col("__n")).cast("bigint").as("__N"),
        sum(col("__w")).cast("bigint").as("__W"))
    val s0 = totals.select(col("__i"), lit(1000000L).as("__s"))
    val fitted = (1 to iters).foldLeft(s0) { (s, _) =>
      sym
        .join(broadcast(s), Seq("__i"))
        .join(broadcast(s.select(col("__i").as("__j"), col("__s").as("__sj"))),
          Seq("__j"))
        .groupBy(col("__i"))
        // 10¹²-scaled game counts ride on DECIMAL(38,0): int64 would
        // wrap once a pair logs > ~9.2M games (resp. a player ~9.2M
        // wins in the W term below) — large arenas do
        .agg(sum(expr("(cast(1000000000000 as decimal(38,0)) * __n) " +
          "div (__s + __sj)")).cast("bigint").as("__D"))
        .join(broadcast(totals), Seq("__i"))
        // a zero denominator means the ppm lattice collapsed (all
        // strengths astronomically large) — impossible from the 10⁶
        // start, but fail loudly rather than divide by zero
        .select(col("__i"), expr(
          "CASE WHEN __D > 0 THEN " +
            "(cast(1000000000000 as decimal(38,0)) * __W) div __D " +
            "ELSE raise_error('bradleyTerry: zero MM denominator') END")
          .as("__s"))
    }
    val norm = fitted.agg(sum(col("__s")).cast("bigint").as("__sum"),
      count(lit(1)).cast("bigint").as("__k"))
    fitted.crossJoin(broadcast(norm))
      .join(broadcast(totals), Seq("__i"))
      .select(col("__i").as("player"), col("__N").as("n_games"),
        col("__W").as("n_wins"),
        expr("(cast(__s as decimal(38,0)) * __k * 1000000L) div __sum")
          .cast("bigint").as("strength_ppm"))
  }

  /** Chapman capture–recapture estimate of an unseen population from
    * two independent detectors' catches — "two cheap duplicate /
    * quality detectors each flagged a sample; how many are there in
    * TOTAL?" (mark-recapture, the field-standard small-bias form).
    * Input: two id frames (detector A's catch, detector B's catch).
    * One row: `(n_a, n_b, n_both, chapman_est, lincoln_est)` with
    * `chapman = (n_a+1)·(n_b+1) div (n_both+1) − 1` (defined even at
    * zero overlap) and `lincoln = n_a·n_b div n_both` (NULL when the
    * detectors are disjoint) — exact floored integers.
    *
    * Scale shape (100 TB): ids deduplicate map-side, the overlap is
    * one equi-join on the id, and the three counts collapse to one
    * row before any of the arithmetic — no full-table materialization
    * past the distinct id sets. */
  def captureRecapture(dfA: DataFrame, dfB: DataFrame,
                       idCol: String): DataFrame = {
    // ids keep their native type: distinct + equi-join work on any
    // column type, and a cast("long") here would turn string/UUID ids
    // into NULLs — silently collapsing each catch to one row
    val a = dfA.select(col(idCol).as("__id")).distinct()
    val b = dfB.select(col(idCol).as("__id")).distinct()
    val na = a.agg(count(lit(1)).cast("bigint").as("__na"))
    val nb = b.agg(count(lit(1)).cast("bigint").as("__nb"))
    val m = a.join(b, Seq("__id")).agg(count(lit(1)).cast("bigint").as("__m"))
    na.crossJoin(broadcast(nb)).crossJoin(broadcast(m))
      .select(col("__na").as("n_a"), col("__nb").as("n_b"),
        col("__m").as("n_both"),
        expr("((__na + 1L) * (__nb + 1L)) div (__m + 1L) - 1L")
          .cast("bigint").as("chapman_est"),
        expr("CASE WHEN __m > 0 THEN (__na * __nb) div __m ELSE NULL END")
          .cast("bigint").as("lincoln_est"))
  }

  /** Stratified treated-vs-control contrast — the propensity-strata
    * estimator: within each stratum of a confounder proxy (activity
    * decile, source bucket…), compare treated and control outcome
    * means; strata where either arm is empty are reported with NULL
    * contrast instead of being dropped (the overlap diagnostic).
    * One row per stratum: `(stratum, n_treat, n_ctrl, sum_treat,
    * sum_ctrl, att_diff)`. Sums are DECIMAL(18,2)-exact (cast once,
    * summed as decimals); `att_diff` is the only IEEE value — two
    * divisions and a subtract on already-aggregated scalars, bitwise
    * deterministic. The cross-stratum pooled ATT is left to the
    * caller (a weighted fold over ≤ #strata rows) so nothing here
    * depends on float accumulation order.
    *
    * Scale shape (100 TB): one keyed aggregation on (stratum, arm)
    * — map-side-combinable — then a pivot on the tiny strata frame.
    * No joins on unit-level data. */
  def stratifiedContrast(df: DataFrame, stratumCol: String,
                         treatCond: org.apache.spark.sql.Column,
                         outcomeCol: String): DataFrame = {
    val per = df.select(col(stratumCol).as("__s"),
        when(treatCond, 1L).otherwise(0L).as("__arm"),
        col(outcomeCol).cast("decimal(18,2)").as("__y"))
      .groupBy(col("__s"), col("__arm"))
      .agg(count(lit(1)).cast("bigint").as("__n"),
        sum(col("__y")).as("__sum"))
    per.groupBy(col("__s"))
      .agg(
        sum(when(col("__arm") === 1L, col("__n")).otherwise(0L))
          .cast("bigint").as("n_treat"),
        sum(when(col("__arm") === 0L, col("__n")).otherwise(0L))
          .cast("bigint").as("n_ctrl"),
        sum(when(col("__arm") === 1L, col("__sum"))
          .otherwise(lit(0).cast("decimal(18,2)"))).as("__st"),
        sum(when(col("__arm") === 0L, col("__sum"))
          .otherwise(lit(0).cast("decimal(18,2)"))).as("__sc"))
      .select(col("__s").as("stratum"), col("n_treat"), col("n_ctrl"),
        col("__st").cast("decimal(18,2)").as("sum_treat"),
        col("__sc").cast("decimal(18,2)").as("sum_ctrl"),
        when(col("n_treat") > 0 && col("n_ctrl") > 0,
          col("__st").cast("double") / col("n_treat").cast("double")
            - col("__sc").cast("double") / col("n_ctrl").cast("double"))
          .as("att_diff"))
  }

  /** Krippendorff's alpha (nominal) — the agreement coefficient that
    * TOLERATES MISSING RATINGS, where [[fleissKappa]] requires every
    * rater on every item: ratings arrive as (unit, category) rows,
    * units keep whatever raters actually showed up, and units with
    * fewer than two ratings drop (nothing to pair). With per-unit
    * category counts `o_uc`, unit sizes `m_u`, kept-total `n = Σm_u`
    * and category totals `n_c`:
    *
    *   α = 1 − (n−1) · [Σ_u Σ_c o_uc(m_u−o_uc)/(m_u−1)] / [Σ_c n_c(n−n_c)]
    *
    * The only rationals are the per-unit 1/(m_u−1); multiplying
    * through by `L = lcm(1 .. maxRatersPerUnit−1)` makes every term
    * an exact integer (a unit with more ratings than the declared cap
    * raises loudly — the weight needs the lcm). One documented ppm
    * floor: `alpha_ppm = 10⁶ − (10⁶(n−1)·Do_L) div (L·De)`. One row:
    * `(n_units, n_ratings, n_categories, alpha_ppm)`; a single-
    * category or sub-2-rating pool yields NULL.
    *
    * Scale shape (100 TB): one (unit, category) aggregation, one
    * unit-keyed size join, one category aggregation; only 1-row
    * scalar frames cross. Budget: 10⁶·n·L·De ≤ 10⁶·n³·L stays inside
    * DECIMAL(38,0) through n ≈ 10⁹ ratings at L ≤ 840 (R ≤ 9). */
  def krippendorffAlpha(ratings: DataFrame, unitCol: String,
                        catCol: String,
                        maxRatersPerUnit: Int = 8): DataFrame = {
    require(maxRatersPerUnit >= 2 && maxRatersPerUnit <= 12,
      "maxRatersPerUnit must be in [2, 12] (lcm growth)")
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val L = (1L until maxRatersPerUnit.toLong)
      .foldLeft(1L)((acc, i) => acc / gcd(acc, i) * i)
    val uc = ratings
      .select(col(unitCol).as("__u"), col(catCol).as("__c"))
      .where(col("__c").isNotNull)
      .groupBy(col("__u"), col("__c"))
      .agg(count(lit(1)).cast("bigint").as("__o"))
      .localCheckpoint() // feeds unit sizes, Do, and category totals
    val um = uc.groupBy(col("__u"))
      .agg(sum(col("__o")).cast("bigint").as("__m"))
      .where(col("__m") >= 2L)
      .withColumn("__m", expr(
        s"CASE WHEN __m <= ${maxRatersPerUnit}L THEN __m ELSE raise_error(" +
          "'krippendorffAlpha: a unit has more ratings than " +
          "maxRatersPerUnit — raise the cap (the exact per-unit weight " +
          "is lcm(1..R-1) div (m_u - 1))') END"))
    val kept = uc.join(um, Seq("__u"))
    val totals = kept.agg(
      sum(col("__o")).cast("bigint").as("__n"),
      countDistinct(col("__u")).cast("bigint").as("__units"),
      countDistinct(col("__c")).cast("bigint").as("__k"),
      sum(expr(s"cast(${L}L div (__m - 1L) as decimal(38,0)) " +
        "* __o * (__m - __o)")).as("__do"))
    val deS = kept.groupBy(col("__c"))
      .agg(sum(col("__o")).cast("bigint").as("__nc"))
      .crossJoin(broadcast(totals.select(col("__n").as("__nt"))))
      .agg(sum(expr("cast(__nc as decimal(38,0)) * (__nt - __nc)"))
        .as("__de"))
    totals.crossJoin(broadcast(deS))
      .select(
        coalesce(col("__units"), lit(0L)).as("n_units"),
        coalesce(col("__n"), lit(0L)).as("n_ratings"),
        coalesce(col("__k"), lit(0L)).as("n_categories"),
        expr(s"""CASE WHEN __de IS NULL OR __de <= 0 OR __n < 2 THEN NULL
               |ELSE 1000000L - cast((cast(1000000 as decimal(38,0))
               |  * (__n - 1L) * __do) div (${L}L * __de) as bigint)
               |END""".stripMargin).cast("bigint").as("alpha_ppm"))
  }

  /** Exact decision-threshold sweep — "where do I set the quality
    * filter's cutoff?": for EVERY distinct score s (rule: keep when
    * score ≥ s), the confusion counts come from suffix sums over the
    * score histogram, Youden's J picks the operating point, and the
    * F1 at that point rides along:
    *
    *   J(s)  = (10⁶·TP) div P − (10⁶·FP) div N     (two floors)
    *   F1(s) = (2·10⁶·TP) div (TP + FP + P)        (one floor)
    *
    * Deterministic selection: max J, ties to the SMALLEST threshold
    * (the most permissive cutoff achieving the optimum). One row:
    * `(n_pos, n_neg, n_thresholds, best_threshold, j_ppm, f1_ppm)`;
    * a single-class pool NULLs all three of best_threshold / j_ppm /
    * f1_ppm (no trade-off to optimize, so no operating point to
    * report either).
    *
    * Scale shape (100 TB): rows collapse to the (score, label)
    * histogram; suffix sums = totals − the bucket-decomposed
    * [[graft.operators.Sequencing.runningTotalsBefore]] prefix
    * (never a single-reducer window); the argmax is a top-1
    * TakeOrdered over distinct scores, never a full sort. */
  def thresholdSweep(df: DataFrame, scoreCol: String,
                     posCond: org.apache.spark.sql.Column,
                     buckets: Int = 32): DataFrame = {
    val hist = df.select(col(scoreCol).cast("bigint").as("__s"),
        when(posCond, 1L).otherwise(0L).as("__p"))
      .where(col("__s").isNotNull)
      .groupBy(col("__s"))
      .agg(sum(col("__p")).cast("bigint").as("__tp0"),
        (count(lit(1)) - sum(col("__p"))).cast("bigint").as("__tn0"))
      .localCheckpoint() // feeds the suffix sums AND the n_thresholds count
    val (cum, totals) = graft.operators.Sequencing.runningTotalsBefore(
      hist, "__s", "__s", Seq("__tp0", "__tn0"), buckets, "thresholdSweep")
    val (p, nn) = (totals("__tp0"), totals("__tn0"))
    val scored = cum
      .withColumn("__tp", expr(s"${p}L - __cum___tp0"))
      .withColumn("__fp", expr(s"${nn}L - __cum___tn0"))
      .withColumn("__j", expr(
        s"""CASE WHEN ${p}L = 0 OR ${nn}L = 0 THEN NULL
           |ELSE (cast(1000000 as decimal(38,0)) * __tp) div ${p}L
           |   - (cast(1000000 as decimal(38,0)) * __fp) div ${nn}L
           |END""".stripMargin))
      .withColumn("__f1", expr(
        s"""CASE WHEN __tp + __fp + ${p}L = 0 THEN NULL
           |ELSE (cast(2000000 as decimal(38,0)) * __tp)
           |  div (__tp + __fp + ${p}L) END""".stripMargin))
    // a single-class pool has no trade-off: NULL the whole operating
    // point (threshold and F1 included), not just J
    val degenerate = p == 0L || nn == 0L
    scored
      .orderBy(col("__j").desc_nulls_last, col("__s"))
      .limit(1)
      .select(lit(p).cast("bigint").as("n_pos"),
        lit(nn).cast("bigint").as("n_neg"),
        (if (degenerate) lit(null) else col("__s"))
          .cast("bigint").as("best_threshold"),
        col("__j").cast("bigint").as("j_ppm"),
        (if (degenerate) lit(null) else col("__f1"))
          .cast("bigint").as("f1_ppm"))
      .crossJoin(broadcast(hist.agg(
        count(lit(1)).cast("bigint").as("n_thresholds"))))
      .select(col("n_pos"), col("n_neg"), col("n_thresholds"),
        col("best_threshold"), col("j_ppm"), col("f1_ppm"))
  }

  /** Gwet's AC1 for n binary raters — the PARADOX-RESISTANT
    * agreement coefficient: when prevalence is skewed (say 95% of
    * docs are "clean"), [[fleissKappa]]'s chance term approaches the
    * observed agreement and κ collapses toward 0 even for
    * near-perfect raters; AC1's chance term `2π(1−π)` instead
    * approaches 0, keeping the coefficient informative — run both and
    * diverging values flag a prevalence problem, not a rater problem.
    * Same input and observed-agreement sum as fleissKappa
    * (`S1 = Σ a² + (n−a)² − n`); with `SA = Σa`, `Nn = N·n`:
    *
    *   ac1 = (S1·(Nn)² − 2·SA·(Nn−SA)·Nn(n−1)) /
    *         (Nn(n−1) · ((Nn)² − 2·SA·(Nn−SA)))
    *
    * one sign-split ppm floor on DECIMAL(38,0). One row:
    * `(n_items, n_raters, ac1_ppm)`; a degenerate pool (everyone
    * always positive or always negative — chance term 1) yields NULL.
    *
    * Scale shape (100 TB): identical to fleissKappa — per-row rater
    * conditions, one global three-sum aggregation. */
  def gwetAC1(df: DataFrame,
              raterConds: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val n = raterConds.size
    require(n >= 2, "gwetAC1 needs at least two raters")
    val a = raterConds.map(c => when(c, 1L).otherwise(0L)).reduce(_ + _)
    df.select(a.as("__a"))
      .agg(count(lit(1)).cast("bigint").as("__N"),
        sum(col("__a")).cast("bigint").as("__SA"),
        sum(expr(s"__a * __a + (${n}L - __a) * (${n}L - __a) - ${n}L"))
          .cast("bigint").as("__S1"))
      .withColumn("__Nn", expr(s"__N * ${n}L"))
      .withColumn("__pe2", expr(
        "cast(2 as decimal(38,0)) * __SA * (__Nn - __SA)"))
      .withColumn("__num", expr(
        s"cast(__S1 as decimal(38,0)) * __Nn * __Nn " +
          s"- __pe2 * __Nn * ${n - 1}L"))
      .withColumn("__den", expr(
        s"cast(__Nn as decimal(38,0)) * ${n - 1}L " +
          "* (cast(__Nn as decimal(38,0)) * __Nn - __pe2)"))
      .select(col("__N").as("n_items"), lit(n.toLong).as("n_raters"),
        expr("CASE WHEN __den <= 0 THEN NULL " +
          "WHEN __num >= 0 THEN cast((1000000 * __num) div __den as bigint) " +
          "ELSE -cast((1000000 * -__num) div __den as bigint) END")
          .cast("bigint").as("ac1_ppm"))
  }

  /** Lin's concordance correlation coefficient — "does the cheap
    * score REPRODUCE the reference score?", penalizing location and
    * scale bias where Pearson's r forgives both (the calibration
    * read for a proxy metric vs its gold standard). Entirely in
    * integer moment sums — NO square root anywhere:
    *
    *   ccc = 2(nΣxy − ΣxΣy) /
    *         (nΣx² − (Σx)² + nΣy² − (Σy)² + (Σx − Σy)²)
    *
    * emitted as one sign-split ppm floor per group. Rows per group:
    * `(keys…, n, ccc_ppm)`; a degenerate group (both sides constant
    * and equal-mean) yields NULL.
    *
    * Scale shape (100 TB): one keyed aggregation of five moment sums
    * — partial-aggregated map-side, nothing else. Budget: the moment
    * products live on DECIMAL(38,0); with |x|,|y| ≤ 10⁶ the ppm
    * numerator 10⁶·2·n·Σxy stays exact through n ≈ 10¹³ rows. */
  def concordanceCorrelation(df: DataFrame, xCol: String, yCol: String,
                             keys: Seq[String]): DataFrame = {
    val kcols = keys.map(col)
    df.select(kcols :+ col(xCol).cast("bigint").as("__x")
        :+ col(yCol).cast("bigint").as("__y"): _*)
      .where(col("__x").isNotNull && col("__y").isNotNull)
      .groupBy(kcols: _*)
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(col("__x")).cast("decimal(38,0)").as("__sx"),
        sum(col("__y")).cast("decimal(38,0)").as("__sy"),
        sum(expr("cast(__x as decimal(38,0)) * __x")).as("__sxx"),
        sum(expr("cast(__y as decimal(38,0)) * __y")).as("__syy"),
        sum(expr("cast(__x as decimal(38,0)) * __y")).as("__sxy"))
      .withColumn("__num", expr(
        "cast(2 as decimal(38,0)) * (n * __sxy - __sx * __sy)"))
      .withColumn("__den", expr(
        """n * __sxx - __sx * __sx + n * __syy - __sy * __sy
          |+ (__sx - __sy) * (__sx - __sy)""".stripMargin))
      .select(kcols :+ col("n") :+
        expr("""CASE WHEN __den <= 0 THEN NULL
               |WHEN __num >= 0
               |  THEN cast((1000000 * __num) div __den as bigint)
               |ELSE -cast((1000000 * -__num) div __den as bigint)
               |END""".stripMargin).cast("bigint").as("ccc_ppm"): _*)
  }
}
