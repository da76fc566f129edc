package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations: evaluate named boolean
  * rules over a table in ONE aggregation pass and report violation
  * counts — the accept/reject gate a curation pipeline runs before
  * admitting a new drop of data (nulls where not allowed, ranges,
  * cross-column invariants).
  *
  * Not in the reference (polario is dataset I/O only — SURVEY.md §0).
  *
  * Scale shape: every rule is a codegen'd boolean expression inside
  * the same scan; the aggregate emits one row per rule regardless of
  * table size (plain partial aggregation, no Expand). Rules see NULL
  * as a violation (`NOT rule` null-safe via coalesce) — an unknown
  * never passes a gate silently. */
object Validate {

  /** One row per rule: `(rule, n_rows, n_violations, pass)`. `rules`
    * are (name, SQL boolean expression) pairs evaluated against the
    * frame's columns. An EMPTY input yields `n_violations = 0` and a
    * definite `pass = true` for every rule (sums are coalesced — a
    * NULL pass would let a gate silently admit an empty drop). Rule
    * names are restricted to `[A-Za-z0-9_]+`: they are spliced into
    * the melt expression, and a quote/comma/backtick would corrupt
    * it. */
  def expect(df: DataFrame, rules: Seq[(String, String)]): DataFrame = {
    require(rules.nonEmpty, "rules must be non-empty")
    require(rules.map(_._1).distinct.size == rules.size, "rule names must be unique")
    rules.foreach { case (name, _) =>
      require(name.matches("[A-Za-z0-9_]+"),
        s"rule name '$name' must match [A-Za-z0-9_]+ (it is spliced into the melt SQL)")
    }
    val aggs = rules.map { case (name, sql) =>
      coalesce(sum(when(!coalesce(expr(sql), lit(false)), 1L).otherwise(0L)), lit(0L))
        .as(s"__v_$name")
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    one.select(expr(
      s"stack(${rules.size}, " +
        rules.map { case (name, _) => s"'$name', __n, __v_$name" }.mkString(", ") +
        ") AS (rule, n_rows, n_violations)"))
      .withColumn("pass", col("n_violations") === 0L)
  }

  /** The debugging half of [[expect]]: for each violated rule, up to
    * `maxExamples` EXEMPLAR row ids (smallest ids — deterministic),
    * comma-joined ascending — what a failed gate prints so the
    * on-call can open the offending rows instead of re-querying.
    * Rules that pass produce no row; output is rule-bounded ×
    * `maxExamples`.
    *
    * Scale shape: one pass per rule over the frame, each a filter +
    * TakeOrdered(maxExamples) — rules are config-sized, and no rule
    * ever collects more than `maxExamples` ids. */
  def expectExamples(df: DataFrame, idCol: String,
                     rules: Seq[(String, String)],
                     maxExamples: Int = 5): DataFrame = {
    require(rules.nonEmpty, "rules must be non-empty")
    require(maxExamples >= 1, "maxExamples must be positive")
    rules.foreach { case (name, _) =>
      require(name.matches("[A-Za-z0-9_]+"),
        s"rule name '$name' must match [A-Za-z0-9_]+")
    }
    rules.map { case (name, sql) =>
      df.where(!coalesce(expr(sql), lit(false)))
        .select(col(idCol).cast("long").as("__id"))
        .orderBy(col("__id"))
        .limit(maxExamples)
        .agg(count(lit(1)).cast("bigint").as("n_examples"),
          concat_ws(",", sort_array(collect_list(col("__id"))))
            .as("example_ids"))
        .select(lit(name).as("rule"), col("n_examples"), col("example_ids"))
        .where(col("n_examples") > 0L)
    }.reduce(_.union(_)).orderBy(col("rule"))
  }

  /** Referential-integrity check: one row
    * `(n_child, n_null_keys, n_orphans, ok)` counting child rows
    * whose non-null key has NO match in the parent key set (null
    * child keys are reported separately — a null key is a missing
    * value, not an orphan). The ingest gate between fact and
    * dimension loads.
    *
    * Scale shape: the parent reduces to its distinct keys before one
    * key-equi left join (bucketed parents make it co-located; a
    * runtime bloom filter prunes map-side when the optimizer sees
    * fit) and one aggregation — payloads never shuffle. */
  def referentialIntegrity(child: DataFrame, parent: DataFrame,
                           childKey: String, parentKey: String): DataFrame = {
    val pk = parent.select(col(parentKey).as("__pk")).distinct()
      .withColumn("__hit", lit(1))
    child.select(col(childKey).as("__ck"))
      .join(pk, col("__ck") === col("__pk"), "left")
      .agg(
        count(lit(1)).as("n_child"),
        sum(when(col("__ck").isNull, 1L).otherwise(0L)).as("n_null_keys"),
        sum(when(col("__ck").isNotNull && col("__hit").isNull, 1L).otherwise(0L))
          .as("n_orphans"))
      .withColumn("ok", col("n_orphans") === 0L)
  }

  /** k-anonymity audit: the quasi-identifier combinations held by
    * FEWER than `k` rows — the suppression list a privacy release
    * gate needs (a combination identifying under k individuals is a
    * re-identification risk; Sweeney 2002). One aggregation with
    * map-side combine; output is bounded by the number of rare
    * combinations, not corpus size.
    *
    * Output: the `cols` columns + `n`, ordered by `cols`. */
  def smallGroups(df: DataFrame, cols: Seq[String], k: Long): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    require(k >= 1, "k must be positive")
    df.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).cast("bigint").as("n"))
      .where(col("n") < k)
      .orderBy(cols.map(col): _*)
  }

  /** Cohen's kappa between two label columns — chance-corrected
    * agreement, the labeling-pipeline QA scalar (annotator vs
    * annotator, or classifier vs gold as in the q152 confusion
    * matrix): `κ = (p_o − p_e) / (1 − p_e)` with `p_o` the observed
    * agreement rate and `p_e` the marginal-product chance rate.
    *
    * Numeric parity discipline: all counts stay exact integers
    * (marginal products summed as BIGINT, n² through DECIMAL(38,0) —
    * safe past 10^19 rows); `p_o`, `p_e`, and κ are then a FIXED
    * five-op IEEE tree (two divisions, two subtractions, one
    * division) — bitwise-portable.
    *
    * Scale shape: one count+agree aggregate plus two label-bounded
    * marginal aggregates joined on the (tiny) label domain — nothing
    * corpus-sized shuffles. Degenerate all-one-label inputs make
    * `p_e = 1` and κ NULL (0/0) — surfaced as NULL, not masked.
    *
    * Output: one row `(n, po, pe, kappa)`. */
  def agreementKappa(df: DataFrame, actualCol: String,
                     predCol: String): DataFrame = {
    val g = df.select(col(actualCol).as("__a"), col(predCol).as("__p"))
    val n = g.agg(
      count(lit(1)).cast("bigint").as("n"),
      coalesce(sum(when(col("__a") === col("__p"), 1L).otherwise(0L)), lit(0L))
        .cast("bigint").as("__agree"))
    val r = g.groupBy(col("__a")).agg(count(lit(1)).cast("bigint").as("__ra"))
    val c = g.groupBy(col("__p")).agg(count(lit(1)).cast("bigint").as("__cp"))
    val sp = r.join(c, col("__a") === col("__p"))
      .agg(coalesce(sum(col("__ra") * col("__cp")), lit(0L)).cast("bigint")
        .as("__sumprod"))
    n.crossJoin(broadcast(sp))
      .withColumn("po", col("__agree").cast("double") / col("n").cast("double"))
      .withColumn("pe", col("__sumprod").cast("double") /
        (col("n").cast("decimal(38,0)") * col("n").cast("decimal(38,0)")).cast("double"))
      .withColumn("kappa", (col("po") - col("pe")) / (lit(1.0) - col("pe")))
      .select(col("n"), col("po"), col("pe"), col("kappa"))
  }

  /** l-diversity audit (Machanavajjhala et al.): within each
    * quasi-identifier group, how many DISTINCT sensitive values
    * appear? A group with fewer than `l` is re-identifiable by
    * linking (k-anonymity alone doesn't protect when everyone in the
    * group shares the sensitive value). One summary row:
    * `(n_groups, n_violating, min_diversity, rows_at_risk)` — the
    * last is the row mass inside violating groups, the quantity a
    * release gate must suppress or generalize.
    *
    * Scale shape: one quasi-keyed distinct-count aggregation (expand
    * + two same-key exchanges, Spark's standard distinct-agg plan)
    * then a dimension-free fold. Nothing else moves.
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, "l must be at least 2")
    df.groupBy(quasiCols.map(col): _*)
      .agg(countDistinct(col(sensitiveCol)).as("__nd"),
        count(lit(1)).cast("bigint").as("__n"))
      .agg(
        count(lit(1)).cast("bigint").as("n_groups"),
        sum(when(col("__nd") < l, 1L).otherwise(0L)).cast("bigint")
          .as("n_violating"),
        min(col("__nd")).cast("bigint").as("min_diversity"),
        sum(when(col("__nd") < l, col("__n")).otherwise(0L)).cast("bigint")
          .as("rows_at_risk"))
  }

  /** t-closeness audit (Li et al.) — the third leg of the release-
    * gate trio beside [[lDiversity]] (distinct-count) and
    * [[suppressSmallGroups]] (k-anonymity): within each quasi-
    * identifier group, how FAR is the distribution of the ordered
    * numeric sensitive attribute from the table-wide distribution?
    * Distance is the normalized 1-D earth-mover (the paper's choice
    * for ordered attributes): `t_g = W1(F_g, F) / (v_max − v_min)`
    * with `W1 = Σᵢ |F_g(vᵢ)−F(vᵢ)|·(vᵢ₊₁−vᵢ)` over the GLOBAL
    * support — a group may be perfectly l-diverse yet sit entirely
    * in one tail, and only a distributional distance sees that.
    *
    * Exactness: per support point the gap numerator
    * `|c_g·N − C·n_g|` is exact on DECIMAL(38,0); ONE floor renders
    * `t_ppm = (10⁶·Σ|…|·gap) div (n_g·N·(v_max−v_min))`; a single-
    * value support defines t = 0. One summary row (the [[lDiversity]]
    * shape): `(n_groups, n_violating, max_t_ppm, rows_at_risk)`
    * against the caller's `tPpm` threshold.
    *
    * Scale shape (100 TB): group histograms and the global histogram
    * are one aggregation each; the dense (group × support) grid the
    * CDF comparison needs is the real cost and is LOUDLY capped —
    * `groups·values > maxGridCells` raises with instructions to
    * bucket the sensitive attribute first (the standard move: EMD
    * over a coarse ordered domain), never a silent explosion. The
    * per-group cumulative window is support-bounded per partition;
    * the global cumulative runs on the value histogram. */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, tPpm: Long,
                 maxGridCells: Long = 2000000L): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(tPpm > 0, "tPpm must be positive")
    val qc = quasiCols.map(col)
    val cells = df
      .select(qc :+ col(sensitiveCol).cast("bigint").as("__v"): _*)
      .where(col("__v").isNotNull)
      .groupBy(qc :+ col("__v"): _*)
      .agg(count(lit(1)).cast("bigint").as("__h"))
    val wg = Window.orderBy(col("__v"))
    val glob = cells.groupBy(col("__v"))
      .agg(sum(col("__h")).cast("bigint").as("__hg"))
      .withColumn("__cg", sum(col("__hg"))
        .over(wg.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__gap", lead(col("__v"), 1).over(wg) - col("__v"))
    val groups = cells.groupBy(qc: _*)
      .agg(sum(col("__h")).cast("bigint").as("__ng"))
    val dims = groups.agg(count(lit(1)).cast("bigint").as("__gcnt"))
      .crossJoin(broadcast(glob.agg(
        count(lit(1)).cast("bigint").as("__vcnt"),
        max(col("__cg")).cast("bigint").as("__N"),
        (max(col("__v")) - min(col("__v"))).cast("bigint").as("__range"))))
    // the guard rewrites __ng — a column every downstream term keeps,
    // so column pruning cannot delete it
    val gridBase = groups.crossJoin(broadcast(dims))
      .withColumn("__ng", expr(
        s"CASE WHEN __gcnt * __vcnt <= ${maxGridCells}L THEN __ng " +
          "ELSE raise_error(concat('tCloseness: dense grid ', " +
          "cast(__gcnt as string), ' groups x ', cast(__vcnt as string), " +
          "' values exceeds the cap — bucket the sensitive attribute " +
          "into a coarser ordered domain first')) END"))
    val grid = gridBase
      .crossJoin(broadcast(glob.select(col("__v"), col("__cg"), col("__gap"))))
      .join(cells, quasiCols :+ "__v", "left")
      .withColumn("__h", coalesce(col("__h"), lit(0L)))
    val wq = Window.partitionBy(qc: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val perGroup = grid
      .withColumn("__c", sum(col("__h")).over(wq))
      .groupBy(qc: _*)
      .agg(max(col("__ng")).as("__ng"), max(col("__N")).as("__N"),
        max(col("__range")).as("__range"),
        sum(expr("abs(cast(__c as decimal(38,0)) * __N " +
          "- cast(__cg as decimal(38,0)) * __ng) * coalesce(__gap, 0L)"))
          .as("__w1n"))
      .withColumn("__tppm", expr(
        """CASE WHEN __range = 0 THEN 0L
          |ELSE cast((cast(1000000 as decimal(38,0)) * __w1n)
          |  div (cast(__ng as decimal(38,0)) * __N * __range) as bigint)
          |END""".stripMargin))
    perGroup.agg(
      count(lit(1)).cast("bigint").as("n_groups"),
      sum(when(col("__tppm") > tPpm, 1L).otherwise(0L)).cast("bigint")
        .as("n_violating"),
      max(col("__tppm")).cast("bigint").as("max_t_ppm"),
      sum(when(col("__tppm") > tPpm, col("__ng")).otherwise(0L)).cast("bigint")
        .as("rows_at_risk"))
  }

  /** k-anonymity suppression release: group counts over the given
    * (string-typed) dimensions, with every group smaller than `k`
    * SUPPRESSED — its identity replaced by the `'__suppressed__'`
    * sentinel and its mass folded into one residual row — the
    * standard small-cell suppression rule for publishing aggregates
    * (census/DP-adjacent release hygiene: tiny cells are the
    * re-identification surface). Released rows keep their exact
    * counts; the sentinel row carries the total suppressed mass so
    * the release still sums to the input.
    *
    * Scale shape: one grouped count (map-side combined) and a
    * dimension-sized conditional fold. */
  def suppressSmallGroups(df: DataFrame, cols: Seq[String],
                          k: Long): DataFrame = {
    require(cols.nonEmpty, "need at least one dimension column")
    require(k >= 2, "k must be at least 2")
    val counts = df.groupBy(cols.map(c => col(c).cast("string").as(c)): _*)
      .agg(count(lit(1)).cast("bigint").as("n"))
    val masked = counts.select(
      cols.map(c => when(col("n") >= k, col(c))
        .otherwise(lit("__suppressed__")).as(c)) :+ col("n"): _*)
    masked.groupBy(cols.map(col): _*)
      .agg(sum(col("n")).cast("bigint").as("n"))
  }

  /** Ingestion-order audit: within each entity (ordered by the
    * monotone ingestion sequence `seqCol`), count adjacent pairs
    * whose event time went BACKWARD — the out-of-order rate that
    * decides watermark slack and flags broken producer clocks.
    * One row: `(n_pairs, n_inversions, inversion_ppm, max_backstep)`
    * with `max_backstep` the largest observed time regression (in
    * the time column's own unit).
    *
    * Scale shape: one entity-keyed shuffle feeding a lag window
    * (entity-bounded history — the sessionize contract) and a
    * dimension-free fold. */
  def timeOrderAudit(df: DataFrame, entityCol: String, seqCol: String,
                     tsCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(entityCol)).orderBy(col(seqCol))
    df.withColumn("__prev", lag(col(tsCol), 1).over(w))
      .agg(
        sum(when(col("__prev").isNotNull, 1L).otherwise(0L)).cast("bigint")
          .as("n_pairs"),
        sum(when(col("__prev") > col(tsCol), 1L).otherwise(0L)).cast("bigint")
          .as("n_inversions"),
        coalesce(max(when(col("__prev") > col(tsCol),
          col("__prev") - col(tsCol))), lit(0L)).cast("bigint")
          .as("max_backstep"))
      .withColumn("inversion_ppm", expr(
        "CASE WHEN n_pairs = 0 THEN NULL " +
          "ELSE (1000000L * n_inversions) div n_pairs END"))
      .select(col("n_pairs"), col("n_inversions"), col("inversion_ppm"),
        col("max_backstep"))
  }

  /** Functional-dependency audit: does `detCols → depCol` hold? For
    * each distinct determinant key, count the distinct dependent
    * values; report `(n_keys, n_violating, max_distinct,
    * violation_ppm)` — the schema-inference / data-contract check
    * ("order id determines customer", "doc id determines source")
    * that catches silent key collisions and merge bugs long before a
    * join fans out.
    *
    * Scale shape: one key-grouped `count(distinct dep)` (two-level
    * partial aggregation — Spark plans distinct-aggregates as
    * expand + two exchanges on the SAME key) and one dimension-free
    * final fold to a single row. Nothing else.
    */
  def functionalDependency(df: DataFrame, detCols: Seq[String],
                           depCol: String): DataFrame = {
    require(detCols.nonEmpty, "need at least one determinant column")
    df.groupBy(detCols.map(col): _*)
      .agg(countDistinct(col(depCol)).as("__nd"))
      .agg(
        count(lit(1)).cast("bigint").as("n_keys"),
        sum(when(col("__nd") > 1L, 1L).otherwise(0L)).cast("bigint")
          .as("n_violating"),
        max(col("__nd")).cast("bigint").as("max_distinct"))
      .withColumn("violation_ppm",
        expr("CASE WHEN n_keys = 0 THEN NULL " +
          "ELSE (1000000L * n_violating) div n_keys END"))
  }
}
