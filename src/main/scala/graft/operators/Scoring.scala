package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Batched model-scoring seam: the plumbing for running a quality /
  * safety / language classifier (fastText, KenLM, an ONNX model)
  * over the corpus at scale, with the MODEL stubbed and everything
  * Spark-side real — the [[Multimodal]] pattern applied to
  * inference.
  *
  * The shape a real model needs and this seam provides:
  *  - one model INIT per partition (the expensive part — weights
  *    load once per task, not per row), via `mapPartitions`;
  *  - explicit BATCHES inside the partition (`grouped(batchSize)`)
  *    — the unit a vectorized scorer consumes;
  *  - only `(id, text)` is shipped to the scorer and only
  *    `(id, score)` comes back — the join back to the full row is a
  *    key equi-join, payload columns never pass through the seam.
  *
  * The stub scorer is a deterministic rational function of the
  * content hash (`rollingHash(text) % 1000` ‰), which is what lets
  * the driver hash-check the ENTIRE seam — schema, batching, join —
  * against an oracle that recomputes the stub arithmetically. Swap
  * `scoreBatch` for a real model call and nothing else changes.
  *
  * Scale shape (100 TB): one narrow projection into the seam, one
  * id-keyed join out; scoring parallelism is the scan's partitioning
  * (size `spark.sql.files.maxPartitionBytes` so one model instance
  * per ~128 MB of text). Scores in integer permille — aggregates
  * stay exact. */
object Scoring {

  /** STUB batch scorer — one call per batch, like a real vectorized
    * model. Deterministic: score_permille = rollingHash(text) % 1000. */
  def scoreBatch(batch: Seq[(Long, String)]): Seq[(Long, Long)] = {
    // ??? real model.predict(batch) goes here; deterministic fake below ???
    val P = 1000000007L
    batch.map { case (id, text) =>
      val h = text.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % P)
      (id, h % 1000L)
    }
  }

  /** Hashing-trick featurization: map a categorical feature cross
    * (the `cols` values joined with `|`) into `nBuckets` hash buckets
    * — fixed-width feature vectors without a fitted vocabulary, the
    * standard featurizer when the category space is unbounded.
    * Content-hashed (rollingHash), so bucket ids are stable across
    * runs, engines, and corpus versions; collisions are a MEASURED
    * property (witness q195 reports features-per-bucket), not a
    * surprise. Per-row expression, no shuffle. */
  def withHashedFeature(df: DataFrame, cols: Seq[String], nBuckets: Int,
                        out: String = "feature_bucket"): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    require(nBuckets >= 2, "nBuckets must be at least 2")
    require(!df.columns.contains(out), s"withHashedFeature reserves $out")
    import graft.functions.TextHash.{spark => H}
    val cross = s"concat_ws('|', ${cols.mkString(", ")})"
    df.withColumn(out,
      (expr(H.rollingHash(cross)) % nBuckets).cast("int"))
  }

  /** The seam itself: `(id, text)` pairs scored through the batched
    * partition iterator, returning `(__sid, score_permille)`. Built
    * on the TYPED Dataset `mapPartitions`, so it composes with
    * Structured Streaming unchanged (an `.rdd` seam would not) —
    * `EventStreamSpec` proves streamed scores equal the batch run. */
  def scoredPairs(df: DataFrame, idCol: String, textCol: String,
                  batchSize: Int = 64): DataFrame = {
    require(batchSize >= 1, "batchSize must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        // (real seam: init the model HERE, once per partition)
        it.grouped(batchSize).flatMap(b => scoreBatch(b.toSeq))
      }
      .toDF("__sid", "score_permille")
  }

  /** Score every row's `textCol` through the batched seam and join
    * the integer-permille score back as `score_permille`. */
  def withModelScore(df: DataFrame, idCol: String, textCol: String,
                     batchSize: Int = 64): DataFrame = {
    require(!df.columns.contains("score_permille"),
      "withModelScore reserves column name score_permille")
    df.join(scoredPairs(df, idCol, textCol, batchSize),
      col(idCol) === col("__sid")).drop("__sid")
  }

  /** ROUGE-n overlap between a candidate and a reference text on the
    * same row (Lin 2004): clipped n-gram-multiset intersection
    * `m = Σ_g min(count_cand(g), count_ref(g))`, from which
    * `rouge_p = m/|cand grams|`, `rouge_r = m/|ref grams|`, and
    * `rouge_f1 = 2m/(|cand|+|ref|)` (the F1 identity — exact
    * integers, one IEEE division each). The standard reference-based
    * eval for generated/augmented text, and a sharper near-dup
    * diagnostic than Jaccard (multiset counts see repetition).
    *
    * Adds `n_overlap, n_cand, n_ref, rouge_p, rouge_r, rouge_f1`
    * (ratios null when the denominator is 0; null text → null row
    * stats). Per-row only — zero shuffles. The clipped intersection
    * is O(distinct · (|cand| + |ref|)) per row via let-bound HOFs —
    * right for sentence/document eval pairs; book-sized texts should
    * pre-truncate. */
  def withRougeN(df: DataFrame, candCol: String, refCol: String,
                 n: Int = 2): DataFrame = {
    require(n >= 1 && n <= 4, "n must be in [1, 4]")
    val reserved = Set("__cg", "__rg", "n_overlap", "n_cand", "n_ref",
      "rouge_p", "rouge_r", "rouge_f1")
    require(df.columns.toSet.intersect(reserved).isEmpty,
      s"withRougeN reserves ${reserved.mkString(", ")}")
    def grams(c: String) =
      s"element_at(transform(array(split($c, ' ')), t -> " +
        s"CASE WHEN size(t) >= $n THEN transform(sequence(1, size(t) - ${n - 1}), " +
        s"i -> array_join(slice(t, i, $n), ' ')) " +
        s"ELSE CAST(array() AS array<string>) END), 1)"
    df.withColumn("__cg", expr(grams(candCol)))
      .withColumn("__rg", expr(grams(refCol)))
      .withColumn("n_overlap", expr(
        "aggregate(array_distinct(__cg), 0L, (acc, g) -> acc + " +
          "least(size(filter(__cg, x -> x = g)), " +
          "size(filter(__rg, x -> x = g))))"))
      .withColumn("n_cand", size(col("__cg")).cast("long"))
      .withColumn("n_ref", size(col("__rg")).cast("long"))
      .withColumn("rouge_p",
        when(col("n_cand") > 0,
          col("n_overlap").cast("double") / col("n_cand")))
      .withColumn("rouge_r",
        when(col("n_ref") > 0,
          col("n_overlap").cast("double") / col("n_ref")))
      .withColumn("rouge_f1",
        when(col("n_cand") + col("n_ref") > 0,
          lit(2.0) * col("n_overlap") / (col("n_cand") + col("n_ref"))))
      .drop("__cg", "__rg")
  }

  /** Unbiased pass@k (Chen et al. 2021, the HumanEval estimator):
    * for a group with `n` sampled attempts of which `c` passed,
    * `pass@k = 1 − C(n−c, k)/C(n, k)` — the probability at least one
    * of k drawn samples passes. Computed EXACTLY:
    * `C(n−c,k)/C(n,k) = Π_{i<k}(n−c−i) / Π_{i<k}(n−i)` as two BIGINT
    * product folds (the numerator clamps at 0 when `n−c < k` —
    * pass@k is then exactly 1), and
    * `pass_at_k_ppm = 10⁶ − (10⁶·num) div den`. Groups with `n < k`
    * emit NULL (the estimator is undefined); a denominator that
    * would overflow the 10⁶ scaling raises loudly — thin the samples
    * (content-hash cap) rather than silently losing exactness.
    *
    * Scale shape: one groupBy on the problem key (map-side
    * combined); the combinatorial folds are per-GROUP-row scalar
    * expressions over `sequence(0, k−1)` — k-bounded, no join. */
  def passAtK(df: DataFrame, groupCol: String, passCol: String,
              k: Int): DataFrame = {
    require(k >= 1 && k <= 20, "k must be in [1, 20]")
    val reserved = Set("n", "c", "pass_at_k_ppm")
    require(df.columns.toSet.intersect(reserved).isEmpty,
      s"passAtK reserves ${reserved.mkString(", ")}")
    val g = df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(when(expr(
          s"CASE WHEN $passCol IS NULL THEN " +
            s"raise_error('passAtK: null $passCol has no outcome') " +
            s"ELSE $passCol END"), 1L).otherwise(0L)).cast("bigint").as("c"))
    val num = s"aggregate(sequence(0, ${k - 1}), 1L, " +
      "(a, i) -> a * greatest(n - c - CAST(i AS BIGINT), 0L))"
    val den = s"aggregate(sequence(0, ${k - 1}), 1L, " +
      "(a, i) -> a * (n - CAST(i AS BIGINT)))"
    g.withColumn("__den", expr(
        s"CASE WHEN n < $k THEN CAST(NULL AS BIGINT) " +
          s"WHEN $den > 9000000000000L THEN " +
          s"raise_error('passAtK: n choose k overflows the ppm scaling; thin the samples') " +
          s"ELSE $den END"))
      .withColumn("pass_at_k_ppm",
        expr(s"CASE WHEN __den IS NULL THEN CAST(NULL AS BIGINT) " +
          s"ELSE 1000000L - (1000000L * $num) div __den END"))
      .drop("__den")
      .orderBy(col(groupCol))
  }

  /** Exact ROC-AUC (Mann–Whitney with midrank tie handling) of a
    * score against a boolean label, per group — the standard quality-
    * classifier eval: does the score actually rank positives above
    * negatives?
    *
    * Pair formulation, no per-row ranks: group rows by score value
    * (`p_s` positives, `q_s` negatives at score `s`), then
    * `concordant C = Σ_s p_s · (negatives strictly below s)` and
    * `ties T = Σ_s p_s·q_s`, giving
    * `auc_ppm = (10⁶ · (2C + T)) div (2·n_pos·n_neg)` — exact
    * integers end to end, bitwise-portable. NULL when a group has no
    * positives or no negatives; NULL scores/labels raise (a row with
    * no rank position or no truth is a pipeline bug, not data).
    *
    * Scale shape (100 TB): one groupBy on (group, score) — corpus
    * reduced map-side to the distinct-score frame — then the
    * strictly-below cumulative. Grouped: a window per group over its
    * distinct scores (group-cardinality-bounded). Ungrouped: the
    * shared quantile-bucket running-total decomposition
    * ([[Sequencing.runningTotalsBefore]]) — no single-reducer window
    * even when the score is continuous. */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String,
             groupCols: Seq[String] = Nil): DataFrame = {
    val reserved = Set("__s", "__y", "__p", "__q", "__cq", "__num2",
      "n_pos", "n_neg", "auc_ppm")
    require(df.columns.toSet.intersect(reserved).isEmpty,
      s"rocAuc reserves ${reserved.mkString(", ")}")
    val guarded = df
      .withColumn("__s", expr(
        s"CASE WHEN $scoreCol IS NULL THEN " +
          s"raise_error('rocAuc: null $scoreCol has no rank position') " +
          s"ELSE $scoreCol END"))
      .withColumn("__y", expr(
        s"CASE WHEN $labelCol IS NULL THEN " +
          s"raise_error('rocAuc: null $labelCol has no truth value') " +
          s"ELSE $labelCol END"))
    val keys = groupCols.map(col) :+ col("__s")
    val counts = guarded.groupBy(keys: _*)
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("__p"),
        sum(when(col("__y"), 0L).otherwise(1L)).as("__q"))
    val cum =
      if (groupCols.nonEmpty) {
        val w = Window.partitionBy(groupCols.map(col): _*)
          .orderBy(col("__s"))
          .rowsBetween(Window.unboundedPreceding, -1)
        counts.withColumn("__cq", coalesce(sum(col("__q")).over(w), lit(0L)))
      } else {
        // distinct scores are unique rows here, so the score doubles
        // as the decomposition's tie-break id
        Sequencing.runningTotalsBefore(
          counts, "__s", "__s", Seq("__q"), buckets = 32,
          caller = "rocAuc")._1.withColumnRenamed("__cum___q", "__cq")
      }
    val aggKeys = groupCols.map(col)
    val out = (if (aggKeys.nonEmpty) cum.groupBy(aggKeys: _*).agg(
      sum(col("__p")).as("n_pos"), sum(col("__q")).as("n_neg"),
      sum(col("__p") * (lit(2L) * col("__cq") + col("__q"))).as("__num2"))
    else cum.agg(
      sum(col("__p")).as("n_pos"), sum(col("__q")).as("n_neg"),
      sum(col("__p") * (lit(2L) * col("__cq") + col("__q"))).as("__num2")))
    // __num2 reaches 2·n_pos·n_neg — the 10⁶ scaling rides on
    // DECIMAL(38,0) so int64 cannot wrap once the class product
    // passes ~4.6e12 (~2M×2M rows)
    out.withColumn("auc_ppm",
      when(col("n_pos") > 0 && col("n_neg") > 0,
        expr("(cast(1000000 as decimal(38,0)) * __num2) " +
          "div (cast(2 as decimal(38,0)) * n_pos * n_neg)").cast("bigint")))
      .drop("__num2")
  }

  /** Reliability (calibration) report of a permille-confidence score
    * against a boolean label: `nBins` equal-width confidence bins,
    * each with its observed count, mean confidence, and empirical
    * accuracy, plus the corpus Expected Calibration Error
    * `ece_ppm = Σ_b n_b·|acc_b − conf_b| div N` (Naeini 2015) stamped
    * on every row. All ppm values from exact integer division —
    * bitwise-portable. Bins with no rows keep NULL stats so the
    * report shape is constant.
    *
    * `probCol` must be an integer confidence in [0, 1000] (the
    * model-seam permille convention); out-of-range or NULL raises.
    *
    * Scale shape (100 TB): one groupBy on the bin id (nBins-bounded
    * dimension frame), the bin spine and the one-row ECE total both
    * broadcast — the corpus is scanned once and never windowed. */
  def calibrationReport(df: DataFrame, probCol: String, labelCol: String,
                        nBins: Int = 10): DataFrame = {
    require(nBins >= 2 && nBins <= 1000, "nBins must be in [2, 1000]")
    val reserved = Set("__pr", "__y", "__bin", "bin", "n", "conf_ppm",
      "acc_ppm", "gap_ppm", "ece_ppm")
    require(df.columns.toSet.intersect(reserved).isEmpty,
      s"calibrationReport reserves ${reserved.mkString(", ")}")
    val spark = df.sparkSession
    val guarded = df.withColumn("__pr", expr(
      s"CASE WHEN $probCol IS NULL OR $probCol < 0 OR $probCol > 1000 " +
        s"THEN raise_error('calibrationReport: $probCol outside [0, 1000] permille') " +
        s"ELSE CAST($probCol AS BIGINT) END"))
      .withColumn("__y", expr(
        s"CASE WHEN $labelCol IS NULL THEN " +
          s"raise_error('calibrationReport: null $labelCol has no truth value') " +
          s"ELSE $labelCol END"))
    val binned = guarded.withColumn("__bin",
      least(expr(s"(__pr * ${nBins}L) div 1000L"), lit(nBins - 1L)))
    val perBin = binned.groupBy(col("__bin").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("__pr")).as("__sum_pr"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__n_true"))
      .withColumn("conf_ppm", expr("(1000L * __sum_pr) div n"))
      .withColumn("acc_ppm", expr("(1000000L * __n_true) div n"))
      .withColumn("gap_ppm", abs(col("acc_ppm") - col("conf_ppm")))
    val ece = perBin.agg(
      expr("(sum(n * gap_ppm)) div sum(n)").as("ece_ppm"))
    spark.range(0, nBins).toDF("bin")
      .join(perBin, Seq("bin"), "left")
      .crossJoin(broadcast(ece))
      .select(col("bin"), coalesce(col("n"), lit(0L)).as("n"),
        col("conf_ppm"), col("acc_ppm"), col("gap_ppm"), col("ece_ppm"))
      .orderBy("bin")
  }
}
