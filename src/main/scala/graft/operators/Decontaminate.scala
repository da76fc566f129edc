package graft.operators

import graft.functions.TextHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/benchmark decontamination: flag corpus documents that share
  * any 3-token shingle with a benchmark/eval set — the standard
  * "remove test-set leakage from training data" pipeline step.
  *
  * Not in the reference (polario is dataset I/O only, SURVEY.md §0);
  * first-class LLM-pipeline extension.
  *
  * Scale design (100 TB corpus, small benchmark): the benchmark's
  * distinct shingle set is tiny (eval sets are MBs, not TBs) →
  * `broadcast()` it, so the corpus-side shingle explode feeds a
  * broadcast LEFT SEMI join — the corpus is never shuffled, and the
  * explode output is consumed by the join without materialization.
  * The contaminated-id set (bounded by corpus row count, usually a
  * tiny fraction) then drives one more broadcast-able semi/anti join
  * to attach the flag. Shingling is the same codegen'd expression
  * chain as the dedup operators (TextHash).
  */
object Decontaminate {

  import TextHash.{spark => H}

  /** Distinct 3-token shingles of `textCol` (whole-text fallback for
    * short docs, matching the dedup operators' shingling). */
  private def shingleSet(df: DataFrame, textCol: String, out: String): DataFrame =
    TextOps.withTokens(df, textCol, "__toks")
      .select(explode(expr(H.shingles3("__toks", textCol))).as(out))
      .distinct()

  /** Annotate `corpus` with a `contaminated` flag: true iff the doc
    * shares at least one 3-token shingle with `benchmark`. Fails
    * loudly if the corpus already carries the internal or output
    * column names (re-running on annotated output would otherwise
    * silently overwrite the flag). */
  def flagContaminated(corpus: DataFrame, benchmark: DataFrame,
                       idCol: String, textCol: String): DataFrame = {
    val reserved = Set("__toks", "__sh", "__bsh", "__cont_id", "contaminated")
    val collisions = corpus.columns.toSet.intersect(reserved)
    require(collisions.isEmpty,
      s"flagContaminated reserves column names ${reserved.mkString(", ")}; " +
        s"rename the colliding input columns: ${collisions.mkString(", ")}")
    val benchShingles = broadcast(shingleSet(benchmark, textCol, "__bsh"))
    val contaminatedIds = TextOps.withTokens(corpus, textCol, "__toks")
      .select(col(idCol), explode(expr(H.shingles3("__toks", textCol))).as("__sh"))
      .join(benchShingles, col("__sh") === col("__bsh"), "left_semi")
      .select(col(idCol).as("__cont_id"))
      .distinct()
    corpus
      .join(contaminatedIds, col(idCol) === col("__cont_id"), "left")
      .withColumn("contaminated", col("__cont_id").isNotNull)
      .drop("__cont_id")
  }

  /** Graded contamination — per corpus document, how MUCH of it
    * leaks: distinct-shingle count, overlapping-shingle count, and
    * the exact overlap fraction `overlap_ppm = 1e6·n_overlap div
    * n_shingles` (graft scaled-integer discipline; NULL when a
    * null-text doc has no shingles). [[flagContaminated]]'s boolean
    * answers "any leak at all?"; this answers "is it a quoted
    * sentence or a wholesale copy?" — the threshold a curation
    * pipeline actually tunes (drop at >50%, keep-and-log below).
    *
    * Scale shape: same broadcast benchmark-shingle set as
    * [[flagContaminated]] (eval sets are MBs); the corpus-side
    * explode feeds a broadcast LEFT join (hit marker, corpus never
    * shuffled for the probe) and ONE doc-keyed aggregation whose two
    * distinct counts share a single Expand — one shuffle total. */
  def overlapFraction(corpus: DataFrame, benchmark: DataFrame,
                      idCol: String, textCol: String): DataFrame = {
    val benchShingles = broadcast(shingleSet(benchmark, textCol, "__bsh"))
    TextOps.withTokens(corpus, textCol, "__toks")
      .select(col(idCol), explode(expr(H.shingles3("__toks", textCol))).as("__sh"))
      .join(benchShingles, col("__sh") === col("__bsh"), "left")
      .groupBy(col(idCol))
      .agg(
        countDistinct(col("__sh")).cast("bigint").as("n_shingles"),
        countDistinct(when(col("__bsh").isNotNull, col("__sh")))
          .cast("bigint").as("n_overlap"))
      .withColumn("overlap_ppm", expr(
        "CASE WHEN n_shingles = 0 THEN NULL " +
          "ELSE CAST(1000000 AS DECIMAL(38,0)) * n_overlap div n_shingles END")
        .cast("bigint"))
  }

  /** The cleaned corpus: contaminated docs removed (one anti join). */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                    idCol: String, textCol: String): DataFrame =
    flagContaminated(corpus, benchmark, idCol, textCol)
      .where(!col("contaminated"))
      .drop("contaminated")

  /** SEMANTIC decontamination: flag corpus rows whose embedding's max
    * cosine against ANY benchmark embedding reaches `tau` — catches
    * paraphrased eval leakage the shingle matcher of
    * [[flagContaminated]] misses (the two are complementary gates;
    * run both).
    *
    * Scale: the benchmark (eval sets are small) collapses to ONE
    * broadcast row holding all its vectors; the corpus streams
    * through a single scan with the per-row max computed as an array
    * fold in the same codegen stage — zero shuffles, zero joins. A
    * benchmark too large to broadcast routes through
    * [[SimilarityOps.hyperplaneLshPairs]]-style banding instead.
    * `max` selects, never mixes, so cosines stay bitwise-exact.
    *
    * Output: corpus row + `max_bench_sim` + `contaminated` (null
    * vectors and an empty benchmark flag false, sim null). */
  def flagSemanticContaminated(corpus: DataFrame, idCol: String, vecCol: String,
                               benchmark: DataFrame, benchVec: String,
                               tau: Double): DataFrame = {
    import graft.functions.VectorSql.{spark => V}
    val reserved = Set("max_bench_sim", "contaminated", "__bvs")
    val collisions = corpus.columns.toSet.intersect(reserved)
    require(collisions.isEmpty,
      s"flagSemanticContaminated reserves column names ${reserved.mkString(", ")}; " +
        s"rename the colliding input columns: ${collisions.mkString(", ")}")
    val bench = broadcast(
      benchmark.agg(collect_list(col(benchVec)).as("__bvs")))
    corpus.crossJoin(bench)
      .withColumn("max_bench_sim",
        expr(s"array_max(transform(__bvs, __bv -> ${V.cosine(vecCol, "__bv")}))"))
      .withColumn("contaminated",
        coalesce(col("max_bench_sim") >= tau, lit(false)))
      .drop("__bvs")
  }
}
