package graft

import graft.operators._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partitioning-invariance witnesses: the selection/ordering operators
  * whose 100 TB safety depends on determinism must produce IDENTICAL
  * results regardless of how the input happens to be partitioned —
  * that is what makes speculative retries, AQE re-plans, and
  * different cluster layouts safe. Every operator here derives its
  * decisions from content hashes or total orders, never from
  * `rand()`, `spark_partition_id()`, or first-seen order.
  */
class DeterminismSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  /** Collect to a canonical sorted form for exact comparison. */
  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def invariant(f: DataFrame => DataFrame): Unit = {
    val base = canon(f(docs))
    assert(base.nonEmpty)
    assert(canon(f(docs.repartition(7))) == base, "repartition(7) changed the result")
    assert(canon(f(docs.repartition(3, col("lang")))) == base,
      "key-partitioned layout changed the result")
  }

  test("weightedSample picks the same rows under any partitioning") {
    import graft.functions.TextHash.{spark => H}
    invariant { d =>
      val weights = d.select(col("source")).distinct()
        .withColumn("permille", (expr(H.rollingHash("source")) % 80) * 10)
      Mixing.weightedSample(d, "text", "source", weights).select("doc_id")
    }
  }

  test("capPerGroup picks the same rows under any partitioning") {
    invariant(d =>
      Mixing.capPerGroup(d, "text", "source", "doc_id", n = 10)
        .select("source", "doc_id"))
  }

  test("interleaveSources assigns the same epochs under any partitioning") {
    invariant(d =>
      Mixing.interleaveSources(d, "source", "text", "doc_id")
        .select("doc_id", "epoch"))
  }

  test("mooreLewisSelect picks the same top-k under any partitioning") {
    invariant(d =>
      TextOps.mooreLewisSelect(d, "doc_id", "text",
        col("lang") === "de", k = 15))
  }

  test("dropNearDuplicates keeps the same survivors under any partitioning") {
    invariant(d =>
      DedupOps.dropNearDuplicates(d, "doc_id", "text",
        bands = 2, rowsPerBand = 4, minJaccard = 0.2).select("doc_id"))
  }

  test("partitionDigests are order- and partitioning-independent; any row change flips them") {
    invariant(d => Inspect.partitionDigests(d, "source", "text"))
    val base = canon(Inspect.partitionDigests(docs, "source", "text"))
    val mutated = docs.withColumn("text",
      when(col("doc_id") === 7, concat(col("text"), lit(" x"))).otherwise(col("text")))
    assert(canon(Inspect.partitionDigests(mutated, "source", "text")) != base)
  }

  test("matchDistribution keeps the same rows under any partitioning") {
    import spark.implicits._
    val tgt = Seq(("en", 400L), ("de", 200L), ("es", 150L), ("fr", 150L),
      ("zh", 100L)).toDF("lang", "target_permille")
    invariant { d =>
      Mixing.matchDistribution(d, "text", "lang", "doc_id", tgt).select("doc_id")
    }
  }

  test("takeTopShare keeps the same rows under any partitioning") {
    invariant { d =>
      Mixing.takeTopShare(d, "source", "n_chars", "doc_id", pPermille = 500)
        .select("doc_id")
    }
  }

  test("allocateBudget apportions identically under any partitioning") {
    invariant { d =>
      val counts = d.groupBy(col("source"))
        .agg(sum(col("n_chars")).cast("bigint").as("n"))
      Mixing.allocateBudget(counts, "source", "n", budget = 999983L)
    }
  }

  test("withWeightedShardAssignment assigns the same shards under any partitioning") {
    invariant(d => Sequencing.withWeightedShardAssignment(
      d, "doc_id", "doc_id", "n_chars", nShards = 7).select("doc_id", "shard"))
  }

  test("ksStatistic and weightedPercentiles are partitioning-invariant") {
    invariant(d => RobustStats.ksStatistic(d, "n_chars", "source", "src0", "src1"))
    invariant(d => RobustStats.weightedPercentiles(
      d.withColumn("w", col("n_chars")), "n_chars", "w", Seq(1 -> 4, 1 -> 2)))
  }

  test("bottomK selects the same sample under any partitioning") {
    invariant(d => Sketches.bottomK(d, "doc_id", "text", 25))
  }

  test("mergeIntervals: output spans are disjoint with gaps, and counts conserve rows") {
    import spark.implicits._
    // deterministic synthetic spans: start = hash-ish spread, len 1..50
    val iv = spark.range(2000).selectExpr(
      "id % 13 AS k",
      "(id * 37) % 1000 AS s",
      "(id * 37) % 1000 + 1 + id % 50 AS e")
    val out = graft.operators.TimeSeries.mergeIntervals(iv.toDF(), "k", "s", "e")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // conservation: every input interval lands in exactly one span
    assert(out.map(_._4).sum == 2000L)
    // disjointness with strict gaps per key (touching would have merged)
    out.groupBy(_._1).foreach { case (_, spans) =>
      spans.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => assert(b._2 > a._3,
          s"spans $a and $b overlap or touch — they should have merged")
        case _ =>
      }
    }
  }

  test("fifth-session statistics operators are partitioning-invariant") {
    val events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      .withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
      .withColumn("mv", expr("cast(floor(value * 1000000d + 0.5d) as bigint)"))
      .withColumn("b", expr("ts div 86400000000000L"))
    def inv(f: DataFrame => DataFrame): Unit = {
      def c(df: DataFrame) = df.collect().map(_.toString).sorted.toSeq
      val base = c(f(events))
      assert(base.nonEmpty)
      assert(c(f(events.repartition(7))) == base,
        "repartition(7) changed the result")
      assert(c(f(events.repartition(3, col("event_type")))) == base,
        "key-partitioned layout changed the result")
    }
    inv(df => EvalStats.signTest(df, "user_id", "b", "mv"))
    inv(df => EvalStats.medianCI(df, "user_id", "b", "mv"))
    inv(df => EvalStats.aucDeLong(
      df.withColumn("hit",
        expr("cast(get_json_object(props, '$.k') as bigint) >= 50L")),
      "mv", "hit"))
    inv(df => TimeSeries.detectPeaks(df, "ts", "event_type",
      minProminence = 3L))
    inv(df => RobustStats.theilSenSlope(df, "user_id", "b", "mv"))
  }

  test("round-7 statistics operators are partitioning-invariant") {
    val events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      .withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
      .withColumn("b", expr("ts div 86400000000000L"))
    def inv(f: DataFrame => DataFrame): Unit = {
      def c(df: DataFrame) = df.collect().map(_.toString).sorted.toSeq
      val base = c(f(events))
      assert(base.nonEmpty)
      assert(c(f(events.repartition(7))) == base,
        "repartition(7) changed the result")
      assert(c(f(events.repartition(3, col("event_type")))) == base,
        "key-partitioned layout changed the result")
    }
    def perUserCounts(df: DataFrame) =
      df.groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).cast("bigint").as("v"))
    inv(df => TimeSeries.sprtMonitor(
      df.withColumn("g", expr("user_id % 10L")), "g", "event_id",
      col("event_type") === "view", 0.2, 0.4))
    inv(df => EvalStats.brierDecomposition(
      df.withColumn("xb",
        expr("cast(get_json_object(props, '$.k') as bigint) div 10L")),
      "xb", col("event_type") === "purchase"))
    inv(df => RobustStats.kruskalWallis(perUserCounts(df), "event_type", "v"))
    inv(df => RobustStats.mannKendall(
      df.groupBy(col("event_type"), col("b"))
        .agg(count(lit(1)).cast("bigint").as("y")),
      "event_type", "b", "y"))
    inv(df => RobustStats.runsTest(
      df.groupBy(col("event_type"), col("b"))
        .agg(count(lit(1)).cast("bigint").as("y")),
      "event_type", "b", "y"))
    inv(df => RobustStats.spearmanRho(
      df.groupBy(col("user_id")).agg(
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("y")),
      "x", "y"))
    // survival trio: duration frames derived per user, then the
    // histogram-fold operators — the fold order is pinned by
    // sort_array, the windows by the total order on t
    def lifetimes(df: DataFrame) = {
      val f = df.groupBy(col("user_id")).agg(min(col("b")).as("fb"))
      val fe = df.where(col("event_type") === "error")
        .groupBy(col("user_id")).agg(min(col("b")).as("eb"))
      val mx = df.agg(max(col("b")).as("bl"))
      f.join(fe, Seq("user_id"), "left").crossJoin(broadcast(mx))
        .select(
          when(col("eb").isNull, col("bl") - col("fb"))
            .otherwise(col("eb") - col("fb")).as("t"),
          col("eb").isNull.as("cen"),
          (col("user_id") % 2 === 0).as("g"))
    }
    inv(df => TimeSeries.nelsonAalen(lifetimes(df), "t", "cen"))
    inv(df => TimeSeries.logRankCurve(lifetimes(df), "t", "cen", col("g")))
  }

  test("round-7 dedup/mixing operators are partitioning-invariant") {
    invariant(df => DedupOps.exactJaccardJoin(
      df.where(col("doc_id") < 200), "doc_id", "text", 19L, 20L))
    invariant(df => Mixing.ipfRaking(df, "source", "lang", iters = 2))
    invariant(df => Mixing.vocabShapley(
      df.withColumn("p",
        expr("cast(regexp_extract(source, '([0-9]+)', 1) as bigint) % 5L")),
      "p", "text", k = 5))
    invariant(df => TextOps.bigramLmSurprisal(df, "doc_id", "text"))
    invariant(df => RobustStats.hodgesLehmann(df, col("lang") === "en",
      "n_chars"))
    invariant(df => EvalStats.cramersV(df, "source", "lang"))
    invariant(df => Mixing.horvitzThompson(
      df.withColumn("cents", col("n_chars")),
      "lang", "cents", "doc_id", nPerStratum = 10L))
  }

  test("round-8 operators are partitioning-invariant") {
    invariant { df =>
      val scoped = df.where(col("doc_id") < 200)
      DedupOps.exactJaccardJoinIncremental(
        scoped.where(col("doc_id") % 5 =!= 0),
        scoped.where(col("doc_id") % 5 === 0),
        "doc_id", "text", 19L, 20L)
    }
    // knnGraphAudit on the embeddings table (same invariance harness,
    // different source frame)
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .where(col("vec_id") < 150)
    val base = canon(SimilarityOps.knnGraphAudit(emb, "vec_id", "embedding", 5))
    assert(base.nonEmpty)
    assert(canon(SimilarityOps.knnGraphAudit(
      emb.repartition(7), "vec_id", "embedding", 5)) == base)
    assert(canon(SimilarityOps.knnGraphAudit(
      emb.repartition(3, col("vec_id")), "vec_id", "embedding", 5)) == base)
  }
}
