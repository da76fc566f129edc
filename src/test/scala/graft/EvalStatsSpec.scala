package graft

import graft.operators.EvalStats
import org.apache.spark.sql.functions._

/** Unit contracts for the evaluation-statistics family (EvalStats) —
  * hand-computable fixtures pinning the integer arithmetic the
  * q267–q270 oracles witness at corpus scale.
  */
class EvalStatsSpec extends SparkSpec {

  import spark.implicits._

  test("winRateMatrix: wins, ties-as-half, and pair orientation") {
    // items 1..3; m1 beats m2 on 1 and 3, ties on 2 -> 5/6 win rate.
    val df = Seq(
      ("m1", 1L, 10L), ("m2", 1L, 5L),
      ("m1", 2L, 7L), ("m2", 2L, 7L),
      ("m1", 3L, 2L), ("m2", 3L, 1L),
      ("m3", 1L, 99L) // co-scored with m1/m2 on item 1 only
    ).toDF("model", "item", "score")
    val out = EvalStats.winRateMatrix(df, "model", "item", "score")
      .orderBy("model_a", "model_b").collect()
    assert(out.length == 3)
    val m12 = out.find(r => r.getString(0) == "m1" && r.getString(1) == "m2").get
    assert(m12.getAs[Long]("n_common") == 3L)
    assert(m12.getAs[Long]("win_ppm") == (1000000L * 5) / 6) // (2+2+1)/6
    val m13 = out.find(r => r.getString(0) == "m1" && r.getString(1) == "m3").get
    assert(m13.getAs[Long]("n_common") == 1L && m13.getAs[Long]("win_ppm") == 0L)
    val m23 = out.find(r => r.getString(0) == "m2" && r.getString(1) == "m3").get
    assert(m23.getAs[Long]("win_ppm") == 0L)
  }

  test("winRateMatrix never pairs a model with itself or double-counts a pair") {
    val df = Seq(("a", 1L, 1L), ("b", 1L, 2L), ("c", 1L, 3L))
      .toDF("model", "item", "score")
    val out = EvalStats.winRateMatrix(df, "model", "item", "score").collect()
    assert(out.length == 3) // C(3,2), each once, oriented a<b
    out.foreach(r => assert(r.getString(0) < r.getString(1)))
  }

  test("poissonBootstrapCi: lo <= med <= hi, plausible center, determinism") {
    val df = (1 to 400).map(i => (s"doc $i text", i.toLong)).toDF("text", "x")
    val ci = EvalStats.poissonBootstrapCi(df, "text", "x", reps = 64)
      .orderBy("mean_micro").collect()
    assert(ci.map(_.getString(0)).toSeq == Seq("lo", "med", "hi"))
    val Seq(lo, med, hi) = ci.map(_.getAs[Long]("mean_micro")).toSeq
    assert(lo <= med && med <= hi)
    // true mean is 200.5; a 95% bootstrap CI on n=400 uniform[1,400]
    // has half-width ~ 1.96*sd/sqrt(n) ~ 11.3 — assert a generous 3x.
    assert(lo > 165L * 1000000 && hi < 235L * 1000000)
    assert(med > 190L * 1000000 && med < 211L * 1000000)
    val again = EvalStats.poissonBootstrapCi(df, "text", "x", reps = 64)
      .orderBy("mean_micro").collect()
    assert(again.map(_.toString).toSeq == ci.map(_.toString).toSeq)
  }

  test("spearmanFootrule: identical orders -> 0; reversed -> ppm near 1e6") {
    val up = (1 to 10).map(i => ("g", i.toLong, i.toLong))
    val down = (1 to 10).map(i => ("r", i.toLong, (11 - i).toLong))
    val df = (up ++ down).toDF("g", "x", "y")
    val out = EvalStats.spearmanFootrule(df, "g", "x", "y")
      .orderBy("g").collect()
    val same = out(0)
    assert(same.getAs[Long]("footrule2") == 0L && same.getAs[Long]("footrule_ppm") == 0L)
    val rev = out(1)
    // reversed order of n=10: footrule = 2*floor(n^2/2) doubled-rank = 2*50 = 100
    assert(rev.getAs[Long]("footrule2") == 100L)
    assert(rev.getAs[Long]("footrule_ppm") == 1000000L)
  }

  test("spearmanFootrule tie handling: average ranks keep ties symmetric") {
    // x has all-distinct ranks; y is constant -> every ry2 = n+1.
    val df = (1 to 5).map(i => ("g", i.toLong, 7L)).toDF("g", "x", "y")
    val out = EvalStats.spearmanFootrule(df, "g", "x", "y").collect()(0)
    // rx2 = 2,4,6,8,10; ry2 = 6 each -> |d| = 4+2+0+2+4 = 12
    assert(out.getAs[Long]("footrule2") == 12L)
  }

  test("abZSquared: hand-computed counts and z²") {
    // arm A: 6 rows 3 conv; arm B: 4 rows 1 conv.
    val df = (Seq.fill(3)(("A", true)) ++ Seq.fill(3)(("A", false)) ++
      Seq.fill(1)(("B", true)) ++ Seq.fill(3)(("B", false)))
      .toDF("arm", "conv")
    val r = EvalStats.abZSquared(df, col("arm") === "A", col("conv")).collect()(0)
    assert(r.getAs[Long]("n_a") == 6L && r.getAs[Long]("n_b") == 4L)
    assert(r.getAs[Long]("conv_a") == 3L && r.getAs[Long]("conv_b") == 1L)
    assert(r.getAs[Long]("rate_a_ppm") == 500000L)
    assert(r.getAs[Long]("rate_b_ppm") == 250000L)
    // z2 = (c1*n2-c2*n1)^2*N / (n1*n2*C*(N-C)) = (12-6)^2*10/(6*4*4*6) = 360/576
    assert(r.getAs[Long]("z2_micro") == (1000000L * 360) / 576)
  }

  test("abZSquared: zero conversions yield NULL z² (guarded division)") {
    val df = Seq(("A", false), ("B", false)).toDF("arm", "conv")
    val r = EvalStats.abZSquared(df, col("arm") === "A", col("conv")).collect()(0)
    assert(r.isNullAt(r.fieldIndex("z2_micro")))
  }

  test("copelandScores: majority head-to-heads, one total order") {
    // A vs B: 1 win 2 losses -> B beats A. A vs C: 2-1 -> A beats C.
    // B vs C: 2-1 -> B beats C. Copeland2: B=4, A=2, C=0.
    val df = Seq(
      ("A", 1L, 3L), ("A", 2L, 1L), ("A", 3L, 1L),
      ("B", 1L, 2L), ("B", 2L, 2L), ("B", 3L, 2L),
      ("C", 1L, 1L), ("C", 2L, 3L), ("C", 3L, 0L)).toDF("m", "i", "sc")
    val out = EvalStats.copelandScores(df, "m", "i", "sc")
      .orderBy(desc("copeland2"), col("model")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq(
      ("B", 2L, 0L, 0L, 4L), ("A", 1L, 0L, 1L, 2L), ("C", 0L, 0L, 2L, 0L)))
  }

  test("reliabilityBins: bin edges, clamping, and the signed gap") {
    // scores 100000/150000 land in bin 1; 950000 and the clamped
    // 1000000 land in bin 9 (top edge is inclusive).
    val df = Seq((100000L, false), (150000L, true),
      (950000L, true), (1000000L, true)).toDF("sc", "y")
    val out = EvalStats.reliabilityBins(df, "sc", col("y"), bins = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 2L, 125000L, 500000L, -375000L),
      (9L, 2L, 975000L, 1000000L, -25000L)))
  }

  test("mcnemar: only discordant pairs drive the statistic") {
    // (ra, rb) mix: 3x(T,F), 1x(F,T), 2x(T,T), 1x(F,F)
    // -> b=3, c=1, stat = 1000*(3-1)^2/(3+1) = 1000.
    val df = (Seq.fill(3)((true, false)) ++ Seq((false, true)) ++
      Seq.fill(2)((true, true)) ++ Seq((false, false)))
      .toDF("pa", "pb")
    val r = EvalStats.mcnemar(df, col("pa"), col("pb"), lit(true)).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (7L, 3L, 1L, 1000L))
  }

  test("mcnemar: no discordant pairs yields NULL (no evidence)") {
    val df = Seq((true, true), (false, false)).toDF("pa", "pb")
    val r = EvalStats.mcnemar(df, col("pa"), col("pb"), lit(true)).head()
    assert(r.isNullAt(r.fieldIndex("mcnemar_milli")))
  }

  test("jackknifeMeanBounds: extremes from dropping max/min; sign-split") {
    val df = Seq(("g", 1L), ("g", 2L), ("g", 10L), ("h", -5L), ("h", -7L))
      .toDF("grp", "v")
    val out = EvalStats.jackknifeMeanBounds(df, Seq("grp"), "v")
      .orderBy("grp").collect()
    // g: s=13 n=3 -> mean 4333, loo_min (13-10)*1000/2=1500,
    //    loo_max (13-1)*1000/2=6000, span 4500.
    val g = out(0)
    assert((g.getLong(1), g.getLong(2), g.getLong(3), g.getLong(4),
      g.getLong(5)) == (3L, 4333L, 1500L, 6000L, 4500L))
    // h: s=-12 n=2 -> mean -6000 (truncated toward zero),
    //    loo_min -7000 (drop the max -5), loo_max -5000, span 2000.
    val h = out(1)
    assert((h.getLong(1), h.getLong(2), h.getLong(3), h.getLong(4),
      h.getLong(5)) == (2L, -6000L, -7000L, -5000L, 2000L))
  }

  test("jackknifeMeanBounds: singleton group has NULL LOO bounds") {
    val df = Seq(("g", 5L)).toDF("grp", "v")
    val r = EvalStats.jackknifeMeanBounds(df, Seq("grp"), "v").head()
    assert(r.getLong(2) == 5000L)
    assert(r.isNullAt(r.fieldIndex("loo_min_milli")))
    assert(r.isNullAt(r.fieldIndex("influence_span_milli")))
  }

  test("mannWhitneyU: doubled midpoint tie-ranks and the tie term") {
    // A = {1,2,2}, B = {2,3}: pooled ranks 1,(3,3,3),5 so
    // R_A = 1+3+3 = 7 -> u2_a = 2*R_A - na(na+1) = 14-12 = 2
    // (A beats B on no pair, ties two -> U_A = 1, doubled 2);
    // u2_b = 2*na*nb - u2_a = 10; one tie group t=3 -> 27-3 = 24.
    val df = Seq((1L, true), (2L, true), (2L, true), (2L, false),
      (3L, false)).toDF("v", "a")
    val r = EvalStats.mannWhitneyU(df, col("a"), "v", buckets = 2).head()
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("u2_a") == 2L)
    assert(r.getAs[Long]("u2_b") == 10L)
    assert(r.getAs[Long]("tie_term") == 24L)
    // delta = (2-10)/(2*3*2) = -2/3 -> ppm truncated toward zero.
    assert(r.getAs[Long]("cliffs_delta_ppm") == -666666L)
  }

  test("mannWhitneyU: tie-free complete separation and bucket invariance") {
    // A = {5,6} above all of B = {1,2}: U_A = 4 -> u2_a = 8, u2_b = 0.
    val df = Seq((5L, true), (6L, true), (1L, false), (2L, false))
      .toDF("v", "a")
    for (b <- Seq(1, 3)) {
      val r = EvalStats.mannWhitneyU(df, col("a"), "v", buckets = b).head()
      assert(r.getAs[Long]("u2_a") == 8L && r.getAs[Long]("u2_b") == 0L)
      assert(r.getAs[Long]("tie_term") == 0L)
      assert(r.getAs[Long]("cliffs_delta_ppm") == 1000000L)
    }
  }

  test("aucDeLong: hand-traced placements, SE, and 49/25 CI") {
    // pos {2,3}, neg {1,2}: AUC = 3.5/4; placements .75/1 and
    // .75/1 give s10² = s01² = 1/32 -> Var = 1/32, se = .176776...
    val df = Seq((2L, true), (3L, true), (1L, false), (2L, false))
      .toDF("v", "p")
    val r = EvalStats.aucDeLong(df, "v", "p").head()
    assert(r.getAs[Long]("n_pos") == 2L && r.getAs[Long]("n_neg") == 2L)
    assert(r.getAs[Long]("auc_micro") == 875000L)
    assert(r.getAs[Long]("se_micro") == 176776L)
    assert(r.getAs[Long]("ci_lo_micro") == 528520L)
    assert(r.getAs[Long]("ci_hi_micro") == 1221480L)
  }

  test("aucDeLong: singleton class has exact AUC but NULL SE") {
    val df = Seq((5L, true), (1L, false), (2L, false)).toDF("v", "p")
    val r = EvalStats.aucDeLong(df, "v", "p").head()
    assert(r.getAs[Long]("auc_micro") == 1000000L)
    assert(r.isNullAt(r.fieldIndex("se_micro")))
  }

  test("mantelHaenszel: pooled vs crude OR on two hand strata") {
    // S1: a=2,b=1,c=1,d=2 (n=6); S2: a=b=c=d=1 (n=4).
    // MH = (4*4 + 1*6)/(1*4 + 1*6) = 22/10 = 2.2; crude = 9/4.
    val s1 = Seq((true, true), (true, true), (true, false), (false, true),
      (false, false), (false, false)).map { case (e, o) => ("s1", e, o) }
    val s2 = Seq((true, true), (true, false), (false, true), (false, false))
      .map { case (e, o) => ("s2", e, o) }
    val df = (s1 ++ s2).toDF("st", "e", "o")
    val r = EvalStats.mantelHaenszel(df, "st", "e", "o").head()
    assert(r.getAs[Long]("n_strata") == 2L)
    assert(r.getAs[Long]("or_crude_micro") == 2250000L)
    assert(r.getAs[Long]("or_mh_micro") == 2200000L)
  }

  test("mantelHaenszel: zero discordant denominator yields NULL") {
    val df = Seq(("s", true, true), ("s", false, false)).toDF("st", "e", "o")
    val r = EvalStats.mantelHaenszel(df, "st", "e", "o").head()
    assert(r.isNullAt(r.fieldIndex("or_mh_micro")))
  }

  test("medianCI: exact binomial bracket at n=7, vacuous below n=6") {
    // n=7: l=1 (40*C(7,0)=40 <= 128; 40*8=320 > 128) -> bracket
    // [1, 7], conf = 1e6*126/128 = 984375. n=5: no 95% bracket.
    val seven = (0 to 6).map(b => ("e7", b.toLong, (b + 1).toLong))
    val five = (0 to 4).map(b => ("e5", b.toLong, (b + 10).toLong))
    val df = (seven ++ five).toDF("e", "b", "v")
    val out = EvalStats.medianCI(df, "e", "b", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    val r7 = out("e7")
    assert(r7.getAs[Long]("n_days") == 7L)
    assert(r7.getAs[Long]("lo") == 1L && r7.getAs[Long]("hi") == 7L)
    assert(r7.getAs[Long]("median") == 4L)
    assert(r7.getAs[Long]("conf_ppm") == 984375L)
    val r5 = out("e5")
    assert(r5.isNullAt(r5.fieldIndex("lo")))
    assert(r5.getAs[Long]("median") == 12L)
    assert(r5.isNullAt(r5.fieldIndex("conf_ppm")))
  }

  test("diffInDiff: exact rational over the common denominator") {
    // A: pre {1,3} -> post {10}; B: pre {2} -> post {4,6}:
    // dd = (10-2) - (5-2) = 5, exactly (num 20 / den 4).
    val df = Seq((true, false, 1L), (true, false, 3L), (true, true, 10L),
      (false, false, 2L), (false, true, 4L), (false, true, 6L))
      .toDF("a", "p", "v")
    val r = EvalStats.diffInDiff(df, "a", "p", "v").head()
    assert(r.getAs[Long]("mean_a_post") == 10L)
    assert(r.getAs[Long]("mean_a_pre") == 2L)
    assert(r.getAs[Long]("mean_b_post") == 5L)
    assert(r.getAs[Long]("dd") == 5L)
    // swapped arms negate it exactly
    val neg = EvalStats.diffInDiff(df.withColumn("a", !col("a")),
      "a", "p", "v").head()
    assert(neg.getAs[Long]("dd") == -5L)
  }

  test("diffInDiff: empty cell yields NULL, not a crash") {
    val df = Seq((true, true, 1L), (false, false, 2L), (false, true, 3L))
      .toDF("a", "p", "v")
    val r = EvalStats.diffInDiff(df, "a", "p", "v").head()
    assert(r.isNullAt(r.fieldIndex("dd")))
  }

  test("signTest: exact binomial tails, ties dropped") {
    // up: 1,2,3,4 -> 3/3 ups, p = C(3,3)/8 = 125000 ppm;
    // mixed: 1,2,1 -> 1/2 ups, p = (C(2,1)+C(2,2))/4 = 750000;
    // tie: 1,1,2 -> the tie is dropped, 1/1 up, p = 1/2.
    val df = (Seq(("up", 0L, 1L), ("up", 1L, 2L), ("up", 2L, 3L), ("up", 3L, 4L)) ++
      Seq(("mix", 0L, 1L), ("mix", 1L, 2L), ("mix", 2L, 1L)) ++
      Seq(("tie", 0L, 1L), ("tie", 1L, 1L), ("tie", 2L, 2L)))
      .toDF("e", "b", "v")
    val out = EvalStats.signTest(df, "e", "b", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("up") == ((3L, 3L, 125000L)))
    assert(out("mix") == ((2L, 1L, 750000L)))
    assert(out("tie") == ((1L, 1L, 500000L)))
  }

  test("signTest: running-coefficient tail equals exact BigInt tails, all (n,k) n<=20") {
    // One synthetic entity per (n, k): a strictly rising run of k+? —
    // easier to drive the fold directly by constructing sequences with
    // exactly k ups out of n non-tie changes (k ups then n-k downs,
    // values kept positive and never tying).
    val rows = for {
      n <- 1 to 20; k <- 0 to n
      seq = {
        // start at 1000; k increments of +2, then n-k decrements of -1
        val deltas = Seq.fill(k)(2L) ++ Seq.fill(n - k)(-1L)
        deltas.scanLeft(1000L)(_ + _)
      }
      (v, i) <- seq.zipWithIndex
    } yield (s"e_${n}_$k", i.toLong, v)
    val out = EvalStats.signTest(rows.toDF("e", "b", "v"), "e", "b", "v")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    def choose(n: Int, i: Int): BigInt =
      (1 to i).foldLeft(BigInt(1))((c, j) => c * (n - j + 1) / j)
    for (n <- 1 to 20; k <- 0 to n) {
      val tail = (k to n).map(choose(n, _)).sum
      val expect = (BigInt(1000000) * tail / (BigInt(1) << n)).toLong
      assert(out(s"e_${n}_$k") == expect, s"n=$n k=$k")
    }
  }

  test("signTest: spans past 66 changed buckets raise loudly; 66 stays BigInt-exact") {
    // SQL div truncates its quotient to BIGINT and silently WRAPS
    // past 2^63 even under ANSI (C(67,33) is the first casualty) —
    // the operator must refuse, never return a silently wrong value
    val rows = (0 to 67).map(i =>
      ("e", i.toLong, if (i % 2 == 0) 10L else 20L))
    val e = intercept[Exception] {
      EvalStats.signTest(rows.toDF("e", "b", "v"), "e", "b", "v").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++
        msgs(x.getCause))
    assert(msgs(e).exists(_.contains("66")), s"wrong failure: ${msgs(e)}")
    // the 66-change boundary computes and matches exact BigInt math
    val ok = (0 to 66).map(i =>
      ("e", i.toLong, if (i % 2 == 0) 10L else 20L))
    val out = EvalStats.signTest(ok.toDF("e", "b", "v"), "e", "b", "v")
      .collect()
    def choose(n: Int, i: Int): BigInt =
      (1 to i).foldLeft(BigInt(1))((c, j) => c * (n - j + 1) / j)
    val expect = (BigInt(1000000) *
      (33 to 66).map(choose(66, _)).sum / (BigInt(1) << 66)).toLong
    assert(out.length == 1 && out.head.getLong(3) == expect,
      s"n = 66 must stay exactly computable, got ${out.toSeq}")
  }

  test("medianCI: spans past 66 buckets raise loudly (the same BIGINT-quotient line)") {
    val rows = (0 to 67).map(i => ("e", i.toLong, i.toLong))
    val e = intercept[Exception] {
      EvalStats.medianCI(rows.toDF("e", "b", "v"), "e", "b", "v").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++
        msgs(x.getCause))
    assert(msgs(e).exists(_.contains("66")), s"wrong failure: ${msgs(e)}")
    // 66 buckets still compute a valid bracket
    val ok = EvalStats.medianCI((0 to 65).map(i => ("e", i.toLong, i.toLong))
      .toDF("e", "b", "v"), "e", "b", "v").collect()
    assert(ok.length == 1 && !ok.head.isNullAt(4))
  }

  test("bhAdjust: step-up boundary rejects exactly the ranks below i*") {
    // m=4, q=0.1: ranks 1,2 pass (p·4 ≤ 1e5·rank), 3,4 fail -> i*=2.
    val df = Seq(("a", 10000L), ("b", 30000L), ("c", 200000L),
      ("d", 900000L)).toDF("tid", "p")
    val out = EvalStats.bhAdjust(df, "tid", "p").orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      ("a", 1L, 25000L, true), ("b", 2L, 50000L, true),
      ("c", 3L, 75000L, false), ("d", 4L, 100000L, false)))
  }

  test("bhAdjust: nothing passes -> empty rejection set, not a crash") {
    val df = Seq(("a", 900000L), ("b", 990000L)).toDF("tid", "p")
    val out = EvalStats.bhAdjust(df, "tid", "p").collect()
    assert(out.forall(!_.getBoolean(4)))
  }

  test("wilsonBounds: z=1 interval for 1/4 is exactly [0.1, 0.5]") {
    // x = 1e6*(4*4*1*3*1e6 + 16e6) = 6.4e13, a perfect square
    // (isqrt = 8e6); ctr = 1.2e7, den = 4e7 -> [100000, 500000].
    val df = Seq(("g", true), ("g", false), ("g", false), ("g", false))
      .toDF("grp0", "succ")
    val r = EvalStats.wilsonBounds(df, "grp0", "succ", z2Micro = 1000000L)
      .head()
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("successes") == 1L)
    assert(r.getAs[Long]("rate_ppm") == 250000L)
    assert(r.getAs[Long]("wilson_lo_ppm") == 100000L)
    assert(r.getAs[Long]("wilson_hi_ppm") == 500000L)
  }

  test("wilsonBounds: zero successes still get a positive upper bound") {
    // 0/3 at z=1: upper = z²/(n+z²) = 1/4; lower pins to 0.
    val df = Seq(("g", false), ("g", false), ("g", false)).toDF("g0", "s0")
    val r = EvalStats.wilsonBounds(df, "g0", "s0", z2Micro = 1000000L).head()
    assert(r.getAs[Long]("wilson_lo_ppm") == 0L)
    assert(r.getAs[Long]("wilson_hi_ppm") == 250000L)
  }

  test("splitConformal: nearest-rank q-hat and test coverage") {
    // cal 1..10: med = 5, |v-5| sorted has rank-10 value 5 (k =
    // (9*11+9)//10 = 10) -> qhat = 5; test {0, 11, 5} covers 2/3.
    val cal = (1 to 10).map(v => ("g", v.toLong, true))
    val tst = Seq(("g", 0L, false), ("g", 11L, false), ("g", 5L, false))
    val df = (cal ++ tst).toDF("grp0", "v", "cal")
    val r = EvalStats.splitConformal(df, "grp0", "v", "cal").head()
    assert(r.getAs[Long]("n_cal") == 10L && r.getAs[Long]("n_test") == 3L)
    assert(r.getAs[Long]("qhat") == 5L)
    assert(r.getAs[Long]("covered") == 2L)
    assert(r.getAs[Long]("coverage_ppm") == 666666L)
  }

  test("splitConformal: tiny calibration set yields the vacuous band") {
    // n_cal = 3 -> k = 4 > 3 -> qhat NULL, coverage 1e6 by convention.
    val df = Seq(("g", 1L, true), ("g", 2L, true), ("g", 3L, true),
      ("g", 99L, false)).toDF("grp0", "v", "cal")
    val r = EvalStats.splitConformal(df, "grp0", "v", "cal").head()
    assert(r.isNullAt(r.fieldIndex("qhat")))
    assert(r.getAs[Long]("coverage_ppm") == 1000000L)
  }

  test("isotonicFit: violating middle bucket pools with its left neighbor") {
    // raw rates 1/2, 0/2, 2/2: minimax pools buckets 0-1 to 1/4 and
    // leaves bucket 2 at 1 — hand-traced max-min over block means.
    val df = Seq((0L, true), (0L, false), (1L, false), (1L, false),
      (2L, true), (2L, true)).toDF("b", "y")
    val out = EvalStats.isotonicFit(df, "b", "y").orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (0L, 2L, 1L, 500000L, 250000L),
      (1L, 2L, 0L, 0L, 250000L),
      (2L, 2L, 2L, 1000000L, 1000000L)))
  }

  test("isotonicFit: already-monotone rates are a fixed point") {
    val df = Seq((0L, false), (0L, false), (1L, true), (1L, false),
      (2L, true), (2L, true)).toDF("b", "y")
    val out = EvalStats.isotonicFit(df, "b", "y").orderBy("bucket").collect()
      .map(r => (r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((0L, 0L), (500000L, 500000L), (1000000L, 1000000L)))
  }

  test("isotonicFit: descending input pools to the global mean") {
    // rates 1, 1/2, 0 -> every block violates; fit is flat 3/6 = 1/2.
    val df = Seq((0L, true), (0L, true), (1L, true), (1L, false),
      (2L, false), (2L, false)).toDF("b", "y")
    val out = EvalStats.isotonicFit(df, "b", "y").orderBy("bucket").collect()
      .map(_.getLong(4))
    assert(out.toSeq == Seq(500000L, 500000L, 500000L))
  }

  test("brierDecomposition: perfect forecasts have zero brier/rel, full resolution") {
    // k=10 twice (both positive), k=0 twice (both negative):
    // brier = 0, rel = 0, obar = 1/2 -> res = unc = 250000 ppm.
    val df = Seq((10L, true), (10L, true), (0L, false), (0L, false))
      .toDF("k", "o")
    val r = EvalStats.brierDecomposition(df, "k", col("o")).collect().head
    assert((r.getLong(0), r.getLong(1)) == ((4L, 2L)))
    assert(r.getLong(2) == 0L)       // brier_ppm
    assert(r.getLong(3) == 0L)       // rel_ppm
    assert(r.getLong(4) == 250000L)  // res_ppm
    assert(r.getLong(5) == 250000L)  // unc_ppm
  }

  test("brierDecomposition: constant uninformative forecast = pure reliability gap") {
    // always claim k=5 (p=.5); outcomes 3/4 positive: brier exact
    // 10^6*(25*4-100*3+100*3)/(100*4) = 250000; rel = (500000-750000)^2
    // *4 div (10^6*4) = 62500; res = 0.
    val df = Seq((5L, true), (5L, true), (5L, true), (5L, false))
      .toDF("k", "o")
    val r = EvalStats.brierDecomposition(df, "k", col("o")).collect().head
    assert(r.getLong(2) == 250000L)
    assert(r.getLong(3) == 62500L)
    assert(r.getLong(4) == 0L)
    // unc = 750000*250000 div 10^6
    assert(r.getLong(5) == 187500L)
  }

  test("brierDecomposition: out-of-range forecast numerator raises") {
    val df = Seq((11L, true)).toDF("k", "o")
    val e = intercept[Exception](
      EvalStats.brierDecomposition(df, "k", col("o")).collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("brierDecomposition")))
  }

  test("cochranQ: hand fixture Q = 3 exactly") {
    // subjects (1,1,0),(1,0,0),(1,1,1),(0,0,0): C=(3,2,1), T=6,
    // sumR^2=14 -> Q = 2*18/(3*(18-14)) = 3.
    val df = Seq((1, 1, 0), (1, 0, 0), (1, 1, 1), (0, 0, 0))
      .toDF("a", "b", "c")
    val r = EvalStats.cochranQ(df,
      Seq(col("a") === 1, col("b") === 1, col("c") === 1)).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 3L, 3000000L)))
  }

  test("cochranQ: degenerate all-identical answers yield NULL, not 0") {
    val df = Seq((1, 1), (0, 0)).toDF("a", "b")
    val r = EvalStats.cochranQ(df,
      Seq(col("a") === 1, col("b") === 1)).collect().head
    assert(r.isNullAt(2))
  }

  test("friedmanRanks: perfect agreement across blocks and midrank ties") {
    // two blocks, identical order -> Fr = 4 exactly
    val agree = Seq((1L, "x", 1L), (1L, "y", 2L), (1L, "z", 3L),
      (2L, "x", 1L), (2L, "y", 2L), (2L, "z", 3L)).toDF("b", "tr", "v")
    val r1 = EvalStats.friedmanRanks(agree, "b", "tr", "v").collect().head
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2)) == ((2L, 3L, 4000000L)))
    // one block with a tie (1,1,2): midranks (1.5,1.5,3) -> Fr = 1.5
    val tied = Seq((1L, "x", 1L), (1L, "y", 1L), (1L, "z", 2L))
      .toDF("b", "tr", "v")
    val r2 = EvalStats.friedmanRanks(tied, "b", "tr", "v").collect().head
    assert(r2.getLong(2) == 1500000L)
  }

  test("friedmanRanks: incomplete blocks raise instead of silently skewing ranks") {
    val df = Seq((1L, "x", 1L), (1L, "y", 2L), (2L, "x", 1L))
      .toDF("b", "tr", "v")
    val e = intercept[Exception](
      EvalStats.friedmanRanks(df, "b", "tr", "v").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("friedmanRanks")))
  }

  test("captureRecapture: Chapman and Lincoln-Petersen hand fixture") {
    val a = Seq(1L, 2L, 3L, 3L).toDF("id") // dup collapses
    val b = Seq(2L, 3L, 4L, 5L).toDF("id")
    val r = EvalStats.captureRecapture(a, b, "id").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 4L, 2L)))
    assert(r.getLong(3) == 5L) // (4*5) div 3 - 1
    assert(r.getLong(4) == 6L) // 12 div 2
    // disjoint detectors: chapman still defined, lincoln NULL
    val r2 = EvalStats.captureRecapture(
      Seq(1L).toDF("id"), Seq(2L).toDF("id"), "id").collect().head
    assert(r2.getLong(3) == 3L && r2.isNullAt(4))
  }

  test("bradleyTerry: shutout collapses to zero strength; winner takes the whole mass") {
    // A beats B 3-0: every MM iteration gives s_A = 2e6, s_B = 0;
    // normalization to k·1e6 = 2e6 keeps (2000000, 0).
    val pairs = Seq(("A", "B", 3L, 0L)).toDF("a", "b", "wa", "wb")
    val out = EvalStats.bradleyTerry(pairs, "a", "b", "wa", "wb")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("A") == ((3L, 3L, 2000000L)))
    assert(out("B") == ((3L, 0L, 0L)))
  }

  test("bradleyTerry: transitive wins order strengths; masses sum to k ppm") {
    val pairs = Seq(("A", "B", 2L, 1L), ("B", "C", 2L, 1L), ("A", "C", 3L, 0L))
      .toDF("a", "b", "wa", "wb")
    val out = EvalStats.bradleyTerry(pairs, "a", "b", "wa", "wb")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("A") > out("B") && out("B") > out("C"),
      s"expected A > B > C, got $out")
    val sum = out.values.sum
    assert(sum <= 3000000L && sum > 3000000L - 5L,
      s"normalized strengths must sum to ~3e6 (floor loss < k), got $sum")
  }

  test("fleissKappa: perfect agreement, disagreement sign, degenerate NULL") {
    val conds = Seq(col("a") === 1, col("b") === 1, col("c") === 1)
    // unanimous on every item -> kappa = 1
    val perfect = Seq((1, 1, 1), (0, 0, 0)).toDF("a", "b", "c")
    assert(EvalStats.fleissKappa(perfect, conds).collect().head.getLong(2)
      == 1000000L)
    // systematic disagreement (1-of-3 vs 2-of-3): kappa = -72/216 ->
    // sign-split floor = -333333
    val dis = Seq((1, 0, 0), (0, 1, 1)).toDF("a", "b", "c")
    assert(EvalStats.fleissKappa(dis, conds).collect().head.getLong(2)
      == -333333L)
    // all raters always positive: chance agreement is total -> NULL
    val const = Seq((1, 1, 1), (1, 1, 1)).toDF("a", "b", "c")
    assert(EvalStats.fleissKappa(const, conds).collect().head.isNullAt(2))
  }

  test("cramersV: perfect association = 1e6 ppm, independence = 0") {
    val perfect = (Seq.fill(5)(("r0", "c0")) ++ Seq.fill(5)(("r1", "c1")))
      .toDF("r", "c")
    val p = EvalStats.cramersV(perfect, "r", "c").collect().head
    assert((p.getLong(0), p.getLong(1), p.getLong(2)) == ((10L, 2L, 2L)))
    assert(p.getLong(4) == 1000000L)
    val indep = (for { r <- Seq("r0", "r1"); c <- Seq("c0", "c1");
      _ <- 1 to 5 } yield (r, c)).toDF("r", "c")
    val i = EvalStats.cramersV(indep, "r", "c").collect().head
    assert(i.getLong(3) == 0L && i.getLong(4) == 0L)
    // a single-column table has no association dimension -> NULL
    val onecol = Seq(("r0", "c0"), ("r1", "c0")).toDF("r", "c")
    assert(EvalStats.cramersV(onecol, "r", "c").collect().head.isNullAt(4))
  }

  test("stratifiedContrast: per-stratum arms, decimal sums, NULL on empty arm") {
    val df = Seq(
      (0L, true, "2.00"), (0L, true, "4.00"), (0L, false, "1.00"),
      (1L, true, "9.00")).toDF("s", "tr", "y")
      .withColumn("y", col("y").cast("decimal(18,2)"))
    val out = EvalStats.stratifiedContrast(df, "s", col("tr"), "y")
      .orderBy("stratum").collect()
    val s0 = out(0)
    assert((s0.getLong(1), s0.getLong(2)) == ((2L, 1L)))
    assert(s0.getDecimal(3).doubleValue() == 6.0)
    assert(s0.getDecimal(4).doubleValue() == 1.0)
    assert(s0.getDouble(5) == 2.0)
    val s1 = out(1)
    assert(s1.getLong(2) == 0L && s1.isNullAt(5))
  }

  test("krippendorffAlpha: missing ratings, unpairable drop, hand value") {
    // u1 (a,a), u2 (a,b), u3 (b,b,b), u4 (a,b,b); u5 has ONE rating
    // (category 'c') and must drop entirely — from n AND from the
    // category margins. L = lcm(1,2) = 2:
    // DoL = 2·(1·1+1·1) [u2] + 1·(1·2+2·1) [u4] = 8; n = 10,
    // n_a = 4, n_b = 6 -> De = 4·6+6·4 = 48;
    // alpha = 1e6 − (1e6·9·8) div (2·48) = 250000 (true 0.25)
    val r = Seq(
      (1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"),
      (3L, "b"), (3L, "b"), (3L, "b"),
      (4L, "a"), (4L, "b"), (4L, "b"),
      (5L, "c")).toDF("u", "c")
    val out = EvalStats.krippendorffAlpha(r, "u", "c", maxRatersPerUnit = 3)
      .collect().head
    assert((out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3))
      == ((4L, 10L, 2L, 250000L)))
    // perfect agreement -> exactly 1e6
    val perf = Seq((1L, "x"), (1L, "x"), (2L, "y"), (2L, "y")).toDF("u", "c")
    assert(EvalStats.krippendorffAlpha(perf, "u", "c", 3)
      .collect().head.getLong(3) == 1000000L)
    // one category everywhere: De = 0 -> NULL, never a fake 1
    val mono = Seq((1L, "x"), (1L, "x"), (2L, "x"), (2L, "x")).toDF("u", "c")
    assert(EvalStats.krippendorffAlpha(mono, "u", "c", 3)
      .collect().head.isNullAt(3))
  }

  test("thresholdSweep: suffix-sum confusion, J tie to permissive cutoff, perfect split") {
    // pos scores {3,4}, neg {1,3}: J(1) = 0, J(3) = J(4) = 500000 —
    // the tie resolves to the SMALLEST threshold 3, where F1 =
    // 2e6·2/(2+1+2) = 800000
    val df = Seq((3L, true), (4L, true), (1L, false), (3L, false))
      .toDF("s", "lab")
    val r = EvalStats.thresholdSweep(df, "s", col("lab")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((2L, 2L, 3L, 3L, 500000L, 800000L)))
    // perfectly separable: J = F1 = 1e6 exactly at the class boundary
    val sep = Seq((5L, true), (6L, true), (1L, false), (2L, false))
      .toDF("s", "lab")
    val rp = EvalStats.thresholdSweep(sep, "s", col("lab")).collect().head
    assert((rp.getLong(3), rp.getLong(4), rp.getLong(5))
      == ((5L, 1000000L, 1000000L)))
    // single-class pool: no trade-off to optimize -> the WHOLE
    // operating point is NULL (threshold and F1, not just J)
    val mono = Seq((1L, true), (2L, true)).toDF("s", "lab")
    val rm = EvalStats.thresholdSweep(mono, "s", col("lab")).collect().head
    assert(rm.isNullAt(3) && rm.isNullAt(4) && rm.isNullAt(5))
    assert((rm.getLong(0), rm.getLong(1), rm.getLong(2)) == ((2L, 0L, 2L)))
  }

  test("gwetAC1: hand value, and the prevalence paradox vs fleissKappa") {
    // Two raters on 4 items with a-counts {2,1,2,0}: S1 = 6, SA = 5,
    // Nn = 8 -> num = 6·64 − 30·8 = 144, den = 8·(64−30) = 272 ->
    // ac1 = 529411 (true 0.5294)
    val df = Seq((2L, 0L), (1L, 1L), (2L, 0L), (0L, 2L)).toDF("p", "q")
    val out = EvalStats.gwetAC1(df,
      Seq(col("p") >= 1L, col("p") >= 2L)).collect().head
    assert((out.getLong(0), out.getLong(1), out.getLong(2))
      == ((4L, 2L, 529411L)))
    // the paradox: 99 all-positive items + 1 split item. Observed
    // agreement is 99% but kappa collapses to ~0 (chance term ≈ Pa)
    // while AC1 stays high (chance term ≈ 0) — the whole point.
    val skew = (Seq.fill(99)((1L, 1L)) :+ (1L, 0L)).toDF("r1", "r2")
    val conds = Seq(col("r1") === 1L, col("r2") === 1L)
    val kappa = EvalStats.fleissKappa(skew, conds).collect().head.getLong(2)
    val ac1 = EvalStats.gwetAC1(skew, conds).collect().head.getLong(2)
    assert(kappa < 0L)              // kappa punishes the prevalence
    assert(ac1 > 900000L)           // AC1 reads the 99% agreement
  }

  test("concordanceCorrelation: scale bias penalized, identity exact, sign split") {
    // g1: y = 2x — Pearson r = 1 but CCC must punish the scale bias:
    // num = 2(2·10 − 18) = 4, den = 1 + 4 + 9 = 14 -> 285714
    // g2: y = x (shifted pairs) -> exactly 1e6
    val df = Seq(("g1", 1L, 2L), ("g1", 2L, 4L),
      ("g2", 3L, 3L), ("g2", 7L, 7L)).toDF("g", "x", "y")
    val out = EvalStats.concordanceCorrelation(df, "x", "y", Seq("g"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g1").getLong(2) == 285714L)
    assert(out("g2").getLong(2) == 1000000L)
    // anticorrelated with offset: num = −2, den = 38 -> −52631
    val neg = Seq(("n", 1L, -1L), ("n", 2L, -2L)).toDF("g", "x", "y")
    assert(EvalStats.concordanceCorrelation(neg, "x", "y", Seq("g"))
      .collect().head.getLong(2) == -52631L)
    // both sides constant and equal: den = 0 -> NULL
    val cst = Seq(("c", 5L, 5L), ("c", 5L, 5L)).toDF("g", "x", "y")
    assert(EvalStats.concordanceCorrelation(cst, "x", "y", Seq("g"))
      .collect().head.isNullAt(2))
  }
}
