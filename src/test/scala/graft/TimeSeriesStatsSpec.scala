package graft

import graft.operators.{Sequencing, TimeSeries}
import org.apache.spark.sql.functions._

/** Unit contracts for the Batch-3 extensions: integer-exact ACF,
  * phase-of-period seasonal index, and run-length layout stats — the
  * hand-computable fixtures behind the q274–q276 corpus witnesses.
  */
class TimeSeriesStatsSpec extends SparkSpec {

  import spark.implicits._

  private val G = 1000000000L // nanos per second

  /** One event per listed (bucket, count) cell at bucketSec=1. */
  private def series(xs: Seq[Long]) =
    xs.zipWithIndex
      .flatMap { case (n, t) => Seq.fill(n.toInt)(t.toLong * G) }
      .toDF("ts")

  test("acf: constant series has zero denominator -> NULL acf, pairs counted") {
    val out = TimeSeries.acf(series(Seq(3, 3, 3, 3)), "ts", Seq(1, 2), 1L)
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 3L), (2L, 2L)))
    assert(out.forall(_.isNullAt(2)))
  }

  test("acf: alternating series is perfectly anti-correlated at lag 1") {
    // counts 1,3,1,3,... mean 2; c_t alternates ±N -> r1 = -1, r2 = +1.
    val out = TimeSeries.acf(series(Seq(1, 3, 1, 3, 1, 3)), "ts", Seq(1, 2), 1L)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("acf_ppm")).toMap
    // r1 = -(n_pairs=5 terms sum -5N²)/den(6N²) = -5/6; r2 = 4/6
    assert(out(1L) == -833334L || out(1L) == -833333L)
    assert(out(2L) == 666666L)
    // pin exactly: num1 = -5·N², den = 6·N² -> floor(-1e6*5/6) via
    // sign*floor(|.|): -(833333) = -833333
    assert(out(1L) == -833333L)
  }

  test("acf is gap-aware: missing buckets contribute no pairs") {
    // buckets 0,1,2 then a hole at 3, then 4: lag-1 pairs = (0,1),(1,2),
    // hole kills (2,3),(3,4) -> 2 pairs.
    val df = Seq(0L, 1L, 2L, 4L).map(_ * G).toDF("ts")
    val out = TimeSeries.acf(df, "ts", Seq(1), 1L).collect()
    assert(out(0).getLong(1) == 2L)
  }

  test("seasonalIndex: uniform phases index to 1e6; share sums to ~1e6") {
    val df = (0 until 21).map(_.toLong * 86400L * G).toDF("ts")
    val out = TimeSeries.seasonalIndex(df, "ts", 86400L, 7).collect()
    assert(out.length == 7)
    assert(out.forall(_.getAs[Long]("index_ppm") == 1000000L))
    assert(out.map(_.getAs[Long]("share_ppm")).sum <= 1000000L)
  }

  test("seasonalIndex: a loaded phase indexes above, others below") {
    // phase 0 gets 8 events, phases 1..6 get 1 each (total 14).
    val df = (Seq.fill(8)(0L) ++ (1 to 6).map(_.toLong))
      .map(_ * 86400L * G).toDF("ts")
    val out = TimeSeries.seasonalIndex(df, "ts", 86400L, 7)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("index_ppm")).toMap
    assert(out(0L) == 4000000L) // 7*8/14 = 4x the average
    assert((1L to 6L).forall(p => out(p) == 500000L))
  }

  test("runLengthStats: hand-built runs, null-safe equality, per-column rows") {
    val df = Seq(
      (1L, 1, "a", "x"), (2L, 1, "a", "y"), (3L, 1, "b", "y"),
      (4L, 1, "b", "y"), (5L, 1, "a", null), (6L, 1, "a", null))
      .toDF("k", "i", "c1", "c2")
    val out = Sequencing.runLengthStats(df, "k", "i", Seq("c1", "c2"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // c1: a,a,b,b,a,a -> 3 runs; c2: x,y,y,y,null,null -> 3 runs (nulls run)
    assert(out("c1") == ((6L, 3L, 2000000L)))
    assert(out("c2") == ((6L, 3L, 2000000L)))
  }

  test("runLengthStats: sorted layout collapses to one run per value") {
    val df = (1 to 100).map(i => (i.toLong, 1, if (i <= 50) "a" else "b"))
      .toDF("k", "i", "c")
    val out = Sequencing.runLengthStats(df, "k", "i", Seq("c")).collect()(0)
    assert(out.getLong(1) == 100L && out.getLong(2) == 2L)
    assert(out.getLong(3) == 50000000L)
  }

  test("burstiness: silent days counted in span, Fano exact") {
    val day = 86400L * 1000000000L
    // e1: day0 x3, day2 x1 -> span 3, s=4, q=10,
    //   fano = 1000*(3*10-16)/(3*4) = 14000/12 = 1166 (truncated).
    // e2: one event -> span 1, variance 0 -> fano 0.
    val df = Seq(("e1", 100L), ("e1", 200L), ("e1", 300L),
      ("e1", 2 * day + 5L), ("e2", 5 * day)).toDF("u", "ts")
    val out = TimeSeries.burstiness(df, "ts", "u")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("e1") == ((3L, 2L, 4L, 1166L)))
    assert(out("e2") == ((1L, 1L, 1L, 0L)))
  }

  test("burstiness: uniform one-per-day entity has Fano 0") {
    val day = 86400L * 1000000000L
    val df = (0 until 10).map(i => ("u", i * day + 7L)).toDF("u", "ts")
    val r = TimeSeries.burstiness(df, "ts", "u").head()
    assert(r.getLong(1) == 10L && r.getLong(2) == 10L)
    assert(r.getLong(4) == 0L)
  }

  test("detectPeaks: strict maxima with topographic prominence") {
    // counts per day: [1,5,1,3,1,6,1] -> peaks at days 1 (prom 4,
    // right scan latches at the higher 6), 3 (prom 2, both scans
    // latch), 5 (prom 5, the summit: valleys run to the edges).
    val counts = Seq(1, 5, 1, 3, 1, 6, 1)
    val day = 86400L * 1000000000L
    val df = counts.zipWithIndex
      .flatMap { case (n, d) => Seq.fill(n)(("k", d * day + 9L)) }
      .toDF("k", "ts")
    val out = TimeSeries.detectPeaks(df, "ts", "k", minProminence = 1L)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 5L, 4L), (3L, 3L, 2L), (5L, 6L, 5L)))
  }

  test("detectPeaks: prominence threshold filters ripples") {
    val counts = Seq(1, 5, 1, 3, 1, 6, 1)
    val day = 86400L * 1000000000L
    val df = counts.zipWithIndex
      .flatMap { case (n, d) => Seq.fill(n)(("k", d * day + 9L)) }
      .toDF("k", "ts")
    val out = TimeSeries.detectPeaks(df, "ts", "k", minProminence = 4L)
      .orderBy("bucket").collect().map(_.getLong(1))
    assert(out.toSeq == Seq(1L, 5L))
  }

  test("seriesCorrelation: mirrored series are exactly -1, equal series +1") {
    // a: 1,2,3 and b: 3,2,1 per bucket -> r = -1e6; c copies a -> +1e6.
    def rows(k: String, counts: Seq[Int]) =
      counts.zipWithIndex.flatMap { case (n, b) =>
        Seq.fill(n)((k, b.toLong * G)) }
    val df = (rows("a", Seq(1, 2, 3)) ++ rows("b", Seq(3, 2, 1)) ++
      rows("c", Seq(1, 2, 3))).toDF("k", "ts")
    val out = TimeSeries.seriesCorrelation(df, "ts", "k", bucketSec = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(out(("a", "b")) == -1000000L)
    assert(out(("a", "c")) == 1000000L)
    assert(out(("b", "c")) == -1000000L)
  }

  test("seriesCorrelation: lag 1 catches a perfect one-bucket lead") {
    def rows(k: String, cells: Seq[(Int, Int)]) =
      cells.flatMap { case (b, n) => Seq.fill(n)((k, b.toLong * G)) }
    val df = (rows("x", Seq(0 -> 1, 1 -> 2, 2 -> 3)) ++
      rows("y", Seq(1 -> 1, 2 -> 2, 3 -> 3))).toDF("k", "ts")
    val out = TimeSeries.seriesCorrelation(df, "ts", "k", bucketSec = 1L,
        lag = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out(("x", "y")) == ((3L, 1000000L)))
    // the reverse direction is NOT a lead: y_t vs x_{t+1} pairs
    // (1,2),(2,3),(3,0) with means 2 -> r = (3*8-6*6)/sqrt(6*...)<0
    assert(out(("y", "x"))._2 < 0L)
  }

  test("seriesCorrelation: a flat series has no defined correlation") {
    def rows(k: String, counts: Seq[Int]) =
      counts.zipWithIndex.flatMap { case (n, b) =>
        Seq.fill(n)((k, b.toLong * G)) }
    val df = (rows("a", Seq(1, 2, 3)) ++ rows("flat", Seq(2, 2, 2)))
      .toDF("k", "ts")
    val r = TimeSeries.seriesCorrelation(df, "ts", "k", bucketSec = 1L)
      .head()
    assert(r.isNullAt(3))
  }

  test("kaplanMeier: censored subjects thin the risk set without dying") {
    // deaths at t=1 (2 of 4) and t=3 (1 of 1); the t=2 censoring
    // removes a subject from the t=3 risk set silently.
    val df = Seq((1L, false), (1L, false), (2L, true), (3L, false))
      .toDF("d", "cen")
    val out = TimeSeries.kaplanMeier(df, "d", "cen")
      .orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 4L, 2L, 500000L), (3L, 1L, 1L, 0L)))
  }

  test("kaplanMeier: per-step ppm floor chains exactly") {
    // S1 = (1e6*2) div 3 = 666666; S2 = (666666*1) div 2 = 333333.
    val df = Seq((0L, false), (1L, false), (2L, false)).toDF("d", "cen")
    val out = TimeSeries.kaplanMeier(df, "d", "cen")
      .orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, 3L, 1L, 666666L), (1L, 2L, 1L, 333333L), (2L, 1L, 1L, 0L)))
  }

  test("theilSenSlope: median slope ignores the outlier day") {
    // y = 10x on buckets 0,1,2,3 plus a wild outlier at bucket 4:
    // 10 clean-pair slopes of 10e6 ppm, 4 outlier pairs; the
    // nearest-rank median of the 10 pairs (rank (10+1)/2=5) is 10e6.
    val df = Seq(("u", 0L, 0L), ("u", 1L, 10L), ("u", 2L, 20L),
      ("u", 3L, 30L), ("u", 4L, 100000L)).toDF("e", "b", "y")
    val r = graft.operators.RobustStats.theilSenSlope(df, "e", "b", "y").head()
    assert(r.getString(0) == "u")
    assert(r.getLong(1) == 10L)
    assert(r.getLong(2) == 10000000L)
  }

  test("theilSenSlope: negative slope sign-split matches floor-free truncation") {
    // y: 10, 3 on buckets 0,1 -> slope (3-10)*1e6/1 = -7e6 exactly;
    // and an uneven gap pair 10 -> 0 over 3 buckets = -(10e6 div 3).
    val df = Seq(("a", 0L, 10L), ("a", 1L, 3L),
      ("b", 0L, 10L), ("b", 3L, 0L)).toDF("e", "b", "y")
    val out = graft.operators.RobustStats.theilSenSlope(df, "e", "b", "y")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("a") == -7000000L)
    assert(out("b") == -3333333L)
  }

  test("theilSenSlope: same-bucket rows pre-aggregate; single-bucket entities drop") {
    val df = Seq(("u", 0L, 4L), ("u", 0L, 6L), ("u", 1L, 20L),
      ("solo", 5L, 9L)).toDF("e", "b", "y")
    val out = graft.operators.RobustStats.theilSenSlope(df, "e", "b", "y")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("u", 1L, 10000000L)))
  }

  test("nelsonAalen: additive hazard steps, censored rows leave risk set silently") {
    // durations (1,F),(1,F),(2,censored),(3,F): t=1 n=4 d=2 term
    // 500000; t=2 no deaths (skipped); t=3 n=1 d=1 term 10^6.
    val df = Seq((1L, false), (1L, false), (2L, true), (3L, false))
      .toDF("t", "cen")
    val out = TimeSeries.nelsonAalen(df, "t", "cen").orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 4L, 2L, 500000L), (3L, 1L, 1L, 1500000L)))
  }

  test("logRankCurve: hypergeometric O-E and variance, hand fixture") {
    // g1: (1,F),(2,F); g2: (1,F),(2,cen).
    // t=1: n1=n2=2, d1=d2=1 -> oe 0, var 10^6*2*2*2*2/(16*3)=333333
    // t=2: n1=n2=1, d1=1,d2=0 -> oe term 500000, var term 250000
    val df = Seq((1L, false, true), (2L, false, true),
      (1L, false, false), (2L, true, false)).toDF("t", "cen", "g")
    val out = TimeSeries.logRankCurve(df, "t", "cen", col("g"))
      .orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      (1L, 2L, 2L, 1L, 1L, 0L, 333333L),
      (2L, 1L, 1L, 1L, 0L, 500000L, 583333L)))
  }

  test("logRankCurve: negative O-E truncates toward zero (sign-split div)") {
    // one death in group 2 only at t=1 with n1=1,n2=2: term =
    // 10^6*(0*3 - 1*1)/3 = -333333 (truncated, not floored to -333334)
    val df = Seq((1L, true, true), (1L, false, false), (1L, true, false))
      .toDF("t", "cen", "g")
    val out = TimeSeries.logRankCurve(df, "t", "cen", col("g")).collect()
    assert(out.head.getLong(5) == -333333L)
  }

  test("relativeEffect: dominance, equality, and tie handling are exact") {
    import graft.operators.RobustStats
    import org.apache.spark.sql.functions.col
    // B strictly dominates A: p_hat = 1, delta = 1
    val dom = Seq((false, 1L), (false, 2L), (true, 3L), (true, 4L))
      .toDF("inB", "v")
    val r = RobustStats.relativeEffect(dom, col("inB"), "v").collect().head
    assert((r.getLong(2), r.getLong(3)) == ((1000000L, 1000000L)))
    // identical distributions with ties: A {1,2}, B {1,2}:
    // gt=1, lt=1, eq=2 -> p_hat = (2+2)/8 = 500000, delta = 0
    val eqd = Seq((false, 1L), (false, 2L), (true, 1L), (true, 2L))
      .toDF("inB", "v")
    val r2 = RobustStats.relativeEffect(eqd, col("inB"), "v").collect().head
    assert((r2.getLong(2), r2.getLong(3)) == ((500000L, 0L)))
    // reversed dominance: delta sign-splits to -1
    val rev = Seq((false, 3L), (false, 4L), (true, 1L), (true, 2L))
      .toDF("inB", "v")
    assert(RobustStats.relativeEffect(rev, col("inB"), "v")
      .collect().head.getLong(3) == -1000000L)
  }

  test("relativeEffect / hodgesLehmann cardinality guard refuses a near-continuous domain") {
    import graft.operators.RobustStats
    import org.apache.spark.sql.functions.col
    // 200 distinct values per arm × maxPairCells = 100: the cell
    // cross join would detonate on a continuous metric — refuse loud
    val wide = spark.range(400)
      .selectExpr("id % 2 = 0 AS inB", "id AS v")
    val e1 = intercept[IllegalArgumentException](
      RobustStats.relativeEffect(wide, col("inB"), "v",
        maxPairCells = 100L).collect())
    assert(e1.getMessage.contains("Pre-bucket"))
    val e2 = intercept[IllegalArgumentException](
      RobustStats.hodgesLehmann(wide, col("inB"), "v",
        maxPairCells = 100L).collect())
    assert(e2.getMessage.contains("Pre-bucket"))
    // within budget: results are unchanged by the guard
    val r = RobustStats.relativeEffect(wide, col("inB"), "v").collect().head
    assert(r.getLong(0) == 200L && r.getLong(1) == 200L)
  }

  test("ansariBradley: middle-heavy arm scores high; all-tied pool is null-centered") {
    import graft.operators.RobustStats
    import org.apache.spark.sql.functions.col
    // A = {1,4} (extremes), B = {2,3} (middle): scores 1,2,2,1 ->
    // W = 4e6 ppm, mean = 3e6, var = 1/3 -> z = isqrt(3e12) = 1732050
    val df = Seq((false, 1L), (true, 2L), (true, 3L), (false, 4L))
      .toDF("inB", "v")
    val r = RobustStats.ansariBradley(df, col("inB"), "v").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((2L, 2L, 4000000L, 3000000L, 1732050L)))
    // every value identical: the tie midscore lands W exactly on the
    // null mean -> z = 0
    val tied = Seq((false, 5L), (true, 5L), (true, 5L)).toDF("inB", "v")
    val r2 = RobustStats.ansariBradley(tied, col("inB"), "v").collect().head
    assert(r2.getLong(2) == r2.getLong(3) && r2.getLong(4) == 0L)
    // NULL values drop (the wilcoxonRankSum convention): counts and
    // scores must match the fixture without the NULL row
    val withNull = Seq((false, Some(1L)), (true, Some(2L)),
      (true, Some(3L)), (false, Some(4L)), (true, None)).toDF("inB", "v")
    val r3 = RobustStats.ansariBradley(withNull, col("inB"), "v")
      .collect().head
    assert((r3.getLong(0), r3.getLong(1), r3.getLong(2), r3.getLong(3),
      r3.getLong(4)) == ((2L, 2L, 4000000L, 3000000L, 1732050L)))
  }

  test("ordinalAssociation: gamma ignores ties, Somers' D charges y-ties") {
    import graft.operators.RobustStats
    // (1,1),(2,2),(3,3),(3,1): C=3, D=1, T_y=1
    // gamma = 2/4 = 500000; somers_d = 2/5 = 400000
    val df = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L), ("g", 3L, 1L))
      .toDF("grp", "x", "y")
    val r = RobustStats.ordinalAssociation(df, "x", "y", Seq("grp"))
      .collect().head
    assert(r.getAs[Long]("concordant") == 3L)
    assert(r.getAs[Long]("discordant") == 1L)
    assert(r.getAs[Long]("tie_y") == 1L)
    assert(r.getAs[Long]("gamma_ppm") == 500000L)
    assert(r.getAs[Long]("somers_d_ppm") == 400000L)
    // tau-b: T_x = 1 too -> 2 / sqrt(5*5) = 400000
    assert(r.getAs[Long]("tau_b_ppm") == 400000L)
    // an all-ties group has no orderable pairs -> NULL, not 0/0
    val tied = Seq(("t", 1L, 1L), ("t", 1L, 1L)).toDF("grp", "x", "y")
    val r2 = RobustStats.ordinalAssociation(tied, "x", "y", Seq("grp"))
      .collect().head
    assert(r2.isNullAt(r2.fieldIndex("gamma_ppm")))
    assert(r2.isNullAt(r2.fieldIndex("tau_b_ppm")))
  }

  test("hodgesLehmann: weighted lower median of pairwise differences") {
    import graft.operators.RobustStats
    import org.apache.spark.sql.functions.col
    // A {1,2}, B {4,7}: diffs {2,3,5,6} -> lower median 3
    val df = Seq((false, 1L), (false, 2L), (true, 4L), (true, 7L))
      .toDF("inB", "v")
    val r = RobustStats.hodgesLehmann(df, col("inB"), "v").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((2L, 2L, 4L, 3L)))
    // duplicated values weight the cells: A {1,1}, B {2} -> diffs
    // {1 (w=2)} -> HL = 1
    val dup = Seq((false, 1L), (false, 1L), (true, 2L)).toDF("inB", "v")
    assert(RobustStats.hodgesLehmann(dup, col("inB"), "v")
      .collect().head.getLong(3) == 1L)
  }

  test("kruskalWallis: H = 2.4 on the textbook 2x2 fixture; all-ties NULL adjust") {
    import graft.operators.RobustStats
    // A{1,2}, B{3,4}: R_A=3, R_B=7 -> H = 0.6*29 - 15 = 2.4; no ties
    val df = Seq(("A", 1L), ("A", 2L), ("B", 3L), ("B", 4L)).toDF("g", "v")
    val r = RobustStats.kruskalWallis(df, "g", "v").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((4L, 2L, 2400000L, 2400000L)))
    // every value identical: H = 0 and the tie adjustment divides by
    // zero -> NULL, not a fake 0/0
    val tied = Seq(("A", 5L), ("B", 5L)).toDF("g", "v")
    val r2 = RobustStats.kruskalWallis(tied, "g", "v").collect().head
    assert(r2.getLong(2) == 0L && r2.isNullAt(3))
  }

  test("pageTrend: monotone-with-order blocks give z = 2 exactly") {
    import graft.operators.RobustStats
    // 2 blocks, values rise with order j: L2 = 56, mean2 = 48,
    // den = 576 -> z = isqrt((36e12*64)//576) = 2000000
    val up = Seq((1L, 0L, 1L), (1L, 1L, 2L), (1L, 2L, 3L),
      (2L, 0L, 1L), (2L, 1L, 2L), (2L, 2L, 3L)).toDF("b", "j", "v")
    val r = RobustStats.pageTrend(up, "b", "j", "v").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((2L, 3L, 56L, 48L, 2000000L)))
    // reversed values: same magnitude, negative
    val down = Seq((1L, 0L, 3L), (1L, 1L, 2L), (1L, 2L, 1L),
      (2L, 0L, 3L), (2L, 1L, 2L), (2L, 2L, 1L)).toDF("b", "j", "v")
    assert(RobustStats.pageTrend(down, "b", "j", "v")
      .collect().head.getLong(4) == -2000000L)
    // incomplete block raises
    val bad = Seq((1L, 0L, 1L), (1L, 1L, 2L), (2L, 0L, 1L))
      .toDF("b", "j", "v")
    val e = intercept[Exception](
      RobustStats.pageTrend(bad, "b", "j", "v").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("pageTrend")))
  }

  test("jonckheereTerpstra: doubled MWU counts and the exact z quantization") {
    import graft.operators.RobustStats
    // Standard no-tie JT variance: var·72 = N²(2N+3) − Σnᵢ²(2nᵢ+3)
    // (NOT the Mann–Kendall 2N+5 form — a coefficient slip here once
    // survived because the oracle mirrored it; these hand numbers pin
    // the textbook formula independently of any oracle).
    // groups 0:{1,2}, 1:{3,4}: gt=4, eq=0 -> j_x2=8, mean_x2=4;
    // var_x72 = 16*11 - 2*(4*7) = 120; z = isqrt((18e12*16)//120)
    // = 1549193 — agrees with the continuous z = (4-2)/sqrt(120/72)
    // = 1.549193.
    val df = Seq((0L, 1L), (0L, 2L), (1L, 3L), (1L, 4L)).toDF("g", "v")
    val r = RobustStats.jonckheereTerpstra(df, "g", "v").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((4L, 8L, 4L, 120L, 1549193L)))
    // three ordered groups {1,2},{3,4},{5,6}: gt=12 over 3 pairs ->
    // j_x2=24, mean_x2=12; var_x72 = 36*15 - 3*(4*7) = 456;
    // z = isqrt((18e12*144)//456) = 2384158 (continuous: 6/sqrt(456/72)
    // = 2.384158).
    val df3 = Seq((0L, 1L), (0L, 2L), (1L, 3L), (1L, 4L), (2L, 5L),
      (2L, 6L)).toDF("g", "v")
    val r3 = RobustStats.jonckheereTerpstra(df3, "g", "v").collect().head
    assert((r3.getLong(0), r3.getLong(1), r3.getLong(2), r3.getLong(3),
      r3.getLong(4)) == ((6L, 24L, 12L, 456L, 2384158L)))
    // reversed order -> same magnitude, negative sign
    val rev = Seq((1L, 1L), (1L, 2L), (0L, 3L), (0L, 4L)).toDF("g", "v")
    assert(RobustStats.jonckheereTerpstra(rev, "g", "v")
      .collect().head.getLong(4) == -1549193L)
  }

  test("distributionDrift: exact W1 and TV on a hand histogram") {
    import graft.operators.RobustStats
    // A = {0,0,1}, B = {1,2}: F_A = [2/3, 1, 1], F_B = [0, 1/2, 1]
    // W1 = 2/3·1 + 1/2·1 = 7/6 -> (1e6·7) div 6 = 1166666
    // TV = ½(|2/3−0| + |1/3−1/2| + |0−1/2|) = 2/3 -> 666666
    val df = Seq((0L, 0L), (0L, 0L), (0L, 1L), (1L, 1L), (1L, 2L))
      .toDF("arm", "v")
    val r = RobustStats.distributionDrift(df, col("arm") === 1L, "v")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((3L, 2L, 3L, 1166666L, 666666L)))
    // identical arms: both distances exactly zero
    val same = Seq((0L, 5L), (0L, 9L), (1L, 5L), (1L, 9L)).toDF("arm", "v")
    val r0 = RobustStats.distributionDrift(same, col("arm") === 1L, "v")
      .collect().head
    assert((r0.getLong(3), r0.getLong(4)) == ((0L, 0L)))
    // a uniform +3 shift of one arm costs exactly 3e6 in W1 while TV
    // saturates at 1e6 — the ordered-vs-unordered distinction
    val shift = Seq((0L, 1L), (0L, 2L), (1L, 4L), (1L, 5L)).toDF("arm", "v")
    val rs = RobustStats.distributionDrift(shift, col("arm") === 1L, "v")
      .collect().head
    assert((rs.getLong(3), rs.getLong(4)) == ((3000000L, 1000000L)))
    // empty arm: NULL distances, never a fake zero
    val one = Seq((0L, 1L)).toDF("arm", "v")
    val rn = RobustStats.distributionDrift(one, col("arm") === 1L, "v")
      .collect().head
    assert(rn.isNullAt(3) && rn.isNullAt(4))
  }

  test("cramerVonMises: quantized T on hand histograms, null mean, empty arm") {
    import graft.operators.RobustStats
    // A = {0,0,1}, B = {1,2}: d_ppm = (4·1e6)div6, (3·1e6)div6, 0
    // = 666666, 500000, 0; num = 2·666666² + 2·500000²
    // = 1388887111112; c1 = num div 5 = 277777422222;
    // t = (6·c1) div 5e6 = 333332 (true T = 1/3 — two quantization
    // ulps). mean = (1e6·6) div 30 = 200000.
    val df = Seq((0L, 0L), (0L, 0L), (0L, 1L), (1L, 1L), (1L, 2L))
      .toDF("arm", "v")
    val r = RobustStats.cramerVonMises(df, col("arm") === 1L, "v")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((3L, 2L, 3L, 333332L, 200000L)))
    // identical arms: T exactly 0
    val same = Seq((0L, 5L), (0L, 9L), (1L, 5L), (1L, 9L)).toDF("arm", "v")
    assert(RobustStats.cramerVonMises(same, col("arm") === 1L, "v")
      .collect().head.getLong(3) == 0L)
    // disjoint arms {1,2} vs {4,5}: d_ppm = 500000, 1e6, 500000, 0;
    // num = 1.5e12; t = (4·(num div 4)) div 4e6 = 375000 — exact
    // (true T = 0.375, every floor lands on an integer)
    val disj = Seq((0L, 1L), (0L, 2L), (1L, 4L), (1L, 5L)).toDF("arm", "v")
    assert(RobustStats.cramerVonMises(disj, col("arm") === 1L, "v")
      .collect().head.getLong(3) == 375000L)
    // empty arm: NULL statistics
    val onea = Seq((0L, 1L)).toDF("arm", "v")
    val rn = RobustStats.cramerVonMises(onea, col("arm") === 1L, "v")
      .collect().head
    assert(rn.isNullAt(3) && rn.isNullAt(4))
  }

  test("andersonDarling: hand-quantized A², zero on identical arms, arm symmetry") {
    import graft.operators.RobustStats
    // Disjoint arms A = {1,2}, B = {3,4}: N=4, n=2 each, h=1 cells;
    // B2 = 1,3,5,7; den = B2(8−B2)−4 = 3,11,11,3;
    // |4·M2a − 2·B2| = 2,6,6,2 -> d_ppm = 125000,375000,375000,125000
    // (divisor 16, both arms); w = 64e6 div den = 21333333, 5818181 ×2;
    // S = 2·(125000²·21333333 + 375000²·5818181) = 2303030062500000000;
    // a2 = (3·(2·(S div 16) + 2·(S div 16))) div 1e12 = 1727272.
    val disj = Seq((0L, 1L), (0L, 2L), (1L, 3L), (1L, 4L)).toDF("arm", "v")
    val r = RobustStats.andersonDarling(disj, col("arm") === 1L, "v")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((2L, 2L, 4L, 1727272L)))
    // swapping which arm is "B" leaves A² unchanged
    val rs = RobustStats.andersonDarling(disj, col("arm") === 0L, "v")
      .collect().head
    assert(rs.getLong(3) == 1727272L)
    // identical arms: every midpoint gap is zero
    val same = Seq((0L, 5L), (0L, 9L), (1L, 5L), (1L, 9L)).toDF("arm", "v")
    assert(RobustStats.andersonDarling(same, col("arm") === 1L, "v")
      .collect().head.getLong(3) == 0L)
    // empty arm: NULL, never a fake zero
    val one = Seq((0L, 1L)).toDF("arm", "v")
    assert(RobustStats.andersonDarling(one, col("arm") === 1L, "v")
      .collect().head.isNullAt(3))
  }

  test("kuiperDrift: crossing pattern, arm swap, identical arms, empty arm") {
    import graft.operators.RobustStats
    // A = {1,4}, B = {2,3} — a median-preserving spread change:
    // dn = ca·nb − cb·na over cells 1..4 = 2, 0, −2, 0 so
    // D⁺ = D⁻ = 2 -> d_plus = d_minus = (1e6·2) div 4 = 500000 and
    // V = (1e6·4) div 4 = 1000000, where KS alone would read 500000.
    val df = Seq((0L, 1L), (0L, 4L), (1L, 2L), (1L, 3L)).toDF("arm", "v")
    val r = RobustStats.kuiperDrift(df, col("arm") === 1L, "v")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((2L, 2L, 4L, 500000L, 500000L, 1000000L)))
    // swapping which arm is "B" swaps D⁺/D⁻ and leaves V unchanged
    val rs = RobustStats.kuiperDrift(df, col("arm") === 0L, "v")
      .collect().head
    assert((rs.getLong(3), rs.getLong(4), rs.getLong(5))
      == ((500000L, 500000L, 1000000L)))
    // one-sided shift A = {1,2}, B = {3,4}: D⁺ = 4, D⁻ clamps at 0
    val disj = Seq((0L, 1L), (0L, 2L), (1L, 3L), (1L, 4L)).toDF("arm", "v")
    val rd = RobustStats.kuiperDrift(disj, col("arm") === 1L, "v")
      .collect().head
    assert((rd.getLong(3), rd.getLong(4), rd.getLong(5))
      == ((1000000L, 0L, 1000000L)))
    // identical arms: all gaps zero
    val same = Seq((0L, 5L), (0L, 9L), (1L, 5L), (1L, 9L)).toDF("arm", "v")
    assert(RobustStats.kuiperDrift(same, col("arm") === 1L, "v")
      .collect().head.getLong(5) == 0L)
    // empty arm: NULL, never a fake zero
    val one = Seq((0L, 1L)).toDF("arm", "v")
    assert(RobustStats.kuiperDrift(one, col("arm") === 1L, "v")
      .collect().head.isNullAt(5))
  }

  test("wilcoxonSignedRank: direction, doubled ranks, ties, no-change NULL") {
    import graft.operators.RobustStats
    // One entity, values 10,11,13,16 -> deltas +1,+2,+3: double-ranks
    // 2,4,6 all positive so w2_plus = 12, mean2 = 6, v12 = 168,
    // isqrt(12·168 = 2016) = 44, z = (12e6·6) div 44 = +1636363.
    // UPWARD drift MUST be POSITIVE (sign conventions can't be caught
    // by oracle parity — both engines would mirror a flip).
    val up = Seq(("e", 1L, 10L), ("e", 2L, 11L), ("e", 3L, 13L),
      ("e", 4L, 16L)).toDF("ent", "b", "v")
    val r = RobustStats.wilcoxonSignedRank(up, "ent", "b", "v")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((3L, 12L, 6L, 0L, 1636363L)))
    // reversed series: same magnitudes, all negative -> z mirrors
    val down = Seq(("e", 1L, 16L), ("e", 2L, 13L), ("e", 3L, 11L),
      ("e", 4L, 10L)).toDF("ent", "b", "v")
    assert(RobustStats.wilcoxonSignedRank(down, "ent", "b", "v")
      .collect().head.getLong(4) == -1636363L)
    // ties: deltas +1,+1,-1 share one |d| cell (t=3, midrank double
    // 4): w2_plus = 8, tie_term = 24, v12 = 144, isqrt(1728) = 41,
    // z = (12e6·2) div 41 = 585365
    val tie = Seq(("e", 1L, 0L), ("e", 2L, 1L), ("e", 3L, 2L),
      ("e", 4L, 1L)).toDF("ent", "b", "v")
    val rt = RobustStats.wilcoxonSignedRank(tie, "ent", "b", "v")
      .collect().head
    assert((rt.getLong(1), rt.getLong(3), rt.getLong(4))
      == ((8L, 24L, 585365L)))
    // a constant series has no nonzero change: n_pairs 0, NULL z
    val const = Seq(("e", 1L, 5L), ("e", 2L, 5L)).toDF("ent", "b", "v")
    val rc = RobustStats.wilcoxonSignedRank(const, "ent", "b", "v")
      .collect().head
    assert(rc.getLong(0) == 0L && rc.isNullAt(4))
  }

  test("energyDistance: exact pair-sum identity, zero on identical arms") {
    import graft.operators.RobustStats
    // A = {0,2}, B = {1}: E|X−Y| = 1, E|X−X'| = 1, E|Y−Y'| = 0
    // -> E = 2·1 − 1 − 0 = 1 (every div lands exact).
    val df = Seq((0L, 0L), (0L, 2L), (1L, 1L)).toDF("arm", "v")
    val r = RobustStats.energyDistance(df, col("arm") === 1L, "v")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6))
      == ((2L, 1L, 3L, 1000000L, 2000000L, 1000000L, 0L)))
    // identical arms: E exactly zero (the metric property)
    val same = Seq((0L, 1L), (0L, 3L), (1L, 1L), (1L, 3L)).toDF("arm", "v")
    val r0 = RobustStats.energyDistance(same, col("arm") === 1L, "v")
      .collect().head
    assert((r0.getLong(3), r0.getLong(4), r0.getLong(5), r0.getLong(6))
      == ((0L, 2000000L, 1000000L, 1000000L)))
    // a +3 shift of a point mass costs exactly 2·3e6 in the cross
    // term and nothing within: E = 2·|shift|... for singletons
    val shift = Seq((0L, 4L), (1L, 7L)).toDF("arm", "v")
    assert(RobustStats.energyDistance(shift, col("arm") === 1L, "v")
      .collect().head.getLong(3) == 6000000L)
    // empty arm: NULL, never a fake zero
    val one = Seq((0L, 1L)).toDF("arm", "v")
    assert(RobustStats.energyDistance(one, col("arm") === 1L, "v")
      .collect().head.isNullAt(3))
  }

  test("cochranArmitage: exact z on linear trend, sign flip, degenerates") {
    import graft.operators.RobustStats
    // scores 0/1/2 with (n,r) = (2,0),(2,1),(2,2): N=6, R=3,
    // A = 6·5−3·6 = 12, B = 6·10−36 = 24 -> ā = 2e6, b̄ = 4e6,
    // r̄ = r̄ᶜ = 5e8; prod = 1e24, isqrt = 1e12 ->
    // z = (1e12·2e6) div 1e12 = 2000000 (true z = 2, exact).
    def mk(rows: Seq[(Long, Long)]) = rows.zipWithIndex
      .map { case ((w, s), i) => (w, s, i) }.toDF("w", "s", "i")
    val up = mk(Seq((0L, 0L), (0L, 0L), (1L, 1L), (1L, 0L), (2L, 1L),
      (2L, 1L)))
    val r = RobustStats.cochranArmitage(up, col("s") === 1L, "w")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((6L, 3L, 2000000L, 2000000L)))
    // reversed outcomes: same magnitude, negative sign
    val down = mk(Seq((0L, 1L), (0L, 1L), (1L, 1L), (1L, 0L), (2L, 0L),
      (2L, 0L)))
    val rd = RobustStats.cochranArmitage(down, col("s") === 1L, "w")
      .collect().head
    assert((rd.getLong(2), rd.getLong(3)) == ((-2000000L, -2000000L)))
    // quantized path: (0,3,1),(1,3,2): A=3, B=9 -> true z = 3/√13.5
    // = 0.81649658; ā = 5e5, b̄ = 1.5e6, prod = 3.75e23,
    // isqrt = 612372435695 -> z_ppm = 816496 (1 ulp below truth)
    val q = mk(Seq((0L, 0L), (0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L),
      (1L, 1L)))
    assert(RobustStats.cochranArmitage(q, col("s") === 1L, "w")
      .collect().head.getLong(3) == 816496L)
    // degenerate: all successes -> NULL z; single score -> NULL z
    val allS = mk(Seq((0L, 1L), (1L, 1L)))
    assert(RobustStats.cochranArmitage(allS, col("s") === 1L, "w")
      .collect().head.isNullAt(3))
    val oneG = mk(Seq((0L, 0L), (0L, 1L)))
    assert(RobustStats.cochranArmitage(oneG, col("s") === 1L, "w")
      .collect().head.isNullAt(3))
  }

  test("runsTest: tie days drop, runs count by sign change, exact z") {
    import graft.operators.RobustStats
    // y: 1,2,1,2,3,3,2 -> signs +,-,+,+,- (the 3->3 tie drops):
    // n1=3, n2=2, R=4; d = 4*5-5-12 = 3; den = 84;
    // z = isqrt((1e12*9*4)//84) = 654653
    val df = Seq(1L, 2L, 1L, 2L, 3L, 3L, 2L).zipWithIndex
      .map { case (y, i) => ("k", i.toLong, y) }.toDF("k", "b", "y")
    val r = RobustStats.runsTest(df, "k", "b", "y").collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((3L, 2L, 4L, 654653L)))
    // monotone series: one run, strong negative z (fewer runs than
    // chance); degenerate n2=0 -> den <= 0 -> NULL
    val mono = (0 until 5).map(i => ("m", i.toLong, i.toLong)).toDF("k", "b", "y")
    assert(RobustStats.runsTest(mono, "k", "b", "y").collect().head.isNullAt(4))
  }

  test("spearmanRho: monotone, anti-monotone, ties, and constant-column NULL") {
    import graft.operators.RobustStats
    val up = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("x", "y")
    assert(RobustStats.spearmanRho(up, "x", "y").collect().head.getLong(1)
      == 1000000L)
    val down = Seq((1L, 30L), (2L, 20L), (3L, 10L)).toDF("x", "y")
    assert(RobustStats.spearmanRho(down, "x", "y").collect().head.getLong(1)
      == -1000000L)
    // ties: x=(1,1,2), y=(1,2,3): u=(3,3,6), w=(2,4,6) -> num 18,
    // vx 18, vy 24, isqrt(432)=20 -> floor(18e6/20) = 900000 (the
    // documented isqrt-floor quantization at tiny n)
    val tied = Seq((1L, 1L), (1L, 2L), (2L, 3L)).toDF("x", "y")
    assert(RobustStats.spearmanRho(tied, "x", "y").collect().head.getLong(1)
      == 900000L)
    val const = Seq((1L, 1L), (1L, 2L)).toDF("x", "y")
    assert(RobustStats.spearmanRho(const, "x", "y").collect().head.isNullAt(1))
  }

  test("mannKendall: strict trend, tie-killed variance, z quantization") {
    import graft.operators.RobustStats
    val df = Seq(
      ("up", 1L, 1L), ("up", 2L, 2L), ("up", 3L, 3L), ("up", 4L, 4L),
      ("dn", 1L, 4L), ("dn", 2L, 3L), ("dn", 3L, 2L), ("dn", 4L, 1L),
      ("fl", 1L, 7L), ("fl", 2L, 7L), ("fl", 3L, 7L), ("fl", 4L, 7L))
      .toDF("k", "b", "y")
    val out = RobustStats.mannKendall(df, "k", "b", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    // S = ±6; var18 = 4·3·13 = 156; isqrt(18·156) = 52;
    // z = 18e6·(6-1) div 52 = 1730769
    assert(out("up") == ((4L, 6L, 156L, Some(1730769L))))
    assert(out("dn") == ((4L, -6L, 156L, Some(-1730769L))))
    // constant series: the tie correction cancels the variance -> NULL
    assert(out("fl") == ((4L, 0L, 0L, None)))
  }

  test("aalenJohansen: CIFs split the mass the all-cause KM removes") {
    // (1,c1),(1,c2),(2,censored),(3,c1):
    // t=1: n=4, surv 500000, terms 250000/250000
    // t=3: n=1, surv 0, sprev 500000 -> cif1 750000, cif2 250000
    // and surv + cif1 + cif2 = 1e6 exactly here (no floor loss).
    val df = Seq((1L, 1L), (1L, 2L), (2L, 0L), (3L, 1L)).toDF("t", "k")
    val out = TimeSeries.aalenJohansen(df, "t", "k").orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      (1L, 4L, 1L, 1L, 500000L, 250000L, 250000L),
      (3L, 1L, 1L, 0L, 0L, 750000L, 250000L)))
    // invalid cause raises loudly
    val bad = Seq((1L, 3L)).toDF("t", "k")
    val e = intercept[Exception](
      TimeSeries.aalenJohansen(bad, "t", "k").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("aalenJohansen")))
  }

  test("logRankCurve: DECIMAL(38,0) variance is exact where int64 would wrap") {
    // 40k subjects at t=1 (n1=n2=20000, d=20000 deaths split evenly):
    // the variance numerator 10⁶·d·n1·n2·(n−d) = 1.6e23 — int64 wraps
    // at 9.2e18, so this value is only reachable on the DECIMAL(38,0)
    // path. Exact: var_ppm = 1.6e23 div (40000²·39999) = 2500062501;
    // the symmetric split makes oe_ppm exactly 0.
    val df = spark.range(40000).selectExpr("1L AS t", "id % 4 >= 2 AS cen",
      "id % 2 = 0 AS g")
    val r = TimeSeries.logRankCurve(df, "t", "cen",
      org.apache.spark.sql.functions.col("g")).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6)) ==
      ((20000L, 20000L, 10000L, 10000L, 0L, 2500062501L)))
  }

  test("sprtMonitor: earliest boundary crossing wins; undecided streams continue") {
    // p0=.25, p1=.5 -> weights +1000 / -585 milli-bits
    val (wS, wF) = TimeSeries.sprtWeights(0.25, 0.5)
    assert((wS, wF) == ((1000L, -585L)))
    val df = Seq(
      ("A", 1L, true), ("A", 2L, true), ("A", 3L, true),
      ("B", 1L, false), ("B", 2L, false), ("B", 3L, false),
      ("B", 4L, false), ("B", 5L, false),
      ("C", 1L, true), ("C", 2L, false), ("C", 3L, true))
      .toDF("g", "i", "s")
    val out = TimeSeries.sprtMonitor(df, "g", "i", col("s"),
        p0 = 0.25, p1 = 0.5, thresholdMbits = 2500L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("A") == ((3L, "accept_h1", 3L, 3000L)))
    assert(out("B") == ((5L, "accept_h0", 5L, -2925L)))
    assert(out("C") == ((3L, "continue", 3L, 1415L)))
  }

  test("watsonU2Drift: hand value, rotation invariance, identical arms, empty arm") {
    import graft.operators.RobustStats
    // A = {1,4}, B = {2,3}: inclusive gaps e = 2,0,-2,0 so S1 = 0,
    // S2 = 8 -> U2 = 1e6·(4·8 − 0) div (2·2·64) = 125000 (true 0.125)
    val df = Seq((0L, 1L), (0L, 4L), (1L, 2L), (1L, 3L)).toDF("arm", "v")
    val r = RobustStats.watsonU2Drift(df, col("arm") === 1L, "v")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((2L, 2L, 4L, 125000L)))
    // rotate the circle one notch (v -> v mod 4 + 1): A = {2,1},
    // B = {3,4}. KS/CvM change under this rotation; Watson's U2 is
    // built to be IDENTICAL: S1 = 8, S2 = 24, 4·24 − 64 = 32 again.
    val rot = Seq((0L, 2L), (0L, 1L), (1L, 3L), (1L, 4L)).toDF("arm", "v")
    assert(RobustStats.watsonU2Drift(rot, col("arm") === 1L, "v")
      .collect().head.getLong(3) == 125000L)
    // identical arms: every gap is zero
    val same = Seq((0L, 5L), (0L, 9L), (1L, 5L), (1L, 9L)).toDF("arm", "v")
    assert(RobustStats.watsonU2Drift(same, col("arm") === 1L, "v")
      .collect().head.getLong(3) == 0L)
    // empty arm: NULL, never a fake zero
    val one = Seq((0L, 1L)).toDF("arm", "v")
    assert(RobustStats.watsonU2Drift(one, col("arm") === 1L, "v")
      .collect().head.isNullAt(3))
  }

  test("cucconi: middle-heavy arm, symmetric ends, hand-chained micro floors") {
    import graft.operators.RobustStats
    // A = {1,4}, B = {2,3}: doubled ranks s = 2,4,6,8; both ends see
    // the same mass (t2 = t2c = 52) so nu2 = nv2 = 156 − 180 = −24,
    // k4 = 30960: u2 = v2 = uv = (5e6·576) div 30960 = 93023;
    // rterm = (2·363·93023) div 387 = 174508; cnum = 360554·387²,
    // cden = 36000 -> C = 1499994 micro (true C ≈ 1.5034)
    val df = Seq((0L, 1L), (1L, 2L), (1L, 3L), (0L, 4L)).toDF("arm", "v")
    val r = RobustStats.cucconi(df, col("arm") === 1L, "v").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5))
      == ((2L, 2L, 93023L, 93023L, 93023L, 1499994L)))
    // empty arm: NULLs, never fake zeros
    val one = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("arm", "v")
    assert(RobustStats.cucconi(one, col("arm") === 1L, "v")
      .collect().head.isNullAt(5))
    // N < 3: the denominator 120(N−2)(N+2)(N+1)² degenerates -> NULL
    val tiny = Seq((0L, 1L), (1L, 2L)).toDF("arm", "v")
    assert(RobustStats.cucconi(tiny, col("arm") === 1L, "v")
      .collect().head.isNullAt(5))
  }

  test("wilcoxonRankSum: direction, arm swap, midrank ties") {
    import graft.operators.RobustStats
    // A = {1,2}, B = {3,4}: w2 = 14, mean2 = 10, k = 36, X = 60,
    // isqrt(36·4·60 = 8640) = 92 -> z = (1e6·36·4) div 92 = 1565217;
    // arm B sitting HIGH must come out POSITIVE
    val df = Seq((0L, 1L), (0L, 2L), (1L, 3L), (1L, 4L)).toDF("arm", "v")
    val r = RobustStats.wilcoxonRankSum(df, col("arm") === 1L, "v")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5))
      == ((2L, 2L, 14L, 10L, 0L, 1565217L)))
    // swapping which arm is "B" flips the sign exactly
    assert(RobustStats.wilcoxonRankSum(df, col("arm") === 0L, "v")
      .collect().head.getLong(5) == -1565217L)
    // ties take midranks and the tie term discounts the variance:
    // A = {1,1}, B = {1,3}: s = 4,4,4,8 -> w2 = 12, mean2 = 10,
    // tie = 24, X = 36, isqrt(36·4·36 = 5184) = 72 (exact) ->
    // z = (1e6·36·2) div 72 = 1000000
    val tied = Seq((0L, 1L), (0L, 1L), (1L, 1L), (1L, 3L)).toDF("arm", "v")
    val rt = RobustStats.wilcoxonRankSum(tied, col("arm") === 1L, "v")
      .collect().head
    assert((rt.getLong(2), rt.getLong(4), rt.getLong(5))
      == ((12L, 24L, 1000000L)))
  }

  test("brunnerMunzel: interleaved arms, arm-swap antisymmetry, separation NULL") {
    import graft.operators.RobustStats
    // X = {1,3}, Y = {2,4}: doubled placements u_x = (0,2),
    // u_y = (2,4) -> p_hat = 6/8 = 750000; V_x = V_y = 4, K = 8,
    // d = 2 -> t = isqrt((1e12·4·1) div 8) = 707106 (true 1/√2)
    val df = Seq((0L, 1L), (1L, 2L), (0L, 3L), (1L, 4L)).toDF("arm", "v")
    val r = RobustStats.brunnerMunzel(df, col("arm") === 1L, "v")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((2L, 2L, 750000L, 707106L)))
    // swapping arms mirrors p around 1/2 and flips t exactly
    val rs = RobustStats.brunnerMunzel(df, col("arm") === 0L, "v")
      .collect().head
    assert((rs.getLong(2), rs.getLong(3)) == ((250000L, -707106L)))
    // complete separation: zero placement variance in BOTH arms ->
    // K = 0 -> NULL t (the statistic is infinite), p_hat still 1
    val sep = Seq((0L, 1L), (0L, 2L), (1L, 3L), (1L, 4L)).toDF("arm", "v")
    val rd = RobustStats.brunnerMunzel(sep, col("arm") === 1L, "v")
      .collect().head
    assert(rd.getLong(2) == 1000000L && rd.isNullAt(3))
  }

  test("quadeTest: range-weighted blocks, x4 units, all-tied NULL, incomplete raise") {
    import graft.operators.RobustStats
    // blocks: b1 = (1,2,3) range 2, b2 = (2,4,6) range 4,
    // b3 = (5,5,5) range 0. Range ranks Q2 = (4,6,2); within-block
    // doubled ranks (2,4,6) except b3's all-tied (4,4,4).
    // S4 = Q2·(r2−4): b1 (−8,0,8), b2 (−12,0,12), b3 (0,0,0) ->
    // per-treatment sums (−20,0,20): B16 = 800, A16 = 416,
    // F = 1e6·2·800 div (3·416 − 800) = 3571428 (true 100/28)
    val df = Seq(
      ("b1", "t1", 1L), ("b1", "t2", 2L), ("b1", "t3", 3L),
      ("b2", "t1", 2L), ("b2", "t2", 4L), ("b2", "t3", 6L),
      ("b3", "t1", 5L), ("b3", "t2", 5L), ("b3", "t3", 5L))
      .toDF("b", "tr", "v")
    val r = RobustStats.quadeTest(df, "b", "tr", "v").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((3L, 3L, 416L, 800L, 3571428L)))
    // every value identical: A16 = B16 = 0 -> NULL, never 0/0
    val flat = Seq(("b1", "t1", 7L), ("b1", "t2", 7L),
      ("b2", "t1", 7L), ("b2", "t2", 7L)).toDF("b", "tr", "v")
    assert(RobustStats.quadeTest(flat, "b", "tr", "v")
      .collect().head.isNullAt(4))
    // incomplete blocks raise loudly
    val bad = Seq(("b1", "t1", 1L), ("b1", "t2", 2L), ("b2", "t1", 3L))
      .toDF("b", "tr", "v")
    val e = intercept[Exception] {
      RobustStats.quadeTest(bad, "b", "tr", "v").collect()
    }
    assert(e.getMessage.contains("incomplete"))
    // equal block SIZES are not enough: a duplicated treatment hiding
    // a missing one must raise too (kd < kb in b2)
    val dup = Seq(
      ("b1", "t1", 1L), ("b1", "t2", 2L), ("b1", "t3", 3L),
      ("b2", "t1", 2L), ("b2", "t1", 4L), ("b2", "t2", 6L))
      .toDF("b", "tr", "v")
    val e2 = intercept[Exception] {
      RobustStats.quadeTest(dup, "b", "tr", "v").collect()
    }
    assert(e2.getMessage.contains("incomplete"))
    // ...and so must blocks drawing from DIFFERENT treatment sets
    // ({t1,t2} vs {t1,t3}: kd = kb everywhere but global k = 3)
    val mixed = Seq(
      ("b1", "t1", 1L), ("b1", "t2", 2L),
      ("b2", "t1", 3L), ("b2", "t3", 4L))
      .toDF("b", "tr", "v")
    val e3 = intercept[Exception] {
      RobustStats.quadeTest(mixed, "b", "tr", "v").collect()
    }
    assert(e3.getMessage.contains("incomplete"))
  }

  test("moodMedianTest: grand-median split, complete-separation chi2, degenerate NULL") {
    import graft.operators.RobustStats
    // g1 = {1,2,3,4}, g2 = {5,6,7}: N = 7, lower median = 4th
    // smallest = 4; above: g1 -> 0, g2 -> 3 (complete separation).
    // chi2 = 1e6·(7·0−4·3)²/(3·4·4) + 1e6·(7·3−3·3)²/(3·4·3) = 7e6
    // (the Pearson chi2 of [[0,4],[3,0]] is exactly N = 7).
    val df = Seq(("g1", 1L), ("g1", 2L), ("g1", 3L), ("g1", 4L),
      ("g2", 5L), ("g2", 6L), ("g2", 7L)).toDF("g", "v")
    val r = RobustStats.moodMedianTest(df, "g", "v").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((2L, 7L, 4L, 3L, 7000000L)))
    // identical groups: every group splits like the pool -> chi2 = 0
    val same = Seq(("a", 1L), ("a", 9L), ("b", 1L), ("b", 9L))
      .toDF("g", "v")
    assert(RobustStats.moodMedianTest(same, "g", "v")
      .collect().head.getLong(4) == 0L)
    // all values equal: nothing above the median -> NULL, not 0
    val tied = Seq(("a", 5L), ("b", 5L), ("b", 5L)).toDF("g", "v")
    assert(RobustStats.moodMedianTest(tied, "g", "v")
      .collect().head.isNullAt(4))
  }

  test("lepage: composes the location and scale z's; NULL propagates") {
    import graft.operators.RobustStats
    // A = {1,4}, B = {2,3}: pure spread change — the Wilcoxon piece
    // sits exactly on its null (w2 = mean2 = 10 -> zw = 0) while the
    // Ansari-Bradley piece fires (zab = 1732050, the q374 fixture) ->
    // L = (0 + 1732050²) div 1e6 = 2999997 micro (χ² ≈ 3.0)
    val df = Seq((0L, 1L), (1L, 2L), (1L, 3L), (0L, 4L)).toDF("arm", "v")
    val r = RobustStats.lepage(df, col("arm") === 1L, "v").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((2L, 2L, 0L, 1732050L, 2999997L)))
    // an empty arm nulls the Wilcoxon z and must null L, not zero it
    val one = Seq((0L, 1L), (0L, 2L)).toDF("arm", "v")
    val r2 = RobustStats.lepage(one, col("arm") === 1L, "v").collect().head
    assert(r2.isNullAt(4))
    // NULL values drop from BOTH components (one shared pool): adding
    // a NULL row must not move any output column
    val withNull = Seq((0L, Some(1L)), (1L, Some(2L)), (1L, Some(3L)),
      (0L, Some(4L)), (1L, None)).toDF("arm", "v")
    val r3 = RobustStats.lepage(withNull, col("arm") === 1L, "v")
      .collect().head
    assert((r3.getLong(0), r3.getLong(1), r3.getLong(2), r3.getLong(3),
      r3.getLong(4)) == ((2L, 2L, 0L, 1732050L, 2999997L)))
  }
}
