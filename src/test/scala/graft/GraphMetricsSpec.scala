package graft

import graft.operators.Components

/** Hand-computed fixtures for the round-6 graph-metric extensions:
  * degree assortativity, per-node clustering, and reciprocity — the
  * unit contracts behind the q306–q308 corpus witnesses.
  */
class GraphMetricsSpec extends SparkSpec {

  import spark.implicits._

  test("degreeAssortativity: perfect star is exactly -1") {
    // K1,3: hub degree 3, leaves degree 1. Directed image m=6,
    // sxy=18, s1=12, s2=30 -> num=-36, den=36 -> r = -1.
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val r = Components.degreeAssortativity(e, "a", "b").head()
    assert(r.getLong(0) == 3L)
    assert(r.getLong(1) == -1000000L)
  }

  test("degreeAssortativity: regular graph (zero variance) yields NULL") {
    // perfect matching: every degree 1 -> den = 0 -> NULL, not 0.
    val e = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    val r = Components.degreeAssortativity(e, "a", "b").head()
    assert(r.getLong(0) == 2L)
    assert(r.isNullAt(1))
  }

  test("localClustering: triangle with a pendant") {
    // edges (1,2)(1,3)(2,3)(3,4): nodes 1,2 close their one wedge
    // (lcc=1e6), node 3 closes 1 of 3 (333333), node 4 has no wedge
    // and is omitted.
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val out = Components.localClustering(e, "a", "b")
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 2L, 1L, 1000000L),
      (2L, 2L, 1L, 1000000L),
      (3L, 3L, 1L, 333333L)))
  }

  test("reciprocity: dedups arcs, drops self-loops, counts both mutual arcs") {
    val arcs = Seq(("a", "b"), ("b", "a"), ("a", "c"), ("c", "c"), ("a", "b"))
      .toDF("s", "d")
    val r = Components.reciprocity(arcs, "s", "d").head()
    // distinct clean arcs: a->b, b->a, a->c  => 3; mutual: 2.
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (3L, 2L, 666666L))
  }

  test("weightedShortestPaths: relaxation horizon and min-combine") {
    // path a -5- b -1- c plus direct a -10- c: 2 rounds relax both
    // routes; the 2-edge route (6) beats the direct edge (10).
    val e = Seq(("a", "b", 5L), ("b", "c", 1L), ("a", "c", 10L))
      .toDF("x", "y", "w")
    val seeds = Seq("a").toDF("node")
    val out2 = Components.weightedShortestPaths(e, "x", "y", "w",
        seeds, "node", maxRounds = 2)
      .orderBy("node").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out2.toSeq == Seq(("a", 0L), ("b", 5L), ("c", 6L)))
    // 1 round: only ≤1-edge paths are final — c keeps the direct 10.
    val out1 = Components.weightedShortestPaths(e, "x", "y", "w",
        seeds, "node", maxRounds = 1)
      .orderBy("node").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out1.toSeq == Seq(("a", 0L), ("b", 5L), ("c", 10L)))
  }

  test("weightedShortestPaths: multi-edge collapses to cheapest; negative cost rejected") {
    val e = Seq(("a", "b", 7L), ("b", "a", 3L)).toDF("x", "y", "w")
    val seeds = Seq("a").toDF("node")
    val out = Components.weightedShortestPaths(e, "x", "y", "w",
        seeds, "node", maxRounds = 1)
      .orderBy("node").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a", 0L), ("b", 3L)))
    val neg = Seq(("a", "b", -1L)).toDF("x", "y", "w")
    intercept[IllegalArgumentException] {
      Components.weightedShortestPaths(neg, "x", "y", "w", seeds, "node", 1)
    }
  }

  test("hits: two exact integer rounds on a co-cited star") {
    // a->c, b->c, c->d: c is the authority (both hubs point at it),
    // a/b are the pure hubs; hand-rolled two-round trace.
    val arcs = Seq(("a", "c"), ("b", "c"), ("c", "d")).toDF("s", "d")
    val out = Components.hits(arcs, "s", "d", iters = 2)
      .orderBy("node").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("a", 1000000L, 0L),
      ("b", 1000000L, 0L),
      ("c", 250000L, 1000000L),
      ("d", 0L, 250000L)))
  }

  test("skyline2D: per-x max reduction, strict dominance, equal-y drop") {
    import graft.operators.RobustStats
    val pts = Seq((1L, 5L), (2L, 3L), (3L, 3L), (3L, 9L), (4L, 1L),
      (5L, 0L), (5L, 1L)).toDF("x", "y")
    // per-x max: 1->5 2->3 3->9 4->1 5->1; survivors: (3,9), (4,1)
    // is dominated by (5,1)? y'=1 >= 1 and x'=5 > 4 -> dominated.
    // (5,1) survives (nothing above it to the right).
    val out = RobustStats.skyline2D(pts, "x", "y", buckets = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((3L, 9L), (5L, 1L)))
  }

  test("skyline2D: single point and duplicate points survive") {
    import graft.operators.RobustStats
    val pts = Seq((7L, 7L), (7L, 7L)).toDF("x", "y")
    val out = RobustStats.skyline2D(pts, "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((7L, 7L)))
  }

  test("rollingActive: presence-explode window, gap bucket, stickiness") {
    import graft.operators.TimeSeries
    // bucketSec=1, window=3. Entities: u on t=0 and t=2; v on t=0.
    // presence: (0,u),(0,v),(2,u). Range [0,2].
    // t=0: n_bucket=2, window {u,v}=2. t=1: n_bucket=0, window from
    // t=0 presences -> {u,v}=2. t=2: n_bucket=1, window {u,v}=2.
    val ns = 1000000000L
    val df = Seq((0L * ns, "u"), (0L * ns, "v"), (2L * ns, "u"),
      (2L * ns + 1L, "u")).toDF("ts", "e")
    val out = TimeSeries.rollingActive(df, "ts", "e",
      bucketSec = 1L, windowBuckets = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, 2L, 2L, 1000000L),
      (1L, 0L, 2L, 0L),
      (2L, 1L, 2L, 500000L)))
  }

  test("mutualNearestNeighbors: mutual pair kept, hub-asymmetric match dropped") {
    import graft.operators.SimilarityOps
    // 1 and 2 are identical (each other's top-1, sim 1.0); 3 and 4
    // both point AT 1 but 1 points at 2 -> neither survives.
    val df = Seq(
      (1L, Array(1f, 0f)), (2L, Array(1f, 0f)),
      (3L, Array(0f, 1f)), (4L, Array(0.9f, 0.1f))).toDF("id", "v")
    val out = SimilarityOps.mutualNearestNeighbors(df, "id", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L)))
  }

  test("hIndex: classic citation fixture, tie-invariant") {
    import graft.operators.Profile
    val df = Seq(("u", 5L), ("u", 3L), ("u", 2L), ("u", 1L),
      ("v", 4L), ("v", 4L), ("v", 4L), ("v", 4L), ("v", 4L)).toDF("g", "c")
    val out = Profile.hIndex(df, "g", "c").orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // u: {5,3,2,1} -> h=2; v: five 4s -> h=4 (only 4 rank<=4).
    assert(out.toSeq == Seq(("u", 4L, 2L), ("v", 5L, 4L)))
  }

  test("modularity: two triangles + bridge, and the missing-label guard") {
    import spark.implicits._
    // m=7; communities {a,b,c}, {d,e,f}: e_c=3 each, d_c=7 each ->
    // Q*196 = 2*(84-49) = 70 -> q_ppm = 70e6 div 196 = 357142
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"),
      ("d", "e"), ("d", "f"), ("e", "f"), ("a", "d")).toDF("x", "y")
    val labels = Seq(("a", "c1"), ("b", "c1"), ("c", "c1"),
      ("d", "c2"), ("e", "c2"), ("f", "c2")).toDF("node", "lab")
    val r = graft.operators.Components
      .modularity(edges, "x", "y", labels, "node", "lab").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((7L, 2L, 357142L)))
    // a node without a label must raise, not silently vanish
    val partial = labels.where(
      org.apache.spark.sql.functions.col("node") =!= "f")
    val e = intercept[Exception](graft.operators.Components
      .modularity(edges, "x", "y", partial, "node", "lab").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("modularity")))
  }

  test("harmonicCentrality: path graph distances truncate at 3 hops") {
    import spark.implicits._
    // a-b-c-d-e: a reaches b@1, c@2, d@3 (e is 4 hops, dropped)
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
      .toDF("x", "y")
    val out = graft.operators.Components.harmonicCentrality(edges, "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("a") == ((1L, 1L, 1L, 1833333L)))
    assert(out("b") == ((2L, 1L, 1L, 2833333L)))
    assert(out("c") == ((2L, 2L, 0L, 3000000L)))
    assert(out("d") == out("b") && out("e") == out("a"))
  }
}
