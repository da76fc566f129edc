package graft

import graft.operators.{Components, IncrementalAgg, Profile}
import org.apache.spark.sql.functions._

/** Unit contracts for the Batch-5 extensions: incremental aggregate
  * maintenance, bounded-hop BFS, and Gini information gain — the
  * hand-computable fixtures behind the q280–q282 corpus witnesses.
  */
class IncrementalSpec extends SparkSpec {

  import spark.implicits._

  test("maintainCountSum: insert-only, delete-only, mixed, new key, key retirement") {
    val base = Seq(("a", 2L, 10L), ("b", 1L, 5L)).toDF("k", "cnt", "total")
    val delta = Seq(
      ("a", "I", 7L), // a: cnt 3, total 17
      ("b", "D", 5L), // b retires (cnt 0)
      ("c", "I", 1L), ("c", "I", 2L) // new key
    ).toDF("k", "op", "v")
    val out = IncrementalAgg.maintainCountSum(base, delta, Seq("k"), "op", "v")
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("a", 3L, 17L), ("c", 2L, 3L)))
  }

  test("maintainCountSum: untouched base keys pass through; bad op raises") {
    val base = Seq(("x", 4L, 40L)).toDF("k", "cnt", "total")
    val empty = Seq.empty[(String, String, Long)].toDF("k", "op", "v")
    val out = IncrementalAgg.maintainCountSum(base, empty, Seq("k"), "op", "v")
      .collect()
    assert(out.length == 1 && out(0).getLong(1) == 4L && out(0).getLong(2) == 40L)
    val bad = Seq(("x", "U", 1L)).toDF("k", "op", "v")
    val e = intercept[Exception] {
      IncrementalAgg.maintainCountSum(base, bad, Seq("k"), "op", "v").collect()
    }
    assert(e.getMessage.contains("unknown op"))
  }

  test("maintainCountSum equals recompute on a generated CDC history") {
    val facts = (1 to 300).map(i => (s"k${i % 7}", i.toLong, i.toLong % 50))
      .toDF("k", "id", "v")
    val base = facts.where(col("id") % 5 =!= 0).groupBy("k")
      .agg(count(lit(1)).cast("bigint").as("cnt"),
        sum("v").cast("bigint").as("total"))
    val delta = facts.where(col("id") % 5 === 0)
      .select(col("k"), lit("I").as("op"), col("v"))
      .unionAll(facts.where(col("id") % 5 =!= 0 && col("id") % 4 === 0)
        .select(col("k"), lit("D").as("op"), col("v")))
    val maintained = IncrementalAgg.maintainCountSum(
      base, delta, Seq("k"), "op", "v")
    val recomputed = facts
      .where((col("id") % 5 =!= 0 && col("id") % 4 =!= 0) || col("id") % 5 === 0)
      .groupBy("k")
      .agg(count(lit(1)).cast("bigint").as("cnt"),
        sum("v").cast("bigint").as("total"))
    assertSameData(maintained, recomputed)
  }

  test("bfsDistances: path graph distances, maxHops bound, early frontier exit") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("a", "b")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val out = Components.bfsDistances(e, "a", "b", seeds, "node", maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // disconnected 10-11 never reached; node 5 beyond maxHops
    val all = Components.bfsDistances(e, "a", "b", seeds, "node", maxHops = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(all == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
  }

  test("bfsDistances: multiple seeds take the min; seed absent from graph keeps hop 0") {
    val e = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val seeds = Seq(Tuple1(3L), Tuple1(99L)).toDF("node")
    val out = Components.bfsDistances(e, "a", "b", seeds, "node", maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(3L -> 0L, 99L -> 0L, 2L -> 1L, 1L -> 2L))
  }

  test("giniGain: perfectly informative feature recovers full parent impurity") {
    // 2 classes 50/50 -> parent gini 0.5; feature == label -> children pure.
    val df = (1 to 40).map(i => (if (i % 2 == 0) "f0" else "f1",
      if (i % 2 == 0) "l0" else "l1")).toDF("f", "l")
    val r = Profile.giniGain(df, "f", "l").collect()(0)
    assert(r.getAs[Long]("parent_gini_ppm") == 500000L)
    assert(r.getAs[Long]("child_gini_ppm") == 0L)
    assert(r.getAs[Long]("gain_ppm") == 500000L)
  }

  test("giniGain: independent feature gains ~0") {
    // feature splits evenly within each class -> children mirror parent.
    val df = (1 to 40).map(i => (s"f${i % 2}", s"l${(i / 2) % 2}"))
      .toDF("f", "l")
    val r = Profile.giniGain(df, "f", "l").collect()(0)
    assert(r.getAs[Long]("gain_ppm") == 0L)
    assert(r.getAs[Long]("parent_gini_ppm") == r.getAs[Long]("child_gini_ppm"))
  }
}
