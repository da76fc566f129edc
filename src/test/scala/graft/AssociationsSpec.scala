package graft

import graft.operators.{Associations, Mixing, Validate}
import org.apache.spark.sql.functions._

/** Unit contracts for the Batch-4 extensions: group-aware splits,
  * functional-dependency audit, and pair association rules — the
  * hand-computable fixtures behind the q277–q279 corpus witnesses.
  */
class AssociationsSpec extends SparkSpec {

  import spark.implicits._

  test("groupSplit: split is a pure function of the group — zero leakage") {
    val df = (1 to 200).map(i => (i.toLong % 40, i)).toDF("uid", "x")
    val sp = Mixing.groupSplit(df, "uid", 700)
    val leaked = sp.groupBy("uid").agg(countDistinct("split").as("k"))
      .where(col("k") > 1).count()
    assert(leaked == 0L)
    val splits = sp.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "eval")) && splits.size == 2)
  }

  test("groupSplit is deterministic across invocations") {
    val df = (1 to 50).map(i => Tuple1(i.toLong)).toDF("uid")
    val a = Mixing.groupSplit(df, "uid", 500).orderBy("uid")
      .collect().map(_.toString).toSeq
    val b = Mixing.groupSplit(df, "uid", 500).orderBy("uid")
      .collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("functionalDependency: holds, violated, and ppm arithmetic") {
    val ok = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("k", "v")
    val r1 = Validate.functionalDependency(ok, Seq("k"), "v").collect()(0)
    assert(r1.getAs[Long]("n_keys") == 2L && r1.getAs[Long]("n_violating") == 0L)
    assert(r1.getAs[Long]("max_distinct") == 1L && r1.getAs[Long]("violation_ppm") == 0L)

    val bad = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "x"), (3L, "y"), (3L, "y"))
      .toDF("k", "v")
    val r2 = Validate.functionalDependency(bad, Seq("k"), "v").collect()(0)
    assert(r2.getAs[Long]("n_keys") == 3L && r2.getAs[Long]("n_violating") == 1L)
    assert(r2.getAs[Long]("max_distinct") == 3L)
    assert(r2.getAs[Long]("violation_ppm") == 1000000L / 3)
  }

  test("pairRules: support, confidence, and lift on a hand-built basket set") {
    // baskets: {a,b} {a,b} {a,c} {b} -> N=4, n_a=3, n_b=3, n_c=1
    // pair (a,b): n_ab=2, conf(a->b)=2/3, lift = 2*4/(3*3)=8/9
    val df = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"), (4L, "b")).toDF("bk", "it")
    val out = Associations.pairRules(df, "bk", "it", minSupport = 1L, k = 10)
      .collect()
    val ab = out.find(r => r.getString(0) == "a" && r.getString(1) == "b").get
    assert(ab.getAs[Long]("n_ab") == 2L)
    assert(ab.getAs[Long]("n_a") == 3L && ab.getAs[Long]("n_b") == 3L)
    assert(ab.getAs[Long]("conf_ab_ppm") == 666666L)
    assert(ab.getAs[Long]("conf_ba_ppm") == 666666L)
    assert(ab.getAs[Long]("lift_ppm") == (1000000L * 2 * 4) / 9)
    val ac = out.find(r => r.getString(0) == "a" && r.getString(1) == "c").get
    assert(ac.getAs[Long]("n_ab") == 1L)
    assert(ac.getAs[Long]("lift_ppm") == (1000000L * 1 * 4) / 3)
  }

  test("pairRules: minSupport filters; duplicate items in a basket count once") {
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"), (2L, "c"))
      .toDF("bk", "it")
    val out = Associations.pairRules(df, "bk", "it", minSupport = 1L, k = 10)
      .collect()
    // (a,b) support 1 despite 'a' twice in basket 1
    assert(out.find(r => r.getString(0) == "a" && r.getString(1) == "b")
      .get.getAs[Long]("n_ab") == 1L)
    assert(Associations.pairRules(df, "bk", "it", minSupport = 2L, k = 10)
      .count() == 0L)
  }

  test("pairRules: degenerate-basket cap drops the whole basket") {
    // basket 1 has 5 items (> cap 4): contributes nothing; basket 2
    // has the only surviving pair.
    val big = (1 to 5).map(i => (1L, s"i$i"))
    val small = Seq((2L, "x"), (2L, "y"))
    val df = (big ++ small).toDF("bk", "it")
    val out = Associations.pairRules(df, "bk", "it", minSupport = 1L,
      k = 100, maxBasketItems = 4).collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "x" && out(0).getString(1) == "y")
    // N counts only surviving baskets: lift = 1*1/(1*1) = 1e6
    assert(out(0).getAs[Long]("lift_ppm") == 1000000L)
  }
}
