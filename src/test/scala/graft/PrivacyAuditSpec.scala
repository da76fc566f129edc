package graft

import graft.operators.Validate

/** Unit contracts for the Batch-8 data-release/quality audits:
  * l-diversity, small-cell suppression, and ingestion-order audit —
  * the hand-computable fixtures behind the q288–q290 witnesses.
  */
class PrivacyAuditSpec extends SparkSpec {

  import spark.implicits._

  test("lDiversity: violating groups, min diversity, and mass at risk") {
    val df = Seq(
      ("a", 1, "u1"), ("a", 1, "u2"), ("a", 1, "u3"), // diverse (3)
      ("b", 1, "u1"), ("b", 1, "u1"), // diversity 1, 2 rows at risk
      ("c", 2, "u5") // diversity 1, 1 row at risk
    ).toDF("q1", "q2", "s")
    val r = Validate.lDiversity(df, Seq("q1", "q2"), "s", l = 2L).collect()(0)
    assert(r.getAs[Long]("n_groups") == 3L)
    assert(r.getAs[Long]("n_violating") == 2L)
    assert(r.getAs[Long]("min_diversity") == 1L)
    assert(r.getAs[Long]("rows_at_risk") == 3L)
  }

  test("tCloseness: point-mass tails, identical-to-global zero, grid cap") {
    // A = {1,1}, B = {3,3}: global uniform{1,3}, range 2; each group
    // is a point mass one unit from the global mean -> normalized
    // EMD = 0.5 exactly for both (w1n = 8, t = (1e6·8) div (2·4·2)).
    val df = Seq(("A", 1L), ("A", 1L), ("B", 3L), ("B", 3L))
      .toDF("g", "v")
    val r = Validate.tCloseness(df, Seq("g"), "v", tPpm = 400000L)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((2L, 2L, 500000L, 4L)))
    // groups that mirror the global distribution have t = 0
    val same = Seq(("A", 1L), ("A", 3L), ("B", 1L), ("B", 3L))
      .toDF("g", "v")
    val rs = Validate.tCloseness(same, Seq("g"), "v", tPpm = 400000L)
      .collect().head
    assert((rs.getLong(1), rs.getLong(2)) == ((0L, 0L)))
    // a single-value support defines t = 0 (no distance possible)
    val one = Seq(("A", 7L), ("B", 7L)).toDF("g", "v")
    assert(Validate.tCloseness(one, Seq("g"), "v", tPpm = 1L)
      .collect().head.getLong(2) == 0L)
    // the dense-grid cap raises loudly instead of exploding
    val ex = intercept[Exception] {
      Validate.tCloseness(df, Seq("g"), "v", tPpm = 400000L,
        maxGridCells = 3L).collect()
    }
    assert(ex.getMessage.contains("tCloseness") ||
      Option(ex.getCause).exists(_.getMessage.contains("tCloseness")))
  }

  test("suppressSmallGroups: sentinel row carries exactly the suppressed mass") {
    val df = (Seq.fill(6)(("en", "web")) ++ Seq.fill(5)(("de", "web")) ++
      Seq.fill(2)(("fr", "web")) ++ Seq.fill(1)(("zh", "books")))
      .toDF("lang", "src")
    val out = Validate.suppressSmallGroups(df, Seq("lang", "src"), k = 5L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out(("en", "web")) == 6L && out(("de", "web")) == 5L)
    assert(out(("__suppressed__", "__suppressed__")) == 3L)
    assert(out.values.sum == 14L) // release sums to the input
    assert(!out.keySet.exists(k => k._1 == "fr" || k._1 == "zh"))
  }

  test("suppressSmallGroups: nothing to suppress -> no sentinel row") {
    val df = Seq.fill(5)(("en", "web")).toDF("lang", "src")
    val out = Validate.suppressSmallGroups(df, Seq("lang", "src"), k = 5L)
      .collect()
    assert(out.length == 1 && out(0).getString(0) == "en")
  }

  test("timeOrderAudit: counts inversions and the largest backstep") {
    val df = Seq(
      (1L, 1L, 100L), (1L, 2L, 90L), (1L, 3L, 95L), // one inversion, backstep 10
      (2L, 1L, 50L), (2L, 2L, 45L), // inversion, backstep 5
      (3L, 1L, 7L) // singleton: no pairs
    ).toDF("u", "seq", "tn")
    val r = Validate.timeOrderAudit(df, "u", "seq", "tn").collect()(0)
    assert(r.getAs[Long]("n_pairs") == 3L)
    assert(r.getAs[Long]("n_inversions") == 2L)
    assert(r.getAs[Long]("inversion_ppm") == 666666L)
    assert(r.getAs[Long]("max_backstep") == 10L)
  }

  test("timeOrderAudit: fully ordered stream reports zero, empty reports NULL ppm") {
    val ordered = Seq((1L, 1L, 10L), (1L, 2L, 20L)).toDF("u", "seq", "tn")
    val r = Validate.timeOrderAudit(ordered, "u", "seq", "tn").collect()(0)
    assert(r.getAs[Long]("n_inversions") == 0L && r.getAs[Long]("max_backstep") == 0L)
    val empty = Seq.empty[(Long, Long, Long)].toDF("u", "seq", "tn")
    val r2 = Validate.timeOrderAudit(empty, "u", "seq", "tn").collect()(0)
    assert(r2.getAs[Long]("n_pairs") == 0L)
    assert(r2.isNullAt(r2.fieldIndex("inversion_ppm")))
  }
}
