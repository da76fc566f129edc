package graft

import graft.operators.Relevance

/** Unit contracts for the fuzzy term matcher behind q301. */
class FuzzyMatchSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (1L, "spark hash window"),
    (2L, "spark spark table"),
    (3L, "shark bytes")
  ).toDF("doc_id", "text")

  test("fuzzyTermMatch: deletion neighborhoods cover del/ins/sub at distance 1") {
    val out = Relevance.fuzzyTermMatch(docs, "doc_id", "text",
      Seq("spak", "windoww", "hsh"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // spak -> spark (deletion pair), and shark? spak vs shark: edit
    // distance 2 — must NOT match. windoww (insert) -> window.
    // hsh (deletion) -> hash.
    assert(out.toSet == Set(
      ("spak", "spark", 2L), ("windoww", "window", 1L), ("hsh", "hash", 1L)))
  }

  test("fuzzyTermMatch: exact term matches itself; unrelated query matches nothing") {
    val out = Relevance.fuzzyTermMatch(docs, "doc_id", "text",
      Seq("table", "zzzzz"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("table", "table", 1L)))
  }

  test("fuzzyTermMatch: one query can hit several vocabulary tokens") {
    val d = Seq((1L, "cat car can")).toDF("doc_id", "text")
    val out = Relevance.fuzzyTermMatch(d, "doc_id", "text", Seq("ca"))
      .collect().map(_.getString(1)).toSeq
    assert(out == Seq("can", "car", "cat"))
  }
}
