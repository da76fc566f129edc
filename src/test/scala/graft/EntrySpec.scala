package graft

/** The driver smoke-checks `SparkEntry.entry` returns rows — pin that
  * here so a refactor can't silently empty the flagship. */
class EntrySpec extends SparkSpec {
  test("flagship entry returns non-empty per-source curation stats") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0) // n_docs
      assert(r.getLong(3) <= r.getLong(2)) // kept_spans <= total_spans
    }
  }
}
