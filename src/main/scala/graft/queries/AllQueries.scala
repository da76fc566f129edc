package graft.queries

/** The full driver-checkable query surface. */
object AllQueries {
  val all: Seq[Q] = Relational.qs ++ HiveQ.qs ++ TextQ.qs ++ EmbedQ.qs ++ StatsQ.qs

  require(all.map(_.name).distinct.size == all.size, "duplicate query names")
}
