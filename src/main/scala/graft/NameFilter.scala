package graft

/** Token semantics for SPARK_GRAFT_ONLY / SPARK_GRAFT_PROBE_ONLY: a token
  * selects a query when it equals the full name OR is an `_`-delimited
  * prefix of it. `q14` therefore matches `q14_ngram_jaccard` but NOT
  * `q140_entity_blocking` — the bare-startsWith version selected q140–q149
  * too, which cost a measured 6-minute unintended probe sweep (BASELINE.md,
  * round 11). tools/local_verify.py carries the same rule in Python; a
  * FilterSpec pins both the positive and the trap case.
  */
object NameFilter {
  def matches(token: String, name: String): Boolean =
    name == token || name.startsWith(token + "_")

  /** None = no filter (select everything). */
  def selected(only: Option[Seq[String]], name: String): Boolean =
    only.forall(_.exists(matches(_, name)))
}
