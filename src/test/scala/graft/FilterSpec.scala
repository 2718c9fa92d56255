package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the SPARK_GRAFT_ONLY / SPARK_GRAFT_PROBE_ONLY token rule
  * ([[NameFilter]]): exact-or-`_`-prefix, shared by Verify, Bench,
  * ScaleProbe and (in Python) tools/local_verify.py. The trap this
  * kills is measured: bare startsWith made `ONLY=q14` also select
  * q140–q149 — a 6-minute unintended probe sweep (round 11). */
class FilterSpec extends AnyFunSuite {

  test("token matches exact name or _-delimited prefix only") {
    assert(NameFilter.matches("q14", "q14_ngram_jaccard"))
    assert(NameFilter.matches("q14_ngram_jaccard", "q14_ngram_jaccard"))
    assert(!NameFilter.matches("q14", "q140_entity_blocking"))
    assert(!NameFilter.matches("q14", "q149_lpa"))
    assert(NameFilter.matches("q14_ngram", "q14_ngram_jaccard"),
      "a `_`-aligned multi-segment prefix matches")
    assert(!NameFilter.matches("q14_ng", "q14_ngram_jaccard"),
      "a non-`_`-aligned partial token must not match")
  }

  test("selected: None selects everything; tokens OR together") {
    assert(NameFilter.selected(None, "whatever"))
    assert(NameFilter.selected(Some(Seq("q14", "q38")), "q38_cc_clusters"))
    assert(!NameFilter.selected(Some(Seq("q14", "q38")), "q380_nope"))
  }

  test("ONLY=q14 selects exactly one registered query (the measured trap)") {
    val sel = graft.oracle.Registry.all.map(_.name)
      .filter(n => NameFilter.selected(Some(Seq("q14")), n))
    assert(sel == Seq("q14_ngram_jaccard"), s"got $sel")
  }
}
