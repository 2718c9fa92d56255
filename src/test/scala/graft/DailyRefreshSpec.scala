package graft

import graft.oracle.Registry

/** q166 — the composed daily-refresh DAG, reconciliation-pinned to the
  * standalone audits it composes (the q61 discipline): every output
  * column must equal, node-for-node, the value the standalone query
  * computes at the SAME cut. The composition shares one corpus pass and
  * two census caches across the arms — these tests prove the sharing
  * changed nothing.
  */
class DailyRefreshSpec extends SparkSpec {

  private def optLong(v: Any): Option[Long] =
    Option(v).map(_.asInstanceOf[Long])

  // one build each — the three DAGs run their iterative arms eagerly
  private lazy val out =
    Registry.byName("q166_daily_refresh").run(spark, sf0001).collect()
  private lazy val sd =
    Registry.byName("q163_spectral_delta").run(spark, sf0001).collect()
  private lazy val pd =
    Registry.byName("q164_pagerank_delta").run(spark, sf0001).collect()

  test("q166 covers exactly the merged directed census node set, non-empty") {
    assert(out.nonEmpty)
    assert(out.map(_.getLong(0)).distinct.length == out.length,
      "one row per node")
  }

  test("q166 rank columns == q164's settled/warm arms, node-for-node") {
    // q164 rows: (item, rank_settled, rank_warm, rank_cold, drift);
    // both queries cover the merged directed census node set
    val got = out.map(r => r.getLong(0) -> ((optLong(r.get(1)), r.getLong(2)))).toMap
    val want = pd.map(r => r.getLong(0) -> ((optLong(r.get(1)), r.getLong(2)))).toMap
    assert(got.keySet == want.keySet,
      s"node sets differ: only-composed=${(got.keySet -- want.keySet).take(5)} " +
        s"only-standalone=${(want.keySet -- got.keySet).take(5)}")
    val bad = got.collect { case (k, v) if want(k) != v => (k, v, want(k)) }
    assert(bad.isEmpty, s"rank mismatches (node, composed, standalone): ${bad.take(5)}")
  }

  test("q166 spectral columns == q163's settled/warm arms on the merged-matrix node set") {
    // q163 rows: (node, v_settled, v_warm, v_cold, drift) over the merged
    // BACKBONED-PPMI matrix nodes — a strict subset of the census nodes
    val got = out.map(r => r.getLong(0) -> ((optLong(r.get(3)), optLong(r.get(4))))).toMap
    sd.foreach { r =>
      val node = r.getLong(0)
      assert(got.contains(node), s"spectral node $node missing from the composed output")
      assert(got(node)._2.contains(r.getLong(2)),
        s"v_warm mismatch at $node: composed=${got(node)._2} standalone=${r.getLong(2)}")
      assert(got(node)._1 == optLong(r.get(1)),
        s"v_settled mismatch at $node: composed=${got(node)._1} standalone=${optLong(r.get(1))}")
    }
    // and the composed non-null v_warm set IS the standalone node set —
    // the composition introduced no extra (or missing) spectral rows
    assert(out.count(_.get(4) != null) == sd.length,
      "non-null v_warm rows must match q163's row count exactly")
  }
}
