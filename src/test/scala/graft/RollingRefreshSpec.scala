package graft

import graft.ops.{Frontier, PageRankDelta, RollingRefresh, SpectralDelta}
import graft.oracle.{Registry, Tables}
import org.apache.spark.sql.functions._

/** q169 — the rolling two-day refresh: the two closure identities that
  * make the daily maintenance loop sound under iteration, pinned on the
  * real fixture corpus. */
class RollingRefreshSpec extends SparkSpec {

  private val c1 = SpectralDelta.DeltaCutUs
  private val c2 = RollingRefresh.Day2CutUs

  private def itemEvents = {
    val ev = Tables.table(spark, sf0001, "events")
    ev.select(col("user_id"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"),
        Tables.tsMicros(ev).as("t"))
      .filter(col("item").isNotNull)
  }

  test("frontier compaction: advance(F0, lastOf(d1)) == lastOf(settled ∪ d1)") {
    val e = itemEvents
    val s = e.filter(col("t") < c1)
    val d1 = e.filter(col("t") >= c1 && col("t") < c2)
    val rolled = Frontier.advance(Frontier.lastOf(s), Frontier.lastOf(d1))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scratch = Frontier.lastOf(e.filter(col("t") < c2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rolled == scratch, "upsert diverged from re-derivation")
    // teeth: the fixture covers the settled-only and both-sides arms at
    // this cut (every d1 user has settled history); the delta-only
    // (brand-new user) arm comes from the hand case below
    val sU = Frontier.lastOf(s).collect().map(_.getLong(0)).toSet
    val dU = Frontier.lastOf(d1).collect().map(_.getLong(0)).toSet
    assert((sU -- dU).nonEmpty, "no settled-only users")
    assert((sU & dU).nonEmpty, "no both-sides users")
  }

  test("frontier compaction hand case: settled-only, updated and brand-new users") {
    import spark.implicits._
    val f0 = Seq((1L, 10L), (2L, 20L)).toDF("user_id", "s_item")
    val d1Last = Seq((2L, 21L), (3L, 30L)).toDF("user_id", "s_item")
    val got = Frontier.advance(f0, d1Last)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 10L, 2L -> 21L, 3L -> 30L), s"got $got")
  }

  test("census closure: the twice-decomposed m2 == the monolithic full census") {
    val ev = Tables.table(spark, sf0001, "events")
    val got = RollingRefresh.rolledCensusOf(ev, Tables.tsMicros(ev)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = PageRankDelta.fullDirectedCensusOf(ev, Tables.tsMicros(ev))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want,
      s"closure broken: sizes ${got.size} vs ${want.size}; " +
        s"first diff=${(got.toSet diff want.toSet).take(3)}")
  }

  test("day-2 arms are non-degenerate: ranks everywhere, spectral on the PPMI subset") {
    val out = Registry.byName("q169_rolling_refresh").run(spark, sf0001).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => !r.isNullAt(1) && !r.isNullAt(2)), "rank arms must cover all nodes")
    val withV = out.filter(!_.isNullAt(4))
    assert(withV.nonEmpty, "spectral arms must cover the backboned-PPMI subset")
    // warm and cold spectral arms share one node set — v_drift defined
    // exactly where both are
    assert(out.forall(r => r.isNullAt(4) == r.isNullAt(5)),
      "v_warm/v_cold must be null on exactly the same nodes")
  }
}
