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

  test("advanceByTime: a late-bearing delta still yields lastFullOf(settled ∪ delta); advance would not") {
    import spark.implicits._
    // user 1: delta event PREDATES the frontier (the q171/q172 late
    // shape) — time-compare must keep the settled item, blind upsert
    // takes the late one; user 2: genuine post-cut update; user 3: new
    val s = Seq((1L, 100L, 10L, 5000L), (1L, 101L, 11L, 6000L),
      (2L, 200L, 20L, 5000L)).toDF("user_id", "event_id", "item", "t")
    val d = Seq((1L, 102L, 12L, 5500L), // late: between user 1's events
      (2L, 201L, 21L, 9000L), (3L, 300L, 30L, 7000L))
      .toDF("user_id", "event_id", "item", "t")
    def toMapOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = toMapOf(Frontier.advanceByTime(
      Frontier.lastFullOf(s), Frontier.lastFullOf(d)))
    val want = toMapOf(Frontier.lastFullOf(s.unionByName(d)))
    assert(got == want, s"advanceByTime diverged: $got vs $want")
    assert(got == Map(1L -> 11L, 2L -> 21L, 3L -> 30L), s"got $got")
    // the documented hazard is REAL: the blind upsert gets user 1 wrong
    val blind = toMapOf(Frontier.advance(Frontier.lastOf(s), Frontier.lastOf(d)))
    assert(blind(1L) == 12L, "precondition violation should corrupt advance")
    // and on a post-cut delta the two agree (advance's contract holds)
    val dOk = d.filter(col("t") >= lit(6500L))
    assert(toMapOf(Frontier.advanceByTime(Frontier.lastFullOf(s), Frontier.lastFullOf(dOk)))
      == toMapOf(Frontier.advance(Frontier.lastOf(s), Frontier.lastOf(dOk))))
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

  test("N-cycle chain: closure holds at 4 cycles and chained-warm drift stays bounded") {
    val ev = Tables.table(spark, sf0001, "events")
    val cuts = RollingRefresh.dailyCuts(4)
    // closure: the 4-times-rolled census == the monolithic census — fails
    // if ANY cycle's decomposition or frontier upsert is wrong
    val rolled = RollingRefresh.chainFinalCensusOf(ev, Tables.tsMicros(ev), cuts)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val mono = PageRankDelta.fullDirectedCensusOf(ev, Tables.tsMicros(ev))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rolled == mono,
      s"4-cycle closure broken: sizes ${rolled.size} vs ${mono.size}")
    // drift: warm-vs-cold per cycle must not blow up as the prior chains
    // (the "run forever" claim q169 made for 2 cycles; ChainProbe records
    // the sf0.1 curve). Deterministic integer arithmetic — a loose 10×
    // bound on the per-node mean catches accumulation, not noise.
    val drift = RollingRefresh.chainDriftOf(ev, Tables.tsMicros(ev), cuts)
      .collect().sortBy(_.getInt(0))
    assert(drift.length == 4)
    val meanPerNode = drift.map(r => r.getLong(2).toDouble / r.getLong(1))
    assert(meanPerNode.last <= 10.0 * math.max(meanPerNode.head, 1.0),
      s"chained rank drift accumulating: per-node means ${meanPerNode.toSeq}")
    drift.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(4) > 0, s"degenerate cycle: $r") }
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
