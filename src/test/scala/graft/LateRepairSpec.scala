package graft

import graft.ops.{LateRepair, PageRankDelta}
import graft.oracle.{Registry, Tables}
import org.apache.spark.sql.functions._

/** q171 — late-data census repair: the selective per-user recompute
  * must reproduce the monolithic census exactly, INCLUDING the signed
  * transition-split corrections naive append-only maintenance misses. */
class LateRepairSpec extends SparkSpec {

  test("hand fixture: a late event splits an existing transition (signed correction)") {
    import spark.implicits._
    // user 1's settled chain is 10 -> 20; late event (id 47 ≡ 0 mod 47)
    // lands BETWEEN them with item 30: the repair must add 10->30 and
    // 30->20 and REMOVE 10->20
    val ev = Seq(
      (1L, 1L, """{"k": 10}""", 100L),
      (1L, 2L, """{"k": 20}""", 300L),
      (1L, 47L, """{"k": 30}""", 200L)
    ).toDF("user_id", "event_id", "props", "tcol")
    val got = LateRepair.lateRepairOf(ev, col("tcol"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      (10L, 30L) -> ((1L, 1L)),
      (30L, 20L) -> ((1L, 1L)),
      (10L, 20L) -> ((0L, -1L))), s"got $got")
  }

  test("repaired census == monolithic full census on the fixture corpus") {
    val out = Registry.byName("q171_late_repair").run(spark, sf0001).collect()
    val repaired = out.filter(_.getLong(2) > 0)
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ev = Tables.table(spark, sf0001, "events")
    val full = PageRankDelta.fullDirectedCensusOf(ev, Tables.tsMicros(ev))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(repaired == full,
      s"repair diverged: sizes ${repaired.size} vs ${full.size}")
    // teeth: the scattered ~2% late set must actually split transitions
    // somewhere (negative corrections present), or the signed path is
    // untested at corpus scale
    assert(out.exists(_.getLong(3) < 0), "no negative corrections — split case unexercised")
    assert(out.exists(_.getLong(3) > 0), "no positive corrections")
  }
}
