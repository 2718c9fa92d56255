package graft

import graft.ops.{Cohort, Funnel}
import org.apache.spark.sql.functions._

class FunnelCohortSpec extends SparkSpec {

  private def evDf(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    rows.toDF("user_id", "event_type", "t")
  }

  test("q86: funnel attaches the NEXT purchase within gap, ordered semantics exact") {
    // user 1: click@100, purchase@150 (converts, gap 50), purchase@160 (not next)
    // user 1: click@200 -> purchase@200+gap excluded (strictly after, within 100)
    // user 2: click@300, purchase@401 outside gap=100 -> no conversion
    // user 3: purchase@50 BEFORE click@60 -> order matters, no conversion
    val ev = evDf(Seq(
      (1L, "click", 100L), (1L, "purchase", 150L), (1L, "purchase", 160L),
      (1L, "click", 200L), (2L, "click", 300L), (2L, "purchase", 401L),
      (3L, "purchase", 50L), (3L, "click", 60L), (4L, "view", 10L)))
    val out = Funnel.funnelOf(ev, col("t"), gapUs = 100L).collect()(0)
    assert(out.getLong(0) == 4, s"clicks: $out")
    assert(out.getLong(1) == 1, s"conversions: $out")
    assert(out.getLong(2) == 2500, s"conversion bp: $out")
    assert(out.getLong(3) == 50 && out.getLong(4) == 50 && out.getLong(5) == 50,
      s"gap stats: $out")
  }

  test("q86: empty/clickless input is total") {
    val out = Funnel.funnelOf(evDf(Seq((1L, "view", 1L))), col("t")).collect()(0)
    assert(out.getLong(0) == 0 && out.getLong(1) == 0 && out.getLong(2) == 0,
      s"no clicks: $out")
  }

  test("q87: retention matrix counts distinct users at (cohort, age) grain") {
    // day length 86400e6 us; users: u1 first day0 active day0,day1,day2;
    // u2 first day0 active day0,day2; u3 first day1 active day1.
    // multiple events same day collapse.
    val d = 86400000000L
    val ev = evDf(Seq(
      (1L, "e", 0L), (1L, "e", 100L), (1L, "e", d + 5L), (1L, "e", 2 * d),
      (2L, "e", 50L), (2L, "e", 2 * d + 9L),
      (3L, "e", d + 1L)))
    val out = Cohort.cohortRetentionOf(ev, col("t")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 2L) -> 2L, (1L, 0L) -> 1L),
      s"matrix wrong: $out")
  }

  test("q86/q87 plans: one user exchange each, no self-join of the raw corpus (funnel), co-partitioned attach (cohort)") {
    val f = Funnel.q86(spark, sf0001)
    val pf = f.queryExecution.executedPlan.toString
    assert(pf.sliding("Scan parquet".length).count(_ == "Scan parquet") == 1 &&
      !pf.contains("Join"), s"funnel must be one windowed pass, no join:\n$pf")
    val c = Cohort.q87(spark, sf0001)
    val pc = c.queryExecution.executedPlan.toString
    assert(!pc.contains("CartesianProduct") && !pc.contains("BroadcastNestedLoop"),
      s"cohort attach must be keyed:\n$pc")
  }
}
