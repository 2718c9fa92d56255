package graft

import graft.ops.DecayedCount
import org.apache.spark.sql.functions._

class DecayedCountSpec extends SparkSpec {

  private def ev(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    rows.toDF("event_type", "t")
  }

  test("q88: decay weights are exact halvings at half-life multiples") {
    // anchor = newest event (t = 2h); ages 0, 1h, 2h -> 1e6, 5e5, 25e4
    val hl = 3600000000L
    val out = DecayedCount.decayedCountsOf(ev(Seq(
      ("a", 2 * hl), ("a", hl), ("b", 0L))), col("t"), halfLifeUs = hl).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("a") == (2L, 1500000L, 8571L), s"service a: $out")    // 1e6 + 5e5
    assert(out("b") == (1L, 250000L, 1428L), s"service b: $out")     // 25e4; share 25/175
  }

  test("q88: exp2 table boundary cells are pinned (no libm in the weight path)") {
    val tab = DecayedCount.Exp2MicroTab
    assert(tab.length == 1000)
    assert(tab(0) == 1000000L)      // 2^0
    assert(tab(500) == 707107L)     // round(2^-0.5 * 1e6) = round(707106.78)
    assert(tab(999) == 500347L)     // one grid step above a full halving
    assert(tab.zip(tab.tail).forall { case (a, b) => a > b }, "strictly decreasing")
    // a non-multiple age runs through table + shift: age = 1.5 half-lives
    val hl = 3600000000L
    val out = DecayedCount.decayedCountsOf(ev(Seq(
      ("a", 3 * hl / 2), ("b", 0L))), col("t"), halfLifeUs = hl).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("a") == 1000000L, s"anchor event: $out")
    assert(out("b") == tab(500) / 2, s"1.5 half-lives = TAB(500) div 2: $out")
  }

  test("q88: recency beats raw volume (a fresh burst outranks an old flood)") {
    val hl = 3600000000L
    // 10 old events (age 10 half-lives) vs 2 fresh ones
    val rows = (1 to 10).map(_ => ("old", 0L)) ++ Seq(("fresh", 10 * hl), ("fresh", 10 * hl))
    val out = DecayedCount.decayedCountsOf(ev(rows), col("t"), halfLifeUs = hl).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("fresh") > out("old"),
      s"2 fresh events must outweigh 10 ten-half-life-old ones: $out")
  }

  test("q88 plan: both consumers read the persisted per-service frame; its build scans events at most twice (anchor + weights)") {
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val df = DecayedCount.q88(spark, sf0001)
    val withCache = df.queryExecution.withCachedData
    val ims = withCache.collect { case r: InMemoryRelation => r }
    assert(ims.length == 2 && ims.map(_.cacheBuilder).distinct.length == 1,
      s"total + final must share the ONE persisted per-service frame:\n$withCache")
    assert(withCache.collect { case l: LogicalRelation => l }.isEmpty,
      s"a corpus scan escaped the persisted frame:\n$withCache")
    val cached = ims.head.cacheBuilder.cachedPlan.toString
    assert(cached.sliding("Scan parquet".length).count(_ == "Scan parquet") <= 2,
      s"anchor census + weights only:\n$cached")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"),
      s"no corpus-keyed join/window belongs here:\n$p")
  }
}
