package graft

import graft.ops.Sessionize
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization stats (q116). */
class SessionizeSpec extends SparkSpec {

  import spark.implicits._

  test("gaps cut sessions exactly at the threshold; spans and means are exact") {
    val gap = 100L
    // user 1: events at 0,50,120 (gap 70 > ... wait 120-50=70 <= 100 -> same),
    // then 500 (gap 380 > 100 -> new session)
    val rows = Seq(
      (1L, 10L, 0L), (1L, 11L, 50L), (1L, 12L, 120L), (1L, 13L, 500L),
      (2L, 20L, 1000L)) // singleton user
      .toDF("user_id", "event_id", "t_us")
    val out = Sessionize.sessionStatsOf(rows, col("t_us"), gapUs = gap)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // user 1: sessions {0,50,120} (span 120) and {500} (span 0)
    assert(out(1L) == ((2L, 4L, 2000000L, 120L)))
    assert(out(2L) == ((1L, 1L, 1000000L, 0L)))
  }

  test("a boundary gap exactly equal to the threshold does NOT cut") {
    val rows = Seq((1L, 1L, 0L), (1L, 2L, 100L)).toDF("user_id", "event_id", "t_us")
    val out = Sessionize.sessionStatsOf(rows, col("t_us"), gapUs = 100L).collect()
    assert(out(0).getLong(1) == 1L, "gap == threshold stays in-session (strict >)")
  }

  test("q116 fixture invariants: sessions partition each user's events") {
    val ev = graft.oracle.Tables.table(spark, sf0001, "events")
    val perUser = ev.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = Sessionize.q116(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == perUser.keySet)
    out.foreach { case (u, (ns, ne)) =>
      assert(ne == perUser(u), s"events must partition into sessions for $u")
      assert(ns >= 1 && ns <= ne)
    }
  }
}
