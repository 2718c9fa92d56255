package graft

import graft.ops.EventsProfile
import org.apache.spark.sql.functions._

class EventsProfileSpec extends SparkSpec {

  test("q91: profile measures are exact on a hand-built feed") {
    import spark.implicits._
    val ev = Seq(
      ("a", Some(1.5), 1L, 100L), ("a", Some(2.5), 1L, 300L),
      ("a", None, 2L, 200L),                        // null value, second user
      ("b", Some(-3.0), 9L, 50L))
      .toDF("event_type", "value", "user_id", "t")
    val out = EventsProfile.eventsProfileOf(ev, col("t")).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) == 3 && a.getLong(2) == 3333, s"n/null_bp: $a")
    assert(a.getDouble(3) == 1.5 && a.getDouble(4) == 2.5, s"range: $a")
    assert(a.getDouble(5) == 2.0, s"mean over non-null: $a")
    assert(a.getLong(6) == 200 && a.getLong(7) == 2, s"span/users: $a")
    val b = out("b")
    assert(b.getLong(1) == 1 && b.getDouble(5) == -3.0 && b.getLong(6) == 0 &&
      b.getLong(7) == 1, s"singleton service: $b")
  }

  test("q91: all-null value column yields null mean, not a division error") {
    import spark.implicits._
    val ev = Seq(("x", Option.empty[Double], 1L, 10L))
      .toDF("event_type", "value", "user_id", "t")
    val out = EventsProfile.eventsProfileOf(ev, col("t")).collect()(0)
    assert(out.getLong(2) == 10000 && out.isNullAt(5), s"all-null: $out")
  }

  test("q91 plan: two corpus aggregations, no Expand, services-row join only") {
    val df = EventsProfile.q91(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Expand"), s"countDistinct Expand crept in:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("Window"),
      s"profile needs neither:\n$p")
  }
}
