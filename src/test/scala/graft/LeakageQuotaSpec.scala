package graft

import graft.ops.{QuotaAudit, TemporalLeakage}
import org.apache.spark.sql.functions._

/** q136 temporal split leakage + q137 quota throttle audit. */
class LeakageQuotaSpec extends SparkSpec {

  import spark.implicits._

  test("q136: seen/cold eval users and leaked event mass, exact hand case") {
    // cut at t=100: user 1 spans the boundary (seen), user 2 eval-only
    // (cold), user 3 train-only (not an eval user at all)
    val ev = Seq(
      (1L, 50L), (1L, 150L), (1L, 160L), // seen: 2 eval events leak
      (2L, 120L),                        // cold start
      (3L, 10L))                         // train only
      .map { case (u, t) => (u, "click", t) }
      .toDF("user_id", "event_type", "t")
    val r = TemporalLeakage.temporalLeakageOf(ev, col("t"), cutUs = 100L).head
    assert(r.getLong(1) == 2L, "two eval users")
    assert(r.getLong(2) == 1L && r.getLong(3) == 5000L, "one seen -> 5000 bp")
    assert(r.getLong(4) == 3L, "three eval events")
    assert(r.getLong(5) == 2L && r.getLong(6) == 6666L, "user 1's events leak")
  }

  test("q137: drops and bursts, exact hand case") {
    // quota 2/min: user 1 minute 0 has 4 events (drop 2), user 2 has 1
    val ev = (1L to 4L).map(i => (1L, "click", i * 1000000L)) :+
      ((2L, "click", 5000000L))
    val r = QuotaAudit.quotaAuditOf(ev.toDF("user_id", "event_type", "t"),
      col("t"), perMinute = 2L).head
    assert(r.getLong(1) == 2L, "two user-minutes")
    assert(r.getLong(2) == 1L, "one over quota")
    assert(r.getLong(4) == 2L, "two dropped")
    assert(r.getLong(5) == 4000L, "2/5 events = 4000 bp")
    assert(r.getLong(6) == 4L, "max burst")
  }

  test("fixture invariants: leakage and drop shares are valid basis points") {
    TemporalLeakage.q136(spark, sf0001).collect().foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(5) <= r.getLong(4))
      assert(r.getLong(3) <= 10000 && r.getLong(6) <= 10000)
    }
    val q = QuotaAudit.q137(spark, sf0001).collect()
    assert(q.nonEmpty)
    q.foreach { r =>
      assert(r.getLong(4) <= r.getLong(3) && r.getLong(5) <= 10000)
      assert(r.getLong(6) >= 1L)
    }
  }
}
