package graft

import graft.ops.SessionPack
import org.apache.spark.sql.functions._

/** q131: session-trajectory packing — gap sessionization + token pricing
  * + continuous-fill bins. */
class SessionPackSpec extends SparkSpec {

  import spark.implicits._

  test("hand trajectory: sessions split on gap, bins follow the start-offset rule") {
    // pricing: 'ab' -> 4 + 1 = 5 toks; 'abcdefgh' -> 4 + 2 = 6 toks
    val ev = Seq(
      (7L, 1L, "ab", 0L), (7L, 2L, "ab", 50L),     // session 1: 10 toks
      (7L, 3L, "abcdefgh", 500L),                  // gap 450 > 100: session 2, 6 toks
      (9L, 4L, "ab", 0L))                          // second user: own lane
      .toDF("user_id", "event_id", "event_type", "t")
    val got = SessionPack.sessionPackOf(ev, col("t"), gapUs = 100L, budget = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // user 7: cum 10 -> bin (10-10)/10 = 0; cum 16 -> bin (16-6)/10 = 1
    assert(got((7L, 0L)) == ((1L, 2L, 10L, 10000L)))
    assert(got((7L, 1L)) == ((1L, 1L, 6L, 6000L)))
    assert(got((9L, 0L)) == ((1L, 1L, 5L, 5000L)))
    assert(got.size == 3)
  }

  test("oversized session: lands in one bin, util_bp exceeds 10000 (documented)") {
    val ev = (1L to 5L).map(i => (1L, i, "abcdefgh", i * 10L)) // one session, 30 toks
      .toDF("user_id", "event_id", "event_type", "t")
    val rows = SessionPack.sessionPackOf(ev, col("t"), gapUs = 1000L, budget = 10L).collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(1) == 0L && rows.head.getLong(4) == 30L &&
      rows.head.getLong(5) == 30000L)
  }

  test("fixture reconciliation: packed events == q116's session event total") {
    val packed = SessionPack.q131(spark, sf0001)
      .agg(sum(col("n_events"))).head.getLong(0)
    val sessions = graft.ops.Sessionize.q116(spark, sf0001)
      .agg(sum(col("n_events"))).head.getLong(0)
    assert(packed == sessions, s"packing must conserve events: $packed vs $sessions")
  }
}
