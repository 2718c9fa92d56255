package graft

import graft.ops.CensusDelta
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

/** q154: the incremental census-maintenance audit — hand corpora pin the
  * split/merge identity (settled + delta + straddle == full), the
  * frontier semantics (last settled item → first delta item, per user),
  * the same-item and null-item boundary cases, and direction pooling
  * across components. */
class CensusDeltaSpec extends SparkSpec {

  import spark.implicits._

  private val Cut = 100L

  /** (user, event_id, t, item) → an events row; item None → props
    * without k (filtered out by the non-null-item prep). */
  private def audit(rows: (Long, Long, Long, Option[Long])*): Row = {
    val df = rows.toSeq
      .map { case (u, eid, t, it) =>
        (u, eid, t, it.map(i => s"""{"k": $i}""").getOrElse("""{}"""))
      }
      .toDF("user_id", "event_id", "t", "props")
    CensusDelta.censusDeltaAuditOf(df, col("t"), Cut).collect().head
  }

  private def assertClean(r: Row, edges: Long, mass: Long, straddle: Long): Unit = {
    assert(r.getAs[Long]("edges_full") == edges, s"edges_full: $r")
    assert(r.getAs[Long]("mass_full") == mass, s"mass_full: $r")
    assert(r.getAs[Long]("edges_merged") == edges, s"edges_merged: $r")
    assert(r.getAs[Long]("mass_merged") == mass, s"mass_merged: $r")
    assert(r.getAs[Long]("missing_in_merged") == 0L, s"missing: $r")
    assert(r.getAs[Long]("extra_in_merged") == 0L, s"extra: $r")
    assert(r.getAs[Long]("w_mismatch") == 0L, s"w_mismatch: $r")
    assert(r.getAs[Long]("straddle_mass") == straddle, s"straddle: $r")
  }

  test("straddling user: the boundary transition is exactly (last settled, first delta)") {
    // settled 1→2, straddle 2→3: full = {(1,2),(2,3)}
    val r = audit(
      (1L, 1L, 1L, Some(1L)), (1L, 2L, 2L, Some(2L)), (1L, 3L, 101L, Some(3L)))
    assertClean(r, edges = 2L, mass = 2L, straddle = 1L)
  }

  test("users entirely on one side contribute no straddle") {
    val r = audit(
      (1L, 1L, 1L, Some(1L)), (1L, 2L, 2L, Some(2L)),      // settled-only
      (2L, 3L, 101L, Some(3L)), (2L, 4L, 102L, Some(4L)))  // delta-only
    assertClean(r, edges = 2L, mass = 2L, straddle = 0L)
  }

  test("same-item straddle is a self-loop on both paths — dropped identically") {
    val r = audit(
      (1L, 1L, 1L, Some(1L)), (1L, 2L, 2L, Some(5L)), (1L, 3L, 101L, Some(5L)))
    assertClean(r, edges = 1L, mass = 1L, straddle = 0L)  // only (1,5)
  }

  test("null-item events vanish BEFORE the lag — the straddle skips them on both paths") {
    // item-sequence is 1 (settled) then 2 (delta); the two k-less events
    // sit right at the boundary and must not break the frontier
    val r = audit(
      (1L, 1L, 1L, Some(1L)), (1L, 2L, 99L, None),
      (1L, 3L, 101L, None), (1L, 4L, 102L, Some(2L)))
    assertClean(r, edges = 1L, mass = 1L, straddle = 1L)  // (1,2) via straddle
  }

  test("direction pooling merges S and D contributions of the same canonical edge") {
    // user 1: settled 3→7; user 2: delta 7→3 — one pooled edge, w = 2
    val r = audit(
      (1L, 1L, 1L, Some(3L)), (1L, 2L, 2L, Some(7L)),
      (2L, 3L, 101L, Some(7L)), (2L, 4L, 102L, Some(3L)))
    assertClean(r, edges = 1L, mass = 2L, straddle = 0L)
  }

  test("straddle + in-delta + in-settled transitions of one user all land once") {
    // settled 1→2, straddle 2→3, delta 3→4: full mass 3, straddle 1
    val r = audit(
      (1L, 1L, 1L, Some(1L)), (1L, 2L, 2L, Some(2L)),
      (1L, 3L, 101L, Some(3L)), (1L, 4L, 102L, Some(4L)))
    assertClean(r, edges = 3L, mass = 3L, straddle = 1L)
  }

  test("empty corpus: one all-zero audit row") {
    val r = audit()
    assertClean(r, edges = 0L, mass = 0L, straddle = 0L)
  }
}
