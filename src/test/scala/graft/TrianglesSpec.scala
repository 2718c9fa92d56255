package graft

import graft.ops.Triangles
import org.apache.spark.sql.functions._

/** q144: degree-ordered triangle counting + local clustering coefficient
  * over the item co-transition graph. */
class TrianglesSpec extends SparkSpec {

  import spark.implicits._

  private def lccMap(pairs: (Long, Long)*): Map[Long, (Long, Long, Option[Long])] =
    Triangles.localClusteringOf(pairs.toSeq.toDF("a", "b"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap

  test("hand graph: one triangle, a pendant and an isolated pair") {
    // {1,2,3} closed, 4 hangs off 1, 5-6 alone. Degree-1 nodes have no
    // possible wedge -> lcc is NULL (the engine-exact x/0 guard).
    val m = lccMap((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (5L, 6L))
    assert(m == Map(
      1L -> ((3L, 1L, Some(3333L))), // 2*1*1e4 div (3*2)
      2L -> ((2L, 1L, Some(10000L))),
      3L -> ((2L, 1L, Some(10000L))),
      4L -> ((1L, 0L, None)),
      5L -> ((1L, 0L, None)),
      6L -> ((1L, 0L, None))), s"got $m")
  }

  test("K4: every node closes every wedge — lcc exactly 10000") {
    val m = lccMap((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    (1L to 4L).foreach { v =>
      assert(m(v) == ((3L, 3L, Some(10000L))), s"node $v in $m")
    }
  }

  test("star: the hub's wedges never close — lcc 0, not NULL") {
    val m = lccMap((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L))
    assert(m(0L) == ((5L, 0L, Some(0L))), s"hub must read 0/10 wedges closed: $m")
    (1L to 5L).foreach(v => assert(m(v) == ((1L, 0L, None))))
  }

  test("wheel: hub skew — every triangle counted once despite the degree-5 center") {
    // hub 0 + rim cycle 1-2-3-4-5: 5 triangles (0,i,i+1). Degree-ordered
    // orientation points every spoke INTO the hub, so each triangle is
    // enumerated at its rim corner — the compact-forward property that
    // keeps hub fan-out sub-quadratic.
    val m = lccMap((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L),
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 5L))
    assert(m(0L) == ((5L, 5L, Some(5000L))), s"hub: 5 of C(5,2)=10 wedges closed: $m")
    (1L to 5L).foreach { v =>
      assert(m(v) == ((3L, 2L, Some(6666L))), s"rim $v: 2 of 3 wedges closed: $m")
    }
  }

  /** Events walking items in ts order (the PageRankSpec builder). */
  private def walk(user: Long, items: Seq[Long]) =
    items.zipWithIndex.map { case (it, i) =>
      (user * 1000L + i, user, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${i}%02d"),
        s"""{"k": $it}""")
    }

  test("itemGraphOf: both directions pool into support; sub-support and self-loops drop") {
    // u1: 1->2 twice + 2->1 once = pooled weight 3 -> kept.
    // u2: 3->4, 4->3 = weight 2 -> below minW 3, dropped.
    // u3: 5 five times in a row = only self-transitions, all dropped.
    val ev = (walk(1, Seq(1, 2, 1, 2)) ++ walk(2, Seq(3, 4, 3)) ++
      walk(3, Seq(5, 5, 5, 5, 5))).toDF("event_id", "user_id", "ts", "props")
    val edges = Triangles.itemGraphOf(ev, unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == Set((1L, 2L)), s"got $edges")
  }
}
