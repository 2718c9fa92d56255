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

  private def embHist(pairs: (Long, Long)*): Set[(Long, Long, Long)] =
    Triangles.edgeEmbeddednessOf(pairs.toSeq.toDF("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("q145 hand histogram: triangle edges embed once, bridges at zero") {
    // {1,2,3} closed + pendant 1-4 + isolated 5-6: the three triangle
    // edges carry embeddedness 1; the two bridges 0. Shares over 5 edges.
    val h = embHist((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (5L, 6L))
    assert(h == Set((1L, 3L, 6000L), (0L, 2L, 4000L)), s"got $h")
  }

  test("q145 K4 collapses to one row: every edge sits in exactly 2 triangles") {
    val h = embHist((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(h == Set((2L, 6L, 10000L)), s"got $h")
  }

  test("q145 wheel: spokes embed twice, rim once; mass reconciles to 3 triangles each") {
    val h = embHist((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L),
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 5L))
    assert(h == Set((2L, 5L, 5000L), (1L, 5L, 5000L)), s"got $h")
  }

  test("q144/q145 reconciliation on the fixture: node mass == edge mass == 3·triangles") {
    // every triangle contributes 3 node incidences AND 3 edge incidences,
    // so the two censuses must agree on total triangle mass
    val nodeMass = graft.oracle.Registry.byName("q144_local_clustering")
      .run(spark, sf0001).agg(sum(col("n_triangles"))).collect()(0).getLong(0)
    val edgeMass = graft.oracle.Registry.byName("q145_edge_embeddedness")
      .run(spark, sf0001)
      .agg(sum(col("embeddedness") * col("n_edges"))).collect()(0).getLong(0)
    assert(nodeMass == edgeMass, s"node-grain $nodeMass vs edge-grain $edgeMass")
    assert(nodeMass % 3 == 0, s"triangle mass must be a multiple of 3: $nodeMass")
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
