package graft

import graft.ops.{Backbone, KCore}
import org.apache.spark.sql.functions._

/** q146: support-backbone extraction + k-core peel. */
class KCoreSpec extends SparkSpec {

  import spark.implicits._

  // ---------------------------------------------------------- backbone τ
  private def backbone(topBp: Long, edges: (Long, Long, Long)*): Set[(Long, Long)] =
    Backbone.backboneOf(edges.toSeq.toDF("a", "b", "w"), topBp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("backbone: τ = support of the ⌈m·topBp/1e4⌉-th strongest edge") {
    // m=10, top 10% → prefix 1 → τ=9 → only the strongest edge
    val es = Seq((1L, 2L, 9L), (1L, 3L, 7L), (2L, 3L, 7L), (3L, 4L, 5L), (4L, 5L, 3L),
      (5L, 6L, 1L), (6L, 7L, 1L), (7L, 8L, 1L), (8L, 9L, 1L), (9L, 10L, 1L))
    assert(backbone(1000L, es: _*) == Set((1L, 2L)))
    // top 30% → prefix 3 → τ=7 → both 7s and the 9
    assert(backbone(3000L, es: _*) == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("backbone: threshold ties ALL survive — no arbitrary cut inside a tie class") {
    // m=4, top 25% → prefix 1 → τ=5, but three edges carry w=5
    val s = backbone(2500L, (1L, 2L, 5L), (2L, 3L, 5L), (3L, 4L, 5L), (4L, 5L, 4L))
    assert(s == Set((1L, 2L), (2L, 3L), (3L, 4L)), s"got $s")
  }

  test("backbone: empty census → empty backbone (NULL τ filters everything)") {
    assert(backbone(1000L) == Set.empty)
  }

  // ------------------------------------------------------------- k-core
  private def core(k: Long, edges: (Long, Long)*): Map[Long, Long] =
    KCore.kCoreOf(edges.toSeq.toDF("a", "b"), k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangle with a pendant chain: 2-core = the triangle, 3-core empty") {
    val es = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    assert(core(2L, es: _*) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(core(3L, es: _*) == Map.empty)
  }

  test("K4 with a tail: 3-core = the clique at degree 3") {
    val es = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    assert(core(3L, es: _*) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("path-8: the 2-core peel cascades from both ends to empty (multi-round)") {
    val es = (1L to 7L).map(i => (i, i + 1))
    assert(core(2L, es: _*) == Map.empty)
  }

  test("cycle with a tail: the peel stops AT the cycle — 2-core keeps it whole") {
    // tail 6-7-8 strips over two rounds; cycle 1..5 is its own 2-core
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 5L), (5L, 6L), (6L, 7L), (7L, 8L))
    assert(core(2L, es: _*) == (1L to 5L).map(_ -> 2L).toMap)
  }

  test("core degree < raw degree: the census reports the INDUCED degree") {
    // node 3 has raw degree 3 (triangle + pendant) but core degree 2
    val m = core(2L, (1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    assert(m(3L) == 2L, s"got $m")
  }

  test("unconverged peel throws — a partial peel is not a k-core") {
    val es = (1L to 11L).map(i => (i, i + 1)) // path-12: 5 peel rounds to empty
    val e = intercept[IllegalStateException] {
      KCore.kCoreOf(es.toDF("a", "b"), 2L, maxIter = 2).collect()
    }
    assert(e.getMessage.contains("peel rounds"))
  }
}
