package graft

import graft.ops.PmiNeighbors

/** q157: second-order PPMI cosine neighbors — a plain-Scala BigInt mirror
  * predicts every (node, nbr, rk, dot, cos2_bp) row bit-for-bit, plus
  * analytic geometry (identical rows → cos²=10⁴ exactly; disjoint
  * supports → absent), the cap's drop-before-expansion semantics, the
  * k-prefix property and the tie discipline. */
class PmiNeighborsSpec extends SparkSpec {

  import spark.implicits._

  private val S = BigInt(10000)

  /** Exact BigInt replay of [[PmiNeighbors.neighborsOf]]. */
  private def mirror(entries: Seq[(Long, Long, Double)], cap: Long,
                     k: Int): Set[(Long, Long, Long, Long, Long)] = {
    val pos = entries.filter(_._3 > 0)
      .map { case (a, b, p) => (a, b, math.round(p * 1e3)) }
      .filter(_._3 > 0)
    val sym = pos.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    val deg = sym.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val capped = sym.filter { case (_, j, _) => deg(j) <= cap }
    val rows = capped.groupBy(_._1).view
      .mapValues(_.map { case (_, j, w) => j -> BigInt(w) }.toMap).toMap
    val n2 = rows.view.mapValues(r => r.values.map(w => w * w).sum).toMap
    val ids = rows.keys.toSeq.sorted
    val sims = for {
      i <- ids; kk <- ids if i < kk
      dot = rows(i).keySet.intersect(rows(kk).keySet).toSeq
        .map(j => rows(i)(j) * rows(kk)(j)).sum if dot > 0
    } yield (i, kk, dot, (dot * dot * S) / (n2(i) * n2(kk)))
    val both = sims.flatMap { case (i, kk, d, c) =>
      Seq((i, kk, d, c), (kk, i, d, c))
    }
    both.groupBy(_._1).toSeq.flatMap { case (node, ns) =>
      ns.sortBy { case (_, nbr, _, c) => (-c, nbr) }
        .take(k).zipWithIndex
        .map { case ((_, nbr, d, c), ix) =>
          (node, nbr, ix + 1L, d.toLong, c.toLong)
        }
    }.toSet
  }

  private def run(entries: Seq[(Long, Long, Double)],
                  cap: Long = PmiNeighbors.ContextCap,
                  k: Int = PmiNeighbors.TopK): Set[(Long, Long, Long, Long, Long)] =
    PmiNeighbors.neighborsOf(entries.toDF("a", "b", "pmi"), cap, k)
      .collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("nbr"),
        r.getAs[Long]("rk"), r.getAs[Long]("dot"), r.getAs[Long]("cos2_bp")))
      .toSet

  test("identical rows: two nodes with the same neighborhood score cos2_bp = 10000 exactly") {
    // 1 and 2 both see contexts 3 and 4 with equal weight; no (1,2) edge
    val es = Seq((1L, 3L, 0.5), (1L, 4L, 0.5), (2L, 3L, 0.5), (2L, 4L, 0.5))
    val got = run(es)
    assert(got == mirror(es, PmiNeighbors.ContextCap, PmiNeighbors.TopK))
    val r12 = got.find(r => r._1 == 1L && r._2 == 2L).get
    assert(r12._5 == 10000L, s"parallel vectors must hit exact 10^4: $r12")
  }

  test("disjoint supports: nodes sharing no context produce NO pair (never a zero row)") {
    val es = Seq((1L, 3L, 0.5), (2L, 4L, 0.5))
    val got = run(es)
    assert(!got.exists(r => Set(r._1, r._2) == Set(1L, 2L)))
    assert(got == mirror(es, PmiNeighbors.ContextCap, PmiNeighbors.TopK))
  }

  test("hub cap: entries incident to an over-cap context vanish from dots AND norms") {
    // hub 100 touches 4 nodes; cap 3 drops every (·,100) entry, so the
    // only remaining geometry is the 1-2 shared context 5
    val es = Seq((1L, 100L, 0.9), (2L, 100L, 0.9), (3L, 100L, 0.9),
      (4L, 100L, 0.9), (1L, 5L, 0.4), (2L, 5L, 0.4))
    val capped = run(es, cap = 3L)
    assert(capped == mirror(es, 3L, PmiNeighbors.TopK))
    // via the hub, 3 and 4 would be 1's neighbors — the cap removes them
    assert(!capped.exists(r => r._1 == 1L && (r._2 == 3L || r._2 == 4L)))
    // norms exclude the hub component too: 1-2 via context 5 alone is
    // parallel in the capped geometry → exact 10^4
    assert(capped.find(r => r._1 == 1L && r._2 == 2L).get._5 == 10000L)
    // uncapped, the hub dominates and 1-3 appears
    val open = run(es, cap = 128L)
    assert(open == mirror(es, 128L, PmiNeighbors.TopK))
    assert(open.exists(r => r._1 == 1L && r._2 == 3L))
  }

  test("generic weighted case matches the BigInt mirror bit-for-bit") {
    val es = Seq((1L, 2L, 1.25), (1L, 3L, 0.333333), (2L, 3L, 2.0),
      (2L, 4L, 0.7), (3L, 4L, 0.000001), (4L, 5L, 1.1), (1L, 5L, 0.6))
    assert(run(es) == mirror(es, PmiNeighbors.ContextCap, PmiNeighbors.TopK))
  }

  test("k-prefix property: top-2 is exactly the rk<=2 slice of top-5") {
    val es = Seq((1L, 2L, 1.25), (1L, 3L, 0.333333), (2L, 3L, 2.0),
      (2L, 4L, 0.7), (3L, 4L, 0.9), (4L, 5L, 1.1), (1L, 5L, 0.6))
    val k5 = run(es, k = 5)
    val k2 = run(es, k = 2)
    assert(k2 == k5.filter(_._3 <= 2L))
  }

  test("tie discipline: equal cos2_bp breaks by neighbor id ASC") {
    // 2 and 3 are symmetric images w.r.t. node 1 → identical cos2_bp
    val es = Seq((1L, 4L, 0.5), (2L, 4L, 0.5), (3L, 4L, 0.5))
    val got = run(es)
    assert(got == mirror(es, PmiNeighbors.ContextCap, PmiNeighbors.TopK))
    val n1 = got.filter(_._1 == 1L).toSeq.sortBy(_._3)
    assert(n1.map(_._2) == Seq(2L, 3L), s"ties must rank by nbr ASC: $n1")
    assert(n1.map(_._5).distinct.size == 1)
  }
}
