package graft

import graft.ops.{PmiAgreement, PmiNeighbors}

/** q158: first- vs second-order agreement census — analytic hand graphs
  * (a bipartite co-occurrence pattern where EVERY top-K discovery is
  * novel; a triangle where every one is direct; a mixed case), the
  * n_direct ≤ n_topk invariant, the share fold, and reconciliation with
  * q157's own output. */
class PmiAgreementSpec extends SparkSpec {

  import spark.implicits._

  private def run(entries: Seq[(Long, Long, Double)]): Set[(Long, Long, Long, Long)] =
    PmiAgreement.agreementOf(entries.toDF("a", "b", "pmi"))
      .collect()
      .map(r => (r.getAs[Long]("n_topk"), r.getAs[Long]("n_direct"),
        r.getAs[Long]("nodes"), r.getAs[Long]("share_bp")))
      .toSet

  test("bipartite co-occurrence: second-order discovers exactly the other side — ALL novel") {
    // 1,2 each co-occur with 3,4 but never with each other; rows of 1 and
    // 2 are parallel, rows of 3 and 4 are parallel; no discovered pair
    // has a direct edge
    val es = Seq((1L, 3L, 0.5), (1L, 4L, 0.5), (2L, 3L, 0.5), (2L, 4L, 0.5))
    assert(run(es) == Set((1L, 0L, 4L, 10000L)))
  }

  test("triangle: every second-order neighbor is a direct partner — full agreement") {
    val es = Seq((1L, 2L, 0.5), (1L, 3L, 0.5), (2L, 3L, 0.5))
    assert(run(es) == Set((2L, 2L, 3L, 10000L)))
  }

  test("mixed case: histogram reconciles with q157's own top-K joined to the edge set") {
    val es = Seq((1L, 2L, 1.25), (1L, 3L, 0.333333), (2L, 3L, 2.0),
      (2L, 4L, 0.7), (3L, 4L, 0.9), (4L, 5L, 1.1), (1L, 5L, 0.6))
    val got = run(es)
    // independent fold: q157's spec-verified output + the ppm edge set
    val nn = PmiNeighbors.neighborsOf(es.toDF("a", "b", "pmi"))
      .collect().map(r => (r.getAs[Long]("node"), r.getAs[Long]("nbr")))
    val edges = es.flatMap { case (a, b, _) => Seq((a, b), (b, a)) }.toSet
    val hist = nn.groupBy(_._1).toSeq
      .map { case (_, ns) => (ns.size.toLong, ns.count(edges.contains).toLong) }
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val tot = hist.map(_._2).sum
    val want = hist.map { case ((tk, d), n) => (tk, d, n, n * 10000L / tot) }.toSet
    assert(got == want)
    // invariants: n_direct <= n_topk, shares fold over the histogram itself
    assert(got.forall(r => r._2 <= r._1))
    assert(got.toSeq.map(_._4).sum <= 10000L)
    assert(got.toSeq.map(_._3).sum == tot)
  }

  test("empty census → empty output") {
    assert(run(Seq.empty[(Long, Long, Double)]).isEmpty)
  }
}
