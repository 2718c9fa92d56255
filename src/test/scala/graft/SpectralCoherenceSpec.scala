package graft

import graft.ops.{PmiNeighbors, SpectralCoherence, SpectralEmbed}

/** q160: spectral-coherence census — reconciliation fold against the two
  * already-mirror-verified layers it composes (q159 coordinates + q157
  * top-K + the canonical edge set), the class-partition invariant, and
  * the exchangeable-satellites structure case. */
class SpectralCoherenceSpec extends SparkSpec {

  import spark.implicits._

  private def run(entries: Seq[(Long, Long, Double)]): Set[(String, Long, Long)] =
    SpectralCoherence.coherenceOf(entries.toDF("a", "b", "pmi"))
      .collect()
      .map(r => (r.getAs[String]("cls"), r.getAs[Long]("pairs"),
        r.getAs[Long]("mean_d2")))
      .toSet

  /** Independent fold: q159's coordinates and q157's top-K (both
    * BigInt-mirror-verified in their own specs) joined to the canonical
    * edge set in plain Scala. */
  private def fold(entries: Seq[(Long, Long, Double)]): Set[(String, Long, Long)] = {
    val coords = SpectralEmbed.spectralPairOf(entries.toDF("a", "b", "pmi"))
      .collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("v1fp"), r.getAs[Long]("v2fp"))).toMap
    val nnp = PmiNeighbors.neighborsOf(entries.toDF("a", "b", "pmi"))
      .collect()
      .map(r => (math.min(r.getAs[Long]("node"), r.getAs[Long]("nbr")),
        math.max(r.getAs[Long]("node"), r.getAs[Long]("nbr")))).toSet
    val ppm = entries.filter(_._3 > 0)
      .filter(e => math.round(e._3 * 1e3) > 0)
      .map(e => (e._1, e._2)).toSet
    val all = (ppm ++ nnp).toSeq.map { p =>
      val cls =
        if (ppm(p) && nnp(p)) "edge_topk"
        else if (ppm(p)) "edge_rest"
        else "novel_topk"
      val (v1a, v2a) = coords(p._1)
      val (v1b, v2b) = coords(p._2)
      val d2 = BigInt(v1a - v1b) * (v1a - v1b) + BigInt(v2a - v2b) * (v2a - v2b)
      (cls, d2)
    }
    all.groupBy(_._1).map { case (cls, xs) =>
      (cls, xs.size.toLong, (xs.map(_._2).sum / xs.size).toLong)
    }.toSet
  }

  test("barbell: census folds exactly from the verified coordinate and top-K layers") {
    val es = Seq(
      (1L, 2L, 0.9), (1L, 3L, 0.9), (2L, 3L, 0.9),
      (7L, 8L, 0.1), (7L, 9L, 0.1), (8L, 9L, 0.1),
      (3L, 7L, 0.05))
    val got = run(es)
    assert(got == fold(es))
    assert(got.nonEmpty)
    // classes partition ppm ∪ nnp — pair counts add up
    val total = got.toSeq.map(_._2).sum
    val ppm = es.count(e => e._3 > 0 && math.round(e._3 * 1e3) > 0)
    assert(total >= ppm, s"every edge must be classified: $got")
  }

  test("exchangeable satellites: predicted as novel, and EXACTLY equal in v1 (symmetric start)") {
    // hub 4 with satellites 5 and 6 (an automorphism swaps them), plus a
    // separate heavy edge to anchor part of the spectrum elsewhere.
    // v1 starts UNIFORM, so the symmetric iteration keeps automorphic
    // nodes bit-identical — v1(5) == v1(6) exactly. v2 does NOT cancel:
    // its start is per-node md5 noise and four deflation rounds only
    // shrink the antisymmetric satellite mode by (σ/λ1)⁴ — measured here
    // and recorded as the honest limit of finite-round deflation (the
    // sf0.1 class ordering in BASELINE.md is a corpus reading, not a
    // spec-pinned law).
    val es = Seq((4L, 5L, 0.4), (4L, 6L, 0.4), (1L, 2L, 0.9))
    val got = run(es)
    assert(got == fold(es))
    val byCls = got.map(r => r._1 -> r._2).toMap
    assert(byCls.get("novel_topk").contains(1L),
      s"the satellite pair must be the one novel prediction: $got")
    val coords = SpectralEmbed.spectralPairOf(es.toDF("a", "b", "pmi"))
      .collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("v1fp"), r.getAs[Long]("v2fp"))).toMap
    assert(coords(5L)._1 == coords(6L)._1,
      s"automorphic nodes must carry identical v1 exactly: $coords")
  }

  test("empty census → empty output") {
    assert(run(Seq.empty[(Long, Long, Double)]).isEmpty)
  }
}
