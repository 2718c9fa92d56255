package graft

import graft.ops.SpectralEmbed

/** q156: fixed-point spectral coordinate — a plain-Scala BigInt mirror of
  * the shifted power iteration predicts every vfp bit-for-bit, plus
  * analytic hand cases (regular graphs are fixed points; the diagonal
  * shift tames the bipartite star; global-max normalization across
  * components) and the PPMI-drop and partitioning-independence contracts. */
class SpectralEmbedSpec extends SparkSpec {

  import spark.implicits._

  /** Exact BigInt replay of [[SpectralEmbed.spectralOf]]: same rounding,
    * same shift, same floor divisions — no doubles past the weight cast. */
  private def mirror(entries: Seq[(Long, Long, Double)]): Map[Long, Long] = {
    val pos = entries.filter(_._3 > 0)
      .map { case (a, b, p) => (a, b, math.round(p * 1e6)) }
    val nodes = pos.flatMap(e => Seq(e._1, e._2)).distinct
    val mat = pos.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) } ++
      nodes.map(n => (n, n, SpectralEmbed.Scale))
    var v: Map[Long, BigInt] =
      nodes.map(_ -> BigInt(SpectralEmbed.Scale)).toMap
    for (_ <- 1 to SpectralEmbed.Rounds) {
      val raw = mat.groupBy(_._1).map { case (i, es) =>
        i -> es.map { case (_, j, w) => BigInt(w) * v(j) }.sum
      }
      val m = raw.values.max
      v = raw.map { case (i, r) => i -> (r * 1000000 / m) }
    }
    v.map { case (k, x) => k -> x.toLong }
  }

  private def run(entries: Seq[(Long, Long, Double)]): Map[Long, Long] =
    SpectralEmbed.spectralOf(entries.toDF("a", "b", "pmi"))
      .collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("vfp"))
      .toMap

  test("equal-weight triangle: uniform IS the Perron vector — every vfp stays 10^6") {
    val es = Seq((1L, 2L, 0.5), (1L, 3L, 0.5), (2L, 3L, 0.5))
    val got = run(es)
    assert(got == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
    assert(got == mirror(es))
  }

  test("star K1,3: bipartite — the diagonal shift converges it; center dominates, leaves tie") {
    val es = Seq((1L, 2L, 0.7), (1L, 3L, 0.7), (1L, 4L, 0.7))
    val got = run(es)
    assert(got == mirror(es))
    assert(got(1L) == 1000000L, "hub is the max-norm anchor")
    assert(got(2L) == got(3L) && got(3L) == got(4L), "symmetric leaves tie exactly")
    assert(got(2L) < got(1L), "leaves sit strictly below the hub")
    // un-shifted power iteration on a bipartite graph oscillates between
    // the two sides; the shift's fingerprint is a stable interior leaf value
    assert(got(2L) > 0L)
  }

  test("two components: global max-normalization — heavy triangle at 10^6, light strictly below") {
    val es = Seq(
      (1L, 2L, 0.9), (1L, 3L, 0.9), (2L, 3L, 0.9),
      (7L, 8L, 0.1), (7L, 9L, 0.1), (8L, 9L, 0.1))
    val got = run(es)
    assert(got == mirror(es))
    assert(Seq(1L, 2L, 3L).forall(got(_) == 1000000L))
    val light = Seq(7L, 8L, 9L).map(got)
    assert(light.distinct.size == 1 && light.head < 1000000L && light.head > 0L)
  }

  test("weighted path: generic asymmetric case matches the BigInt mirror bit-for-bit") {
    val es = Seq((1L, 2L, 1.25), (2L, 3L, 0.333333), (3L, 4L, 2.0), (4L, 5L, 0.000001))
    assert(run(es) == mirror(es))
  }

  test("PPMI drop: non-positive pmi entries contribute no nodes") {
    val es = Seq((1L, 2L, 0.5), (5L, 6L, -0.4), (6L, 7L, 0.0))
    val got = run(es)
    assert(got.keySet == Set(1L, 2L))
    assert(got == mirror(es))
  }

  test("partitioning independence: repartitioned input replays the identical census") {
    val es = Seq((1L, 2L, 0.9), (1L, 3L, 0.4), (2L, 4L, 0.7), (3L, 4L, 0.2), (4L, 5L, 1.1))
    val base = run(es)
    val shuffled = SpectralEmbed.spectralOf(
      es.toDF("a", "b", "pmi").repartition(7))
      .collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("vfp"))
      .toMap
    assert(base == shuffled)
    assert(base == mirror(es))
  }
}
