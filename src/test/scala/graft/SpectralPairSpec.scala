package graft

import graft.ops.SpectralEmbed

/** q159: 2-D fixed-point spectral embedding — a plain-Scala BigInt mirror
  * of the deflated power iteration (same md5 start, same truncate-toward-
  * zero divisions) predicts every (v1fp, v2fp) bit-for-bit, plus analytic
  * structure (sign opposition across a path, near-antisymmetry on an
  * edge, the light component carrying v2 mass after v1 is deflated),
  * near-orthogonality, and partitioning independence. */
class SpectralPairSpec extends SparkSpec {

  import spark.implicits._

  private def h(node: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"spec2|$node".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  /** Exact BigInt replay of [[SpectralEmbed.spectralPairOf]]. */
  private def mirror(entries: Seq[(Long, Long, Double)]): Map[Long, (Long, Long)] = {
    val pos = entries.filter(_._3 > 0)
      .map { case (a, b, p) => (a, b, math.round(p * 1e6)) }
    val nodes = pos.flatMap(e => Seq(e._1, e._2)).distinct
    val mat = pos.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) } ++
      nodes.map(n => (n, n, SpectralEmbed.Scale))
    var v: Map[Long, BigInt] = nodes.map(_ -> BigInt(SpectralEmbed.Scale)).toMap
    for (_ <- 1 to SpectralEmbed.Rounds) {
      val raw = mat.groupBy(_._1).map { case (i, es) =>
        i -> es.map { case (_, j, w) => BigInt(w) * v(j) }.sum
      }
      val m = raw.values.max
      v = raw.map { case (i, r) => i -> (r * 1000000 / m) }
    }
    val den = v.values.map(x => x * x).sum
    var u: Map[Long, BigInt] =
      nodes.map(n => n -> BigInt(h(n) % 2000001L - 1000000L)).toMap
    for (_ <- 1 to SpectralEmbed.Rounds) {
      val w = mat.groupBy(_._1).map { case (i, es) =>
        i -> es.map { case (_, j, wt) => BigInt(wt) * u(j) }.sum
      }
      val num = w.map { case (i, wi) => v(i) * wi }.sum
      val q = num / den // BigInt division truncates toward zero, like div and //
      val wp = w.map { case (i, wi) => i -> (wi - q * v(i)) }
      val m = wp.values.map(_.abs).max
      u = wp.map { case (i, x) =>
        i -> (if (m > 0) x * 1000000 / m else BigInt(0))
      }
    }
    nodes.map(n => n -> (v(n).toLong, u(n).toLong)).toMap
  }

  private def run(entries: Seq[(Long, Long, Double)]): Map[Long, (Long, Long)] =
    SpectralEmbed.spectralPairOf(entries.toDF("a", "b", "pmi"))
      .collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("v1fp"), r.getAs[Long]("v2fp")))
      .toMap

  private def normDot(m: Map[Long, (Long, Long)]): Double = {
    val d = m.values.map { case (a, b) => BigInt(a) * b }.sum.toDouble
    val n1 = math.sqrt(m.values.map { case (a, _) => a.toDouble * a }.sum)
    val n2 = math.sqrt(m.values.map { case (_, b) => b.toDouble * b }.sum)
    if (n1 == 0 || n2 == 0) 0.0 else math.abs(d) / (n1 * n2)
  }

  test("single edge: v2 is the near-antisymmetric direction at full amplitude") {
    val es = Seq((1L, 2L, 0.8))
    val got = run(es)
    assert(got == mirror(es))
    val (v21, v22) = (got(1L)._2, got(2L)._2)
    assert(v21 * v22 < 0, s"the second direction must oppose signs: $got")
    assert(math.max(math.abs(v21), math.abs(v22)) == 1000000L,
      "max-norm anchors at exactly 10^6")
    // each round truncates the projection quotient and the division —
    // ~1 unit per round each, so 2·Rounds bounds the drift
    assert(math.abs(v21 + v22) <= 2L * SpectralEmbed.Rounds,
      s"antisymmetric up to per-round truncation: $got")
  }

  test("path 1-2-3: endpoints oppose, the midpoint stays small") {
    val es = Seq((1L, 2L, 0.5), (2L, 3L, 0.5))
    val got = run(es)
    assert(got == mirror(es))
    assert(got(1L)._2 * got(3L)._2 < 0, s"endpoint signs must oppose: $got")
    assert(math.abs(got(2L)._2) < math.abs(got(1L)._2) &&
      math.abs(got(2L)._2) < math.abs(got(3L)._2),
      s"the Fiedler-like midpoint is the small coordinate: $got")
    assert(normDot(got) < 0.01, s"near-orthogonality: ${normDot(got)}")
  }

  test("heavy + light triangles: v1 anchors the heavy component, v2's amplitude lives on the light one") {
    val es = Seq(
      (1L, 2L, 0.9), (1L, 3L, 0.9), (2L, 3L, 0.9),
      (7L, 8L, 0.1), (7L, 9L, 0.1), (8L, 9L, 0.1))
    val got = run(es)
    assert(got == mirror(es))
    assert(Seq(1L, 2L, 3L).forall(got(_)._1 == 1000000L))
    val heavyMax = Seq(1L, 2L, 3L).map(n => math.abs(got(n)._2)).max
    val lightMax = Seq(7L, 8L, 9L).map(n => math.abs(got(n)._2)).max
    assert(lightMax > heavyMax,
      s"after deflating v1, the light component carries v2: $got")
    assert(normDot(got) < 0.01, s"near-orthogonality: ${normDot(got)}")
  }

  test("generic weighted case matches the BigInt mirror bit-for-bit, repartitioned input included") {
    val es = Seq((1L, 2L, 1.25), (2L, 3L, 0.333333), (3L, 4L, 2.0),
      (4L, 5L, 0.7), (1L, 5L, 0.6), (2L, 5L, -0.4))
    val base = run(es)
    assert(base == mirror(es))
    val shuffled = SpectralEmbed.spectralPairOf(
      es.toDF("a", "b", "pmi").repartition(7))
      .collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("v1fp"), r.getAs[Long]("v2fp")))
      .toMap
    assert(base == shuffled)
    // the negative-pmi pair contributes no node
    assert(base.keySet == Set(1L, 2L, 3L, 4L, 5L))
  }
}
