package graft

import graft.ops.{SpectralDelta, SpectralEmbed}

/** q163: incremental spectral maintenance — the reconciliation layer the
  * round-11 verdict asked for. The operator's limit claim is pinned
  * exactly: AT the integer fixed point, one warm round reproduces the
  * fixed point bit-for-bit (warm == cold where both have converged), a
  * perturbed warm start RETURNS to the cold fixed point, and an empty
  * warm start IS the cold iteration. A BigInt mirror replays the warm
  * trajectory bit-for-bit on an asymmetric census, and the alignment
  * contract (missing node → Scale, retired node → dropped) is pinned
  * via rounds = 0. */
class SpectralDeltaSpec extends SparkSpec {

  import spark.implicits._

  private val S = SpectralEmbed.Scale

  /** Exact BigInt replay of [[SpectralEmbed.spectralWarmOf]] (and, with
    * an empty start and [[SpectralEmbed.Rounds]] rounds, of the cold
    * path): same PPMI drop, same rounding, same shift, same floor
    * divisions, same alignment contract. */
  private def mirrorWarm(entries: Seq[(Long, Long, Double)],
                         start: Map[Long, Long],
                         rounds: Int): Map[Long, Long] = {
    val pos = entries.filter(_._3 > 0)
      .map { case (a, b, p) => (a, b, math.round(p * 1e6)) }
    val nodes = pos.flatMap(e => Seq(e._1, e._2)).distinct
    val mat = pos.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) } ++
      nodes.map(n => (n, n, S))
    var v: Map[Long, BigInt] =
      nodes.map(n => n -> BigInt(start.getOrElse(n, S))).toMap
    for (_ <- 1 to rounds) {
      val raw = mat.groupBy(_._1).map { case (i, es) =>
        i -> es.map { case (_, j, w) => BigInt(w) * v(j) }.sum
      }
      val m = raw.values.max
      v = raw.map { case (i, r) => i -> (r * 1000000 / m) }
    }
    v.map { case (k, x) => k -> x.toLong }
  }

  private def runWarm(entries: Seq[(Long, Long, Double)],
                      start: Map[Long, Long], rounds: Int,
                      key: String): Map[Long, Long] =
    SpectralEmbed.spectralWarmOf(entries.toDF("a", "b", "pmi"),
      start.toSeq.toDF("node", "vfp"), rounds, key)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("vfp")).toMap

  private def runCold(entries: Seq[(Long, Long, Double)]): Map[Long, Long] =
    SpectralEmbed.spectralOf(entries.toDF("a", "b", "pmi"))
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("vfp")).toMap

  val triangle = Seq((1L, 2L, 0.5), (1L, 3L, 0.5), (2L, 3L, 0.5))

  test("warm == cold AT the fixed point: one warm round from v* reproduces v* exactly") {
    // equal-weight triangle: uniform 10^6 IS the integer fixed point
    // (SpectralEmbedSpec) — so a warm restart from it must be invariant
    val vStar = runCold(triangle)
    assert(vStar.values.forall(_ == S), "triangle fixed point is uniform")
    assert(runWarm(triangle, vStar, 1, "sd_fp1") == vStar)
    assert(runWarm(triangle, vStar, SpectralEmbed.Rounds, "sd_fp4") == vStar)
  }

  test("perturbed warm start RETURNS to the cold fixed point's 1-ULP basin") {
    // second eigenvalue ratio (sigma-w)/(2w+sigma) = 0.25 here, so the
    // perturbation collapses geometrically — but floor division means the
    // recovered point is a NEIGHBORING integer fixed point one ULP below
    // uniform ({10^6, 999999, 999999}, stable from round 12 on), not the
    // exact uniform point the cold start sits on: the integer iteration
    // has a 1-ULP-wide family of fixed points and the basin depends on
    // the start. Pinned as measured — the limit claim is "within one
    // fixed-point ULP", and exact equality holds only when restarting
    // FROM the fixed point itself (previous test).
    val start = Map(1L -> S, 2L -> 500000L, 3L -> 250000L)
    val m12 = mirrorWarm(triangle, start, 12)
    assert(m12 == mirrorWarm(triangle, start, 13), "mirror is stable by round 12")
    val vStar = runCold(triangle)
    assert(m12.forall { case (n, x) => math.abs(x - vStar(n)) <= 1L },
      s"recovered point within 1 ULP of the cold fixed point: $m12 vs $vStar")
    assert(runWarm(triangle, start, 12, "sd_ret") == m12)
  }

  test("empty warm start with Rounds rounds IS the cold path") {
    val es = Seq((1L, 2L, 1.25), (2L, 3L, 0.333333), (3L, 4L, 2.0), (4L, 5L, 0.000001))
    assert(runWarm(es, Map.empty, SpectralEmbed.Rounds, "sd_cold") == runCold(es))
  }

  test("asymmetric census, partial start: warm trajectory matches the BigInt mirror bit-for-bit") {
    val es = Seq((1L, 2L, 1.25), (2L, 3L, 0.333333), (3L, 4L, 2.0), (4L, 5L, 0.7))
    val start = Map(1L -> 900000L, 3L -> 123456L) // 2,4,5 fall back to Scale
    (0 to 3).foreach { r =>
      assert(runWarm(es, start, r, s"sd_mir$r") == mirrorWarm(es, start, r),
        s"round $r diverged from the mirror")
    }
  }

  test("alignment contract via rounds = 0: missing node -> Scale, retired node -> dropped") {
    val start = Map(1L -> 777777L, 99L -> 555555L) // 99 is not in the matrix
    val got = runWarm(triangle, start, 0, "sd_align")
    assert(got == Map(1L -> 777777L, 2L -> S, 3L -> S))
  }

  test("fused warm+cold pass == the two independent loops, column for column") {
    val es = Seq((1L, 2L, 1.25), (2L, 3L, 0.333333), (3L, 4L, 2.0), (4L, 5L, 0.7))
    val start = Map(1L -> 900000L, 3L -> 123456L)
    val fused = SpectralDelta.spectralWarmColdOf(es.toDF("a", "b", "pmi"),
      start.toSeq.toDF("node", "vfp"), SpectralDelta.WarmRounds, "sd_fused")
      .collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("v_warm"), r.getAs[Long]("v_cold"))).toMap
    val warm = runWarm(es, start, SpectralDelta.WarmRounds, "sd_fused_w")
    val cold = runCold(es)
    assert(fused.keySet == cold.keySet)
    fused.foreach { case (n, (w, c)) =>
      assert(w == warm(n) && c == cold(n), s"node $n fused=($w,$c) loops=(${warm(n)},${cold(n)})")
    }
  }

  test("q163 on the fixture: new-delta nodes are exactly the NULL v_settled rows") {
    val df = SpectralDelta.q163(spark, sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // drift column is |v_warm - v_cold| by construction
    assert(rows.forall(r =>
      r.getAs[Long]("drift") ==
        math.abs(r.getAs[Long]("v_warm") - r.getAs[Long]("v_cold"))))
    // warm and cold live on the same (merged) node set, all inside [0, Scale]
    assert(rows.forall { r =>
      val w = r.getAs[Long]("v_warm"); val c = r.getAs[Long]("v_cold")
      w >= 0L && w <= S && c >= 0L && c <= S
    })
  }
}
