package graft

import graft.ops.KmvSketch
import org.scalacheck.{Gen, rng}

/** KMV cross-source overlap sketches (q94). The load-bearing claim is that
  * the bounded [[KmvSketch.MinKDistinct]] buffer equals a global
  * distinct-sort-take-k — de-dup inside the cap must not lose or double-
  * count hashes under any arrival order or partial-merge split. */
class KmvSketchSpec extends SparkSpec {

  private def brute(xs: Seq[Long], k: Int): Seq[Long] =
    xs.distinct.sorted.take(k)

  // dense domain → many duplicates, including duplicates of evicted values
  private val gen = Gen.listOf(Gen.chooseNum(0L, 40L))

  test("MinKDistinct == distinct-sort-take-k under arbitrary partial/merge splits") {
    val agg = new KmvSketch.MinKDistinct(8)
    val params = Gen.Parameters.default
    (1 to 60).foreach { i =>
      val xs = gen(params.withSize(i * 4), rng.Seed(i.toLong)).get
      val nSplits = 1 + i % 7
      val parts = if (xs.isEmpty) Seq(Seq.empty[Long])
        else xs.grouped(math.max(1, xs.length / nSplits)).toSeq
      val merged = parts
        .map(p => p.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged).toSeq == brute(xs, 8), s"seed $i n=${xs.length}")
    }
  }

  test("MinKDistinct: duplicate of an evicted max does not re-enter") {
    val agg = new KmvSketch.MinKDistinct(2)
    // 5 fills, 7 fills, 1 evicts 7, then duplicate 7 arrives again
    val buf = Seq(5L, 7L, 1L, 7L).foldLeft(agg.zero)(agg.reduce)
    assert(buf.toSeq == Seq(1L, 5L))
  }

  test("q94 pair census: bounds and symmetric-free pairing on sf0.001") {
    val out = KmvSketch.q94(spark, sf0001).collect()
    val nSources = graft.oracle.Tables.table(spark, sf0001, "documents")
      .select("source").distinct().count()
    assert(out.length == (nSources * (nSources - 1)) / 2)
    out.foreach { r =>
      val kUsed = r.getAs[Long]("k_used")
      val inter = r.getAs[Long]("inter_k")
      val bp = r.getAs[Long]("jaccard_est_bp")
      assert(r.getAs[String]("src_a") < r.getAs[String]("src_b"))
      assert(kUsed >= 1 && kUsed <= KmvSketch.K)
      assert(inter >= 0 && inter <= kUsed)
      assert(bp >= 0 && bp <= 10000)
      assert(r.getAs[Long]("union_est") >= 0)
    }
  }

  test("q94 sketch exchange carries bounded buffers (map-side partial agg)") {
    val plan = KmvSketch.sketches(spark, sf0001).queryExecution.executedPlan.toString
    // partial aggregation before the exchange: the ObjectHashAggregate pair
    // (partial + final) around a single shuffle of ≤k-long buffers
    assert(plan.contains("ObjectHashAggregate"))
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
  }
}
