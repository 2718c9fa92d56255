package graft

import graft.ext.DupSources

/** Cross-source duplication matrix (q119). */
class DupSourcesSpec extends SparkSpec {

  import spark.implicits._

  test("planted pairs attribute to normalized source pairs with exact ppm") {
    val docs = Seq(
      (1L, "mirrorA"), (2L, "mirrorB"), (3L, "mirrorA"), (4L, "mirrorB"),
      (5L, "clean"), (6L, "mirrorA")).toDF("doc_id", "source")
    // 1-2 and 3-4 cross the mirrors (both directions on input — must
    // normalize to one cell); 1-3 is within mirrorA
    val pairs = Seq((1L, 2L), (4L, 3L), (1L, 3L)).toDF("doc_a", "doc_b")
    val out = DupSources.dupSourcesOf(docs, pairs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // cross: 2 pairs over na*nb = 3*2 = 6 candidates -> 333333 ppm
    assert(out(("mirrorA", "mirrorB")) == ((2L, 2L * 1000000L / 6L)))
    // within mirrorA: 1 pair over 3*2/2 = 3 candidates -> 333333 ppm
    assert(out(("mirrorA", "mirrorA")) == ((1L, 1000000L / 3L)))
    out.keySet.foreach { case (a, b) => assert(a <= b, "matrix is upper-triangular") }
    assert(!out.contains(("clean", "clean")))
  }

  test("q119 pair mass reconciles with the q14 pair table") {
    val nPairs = graft.ext.TextOps.ngramJaccard(spark, sf0001).count()
    val out = DupSources.q119(spark, sf0001).collect()
    assert(out.map(_.getLong(2)).sum == nPairs,
      "every near-dup pair lands in exactly one source cell")
    out.foreach { r =>
      assert(r.getString(0) <= r.getString(1), "normalized ordering")
      assert(r.getLong(3) >= 0)
    }
  }
}
