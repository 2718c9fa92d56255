package graft

import graft.ext.{KMeans, KMeansDelta}
import org.apache.spark.sql.functions.col

/** q165: incremental k-means maintenance — the warm-start pattern's
  * third instance. Pins the fixed-point invariance (one warm Lloyd round
  * from a converged centroid frame reproduces it bit-for-bit), the
  * cold ≡ fitFrom(rank-seed) identity that makes the fused-vs-separate
  * choice purely structural, and q165's fixture invariants (both arms'
  * populations cover the corpus; the settled slice carries the shared
  * cid space). */
class KMeansDeltaSpec extends SparkSpec {

  import spark.implicits._

  /** Two well-separated 2-point groups in 64 dims (first two dims carry
    * the structure, the rest are 0) — the Lloyd fixed point is the two
    * group means, reached in one round from the id seeds. */
  private def pts = {
    def v(a: Double, b: Double) =
      Array(a, b) ++ Array.fill(62)(0.0)
    Seq(
      (0L, v(0.0, 0.0)), (1L, v(10.0, 10.0)),
      (2L, v(0.0, 2.0)), (3L, v(10.0, 12.0)))
      .toDF("vec_id", "embedding")
  }

  test("warm restart FROM the Lloyd fixed point is invariant (the q163/q164 limit claim)") {
    val q = KMeans.quantize(pts)
    val fp = KMeans.fit(q, 2, 4) // far past convergence for 2 clusters
    val again = KMeans.fitFrom(q, fp, 1)
    val a = fp.collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val b = again.collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(a == b, s"one warm round from the fixed point must be identity: $a vs $b")
    // and the fixed point is the two group means (quantized milli-units)
    assert(a(0).take(2) == Seq(0L, 1000L) && a(1).take(2) == Seq(10000L, 11000L))
  }

  test("cold == fitFrom(rank seed): the shared-body identity") {
    val q = KMeans.quantize(pts)
    val seed = q.orderBy(col("vec_id")).limit(2)
      .select(col("vec_id").cast("int").as("cid"), col("q").as("cvec"))
    val viaFit = KMeans.fit(q, 2, 2).collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val viaFrom = KMeans.fitFrom(q, seed, 2).collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(viaFit == viaFrom)
  }

  test("q165 on the fixture: k rows, both assignments cover the corpus, shared cid space") {
    val df = KMeansDelta.q165(spark, sf0001)
    val rows = df.collect()
    assert(rows.length == KMeansDelta.K)
    val n = graft.oracle.Tables.table(spark, sf0001, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n_warm")).sum == n, "warm assignment covers every vector")
    assert(rows.map(_.getAs[Long]("n_cold")).sum == n, "cold assignment covers every vector")
    // cids are the k smallest vec_ids — shared by both arms because the
    // settled cut (94%) keeps them inside the settled slice
    assert(rows.map(_.getAs[Long]("cid")).sorted.toSeq == (0L until KMeansDelta.K.toLong))
    assert(rows.forall(_.getAs[Long]("inertia_warm") >= 0L))
  }
}
