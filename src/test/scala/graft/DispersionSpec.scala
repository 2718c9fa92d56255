package graft

import graft.ext.Dispersion

class DispersionSpec extends SparkSpec {

  test("q81: moments are exact on hand-computed clusters") {
    import spark.implicits._
    // label 0: two opposite unit-ish vectors (1,0),( -1,0):
    //   mean_sq_norm = 1, centroid = 0, pairwise dist² = 4 -> dispersion 4
    // label 1: three identical vectors -> dispersion 0, centroid = ||v||²
    // label 2: singleton -> dispersion 0 by contract
    val embeds = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(-1.0f, 0.0f), 0),
      (3L, Array(0.5f, 0.5f), 1), (4L, Array(0.5f, 0.5f), 1), (5L, Array(0.5f, 0.5f), 1),
      (6L, Array(0.25f, 0.25f), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = Dispersion.dispersionOf(embeds).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(0) == (2L, 1.0, 0.0, 4.0), s"opposite pair: ${out(0)}")
    assert(out(1) == (3L, 0.5, 0.5, 0.0), s"identical triple: ${out(1)}")
    assert(out(2) == (1L, 0.125, 0.125, 0.0), s"singleton: ${out(2)}")
  }

  test("q81: dispersion equals the brute-force pair mean on a seeded random cluster") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (1L to 20L).map(i => (i, Array.fill(8)(rnd.nextFloat() - 0.5f), 0))
    val out = Dispersion.dispersionOf(vecs.toDF("vec_id", "embedding", "label"))
      .collect()(0).getDouble(4)
    // brute force over the QUANTIZED grid (the operator's declared domain)
    val q = vecs.map(_._2.map(x => math.floor(x.toDouble * 1e6 + 0.5)))
    val dists = for (i <- q.indices; j <- i + 1 until q.length)
      yield q(i).zip(q(j)).map { case (a, b) => (a - b) * (a - b) }.sum
    val expected = math.floor(dists.sum / dists.length / 1e6) / 1e6
    assert(math.abs(out - expected) < 1e-9, s"$out != brute-force $expected")
  }

  test("q82: scatter/separation/DB are exact on hand-placed clusters") {
    import graft.ext.Separation
    import spark.implicits._
    // three clusters on a line: centers at x=0, x=1, x=3; cluster 0 and 1
    // have within-scatter 0.5 (points at center ± 0.5), cluster 2 is tight
    val embeds = Seq(
      (1L, Array(-0.5f, 0f), 0), (2L, Array(0.5f, 0f), 0),
      (3L, Array(0.5f, 0f), 1), (4L, Array(1.5f, 0f), 1),
      (5L, Array(3.0f, 0f), 2), (6L, Array(3.0f, 0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = Separation.separationOf(embeds).collect()
      .map(r => r.getInt(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // scatters: 0.5, 0.5, 0.0; centroid dists: d01=1, d02=3, d12=2
    assert(out(0) == (0.5, 1.0, 1.0), s"cluster 0: ${out(0)}")     // max((0.5+0.5)/1, (0.5+0)/3) = 1
    assert(out(1) == (0.5, 1.0, 1.0), s"cluster 1: ${out(1)}")     // max(1/1, 0.5/2) = 1
    assert(out(2) == (0.0, 2.0, 0.25), s"cluster 2: ${out(2)}")    // max(0.5/3, 0.5/2) = 0.25
  }

  test("q82: single-cluster corpus yields null separation, not an error") {
    import graft.ext.Separation
    import spark.implicits._
    val out = Separation.separationOf(
      Seq((1L, Array(1f, 0f), 0), (2L, Array(0f, 1f), 0)).toDF("vec_id", "embedding", "label"))
      .collect()
    assert(out.length == 1 && out(0).isNullAt(3) && out(0).isNullAt(4),
      s"no other centroid -> null min_sep/db_index: ${out.toSeq}")
  }

  test("q82 plan: census persisted once for all three consumers, pair side never corpus-sized") {
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    import graft.ext.Separation
    val df = Separation.q82(spark, sf0001)
    val withCache = df.queryExecution.withCachedData
    val ims = withCache.collect { case r: InMemoryRelation => r }
    assert(ims.length >= 3 && ims.map(_.cacheBuilder).distinct.length == 1,
      s"every consumer (scatter x3, both pair sides) must share ONE census materialization:\n$withCache")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian crept in:\n$p")
  }

  test("q81 plan: one scan, one census explode, no join/window/pairs") {
    val df = Dispersion.q81(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    def count(sub: String) = p.sliding(sub.length).count(_ == sub)
    assert(count("Scan parquet") == 1, s"must scan embeddings once:\n$p")
    assert(count("Generate ") == 1, s"exactly the census explode:\n$p")
    assert(!p.contains("Join") && !p.contains("Window") && !p.contains("CartesianProduct"),
      s"pairs/window crept into a census:\n$p")
  }
}
