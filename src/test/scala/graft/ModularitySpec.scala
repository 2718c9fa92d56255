package graft

import graft.ops.{Backbone, Lpa, Modularity, Triangles}
import graft.oracle.Tables
import org.apache.spark.sql.functions._

/** q151: exact-integer modularity census. Hand graphs pin the
  * Newman–Girvan arithmetic (including the Q = 0 single-community and
  * Q < 0 all-singleton identities, and the truncation-toward-zero of a
  * negative non-exact quotient); the reconciliation test pins q151's
  * communities to q149's (same sweep, by construction). */
class ModularitySpec extends SparkSpec {

  import spark.implicits._

  private def census(edges: Seq[(Long, Long)], labels: Seq[(Long, Long)]) =
    Modularity.modularityCensusOf(
      edges.toDF("a", "b"), labels.toDF("v", "lbl"))
      .collect().map(r => r.getAs[Long]("community") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("e_intra"),
          r.getAs[Long]("d_total"), r.getAs[Long]("contrib"),
          r.getAs[Long]("q_ppm"))).toMap

  test("two triangles + a bridge, true labels: Q = 70/196 → 357142 ppm") {
    // m=7, M2=14; each community: e=3, d=7 → contrib = 2·14·3 − 49 = 35
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val labels = Seq(1L -> 10L, 2L -> 10L, 3L -> 10L, 4L -> 20L, 5L -> 20L, 6L -> 20L)
    val c = census(edges, labels)
    assert(c(10L) == ((3L, 3L, 7L, 35L, 357142L)), s"got $c")
    assert(c(20L) == ((3L, 3L, 7L, 35L, 357142L)), s"got $c")
  }

  test("everything in one community: Q = 0 exactly (e = m, d = 2m)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    val labels = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L)
    val c = census(edges, labels)
    assert(c(1L) == ((4L, 4L, 8L, 0L, 0L)), s"got $c")
  }

  test("triangle, all singletons: Q = −12/36 → −333333 ppm (truncation toward zero, both engines)") {
    // M2=6; each node: e=0, d=2 → contrib = −4; Σ = −12; −12·10⁶ div 36
    // = −333333.33… → −333333 (Spark div and DuckDB // both truncate)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val labels = Seq(1L -> 1L, 2L -> 2L, 3L -> 3L)
    val c = census(edges, labels)
    for (v <- 1L to 3L)
      assert(c(v) == ((1L, 0L, 2L, -4L, -333333L)), s"got $c")
  }

  test("handshake identity: Σ d_total = 2m on an irregular graph") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (4L, 5L))
    val labels = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L)
    val c = census(edges, labels)
    assert(c.values.map(_._3).sum == 2L * edges.size)
  }

  test("reconciliation: q151's communities are exactly q149's (same sweep, same rounds)") {
    val sf = "/root/testdata/sf0.001"
    val q149 = graft.oracle.Registry.byName("q149_lpa_communities").run(spark, sf)
      .select(col("community"), col("community_size")).distinct()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val q151 = graft.oracle.Registry.byName("q151_modularity").run(spark, sf)
      .select(col("community"), col("n_nodes"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(q149 == q151, s"q149=$q149 vs q151=$q151")
  }
}
