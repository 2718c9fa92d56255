package graft

import graft.ext.ClusterAgreement
import org.apache.spark.sql.functions._

/** q129/q130: contingency purity and exact pair-counting Rand index. */
class ClusterAgreementSpec extends SparkSpec {

  import spark.implicits._

  private def v(x: Double) = Array.fill(4)(x.toFloat)

  // two tight clusters; ids 0/1 are the k=2 seeds (one per cluster);
  // vec 4 sits in cluster A geometrically but carries label 9
  private def handEmbeds = Seq(
    (0L, v(0.0), 7), (2L, v(0.01), 7), (4L, v(0.02), 9), // cluster A
    (1L, v(10.0), 9), (3L, v(9.99), 9))                  // cluster B
    .toDF("vec_id", "embedding", "label")

  test("q129: contingency and purity match the hand computation") {
    val got = ClusterAgreement.clusterAgreementOf(handEmbeds, k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // cell 0 (seeded by vec 0): labels {7: 2, 9: 1}; cell 1: {9: 2}
    assert(got((0L, 7L)) == ((2L, 3L, 6666L)))
    assert(got((0L, 9L)) == ((1L, 3L, 3333L)))
    assert(got((1L, 9L)) == ((2L, 2L, 10000L)))
    assert(got.size == 3)
  }

  test("q130: Rand index exact — hand case 0.6, perfect case 1.0") {
    // n=5, P=10; within_cells = C(2,2)+C(1,2)+C(2,2) = 1+0+1 = 2;
    // clusters 3,2 -> 3+1 = 4; labels 2,3 -> 1+3 = 4
    // agreements = 10 + 2*2 - 4 - 4 = 6 -> 600000 ppm
    val r = ClusterAgreement.randIndexOf(handEmbeds, k = 2, iters = 2).head
    assert(r.getLong(0) == 5L && r.getLong(1) == 10L)
    assert(r.getLong(2) == 6L)
    assert(r.getLong(3) == 600000L)
    // relabel vec 4 to 7: clustering == labels -> rand = 1
    val perfect = handEmbeds.withColumn("label",
      when(col("vec_id") === 4L, 7).otherwise(col("label")))
    val p = ClusterAgreement.randIndexOf(perfect, k = 2, iters = 2).head
    assert(p.getLong(3) == 1000000L)
  }

  test("q129/q130 reconcile on the fixture: purity shares sum to 10000 per cell") {
    val rows = ClusterAgreement.q129(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (cid, cells) =>
      val total = cells.head.getLong(3)
      assert(cells.map(_.getLong(2)).sum == total, s"cell $cid totals reconcile")
    }
    val rand = ClusterAgreement.q130(spark, sf0001).head
    val ppm = rand.getLong(3)
    assert(ppm >= 0L && ppm <= 1000000L, s"rand in [0,1]: $ppm")
  }
}
