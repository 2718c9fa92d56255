package graft

import graft.ops.KAnonymity
import graft.ext.ClusterAgreement
import org.apache.spark.sql.functions._

/** q132 k-anonymity census + q133 label-outlier mining. */
class KAnonymitySpec extends SparkSpec {

  import spark.implicits._

  test("q132: risky users = users with ANY sub-k group; exact hand case") {
    // one feed, one hour, value buckets 0/1; k=3
    // bucket 0: users 1,2,3 (k-anonymous); bucket 1: users 1,4 (risky)
    val ev = Seq(
      (1L, 1L, 0.0), (2L, 2L, 0.0), (3L, 3L, 10.0),  // vb 0 (bucket 50.0)
      (4L, 1L, 60.0), (5L, 4L, 70.0),                // vb 1
      (6L, 1L, 0.0))                                 // duplicate QI row: distinct folds it
      .map { case (eid, u, v) => (eid, u, "click", v, 1000000L) }
      .toDF("event_id", "user_id", "event_type", "value", "t")
    val got = KAnonymity.kAnonymityOf(ev, col("t"), k = 3).collect()
    assert(got.length == 1)
    val r = got.head
    // 2 groups, 4 users; group vb=1 risky; users 1 and 4 at risk -> 5000 bp
    assert(r.getLong(1) == 2L && r.getLong(2) == 4L)
    assert(r.getLong(3) == 1L && r.getLong(4) == 2L && r.getLong(5) == 5000L)
  }

  test("q132 fixture: bounds hold — risky_users <= users, risky_groups <= groups") {
    val rows = KAnonymity.q132(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(2) && r.getLong(3) <= r.getLong(1))
      assert(r.getLong(5) >= 0 && r.getLong(5) <= 10000)
    }
  }

  test("q133: disagreeing vectors surface with the cell majority; ties break low") {
    def v(x: Double) = Array.fill(4)(x.toFloat)
    // cell A (seed 0): labels 7,7,9 -> majority 7; cell B (seed 1): label 9 only
    val embeds = Seq(
      (0L, v(0.0), 7), (2L, v(0.01), 7), (4L, v(0.02), 9),
      (1L, v(10.0), 9), (3L, v(9.99), 9))
      .toDF("vec_id", "embedding", "label")
    val got = ClusterAgreement.labelOutliersOf(embeds, k = 2, iters = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.keySet == Set(4L), s"only vec 4 disagrees: ${got.keySet}")
    assert(got(4L) == ((0L, 9L, 7L, 6666L)))
    // majority tie: cell with labels {5: 1, 6: 1} -> majority 5 (lowest)
    val tied = Seq((0L, v(0.0), 6), (2L, v(0.01), 5),
      (1L, v(10.0), 9)).toDF("vec_id", "embedding", "label")
    val t = ClusterAgreement.labelOutliersOf(tied, k = 2, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(t == Map(0L -> 5L), s"tie must break to lowest label: $t")
  }

  test("q133 reconciles with q129: outlier count == non-majority contingency mass") {
    val outliers = ClusterAgreement.q133(spark, sf0001).count()
    val ct = ClusterAgreement.q129(spark, sf0001).collect()
    val nonMaj = ct.groupBy(_.getLong(0)).map { case (_, cells) =>
      val total = cells.head.getLong(3)
      // majority by (count desc, label asc) — subtract its mass
      val maj = cells.maxBy(c => (c.getLong(2), -c.getLong(1)))
      total - maj.getLong(2)
    }.sum
    assert(outliers == nonMaj, s"q133 $outliers vs q129-derived $nonMaj")
  }
}
