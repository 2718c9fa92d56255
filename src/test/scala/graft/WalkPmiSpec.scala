package graft

import graft.ops.{WalkPairs, WalkPmi}
import org.apache.spark.sql.Row

/** q155: PMI over the walk-pair census — hand-computed occupancy/total
  * arithmetic, the exact ln-round-6 values (mirrored with the same JVM
  * log + HALF_UP rounding Spark's `round` uses), and the 2T occupancy
  * conservation law, both on hand censuses and composed over real
  * q153 walks. */
class WalkPmiSpec extends SparkSpec {

  import spark.implicits._

  private def pmi6(cnt: Long, t: Long, oa: Long, ob: Long): Double =
    BigDecimal(math.log(cnt.toDouble * t / (oa.toDouble * ob)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def run(pairs: (Long, Long, Long)*): Map[(Long, Long), Row] =
    WalkPmi.pmiOf(pairs.toSeq.toDF("a", "b", "cnt"))
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) -> r).toMap

  test("balanced chain: both pairs sit exactly at independence — pmi 0") {
    // occ: 1→4, 2→8, 3→4; T = 8; ln(4·8 / (4·8)) = 0 for both rows
    val rs = run((1L, 2L, 4L), (2L, 3L, 4L))
    assert(rs.size == 2)
    rs.values.foreach { r =>
      assert(r.getAs[Long]("t_mass") == 8L)
      assert(r.getAs[Double]("pmi") == 0.0)
    }
    assert(rs((1L, 2L)).getAs[Long]("occ_a") == 4L)
    assert(rs((1L, 2L)).getAs[Long]("occ_b") == 8L)
  }

  test("uniform triangle: every pair reads ln(3/4), negative — co-occurrence below independence") {
    val rs = run((1L, 2L, 2L), (1L, 3L, 2L), (2L, 3L, 2L))
    rs.values.foreach { r =>
      assert(r.getAs[Long]("occ_a") == 4L && r.getAs[Long]("occ_b") == 4L)
      assert(r.getAs[Long]("t_mass") == 6L)
      assert(r.getAs[Double]("pmi") == pmi6(2L, 6L, 4L, 4L))
    }
    assert(rs.head._2.getAs[Double]("pmi") < 0.0)
  }

  test("skewed census: the exclusive pair scores high, hand ln values to 6 dp") {
    val rs = run((1L, 2L, 9L), (3L, 4L, 1L))
    assert(rs((1L, 2L)).getAs[Double]("pmi") == pmi6(9L, 10L, 9L, 9L))
    assert(rs((3L, 4L)).getAs[Double]("pmi") == pmi6(1L, 10L, 1L, 1L))
    // (3,4) co-occur ONLY with each other → maximal association
    assert(rs((3L, 4L)).getAs[Double]("pmi") > rs((1L, 2L)).getAs[Double]("pmi"))
  }

  test("occupancy conservation: Σ occ == 2·T on every census (each pair feeds two nodes)") {
    for (census <- Seq(
        Seq((1L, 2L, 4L), (2L, 3L, 4L)),
        Seq((1L, 2L, 9L), (3L, 4L, 1L), (1L, 4L, 5L)))) {
      val rows = WalkPmi.pmiOf(census.toDF("a", "b", "cnt")).collect()
      val t = rows.head.getAs[Long]("t_mass")
      val occ = scala.collection.mutable.Map.empty[Long, Long]
      rows.foreach { r =>
        occ(r.getAs[Long]("a")) = r.getAs[Long]("occ_a")
        occ(r.getAs[Long]("b")) = r.getAs[Long]("occ_b")
      }
      assert(occ.values.sum == 2L * t, s"occ=$occ t=$t")
    }
  }

  test("composed over real walks: every q153 pair gets a finite pmi and the integer columns reconcile") {
    val pairs = WalkPairs.walkPairsOf(
      Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b"))
    val out = WalkPmi.pmiOf(pairs).collect()
    assert(out.nonEmpty)
    val t = out.map(_.getAs[Long]("cnt")).sum
    out.foreach { r =>
      assert(r.getAs[Long]("t_mass") == t)
      assert(!r.getAs[Double]("pmi").isNaN && !r.getAs[Double]("pmi").isInfinite)
      assert(r.getAs[Double]("pmi") ==
        pmi6(r.getAs[Long]("cnt"), t, r.getAs[Long]("occ_a"), r.getAs[Long]("occ_b")))
    }
  }

  test("empty census → empty output") {
    assert(WalkPmi.pmiOf(Seq.empty[(Long, Long, Long)].toDF("a", "b", "cnt"))
      .collect().isEmpty)
  }
}
