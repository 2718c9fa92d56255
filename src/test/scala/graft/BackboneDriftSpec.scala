package graft

import graft.ops.{Backbone, BackboneDrift}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

/** q152: temporal backbone drift — hand-computed adjacent-period overlap
  * arithmetic, the per-period independence of the relative cut, and the
  * reconciliation contract with [[Backbone.backboneOf]] (each week's
  * m_cur must equal what the global backbone would keep on that week's
  * slice alone). */
class BackboneDriftSpec extends SparkSpec {

  import spark.implicits._

  private def drift(topBp: Long, rows: (Long, Long, Long, Long)*): Seq[Row] =
    BackboneDrift.driftOf(rows.toSeq.toDF("wk", "a", "b", "w"), topBp)
      .orderBy(col("period")).collect().toSeq

  test("hand drift: one shared edge of two-per-week flat backbones → jaccard 3333") {
    // flat weights → τ = 1 → both weeks keep everything; common = {(2,3)}
    val rs = drift(1000L,
      (0L, 1L, 2L, 1L), (0L, 2L, 3L, 1L),
      (1L, 2L, 3L, 1L), (1L, 3L, 4L, 1L))
    assert(rs.size == 1)
    val r = rs.head
    assert(r.getAs[Long]("period") == 1L)
    assert(r.getAs[Long]("m_prev") == 2L)
    assert(r.getAs[Long]("m_cur") == 2L)
    assert(r.getAs[Long]("m_common") == 1L)
    assert(r.getAs[Long]("jaccard_bp") == 3333L)  // 1·10⁴ div (2+2−1)
    assert(r.getAs[Long]("retained_bp") == 5000L)
    assert(r.getAs[Long]("fresh_bp") == 5000L)
  }

  test("identical weeks → jaccard 10000, retained 10000, fresh 0") {
    val rs = drift(1000L,
      (0L, 1L, 2L, 3L), (0L, 2L, 3L, 1L),
      (1L, 1L, 2L, 3L), (1L, 2L, 3L, 1L))
    // τ per week = 3 (top decile of 2 edges = 1 edge) → backbone {(1,2)}
    val r = rs.head
    assert(r.getAs[Long]("m_prev") == 1L && r.getAs[Long]("m_cur") == 1L)
    assert(r.getAs[Long]("jaccard_bp") == 10000L)
    assert(r.getAs[Long]("retained_bp") == 10000L)
    assert(r.getAs[Long]("fresh_bp") == 0L)
  }

  test("disjoint weeks → jaccard 0, retained 0, fresh 10000") {
    val rs = drift(1000L,
      (0L, 1L, 2L, 1L), (1L, 3L, 4L, 1L))
    val r = rs.head
    assert(r.getAs[Long]("m_common") == 0L)
    assert(r.getAs[Long]("jaccard_bp") == 0L)
    assert(r.getAs[Long]("retained_bp") == 0L)
    assert(r.getAs[Long]("fresh_bp") == 10000L)
  }

  test("the cut is per-period: a dense week and a flat week get independent τ") {
    // wk0: w = 9 then nine 1s → τ₀ = 9, keeps 1; wk1: ten 5s → τ₁ = 5, keeps 10
    val wk0 = (0 until 10).map(i => (0L, i.toLong, i + 100L, if (i == 0) 9L else 1L))
    val wk1 = (0 until 10).map(i => (1L, i.toLong, i + 100L, 5L))
    val rs = drift(1000L, wk0 ++ wk1: _*)
    val r = rs.head
    assert(r.getAs[Long]("m_prev") == 1L)
    assert(r.getAs[Long]("m_cur") == 10L)
    assert(r.getAs[Long]("m_common") == 1L)  // (0,100) survives both cuts
    assert(r.getAs[Long]("jaccard_bp") == 1000L)  // 1·10⁴ div 10
  }

  test("non-adjacent weeks pair with nothing; three consecutive weeks yield two rows") {
    assert(drift(1000L, (0L, 1L, 2L, 1L), (2L, 1L, 2L, 1L)).isEmpty)
    val rs = drift(1000L,
      (0L, 1L, 2L, 1L), (1L, 1L, 2L, 1L), (2L, 1L, 2L, 1L))
    assert(rs.map(_.getAs[Long]("period")) == Seq(1L, 2L))
    assert(rs.forall(_.getAs[Long]("jaccard_bp") == 10000L))
  }

  test("reconciliation: each week's m_cur/m_prev == |backboneOf| of that week's slice") {
    val censusRows = Seq(
      (0L, 1L, 2L, 9L), (0L, 1L, 3L, 7L), (0L, 2L, 3L, 7L), (0L, 3L, 4L, 5L),
      (0L, 4L, 5L, 1L), (0L, 5L, 6L, 1L),
      (1L, 1L, 2L, 8L), (1L, 2L, 3L, 8L), (1L, 3L, 4L, 2L), (1L, 4L, 5L, 2L),
      (2L, 1L, 2L, 4L), (2L, 6L, 7L, 4L), (2L, 7L, 8L, 3L))
    for (topBp <- Seq(1000L, 2500L, 5000L, 10000L)) {
      val byWeek = censusRows.groupBy(_._1).map { case (wk, rows) =>
        wk -> Backbone.backboneOf(
          rows.map { case (_, a, b, w) => (a, b, w) }.toDF("a", "b", "w"), topBp).count()
      }
      val rs = drift(topBp, censusRows: _*)
      assert(rs.size == 2)
      rs.foreach { r =>
        val p = r.getAs[Long]("period")
        assert(r.getAs[Long]("m_cur") == byWeek(p),
          s"topBp=$topBp period=$p m_cur")
        assert(r.getAs[Long]("m_prev") == byWeek(p - 1),
          s"topBp=$topBp period=$p m_prev")
      }
    }
  }
}
