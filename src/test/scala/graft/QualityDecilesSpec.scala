package graft

import graft.ext.{QualityDeciles, TextOps}
import org.apache.spark.sql.functions._

/** Exact histogram-derived quality deciles (q105). */
class QualityDecilesSpec extends SparkSpec {

  test("q105 matches a brute-force rank-decile computation with the cell tie rule") {
    val scored = TextOps.scoredDocs(
      graft.oracle.Tables.table(spark, sf0001, "documents"))
      .select(expr("CAST(round(quality_score * 10000) AS BIGINT)").as("q10k"),
        col("n_words"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = scored.length.toLong
    // per-cell census, then the operator's rule: cell decile = decile of
    // the cell's LAST rank under decile(r) = (r-1)*10 div n + 1
    val cells = scored.groupBy(_._1).map { case (q, rs) =>
      (q, rs.length.toLong, rs.map(_._2).sum)
    }.toSeq.sortBy(_._1)
    var cum = 0L
    val brute = cells.map { case (q, docs, toks) =>
      cum += docs
      val dec = (cum - 1) * 10 / n + 1
      (dec, q, docs, toks)
    }.groupBy(_._1).map { case (dec, rs) =>
      dec -> (rs.map(_._3).sum, rs.map(_._4).sum, rs.map(_._2).min, rs.map(_._2).max)
    }
    val got = QualityDeciles.q105(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == brute)
  }

  test("decile ranges are disjoint and increasing; masses cover the corpus") {
    val rows = QualityDeciles.q105(spark, sf0001).orderBy("decile").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    val nDocs = graft.oracle.Tables.table(spark, sf0001, "documents").count()
    assert(rows.map(_._2).sum == nDocs)
    rows.foreach { case (_, _, lo, hi) => assert(lo <= hi) }
    rows.sliding(2).foreach {
      case Array((d1, _, _, hi1), (d2, _, lo2, _)) =>
        assert(d1 < d2 && hi1 < lo2, s"deciles overlap: $d1..$d2")
      case _ =>
    }
  }
}
