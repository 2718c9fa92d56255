package graft

import graft.ext.{KsDrift, TextOps}
import org.apache.spark.sql.functions._

/** Exact two-sample KS drift (q101). */
class KsDriftSpec extends SparkSpec {

  test("q101 matches a brute-force KS over collected per-source score sets") {
    val scored = TextOps.scoredDocs(
      graft.oracle.Tables.table(spark, sf0001, "documents"))
      .select(col("source"),
        expr("CAST(round(quality_score * 10000) AS BIGINT)").as("q10k"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val corpus = scored.map(_._2).sorted
    val nC = corpus.length.toLong
    val grid = corpus.distinct
    def cumLe(xs: Array[Long], cell: Long): Long = xs.count(_ <= cell).toLong
    val brute = scored.groupBy(_._1).map { case (src, rows) =>
      val xs = rows.map(_._2).sorted
      val nS = xs.length.toLong
      val diffs = grid.map(g => (g, math.abs(cumLe(xs, g) * nC - cumLe(corpus, g) * nS)))
      val ksNum = diffs.map(_._2).max
      val cell = diffs.filter(_._2 == ksNum).map(_._1).min
      src -> (nS, nC, ksNum * 10000 / (nS * nC), cell)
    }
    val got = KsDrift.q101(spark, sf0001).collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getAs[Long]("ks_bp"), r.getAs[Long]("ks_cell"))
    }.toMap
    assert(got == brute)
  }

  test("a single-source corpus has zero drift") {
    import spark.implicits._
    val docs = (1L to 20L).map(i =>
      (i, (1 to i.toInt % 7 + 3).map(j => s"w$j").mkString(" "), "only")).toDF("doc_id", "text", "source")
    val out = KsDrift.ksDriftOf(docs).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("ks_bp") == 0L)
  }

  test("bounded evaluation frame: sources x corpus grid, never corpus rows") {
    val nSources = graft.oracle.Tables.table(spark, sf0001, "documents")
      .select("source").distinct().count()
    val out = KsDrift.q101(spark, sf0001)
    assert(out.count() == nSources)
  }
}
