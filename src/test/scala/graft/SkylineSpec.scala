package graft

import graft.ext.{Skyline, TextOps}
import org.apache.spark.sql.functions._

/** Pareto skyline over (length, quality) (q123). */
class SkylineSpec extends SparkSpec {

  test("frontier equals a brute-force pairwise dominance check") {
    val pts = TextOps.scoredDocs(
      graft.oracle.Tables.table(spark, sf0001, "documents"))
      .select(col("n_words"),
        expr("CAST(round(quality_score * 10000) AS BIGINT)").as("q10k"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // dominated: another point >= in both dims, > in at least one
    val brute = pts.filter { case (w, q) =>
      !pts.exists { case (w2, q2) =>
        w2 >= w && q2 >= q && (w2 > w || q2 > q)
      }
    }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val got = Skyline.q123(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == brute)
  }

  test("frontier is strictly decreasing in quality as length falls away") {
    val rows = Skyline.q123(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(-_._1)
    rows.sliding(2).foreach {
      case Array((w1, q1), (w2, q2)) =>
        assert(w1 > w2 && q2 > q1, s"frontier must trade length for quality: ($w1,$q1) ($w2,$q2)")
      case _ =>
    }
  }
}
