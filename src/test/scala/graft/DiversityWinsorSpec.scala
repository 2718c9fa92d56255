package graft

import graft.ext.{NgramDiversity, Winsorize}
import org.apache.spark.sql.functions._

/** q96 n-gram diversity and q97 winsorization. */
class DiversityWinsorSpec extends SparkSpec {

  test("q96: distinct ≤ total, ttr in (0, 10000], known tiny corpus exact") {
    val out = NgramDiversity.q96(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val tot = r.getAs[Long]("total_grams")
      val uniq = r.getAs[Long]("distinct_grams")
      val ttr = r.getAs[Long]("ttr_bp")
      assert(uniq >= 1 && uniq <= tot)
      assert(ttr > 0 && ttr <= 10000)
      assert(ttr == uniq * 10000 / tot)
    }

    import spark.implicits._
    // "a b a b" → 1-grams: 4 tot / 2 uniq; 2-grams: 3 tot ("a b","b a","a b")
    // / 2 uniq; 3-grams: 2 tot / 2 uniq
    val tiny = Seq(("s1", "a b a b")).toDF("source", "text")
    val got = NgramDiversity.diversityOf(tiny).collect()
      .map(r => r.getAs[Long]("n") -> (r.getAs[Long]("total_grams"), r.getAs[Long]("distinct_grams"))).toMap
    assert(got(1L) == (4L, 2L) && got(2L) == (3L, 2L) && got(3L) == (2L, 2L))
  }

  test("q97: thresholds and clipped mass match a brute-force reference per source") {
    val docs = graft.oracle.Tables.table(spark, sf0001, "documents")
      .select(col("source"), col("n_chars").cast("long").as("n_chars"))
    val brute = docs.collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (src, rows) =>
        val xs = rows.map(_._2).sorted
        val n = xs.length
        // integer ceil — math.ceil(0.05 * n) drifts on binary-inexact q·n
        def disc(num: Int): Long = xs(math.max(0, (n * num + 19) / 20 - 1))
        val (p05, p95) = (disc(1), disc(19))
        src -> (n.toLong, p05, p95,
          xs.count(_ < p05).toLong, xs.count(_ > p95).toLong,
          xs.map(x => math.max(p05, math.min(p95, x))).sum)
      }
    val got = Winsorize.q97(spark, sf0001).collect().map { r =>
      r.getAs[String]("source") -> (r.getAs[Long]("n_docs"), r.getAs[Long]("p05"),
        r.getAs[Long]("p95"), r.getAs[Long]("n_clipped_low"),
        r.getAs[Long]("n_clipped_high"), r.getAs[Long]("sum_winsorized"))
    }.toMap
    assert(got == brute)
  }
}
