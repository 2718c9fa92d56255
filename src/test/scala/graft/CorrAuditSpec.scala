package graft

import graft.ext.{CorrAudit, TextOps}
import org.apache.spark.sql.functions._

/** Quality-length confound audit (q108). */
class CorrAuditSpec extends SparkSpec {

  import spark.implicits._

  test("q108 matches a brute-force Pearson recomputation from collected sufficient stats") {
    val xs = TextOps.scoredDocs(
      graft.oracle.Tables.table(spark, sf0001, "documents"))
      .select(col("source"), col("n_words"),
        expr("CAST(round(quality_score * 10000) AS BIGINT)").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val brute = xs.groupBy(_._1).map { case (src, rows) =>
      val n = rows.length.toLong
      val (sx, sy) = (rows.map(_._2).sum, rows.map(_._3).sum)
      val sxy = rows.map(r => r._2 * r._3).sum
      val sxx = rows.map(r => r._2 * r._2).sum
      val syy = rows.map(r => r._3 * r._3).sum
      val cov = n.toDouble * sxy - sx.toDouble * sy
      val vx = n.toDouble * sxx - sx.toDouble * sx
      val vy = n.toDouble * syy - sy.toDouble * sy
      val r2 = if (vx * vy == 0) None
               else Some(math.floor(cov * cov / (vx * vy) * 10000).toLong)
      val sign = if (cov > 0) 1L else if (cov < 0) -1L else 0L
      src -> (n, sx * 1000000L / n, sy * 1000000L / n, sign, r2)
    }
    val got = CorrAudit.q108(spark, sf0001).collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))
    }.toMap
    assert(got == brute)
  }

  test("perfectly length-driven quality approaches r2 = 1; constant sources are NULL") {
    // short docs of unique words: ttr = 1, stop_ratio = 0 -> the score's
    // only varying term is the length ramp -> near-perfect correlation
    val ramp = (1L to 30L).map(i =>
      (i, (1 to i.toInt + 2).map(j => s"u${i}w$j").mkString(" "), "ramp"))
    val const = Seq((100L, "alpha beta gamma", "const"), (101L, "delta epsilon zeta", "const"))
    val out = CorrAudit.corrAuditOf((ramp ++ const).toDF("doc_id", "text", "source"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5)))).toMap
    assert(out("ramp")._1 == 1L && out("ramp")._2.exists(_ >= 9990L),
      s"length ramp must correlate ~1: $out")
    // const: both docs score identically (same length, unique words) -> vy = 0
    assert(out("const")._2.isEmpty, s"constant quality has undefined r2: $out")
  }
}
