package graft

import graft.ops.RateAnomaly
import org.apache.spark.sql.functions._

/** Adaptive per-minute rate anomaly (q107). */
class RateAnomalySpec extends SparkSpec {

  import spark.implicits._

  private def mkEvents(rows: Seq[(String, Long)]) =
    rows.toDF("event_type", "t_us")

  test("a planted spike minute flags at 3 sigma; steady types stay silent") {
    // type A: 10 quiet minutes at ~6 events, one spike minute at 60
    val quiet = for (m <- 0L until 10L; i <- 0L until 6L)
      yield ("A", m * 60000000L + i * 1000L)
    val spike = for (i <- 0L until 60L) yield ("A", 10L * 60000000L + i * 1000L)
    // type B: perfectly steady — zero variance, never anomalous
    val steady = for (m <- 0L until 11L; i <- 0L until 5L)
      yield ("B", m * 60000000L + i * 1000L)
    val out = RateAnomaly.rateAnomalyOf(
      mkEvents(quiet ++ spike ++ steady), col("t_us")).collect()
    assert(out.length == 1, s"exactly the spike minute: ${out.mkString(";")}")
    val r = out(0)
    assert(r.getString(0) == "A" && r.getLong(1) == 10L && r.getLong(2) == 60L)
    // brute-force z^2 on the same counts
    val cs = Seq.fill(10)(6L) :+ 60L
    val (n, s, q) = (cs.length.toLong, cs.sum, cs.map(c => c * c).sum)
    assert(r.getLong(4) == (60 * n - s) * (60 * n - s) / (n * q - s * s))
    assert(r.getLong(3) == s * 1000000L / n)
  }

  test("a below-mean outlier minute does not flag (one-sided detector)") {
    val rows = (for (m <- 0L until 10L; i <- 0L until 20L)
      yield ("A", m * 60000000L + i * 1000L)) ++
      Seq(("A", 10L * 60000000L)) // 1-event minute, far BELOW mean
    val out = RateAnomaly.rateAnomalyOf(mkEvents(rows), col("t_us")).collect()
    assert(out.isEmpty, s"drops are not spikes: ${out.mkString(";")}")
  }

  test("q107 runs on the fixture and every flagged cell satisfies the predicate") {
    val out = RateAnomaly.q107(spark, sf0001).collect()
    out.foreach { r =>
      assert(r.getLong(2) * 1000000L > r.getLong(3),
        s"flagged count must exceed its mean: $r")
      assert(r.getLong(4) > 9L - 1L, s"z^2 must exceed sigma^2 boundary: $r")
    }
  }
}
