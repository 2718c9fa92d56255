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

  test("stream-static anomaly: planted spike flags at ingest, steady traffic does not; stream == batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // settled history: type A runs ~6 events/min for 10 minutes
    val history = (for (m <- 0L until 10L; i <- 0L until 6L)
      yield ("A", m * 60000000L + i * 1000L)).toDF("event_type", "t_us")
    // arrivals: one quiet minute (6 events) and one spike minute (60)
    def ts(us: Long) = new java.sql.Timestamp(us / 1000L)
    val arrivals = (0L until 6L).map(i => ("A", ts(100L * 60000000L + i * 1000L))) ++
      (0L until 60L).map(i => ("A", ts(101L * 60000000L + i * 1000L)))
    val stream = MemoryStream[(String, java.sql.Timestamp)]
    val sq = RateAnomaly.rateAnomalyStreamStatic(
        stream.toDF().toDF("event_type", "event_time"), history, col("t_us"))
      .writeStream.format("memory").queryName("rate_gate")
      .outputMode("update").start()
    try {
      stream.addData(arrivals)
      sq.processAllAvailable()
    } finally sq.stop()
    val got = spark.table("rate_gate").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2), r.getBoolean(4)))
      .groupBy(t => (t._1, t._2)).map { case (k, rs) => k -> rs.maxBy(_._3) } // last update wins
    val quiet = got(("A", 100L * 60000L))
    val spike = got(("A", 101L * 60000L))
    assert(quiet._3 == 6L && !quiet._4, s"steady minute must pass: $quiet")
    assert(spike._3 == 60L && spike._4, s"spike minute must flag: $spike")
    // batch equivalence on the same frozen baseline
    val batch = RateAnomaly.rateAnomalyStreamStatic(
        arrivals.toDF("event_type", "event_time"), history, col("t_us"))
      .collect().map(r => ((r.getString(0), r.getTimestamp(1).getTime),
        (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2), r.getBoolean(4)))).toMap
    assert(got == batch, s"stream != batch: $got vs $batch")
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
