package graft.pipeline

import graft.gen.LogGenerator
import graft.io.Codec
import graft.model._
import graft.stateful.Escalator
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Runnable wiring of the full 4-stage topology (the reference's three jobs
  * + metrics notebooks) over deterministic generated logs, with each stage
  * boundary exercised the way the reference uses Kafka topics: stage 1
  * (error-rate detector) runs as a real streaming query fed minute-by-minute
  * through MemoryStream; stages 2-4 consume the produced alerts.
  *
  *   sbt "runMain graft.pipeline.ReplayDemo [seconds]"
  */
object ReplayDemo {
  def main(args: Array[String]): Unit = {
    val seconds = args.headOption.map(_.toInt).getOrElse(600)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-replay")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.sparkContext.setLogLevel("WARN")

    val base = 1767680040L // minute-aligned virtual clock
    val logs = LogGenerator.logs(spark, base, seconds).as[RawLog].collect()
    println(s"[demo] generated ${logs.length} logs over $seconds s (4 services)")

    // --- stage 1: error-rate spike detector, streamed minute by minute
    val rawStream = MemoryStream[RawLog]
    val alertsQ = ErrorRateDetector.detect(ErrorRateDetector.withEventTime(rawStream.toDF()))
      .writeStream.format("memory").queryName("alerts").outputMode("append").start()
    logs.grouped(math.max(1, logs.length / math.max(1, seconds / 60))).foreach { chunk =>
      rawStream.addData(chunk)
      alertsQ.processAllAvailable()
    }
    // flush: one late heartbeat advances the watermark past the last window
    rawStream.addData(RawLog(
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochSecond(base + seconds + 120)),
      "auth-service", "node-1", "INFO", "req-flush", "flush", 10))
    alertsQ.processAllAvailable()
    alertsQ.stop()
    val spikeAlerts = spark.table("alerts")
    println(s"[demo] stage1 spike alerts: ${spikeAlerts.count()}")
    spikeAlerts.groupBy("service").count().show(truncate = false)

    // --- stage 2: latency SLO monitor (window p95 -> consecutive breaches)
    val batchLogs = ErrorRateDetector.withEventTime(logs.toSeq.toDF())
    val breachAlerts = LatencySloMonitor.monitor(batchLogs)
    println(s"[demo] stage2 SLO breach alerts: ${breachAlerts.count()}")

    // --- stage 3: escalation over the union stream (the shared alerts topic)
    val allAlerts = spikeAlerts.as[IncidentAlert].unionByName(breachAlerts)
    val escalations = Escalator.escalate(allAlerts, ttlMs = None)
    val esc = escalations.cache()
    println(s"[demo] stage3 escalations: ${esc.count()} forwarded, " +
      s"${esc.filter(_.severity == "ESCALATED").count()} tagged ESCALATED")

    // --- stage 4: windowed metrics over alerts and escalations
    println("[demo] stage4 alert metrics (first 10 windows):")
    MetricsJob.metrics(allAlerts.toDF()).orderBy("window_start", "service").show(10, truncate = false)
    println("[demo] stage4 escalation metrics (first 5 windows):")
    MetricsJob.metrics(esc.toDF().drop("escalation_reason"), "total_escalations")
      .orderBy("window_start", "service").show(5, truncate = false)

    // --- Kafka value contract round-trip on the wire format
    val wire = Codec.encode(allAlerts.toDF())
    val back = Codec.decodeAlerts(wire)
    println(s"[demo] codec round-trip: ${allAlerts.count()} alerts -> " +
      s"${back.count()} decoded, key sample=${wire.select("key").head.getString(0)}")
    spark.stop()
  }
}
