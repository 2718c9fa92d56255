package graft

import graft.io.{Sinks, Sources, Topics}

/** Kafka boundary contract (S2-S4), tested up to the connector line.
  *
  * `spark-sql-kafka-0-10` is not on this environment's classpath (and no
  * broker exists), so `.load()`/`.start()` cannot be exercised — MIGRATION.md
  * documents that boundary. What IS pinned here: the exact option sets the
  * builders hand to the connector (the part that breaks silently when a
  * topic/offset name drifts from the reference topology), and the fail-fast
  * behavior when the connector is absent.
  */
class IOSpec extends SparkSpec {

  test("kafka source options mirror the reference consumer shape") {
    val opts = Sources.kafkaSourceOptions("broker:9092", Topics.rawLogs)
    assert(opts == Map(
      "kafka.bootstrap.servers" -> "broker:9092",
      "subscribe" -> "app_logs_raw",
      "startingOffsets" -> "latest"))
    // the aggregator consumes the alerts topic from the beginning
    assert(Sources.kafkaSourceOptions("b:9092", Topics.alerts, "earliest")("startingOffsets") == "earliest")
  }

  test("kafka sink options carry topic and checkpoint") {
    val opts = Sinks.kafkaSinkOptions("broker:9092", Topics.escalations, "/tmp/ckpt")
    assert(opts == Map(
      "kafka.bootstrap.servers" -> "broker:9092",
      "topic" -> "incident_escalations",
      "checkpointLocation" -> "/tmp/ckpt"))
  }

  test("kafka source fails fast and loudly when the connector jar is absent") {
    val e = intercept[Exception] {
      Sources.kafka(spark, "broker:9092", Topics.rawLogs)
    }
    def messages(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ messages(t.getCause)
    assert(messages(e).exists(_.toLowerCase.contains("kafka")),
      s"expected a kafka-naming data-source resolution error, got: $e")
  }
}
