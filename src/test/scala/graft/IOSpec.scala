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

  test("S6 file formats: raw logs round-trip through JSON and CSV with explicit schemas") {
    import spark.implicits._
    import graft.model.RawLog
    val logs = graft.gen.LogGenerator.logs(spark, 1767680040L, 60).as[RawLog]
    val schema = logs.schema
    val dir = java.nio.file.Files.createTempDirectory("graft_s6").toString
    logs.write.mode("overwrite").json(s"$dir/json")
    logs.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")

    val fromJson = Sources.json(spark, s"$dir/json", schema).as[RawLog].collect().toSet
    val fromCsv = Sources.csv(spark, s"$dir/csv", schema).as[RawLog].collect().toSet
    val original = logs.collect().toSet
    assert(fromJson == original, "JSON round-trip diverged")
    assert(fromCsv == original, "CSV round-trip diverged")

    logs.write.mode("overwrite").orc(s"$dir/orc")
    val fromOrc = Sources.orc(spark, s"$dir/orc", schema).as[RawLog].collect().toSet
    assert(fromOrc == original, "ORC round-trip diverged")
  }

  test("S6 streaming: jsonDir tails a directory with the explicit schema") {
    import spark.implicits._
    import graft.model.RawLog
    val logs = graft.gen.LogGenerator.logs(spark, 1767680040L, 60).as[RawLog]
    val dir = java.nio.file.Files.createTempDirectory("graft_s6s").toString
    logs.write.mode("overwrite").json(s"$dir/in")
    val sq = Sources.jsonDir(spark, s"$dir/in", logs.schema)
      .writeStream.format("memory").queryName("s6_stream").outputMode("append").start()
    try sq.processAllAvailable() finally sq.stop()
    assert(spark.table("s6_stream").count() == logs.count())
  }
}
