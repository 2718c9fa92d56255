package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Source/sink builders (S2-S5). The Kafka builders mirror the reference's
  * topology (topics app_logs_raw / incident_alerts / incident_escalations)
  * and need `spark-sql-kafka-0-10` on the classpath at runtime — not present
  * in this environment, where tests drive the same pipelines through
  * MemoryStream/file sources instead (same DataFrame programs either way;
  * only the boundary format changes). */
object Topics {
  val rawLogs = "app_logs_raw"
  val alerts = "incident_alerts"
  val escalations = "incident_escalations"
}

object Sources {
  /** Exact option set handed to the kafka source — split out so the
    * connector-independent part of the contract (option names/values the
    * reference consumer uses, error_rate_detector.py:121-129) is testable
    * in an environment without `spark-sql-kafka-0-10` on the classpath. */
  def kafkaSourceOptions(brokers: String, topic: String,
                         startingOffsets: String = "latest"): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> brokers,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets)

  /** Kafka value-only stream (S3) — reference consumer shape
    * (error_rate_detector.py:121-129). */
  def kafka(spark: SparkSession, brokers: String, topic: String,
            startingOffsets: String = "latest"): DataFrame =
    spark.readStream.format("kafka")
      .options(kafkaSourceOptions(brokers, topic, startingOffsets))
      .load()

  /** File-based JSON stream with an explicit schema (no inference — SURVEY
    * §1.3: explicit schemas everywhere). */
  def jsonDir(spark: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).json(path)

  /** Batch file readers (S6), schema always explicit: at 100 TB schema
    * inference is a full extra pass over the data AND a correctness hazard
    * (a column that happens to look numeric in the sampled files flips type
    * between runs). PERMISSIVE mode keeps malformed rows as nulls — same
    * drop-don't-sentinel decision as the stream codec (SURVEY §1.5). */
  def json(spark: SparkSession, path: String,
           schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def csv(spark: SparkSession, path: String,
          schema: org.apache.spark.sql.types.StructType,
          header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  /** ORC — the other columnar format warehouses hand over; schema explicit
    * for the same reasons as [[json]] (ORC files carry one, but pinning it
    * rejects drifted files instead of silently widening the plan). */
  def orc(spark: SparkSession, path: String,
          schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}

object Sinks {
  /** Sink-side option set, connector-independent (see
    * [[Sources.kafkaSourceOptions]]). */
  def kafkaSinkOptions(brokers: String, topic: String,
                       checkpoint: String): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> brokers,
      "topic" -> topic,
      "checkpointLocation" -> checkpoint)

  /** Kafka JSON sink (S2/S4): expects `key`/`value` columns (use
    * [[Codec.encode]]); acks=all is the Kafka default for the Spark sink. */
  def kafka(df: DataFrame, brokers: String, topic: String,
            checkpoint: String): DataStreamWriter[Row] =
    df.writeStream.format("kafka")
      .options(kafkaSinkOptions(brokers, topic, checkpoint))

  def parquet(df: DataFrame, path: String, checkpoint: String): DataStreamWriter[Row] =
    df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)

  /** S5 parity: per-batch console dump when non-empty
    * (spark_incident_alerts_metrics.ipynb:149-159). */
  def console(df: DataFrame, trigger: Trigger = Trigger.ProcessingTime("2 minutes")): DataStreamWriter[Row] =
    df.writeStream.outputMode("update").trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) batch.show(truncate = false)
      }
}
