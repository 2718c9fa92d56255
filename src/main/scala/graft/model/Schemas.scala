package graft.model

import org.apache.spark.sql.types._

/** Data model of the rebuilt engine — SURVEY.md §1 / FIXTURES.md §A.
  *
  * One superset alert schema covers both alert shapes (the reference's own
  * Spark notebooks do the same: spark_incident_alerts_metrics.ipynb:63-72),
  * with proper JSON numeric types end-to-end (SURVEY §1.5 decision — the
  * reference's stringified spike-alert numerics parse to NULL under
  * `from_json` and are treated as a negative test case, not as semantics).
  */
object Schemas {

  /** Raw log event — kafka/log_producer.py:66-74. */
  val rawLog: StructType = StructType(Seq(
    StructField("timestamp", StringType),   // ISO-8601 seconds, UTC, no zone
    StructField("service", StringType),
    StructField("host", StringType),
    StructField("level", StringType),       // ERROR | INFO
    StructField("request_id", StringType),
    StructField("message", StringType),
    StructField("latency_ms", IntegerType)
  ))

  /** Superset of the two alert shapes written to `incident_alerts`
    * (error_rate_detector.py:94-103 ∪ latency_slo_monitor.py:94-103),
    * plus the two fields the reference notebooks silently drop. */
  val incidentAlert: StructType = StructType(Seq(
    StructField("incident_id", StringType),
    StructField("service", StringType),
    StructField("type", StringType),        // ERROR_RATE_SPIKE | LATENCY_SLO_BREACH
    StructField("severity", StringType),    // HIGH | CRITICAL | ESCALATED
    StructField("p95_latency", IntegerType, nullable = true),
    StructField("breach_count", IntegerType, nullable = true),
    StructField("window_start", LongType),  // epoch seconds
    StructField("window_end", LongType),
    StructField("error_rate", DoubleType, nullable = true),
    StructField("total_logs", LongType, nullable = true)
  ))

  /** `incident_escalations` = alert + escalation_reason
    * (incident_aggregator.py:55-66). */
  val escalation: StructType =
    incidentAlert.add(StructField("escalation_reason", StringType, nullable = true))
}

/** Typed rows for the stateful operators (Dataset[T] with product encoders). */
final case class RawLog(
    timestamp: String, service: String, host: String, level: String,
    request_id: String, message: String, latency_ms: Int)

final case class IncidentAlert(
    incident_id: String, service: String, `type`: String, severity: String,
    p95_latency: Option[Int], breach_count: Option[Int],
    window_start: Long, window_end: Long,
    error_rate: Option[Double], total_logs: Option[Long])

final case class EscalationEvent(
    incident_id: String, service: String, `type`: String, severity: String,
    p95_latency: Option[Int], breach_count: Option[Int],
    window_start: Long, window_end: Long,
    error_rate: Option[Double], total_logs: Option[Long],
    escalation_reason: Option[String])

/** Per-window p95 result fed to the consecutive-breach detector (ST1) —
  * the shape emitted by latency_slo_monitor.py:55-59. */
final case class P95Window(service: String, window_start: Long, window_end: Long, p95: Double)
