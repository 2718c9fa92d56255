package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage 3 — the notebooks' windowed incident metrics
  * (spark/spark_incident_alerts_metrics.ipynb:116-146 and the escalations
  * twin): event time = alert `window_end` cast to timestamp (P5), 2-minute
  * watermark, 1-minute tumbling window per service, metric bundle A3-A7.
  * Update output mode + 2-minute processing-time trigger belong to the
  * caller's writeStream (W6/W8); this is the pure transform. */
object MetricsJob {

  val Watermark = "2 minutes"  // ipynb:123
  val Window = "1 minute"      // ipynb:124-127

  /** `alerts` carries the superset alert schema ([[graft.model.Schemas]]).
    * `countName` = total_alerts | total_escalations (the only difference
    * between the two notebooks). */
  def metrics(alerts: DataFrame, countName: String = "total_alerts",
              watermark: String = Watermark, windowSize: String = Window): DataFrame = {
    val streaming = alerts.isStreaming
    val withTime = alerts.withColumn("event_time", col("window_end").cast("timestamp"))
    (if (streaming) withTime.withWatermark("event_time", watermark) else withTime)
      .groupBy(col("service"), window(col("event_time"), windowSize))
      .agg(
        count(lit(1)).as(countName),
        count(when(col("type") === "LATENCY_SLO_BREACH", 1)).as("latency_breaches"),
        count(when(col("type") === "ERROR_RATE_SPIKE", 1)).as("error_spikes"),
        round(avg(col("p95_latency")), 4).as("avg_p95_latency"),
        max(col("breach_count")).as("max_breach_count"),
        round(sum(when(col("severity") === "CRITICAL", 1).otherwise(0)) / count(lit(1)), 4).as("critical_ratio"))
      .select(
        col("service"),
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col(countName), col("latency_breaches"), col("error_spikes"),
        col("avg_p95_latency"), col("max_breach_count"), col("critical_ratio"))
  }
}
