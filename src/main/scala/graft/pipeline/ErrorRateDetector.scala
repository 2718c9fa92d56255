package graft.pipeline

import graft.io.Codec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage 1a — sliding-window error-rate spike detector
  * (flink/error_rate_detector.py re-expressed Spark-first).
  *
  * One declarative program serves batch AND streaming: the caller passes a
  * static or streaming DataFrame of raw logs; Catalyst plans the same
  * partial+final hash aggregation either way, with
  * `EventTimeWatermark`/`StateStoreSave` inserted only in streaming mode.
  *
  * Scale posture: the groupBy key is (service, window) — windows make the
  * key high-cardinality, so the 4-value `service` key from the reference
  * does not hot-spot the exchange; map-side partial aggregation means the
  * shuffle carries (key → {total, errors}) accumulators, not events —
  * exactly the reference's incremental `ErrorRateAgg` intent
  * (error_rate_detector.py:40-68), but picked automatically by Catalyst.
  */
object ErrorRateDetector {

  val WindowSize = "20 seconds"   // error_rate_detector.py:163
  val Slide = "10 seconds"
  val Watermark = "5 seconds"     // error_rate_detector.py:136-138
  val MinVolume = 100L            // error_rate_detector.py:89
  val Threshold = 0.02            // error_rate_detector.py:93

  /** ISO-8601 string → event_time (P6). Malformed rows get NULL and fall
    * out of event-time windows (SURVEY §1.5 decision: drop, don't
    * epoch-0-sentinel like the reference's :25-37). */
  def withEventTime(logs: DataFrame): DataFrame =
    logs.withColumn("event_time", to_timestamp(col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss"))

  /** Detect spikes. `logs` must carry (service, level, event_time). */
  def detect(logs: DataFrame,
             windowSize: String = WindowSize, slide: String = Slide,
             watermark: String = Watermark,
             minVolume: Long = MinVolume, threshold: Double = Threshold): DataFrame = {
    val streaming = logs.isStreaming
    val windowed = (if (streaming) logs.withWatermark("event_time", watermark) else logs)
      .groupBy(col("service"), window(col("event_time"), windowSize, slide))
      .agg(
        count(lit(1)).as("total_logs"),
        count(when(col("level") === "ERROR", 1)).as("errors"))
      .withColumn("error_rate", round(col("errors") / col("total_logs"), 4))
      .filter(col("total_logs") >= minVolume && col("error_rate") >= threshold)
    windowed.select(
      Codec.incidentId(col("service"), unix_timestamp(col("window.start")), lit("ERS")).as("incident_id"),
      col("service"),
      lit("ERROR_RATE_SPIKE").as("type"),
      lit("HIGH").as("severity"),
      lit(null).cast("int").as("p95_latency"),
      lit(null).cast("int").as("breach_count"),
      unix_timestamp(col("window.start")).as("window_start"),
      unix_timestamp(col("window.end")).as("window_end"),
      col("error_rate"),
      col("total_logs"))
  }

  /** Full stage: raw JSON `value` stream → alert rows (P1 → W1/A1 → P7/P8). */
  def fromRawJson(raw: DataFrame): DataFrame =
    detect(withEventTime(Codec.decodeRawLogs(raw)))
}
