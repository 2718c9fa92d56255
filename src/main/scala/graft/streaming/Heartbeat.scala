package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Watermark-idleness mitigation (SURVEY §7.5, W4 divergence).
  *
  * Flink's `with_idleness(10s)` (reference error_rate_detector.py:134-139)
  * lets an idle source partition stop holding back the watermark. Spark has
  * no equivalent: the event-time watermark only advances when NEW rows
  * arrive, so a stream that goes silent freezes every open window forever —
  * late alerts never fire for the traffic that DID arrive.
  *
  * Mitigation: union the real stream with a low-rate synthetic heartbeat
  * stream whose event time tracks processing time. Heartbeat rows carry a
  * reserved service key, never survive a min-volume guard, and are stripped
  * by [[strip]] before anything user-visible; their only job is moving
  * `max(event_time)` forward so watermark-closed windows flush during
  * silence. One heartbeat row per tick advances the GLOBAL watermark — the
  * idle key's windows close too (Spark watermarks are per-query, not
  * per-key), so cost is O(1) rows/tick regardless of key cardinality.
  */
object Heartbeat {

  /** Reserved key — never a real service name. */
  val Service = "__heartbeat__"

  /** Rate-source heartbeats shaped like `withEventTime(RawLog)` output
    * (S1's schema + event_time), ready to union with the detector input.
    * `rowsPerSecond = 1` is plenty: the watermark only needs max event time
    * to move, not volume. */
  def stream(spark: SparkSession): DataFrame =
    spark.readStream.format("rate").option("rowsPerSecond", "1").load()
      .select(
        date_format(col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss").as("timestamp"),
        lit(Service).as("service"),
        lit("synthetic").as("host"),
        lit("INFO").as("level"),
        concat(lit("hb-"), col("value")).as("request_id"),
        lit("heartbeat").as("message"),
        lit(0).as("latency_ms"),
        col("timestamp").as("event_time"))

  /** Union real logs (already carrying `event_time`) with heartbeats. */
  def inject(logs: DataFrame, heartbeats: DataFrame): DataFrame =
    logs.unionByName(heartbeats.select(logs.columns.map(col).toSeq: _*))

  def isHeartbeat: Column = col("service") === Service

  private val notHeartbeat =
    udf((s: String) => s != Service).asNondeterministic()

  /** Drop heartbeat-keyed rows from any result keyed by `service`.
    *
    * Deliberately a NON-DETERMINISTIC predicate: a plain
    * `filter(service =!= Service)` is pushed by Catalyst through the
    * aggregation (service is a grouping key) and through the
    * EventTimeWatermark node into the union's heartbeat branch, where it
    * constant-folds the branch away — the heartbeat rows then never reach
    * the watermark tracker and the mitigation silently does nothing
    * (observed on 4.1.2). Non-deterministic predicates are never pushed, so
    * this filter runs where it is written: on the result rows, after the
    * watermark has already seen the heartbeats. Cost is one JVM call per
    * RESULT row (post-aggregation), not per input row. */
  def strip(df: DataFrame): DataFrame = df.filter(notHeartbeat(col("service")))
}
