package graft.ops

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization (q116) — per-user session statistics
  * from the classic lag/cumulative-flag construction: a new session
  * starts when the gap since the user's previous event exceeds
  * `gapUs`. The batch counterpart of q28's native streaming
  * `session_window` (same session semantics, replayable over history),
  * and the substrate under q86's funnel and q87's retention: those ask
  * one question each about ordered user behavior; this materializes the
  * session structure they implicitly walk.
  *
  * Determinism: events order by (t, event_id) within a user (the q92
  * tie discipline — both engines see the same sequence), and every
  * output is an integer (counts, epoch-micro durations, micro-unit
  * means via exact integer division).
  *
  * Scale shape: ONE hash exchange on user_id + a per-user sort (the
  * q31/q86 ordered-traversal cost class — the sequence IS the
  * semantics); both window passes (lag, running session count) share
  * that sort, the (user, session) rollup and the per-user rollup reuse
  * the user partitioning. No corpus-wide window, no self-join.
  */
object Sessionize {

  /** (user_id, n_sessions, n_events, mean_events_micro,
    * total_active_us) over any events frame; `tMicros` is event time in
    * epoch micros. `total_active_us` sums within-session spans (a
    * 1-event session spans 0). */
  def sessionStatsOf(events: DataFrame, tMicros: Column,
                     gapUs: Long = 30L * 60 * 1000000): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
    val flagged = events
      .select(col("user_id"), col("event_id"), tMicros.cast("long").as("t"))
      .withColumn("prev_t", lag(col("t"), 1).over(w))
      .withColumn("new_s", when(
        col("prev_t").isNull || col("t") - col("prev_t") > gapUs, 1L).otherwise(0L))
      .withColumn("session", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged
      .groupBy(col("user_id"), col("session"))
      .agg(count(lit(1)).as("ev"), (max(col("t")) - min(col("t"))).as("span_us"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("ev")).as("n_events"),
        expr("sum(ev) * 1000000 div count(1)").as("mean_events_micro"),
        sum(col("span_us")).as("total_active_us"))
  }

  // ---------------------------------------------------------------- q116
  def q116(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.table(spark, sfDir, "events")
    sessionStatsOf(ev, Tables.tsMicros(ev))
  }

  private def q116Sql(gapUs: Long = 30L * 60 * 1000000): String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS t FROM events),
       |f AS (
       |  SELECT user_id, event_id, t,
       |         CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
       |                OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) > $gapUs
       |              THEN 1 ELSE 0 END AS new_s
       |  FROM e),
       |s AS (
       |  SELECT user_id, t,
       |         sum(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
       |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session
       |  FROM f),
       |g AS (
       |  SELECT user_id, session, count(*) AS ev,
       |         CAST(max(t) - min(t) AS BIGINT) AS span_us
       |  FROM s GROUP BY user_id, session)
       |SELECT user_id, count(*) AS n_sessions,
       |       CAST(sum(ev) AS BIGINT) AS n_events,
       |       CAST(sum(ev) * 1000000 // count(*) AS BIGINT) AS mean_events_micro,
       |       CAST(sum(span_us) AS BIGINT) AS total_active_us
       |FROM g GROUP BY user_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q116_session_stats", q116, Some(q116Sql()))
  )
}
