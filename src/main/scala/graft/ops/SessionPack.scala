package graft.ops

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Session-trajectory packing (q131) — the composed DAG that turns an
  * event log into training-ready context windows: sessionize each user's
  * stream (q116's gap rule), price each session in tokens (q17's integer
  * pricing per event + a fixed per-event overhead, the chat-template
  * role/framing cost), then pack each user's sessions chronologically
  * into context bins with q33's continuous-fill rule (bin = where the
  * session's token span BEGINS: (cum − toks) div budget). The output is
  * the packing plan at (user, bin) grain — what an agent-trajectory
  * training job feeds its loader.
  *
  * Semantics documented: continuous fill means a session straddling a
  * boundary lands in the bin where it starts, so a bin's tokens can
  * exceed the budget (util_bp > 10000) — the loader either truncates or
  * the budget is chosen from q127's fit census so overflow is rare;
  * both engines compute the identical plan either way.
  *
  * Scale shape: ONE hash exchange on user_id with a per-user (t,
  * event_id) sort shared by the lag flag and the running session count
  * (the q116 cost class); the session rollup, the packing windows
  * (user-keyed, session grain) and the final (user, bin) rollup all
  * reuse that partitioning — no second corpus exchange, no global sort.
  */
object SessionPack {

  /** (user_id, bin, n_sessions, n_events, toks, util_bp) over any events
    * frame with (user_id, event_id, event_type) and event time. */
  def sessionPackOf(events: DataFrame, tMicros: Column,
                    gapUs: Long = 30L * 60 * 1000000,
                    budget: Long = 64L): DataFrame = {
    // bin arithmetic divides by the budget; a non-positive gap makes every
    // event its own session — both are caller bugs worth failing fast on
    require(budget > 0, s"context budget must be positive, got $budget")
    require(gapUs > 0, s"session gap must be positive, got $gapUs")
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
    val flagged = events
      .select(col("user_id"), col("event_id"), tMicros.cast("long").as("t"),
        // per-event token price: 4 framing tokens + the type name at
        // q17's (len+3) div 4 BPE-ish rate
        expr("4 + (length(event_type) + 3) div 4").as("ev_toks"))
      .withColumn("prev_t", lag(col("t"), 1).over(w))
      .withColumn("new_s", when(
        col("prev_t").isNull || col("t") - col("prev_t") > gapUs, 1L).otherwise(0L))
      .withColumn("session", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val sessions = flagged
      .groupBy(col("user_id"), col("session"))
      .agg(count(lit(1)).as("n_events"), sum(col("ev_toks")).as("toks"))
    val ws = Window.partitionBy(col("user_id")).orderBy(col("session"))
    sessions
      .withColumn("cum", sum(col("toks")).over(
        ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("bin", expr(s"(cum - toks) div $budget"))
      .groupBy(col("user_id"), col("bin"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"),
        sum(col("toks")).as("toks"))
      .withColumn("util_bp", expr(s"toks * 10000 div $budget"))
  }

  // ---------------------------------------------------------------- q131
  def q131(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.table(spark, sfDir, "events")
    sessionPackOf(ev, Tables.tsMicros(ev))
  }

  private def q131Sql(gapUs: Long = 30L * 60 * 1000000,
                      budget: Long = 64L): String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS t,
       |         4 + (length(event_type) + 3) // 4 AS ev_toks
       |  FROM events),
       |f AS (
       |  SELECT user_id, event_id, t, ev_toks,
       |         CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
       |                OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) > $gapUs
       |              THEN 1 ELSE 0 END AS new_s
       |  FROM e),
       |s AS (
       |  SELECT user_id, t, ev_toks,
       |         sum(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
       |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session
       |  FROM f),
       |g AS (
       |  SELECT user_id, session, count(*) AS n_events,
       |         CAST(sum(ev_toks) AS BIGINT) AS toks
       |  FROM s GROUP BY user_id, session),
       |p AS (
       |  SELECT user_id, session, n_events, toks,
       |         sum(toks) OVER (PARTITION BY user_id ORDER BY session
       |                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM g)
       |SELECT user_id, CAST((cum - toks) // $budget AS BIGINT) AS bin,
       |       count(*) AS n_sessions,
       |       CAST(sum(n_events) AS BIGINT) AS n_events,
       |       CAST(sum(toks) AS BIGINT) AS toks,
       |       CAST(sum(toks) * 10000 // $budget AS BIGINT) AS util_bp
       |FROM p GROUP BY user_id, (cum - toks) // $budget""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q131_session_pack", q131, Some(q131Sql()))
  )
}
