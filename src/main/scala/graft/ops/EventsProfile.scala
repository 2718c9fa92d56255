package graft.ops

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-service events profile (q91) — the numeric dataset card for the
  * events table, q72's counterpart on the operational side: row counts,
  * null rate, value range and mean, active time span, and exact distinct
  * users per service. The first query an on-call engineer or a data
  * contract check runs against a new feed.
  *
  * Engine-exactness: the mean is an integer micro-unit sum (per-row
  * round(value·1e6) → order-free int64), floor-truncated to 4 dp;
  * min/max carry values through unchanged (no arithmetic to diverge);
  * the null rate is integer basis points. Exact distinct users via a
  * (service, user) pre-aggregation — no countDistinct Expand, and the
  * second aggregate reuses nothing corpus-sized.
  *
  * Shape: two corpus aggregations (stats by service; distinct by
  * (service, user) then service) and a |services|-row join. At 100 TB
  * both exchanges carry map-side-combined partials; nothing collects.
  */
object EventsProfile {

  def eventsProfileOf(events: DataFrame, tUs: org.apache.spark.sql.Column): DataFrame = {
    val base = events.select(
      col("event_type").as("service"), col("value"), col("user_id"), tUs.as("t"),
      expr("CASE WHEN value IS NULL THEN NULL ELSE CAST(round(value * 1e6) AS BIGINT) END")
        .as("vmicro"))
    val stats = base.groupBy(col("service")).agg(
      count(lit(1)).as("n_events"),
      coalesce(sum(when(col("value").isNull, 1L).otherwise(0L)), lit(0L)).as("n_null"),
      coalesce(sum(col("vmicro")), lit(0L)).as("vsum"),
      min(col("value")).as("v_min"),
      max(col("value")).as("v_max"),
      (max(col("t")) - min(col("t"))).as("t_span_us"))
    val users = base.groupBy(col("service"), col("user_id")).agg(count(lit(1)).as("c"))
      .groupBy(col("service")).agg(count(lit(1)).as("n_users"))
    stats.join(users, "service")
      .selectExpr("service", "n_events",
        "CASE WHEN n_events = 0 THEN 0 ELSE (n_null * 10000) div n_events END AS null_bp",
        "v_min", "v_max",
        "CASE WHEN n_events = n_null THEN CAST(NULL AS DOUBLE) " +
          "ELSE floor(vsum / ((n_events - n_null) * 1e2)) / 1e4 END AS v_mean",
        "t_span_us", "n_users")
  }

  // ---------------------------------------------------------------- q91
  def q91(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.table(spark, sfDir, "events")
    eventsProfileOf(ev, Tables.tsMicros(ev))
  }

  private val q91Sql =
    """WITH b AS (
      |  SELECT event_type AS service, value, user_id, epoch_us(ts) AS t,
      |         CASE WHEN value IS NULL THEN NULL
      |              ELSE CAST(round(value * 1e6) AS BIGINT) END AS vmicro
      |  FROM events),
      |s AS (
      |  SELECT service,
      |         CAST(count(*) AS BIGINT) AS n_events,
      |         CAST(coalesce(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_null,
      |         CAST(coalesce(sum(vmicro), 0) AS BIGINT) AS vsum,
      |         min(value) AS v_min, max(value) AS v_max,
      |         CAST(max(t) - min(t) AS BIGINT) AS t_span_us
      |  FROM b GROUP BY service),
      |u AS (
      |  SELECT service, CAST(count(*) AS BIGINT) AS n_users
      |  FROM (SELECT DISTINCT service, user_id FROM b) GROUP BY service)
      |SELECT service, n_events,
      |       CASE WHEN n_events = 0 THEN 0 ELSE (n_null * 10000) // n_events END AS null_bp,
      |       v_min, v_max,
      |       CASE WHEN n_events = n_null THEN CAST(NULL AS DOUBLE)
      |            ELSE floor(vsum / ((n_events - n_null) * 1e2)) / 1e4 END AS v_mean,
      |       t_span_us, n_users
      |FROM s JOIN u USING (service)""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q91_events_profile", q91, Some(q91Sql))
  )
}
