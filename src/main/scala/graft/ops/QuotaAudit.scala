package graft.ops

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Rate-quota throttle audit (q137) — simulate a per-user-per-minute
  * event quota over history and report what it would have dropped: per
  * feed, the burst minutes over quota, the events lost, and the worst
  * single-minute burst. The capacity-planning read on the reference's
  * alerting theme: before deploying a rate limiter (or sizing the
  * `maxOffsetsPerTrigger` equivalent), replay the quota against real
  * traffic and SEE the clip rate — a quota that silently drops 8% of a
  * feed's events is a data-loss incident configured on purpose.
  *
  * Scale shape: ONE exchange to the (type, user, minute) grain with
  * map-side partials (the burst grain — bounded by active user-minutes,
  * far below raw events); everything after is arithmetic on that grain
  * plus a |types|-row rollup. No windows, no joins, no sorts.
  */
object QuotaAudit {

  /** (event_type, n_user_minutes, n_over_quota, n_events, n_dropped,
    * dropped_bp, max_burst) for quota `perMinute`. */
  def quotaAuditOf(events: DataFrame, tMicros: Column, perMinute: Long = 5L): DataFrame =
    events
      .select(col("event_type"), col("user_id"), tMicros.cast("long").as("t"))
      .select(col("event_type"), col("user_id"), expr("t div 60000000").as("minute"))
      .groupBy(col("event_type"), col("user_id"), col("minute"))
      .agg(count(lit(1)).as("burst"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_user_minutes"),
        count(when(col("burst") > perMinute, 1)).as("n_over_quota"),
        sum(col("burst")).as("n_events"),
        sum(greatest(col("burst") - perMinute, lit(0L))).as("n_dropped"),
        max(col("burst")).as("max_burst"))
      .select(col("event_type"), col("n_user_minutes"), col("n_over_quota"),
        col("n_events"), col("n_dropped"),
        expr("n_dropped * 10000 div n_events").as("dropped_bp"),
        col("max_burst"))

  // ---------------------------------------------------------------- q137
  def q137(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.table(spark, sfDir, "events")
    quotaAuditOf(ev, Tables.tsMicros(ev))
  }

  private def q137Sql(perMinute: Long = 5L): String =
    s"""WITH m AS (
       |  SELECT event_type, user_id,
       |         CAST(epoch_us(ts) // 60000000 AS BIGINT) AS minute
       |  FROM events),
       |b AS (
       |  SELECT event_type, user_id, minute, count(*) AS burst
       |  FROM m GROUP BY 1, 2, 3)
       |SELECT event_type,
       |       count(*) AS n_user_minutes,
       |       CAST(count(CASE WHEN burst > $perMinute THEN 1 END) AS BIGINT) AS n_over_quota,
       |       CAST(sum(burst) AS BIGINT) AS n_events,
       |       CAST(sum(greatest(burst - $perMinute, 0)) AS BIGINT) AS n_dropped,
       |       CAST(sum(greatest(burst - $perMinute, 0)) * 10000 // sum(burst) AS BIGINT) AS dropped_bp,
       |       CAST(max(burst) AS BIGINT) AS max_burst
       |FROM b GROUP BY event_type""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q137_quota_audit", q137, Some(q137Sql()))
  )
}
