package graft.ops

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cohort retention (q87) — users grouped by first-active day, counted
  * on every later active day: the (cohort_day, age_days, n_users)
  * retention matrix behind "day-N retention" product analytics. Events-
  * side coverage beyond the reference's operational monitors.
  *
  * Shape: activity first compresses to the DISTINCT (user, day) grain
  * (one exchange on user_id — day count per user is bounded by the
  * calendar, so this is the corpus' last big table); the per-user
  * first-day aggregate REUSES that partitioning (groupBy user over the
  * same key — no second corpus exchange), the cohort attach is a
  * co-partitioned self-join on user_id, and the final matrix aggregate
  * is calendar² rows. Day arithmetic is integer (epoch-µs div 86400e6 —
  * floor semantics identical on both engines).
  */
object Cohort {

  private val DayUs = 86400000000L

  /** (cohort_day, age_days, n_users), cohort_day = epoch-day of the
    * user's first event. */
  def cohortRetentionOf(events: DataFrame, tUs: org.apache.spark.sql.Column): DataFrame = {
    val activity = events
      .select(col("user_id"), tUs.as("tus"))
      .select(col("user_id"), expr(s"tus div $DayUs").as("day"))
      .distinct()
    val firstDay = activity.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    activity.join(firstDay, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("age_days"))
      .agg(count(lit(1)).as("n_users"))
  }

  // ---------------------------------------------------------------- q87
  def q87(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.table(spark, sfDir, "events")
    cohortRetentionOf(ev, Tables.tsMicros(ev))
  }

  private val q87Sql =
    s"""WITH a AS (
       |  SELECT DISTINCT user_id, epoch_us(ts) // $DayUs AS day FROM events),
       |f AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY user_id)
       |SELECT f.cohort_day, a.day - f.cohort_day AS age_days,
       |       CAST(count(*) AS BIGINT) AS n_users
       |FROM a JOIN f USING (user_id)
       |GROUP BY 1, 2""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q87_cohort_retention", q87, Some(q87Sql))
  )
}
