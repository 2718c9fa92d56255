package graft.ops

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Quasi-identifier k-anonymity census (q132) — the privacy audit on the
  * event log: bucket events into quasi-identifier tuples
  * (event_type, hour, value-bucket), count distinct users per tuple, and
  * report per feed how many users sit in groups smaller than k — the
  * users a release of this "anonymized" grain would re-identify. The
  * companion to q49's direct-PII scrub: PII redaction removes the name,
  * this measures whether the remaining shape still points at one person.
  *
  * A user is AT RISK for a feed if ANY of their QI groups there has
  * fewer than k distinct users (the standard k-anonymity violation
  * rule). All counts are exact distinct counts computed by two-level
  * aggregation — no countDistinct Expand, no approximation.
  *
  * Scale shape: ONE distinct pass to the (QI, user) grain; the group
  * census derives from it CO-KEYED (the group size attach reuses the QI
  * partitioning — no extra exchange); the per-user risk flag is one
  * (type, user) exchange; the final rollup is a |types|-row census.
  */
object KAnonymity {

  /** (event_type, n_groups, n_users, n_risky_groups, n_risky_users,
    * risky_bp) for anonymity threshold `k`. */
  def kAnonymityOf(events: DataFrame, tMicros: Column, k: Int = 5,
                   valueBucket: Double = 50.0): DataFrame = {
    val qi = events
      .select(col("event_type"), col("user_id"), tMicros.cast("long").as("t"),
        col("value"))
      // integer division, not `/`: double division + cast truncates in
      // Spark but ROUNDS in DuckDB — div agrees everywhere
      .select(col("event_type"), col("user_id"),
        expr("t div 3600000000").as("hour"),
        floor(col("value") / valueBucket).cast("long").as("vb"))
      .distinct()
    val groups = qi
      .groupBy(col("event_type"), col("hour"), col("vb"))
      .agg(count(lit(1)).as("g_users"))
    val flagged = qi.join(groups, Seq("event_type", "hour", "vb"))
      .groupBy(col("event_type"), col("user_id"))
      .agg(max((col("g_users") < k).cast("long")).as("risky"))
    val userSide = flagged.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"), sum(col("risky")).as("n_risky_users"))
    val groupSide = groups.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_groups"),
        count(when(col("g_users") < k, 1)).as("n_risky_groups"))
    groupSide.join(userSide, "event_type")
      .select(col("event_type"), col("n_groups"), col("n_users"),
        col("n_risky_groups"), col("n_risky_users"),
        expr("n_risky_users * 10000 div n_users").as("risky_bp"))
  }

  // ---------------------------------------------------------------- q132
  def q132(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.table(spark, sfDir, "events")
    kAnonymityOf(ev, Tables.tsMicros(ev))
  }

  private def q132Sql(k: Int = 5, valueBucket: Double = 50.0): String =
    s"""WITH qi AS (
       |  SELECT DISTINCT event_type, user_id,
       |         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour,
       |         CAST(floor(value / $valueBucket) AS BIGINT) AS vb
       |  FROM events),
       |g AS (
       |  SELECT event_type, hour, vb, count(*) AS g_users
       |  FROM qi GROUP BY 1, 2, 3),
       |f AS (
       |  SELECT qi.event_type, qi.user_id,
       |         max(CASE WHEN g.g_users < $k THEN 1 ELSE 0 END) AS risky
       |  FROM qi JOIN g USING (event_type, hour, vb)
       |  GROUP BY 1, 2),
       |us AS (
       |  SELECT event_type, count(*) AS n_users,
       |         CAST(sum(risky) AS BIGINT) AS n_risky_users
       |  FROM f GROUP BY 1),
       |gs AS (
       |  SELECT event_type, count(*) AS n_groups,
       |         CAST(count(CASE WHEN g_users < $k THEN 1 END) AS BIGINT) AS n_risky_groups
       |  FROM g GROUP BY 1)
       |SELECT event_type, n_groups, n_users, n_risky_groups, n_risky_users,
       |       CAST(n_risky_users * 10000 // n_users AS BIGINT) AS risky_bp
       |FROM gs JOIN us USING (event_type)""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q132_k_anonymity", q132, Some(q132Sql()))
  )
}
