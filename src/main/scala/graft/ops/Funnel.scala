package graft.ops

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered conversion funnel (q86) — for every click, the NEXT purchase
  * by the same user within the attribution gap, and the funnel rollup
  * (clicks, conversions, conversion bp, time-to-convert stats). The
  * ORDERED counterpart of q32's range join: q32 enumerates every
  * (click, purchase-window) containment pair regardless of order and
  * multiplicity; the funnel asks the sequential question — "did a
  * purchase FOLLOW this click, and how fast" — which is what
  * MATCH_RECOGNIZE / funnel analytics compute and Spark has no native
  * operator for.
  *
  * Spark-first formulation: ONE window pass per user —
  * `min(CASE WHEN purchase THEN t END) OVER (PARTITION BY user ORDER BY
  * t RANGE BETWEEN 1 AND gap FOLLOWING)` attaches each click's next
  * purchase timestamp in-frame; no self-join, no per-user collect. Cost
  * = one hash exchange on user_id + a per-user sort (the same shape as
  * the as-of join q31); the rollup is a single global aggregate. Range
  * frames on integer micros keep the gap arithmetic exact; all output
  * measures are integer (basis points / integer-µs averages via div).
  */
object Funnel {

  private val GapUs = 600000000L // 10 minutes

  /** One-row funnel rollup over an events frame carrying
    * (user_id, event_type, ts). */
  def funnelOf(events: DataFrame, tUs: org.apache.spark.sql.Column,
               gapUs: Long = GapUs): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"))
      .rangeBetween(1L, gapUs)
    events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_type"), tUs.as("t"))
      .withColumn("next_purchase",
        min(when(col("event_type") === "purchase", col("t"))).over(w))
      .filter(col("event_type") === "click")
      .agg(
        count(lit(1)).as("n_clicks"),
        coalesce(sum(when(col("next_purchase").isNotNull, 1L).otherwise(0L)), lit(0L))
          .as("n_converted"),
        coalesce(sum(when(col("next_purchase").isNotNull,
          col("next_purchase") - col("t")).otherwise(0L)), lit(0L)).as("gap_sum"),
        min(col("next_purchase") - col("t")).as("min_gap_us"),
        max(col("next_purchase") - col("t")).as("max_gap_us"))
      .selectExpr("n_clicks", "n_converted",
        "CASE WHEN n_clicks = 0 THEN 0 ELSE (n_converted * 10000) div n_clicks END AS conversion_bp",
        "CASE WHEN n_converted = 0 THEN 0 ELSE gap_sum div n_converted END AS avg_gap_us",
        "min_gap_us", "max_gap_us")
  }

  // ---------------------------------------------------------------- q86
  def q86(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.table(spark, sfDir, "events")
    funnelOf(ev, Tables.tsMicros(ev))
  }

  private val q86Sql =
    s"""WITH e AS (
       |  SELECT user_id, event_type, epoch_us(ts) AS t
       |  FROM events WHERE event_type IN ('click', 'purchase')),
       |n AS (
       |  SELECT user_id, event_type, t,
       |         min(CASE WHEN event_type = 'purchase' THEN t END)
       |           OVER (PARTITION BY user_id ORDER BY t
       |                 RANGE BETWEEN 1 FOLLOWING AND $GapUs FOLLOWING) AS next_purchase
       |  FROM e),
       |c AS (SELECT * FROM n WHERE event_type = 'click'),
       |a AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_clicks,
       |         CAST(count(next_purchase) AS BIGINT) AS n_converted,
       |         CAST(coalesce(sum(next_purchase - t), 0) AS BIGINT) AS gap_sum,
       |         CAST(min(next_purchase - t) AS BIGINT) AS min_gap_us,
       |         CAST(max(next_purchase - t) AS BIGINT) AS max_gap_us
       |  FROM c)
       |SELECT n_clicks, n_converted,
       |       CASE WHEN n_clicks = 0 THEN 0
       |            ELSE (n_converted * 10000) // n_clicks END AS conversion_bp,
       |       CASE WHEN n_converted = 0 THEN 0
       |            ELSE gap_sum // n_converted END AS avg_gap_us,
       |       min_gap_us, max_gap_us
       |FROM a""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q86_conversion_funnel", q86, Some(q86Sql))
  )
}
