package graft.ops

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral transition matrix (q92) — per-user event-type Markov
  * transitions: for every consecutive event pair in a user's timeline,
  * count (from → to) and each edge's share of its origin's outgoing
  * mass. The session-behavior counterpart of q86's single-edge funnel:
  * the funnel asks one ordered question, this summarizes ALL of them at
  * once (where do users go after a click? what precedes churn-y error
  * views?).
  *
  * Shape: one hash exchange on user_id + per-user sort feeding a lag()
  * window (the q31/q86 cost class — the per-user ordered pass IS the
  * semantics), then a |types|²-bounded aggregation with map-side
  * partials. Ordering ties break by (t, event_id) so the lag is
  * deterministic on both engines; shares are integer basis points.
  */
object Transitions {

  /** (from_type, to_type, n, share_bp) over consecutive same-user event
    * pairs; share_bp = n's basis points of from_type's outgoing total. */
  def transitionsOf(events: DataFrame, tUs: org.apache.spark.sql.Column): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
    val edges = events
      .select(col("user_id"), col("event_id"), col("event_type").as("to_type"), tUs.as("t"))
      .withColumn("from_type", lag(col("to_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val wFrom = Window.partitionBy(col("from_type"))
    // outgoing totals live on the |types|^2-row edge table — window there
    edges
      .withColumn("from_total", sum(col("n")).over(wFrom))
      .selectExpr("from_type", "to_type", "n",
        "(n * 10000) div from_total AS share_bp")
  }

  // ---------------------------------------------------------------- q92
  def q92(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.table(spark, sfDir, "events")
    transitionsOf(ev, Tables.tsMicros(ev))
  }

  private val q92Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type AS to_type, epoch_us(ts) AS t
      |  FROM events),
      |l AS (
      |  SELECT user_id, to_type,
      |         lag(to_type, 1) OVER (PARTITION BY user_id ORDER BY t, event_id) AS from_type
      |  FROM e),
      |g AS (
      |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      |  FROM l WHERE from_type IS NOT NULL
      |  GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |       CAST((n * 10000) // sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS share_bp
      |FROM g""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q92_event_transitions", q92, Some(q92Sql))
  )
}
