package graft.ops

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** User churn / retention set algebra (q122) — per event type, the
  * INTERSECT/EXCEPT question ("who was active in the first half of the
  * window but vanished in the second?") computed the scale-first way:
  * instead of two distinct sets and EXCEPT/INTERSECT operators (each a
  * shuffle of user ids per operator per type), the corpus compresses
  * ONCE to the (type, user) grain carrying two presence flags (max of
  * conditionals — one pass), and churned/retained/new are conditional
  * counts over that frame. Catalyst rewrites EXCEPT to an anti-join
  * anyway; this formulation gets the same answer with ONE exchange and
  * no join at all, and is how the engine covers the set-operation class
  * SURVEY §2.6 notes the reference lacks.
  *
  * The split point is the midpoint of the observed time range (1-row
  * min/max census, integer micros — deterministic in both engines);
  * a real deployment passes its own boundary.
  *
  * Scale shape: one (type, user) aggregation with map-side partials
  * (presence flags fold in the same pass), then a |types|-row rollup.
  * All integer.
  */
object Churn {

  /** (event_type, n_early, n_late, churned, retained, new_users) over
    * any events frame; `tMicros` is event time in epoch micros. */
  def churnOf(events: DataFrame, tMicros: org.apache.spark.sql.Column): DataFrame = {
    val keyed = events.select(col("event_type"), col("user_id"),
      tMicros.cast("long").as("t"))
    val mm = keyed.agg(min(col("t")).as("mn"), max(col("t")).as("mx"))
    keyed.crossJoin(broadcast(mm))
      .withColumn("early", col("t") < expr("(mn + mx + 1) div 2"))
      .groupBy(col("event_type"), col("user_id"))
      .agg(max(when(col("early"), 1).otherwise(0)).as("e"),
        max(when(!col("early"), 1).otherwise(0)).as("l"))
      .groupBy(col("event_type"))
      .agg(sum(col("e")).cast("long").as("n_early"),
        sum(col("l")).cast("long").as("n_late"),
        count(when(col("e") === 1 && col("l") === 0, 1)).as("churned"),
        count(when(col("e") === 1 && col("l") === 1, 1)).as("retained"),
        count(when(col("e") === 0 && col("l") === 1, 1)).as("new_users"))
  }

  // ---------------------------------------------------------------- q122
  def q122(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.table(spark, sfDir, "events")
    churnOf(ev, Tables.tsMicros(ev))
  }

  private val q122Sql =
    """WITH k AS (SELECT event_type, user_id, epoch_us(ts) AS t FROM events),
      |mm AS (SELECT min(t) AS mn, max(t) AS mx FROM k),
      |f AS (SELECT event_type, user_id,
      |             max(CASE WHEN t < (mn + mx + 1) // 2 THEN 1 ELSE 0 END) AS e,
      |             max(CASE WHEN t >= (mn + mx + 1) // 2 THEN 1 ELSE 0 END) AS l
      |      FROM k CROSS JOIN mm GROUP BY event_type, user_id)
      |SELECT event_type,
      |       CAST(sum(e) AS BIGINT) AS n_early,
      |       CAST(sum(l) AS BIGINT) AS n_late,
      |       CAST(count(CASE WHEN e = 1 AND l = 0 THEN 1 END) AS BIGINT) AS churned,
      |       CAST(count(CASE WHEN e = 1 AND l = 1 THEN 1 END) AS BIGINT) AS retained,
      |       CAST(count(CASE WHEN e = 0 AND l = 1 THEN 1 END) AS BIGINT) AS new_users
      |FROM f GROUP BY event_type""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q122_churn_sets", q122, Some(q122Sql))
  )
}
