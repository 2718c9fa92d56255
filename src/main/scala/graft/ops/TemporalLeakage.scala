package graft.ops

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Temporal split leakage audit (q136) — when history is split at a time
  * boundary into train/eval (the standard recommender/forecasting
  * protocol), how much of the eval side is users the model already saw?
  * Per feed: eval users, eval users seen in train, their event mass, and
  * the leakage share. Complements q48 (cluster-aware DOCUMENT splits)
  * and q126 (semantic leakage): this is the ENTITY-level leakage a
  * time-boundary split quietly allows — fine for personalization, fatal
  * for cold-start claims; either way it should be a measured number,
  * not an assumption.
  *
  * The boundary is a PARAMETER (epoch micros). The registered query uses
  * the fixture's observed midpoint hour so every SF exercises both
  * sides; production passes its own cutoff.
  *
  * Scale shape: ONE distinct pass to the (type, user, side) grain
  * (events compress before anything joins); per-(type, user) the two
  * side flags fold in the same pass (max of each); the rollup is a
  * |types|-row census. Event mass attaches from a second aggregation of
  * the raw grain, co-keyed. No corpus sort, no self-join.
  */
object TemporalLeakage {

  /** (event_type, n_eval_users, n_seen_users, seen_bp, n_eval_events,
    * n_leaked_events, leaked_bp) for split boundary `cutUs`. */
  def temporalLeakageOf(events: DataFrame, tMicros: Column, cutUs: Long): DataFrame = {
    val tagged = events
      .select(col("event_type"), col("user_id"),
        (tMicros.cast("long") >= cutUs).cast("long").as("is_eval"))
    val perUser = tagged
      .groupBy(col("event_type"), col("user_id"))
      .agg(max(col("is_eval")).as("has_eval"),
        max(lit(1L) - col("is_eval")).as("has_train"),
        sum(col("is_eval")).as("eval_events"))
      .filter(col("has_eval") === 1L)
    perUser
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_eval_users"),
        sum(col("has_train")).as("n_seen_users"),
        sum(col("eval_events")).as("n_eval_events"),
        sum(col("eval_events") * col("has_train")).as("n_leaked_events"))
      .select(col("event_type"), col("n_eval_users"), col("n_seen_users"),
        expr("n_seen_users * 10000 div n_eval_users").as("seen_bp"),
        col("n_eval_events"), col("n_leaked_events"),
        expr("n_leaked_events * 10000 div n_eval_events").as("leaked_bp"))
  }

  // ---------------------------------------------------------------- q136
  // fixture cutoff: the midpoint of the event range (2024-01-01 →
  // 2024-01-30 at every SF — the generator spans a fixed window, so this
  // lands mid-corpus): 2024-01-16 00:00 UTC
  private val CutUs = 1705363200000000L

  def q136(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.table(spark, sfDir, "events")
    temporalLeakageOf(ev, Tables.tsMicros(ev), CutUs)
  }

  private def q136Sql(cutUs: Long = CutUs): String =
    s"""WITH t AS (
       |  SELECT event_type, user_id,
       |         CASE WHEN epoch_us(ts) >= $cutUs THEN 1 ELSE 0 END AS is_eval
       |  FROM events),
       |u AS (
       |  SELECT event_type, user_id,
       |         max(is_eval) AS has_eval, max(1 - is_eval) AS has_train,
       |         CAST(sum(is_eval) AS BIGINT) AS eval_events
       |  FROM t GROUP BY 1, 2),
       |e AS (SELECT * FROM u WHERE has_eval = 1)
       |SELECT event_type,
       |       count(*) AS n_eval_users,
       |       CAST(sum(has_train) AS BIGINT) AS n_seen_users,
       |       CAST(sum(has_train) * 10000 // count(*) AS BIGINT) AS seen_bp,
       |       CAST(sum(eval_events) AS BIGINT) AS n_eval_events,
       |       CAST(sum(eval_events * has_train) AS BIGINT) AS n_leaked_events,
       |       CAST(sum(eval_events * has_train) * 10000 // sum(eval_events) AS BIGINT) AS leaked_bp
       |FROM e GROUP BY event_type""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q136_temporal_leakage", q136, Some(q136Sql()))
  )
}
