package graft.ops

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-posture operators (SURVEY §7.6). The reference keys everything by
  * `service` — 4 distinct values — which hot-spots a shuffle at 100 TB. These
  * operators are the mitigations, kept oracle-exact where the math allows.
  */
object ScaleOps {

  /** Two-phase salted aggregation for skewed/low-cardinality keys: phase 1
    * aggregates on (key, salt) spreading each hot key over `salts`
    * partitions; phase 2 merges the per-salt partials. Only algebraic
    * aggregates (count/sum/min/max) re-compose — the output is exactly the
    * plain groupBy result (the oracle checks that), the shuffle profile is
    * not: the widest exchange carries key×salts evenly instead of 4 hot
    * partitions.
    *
    * Salt is hash-derived from a high-cardinality column (not rand()) so
    * replays/retries are deterministic. */
  def saltedStats(logs: DataFrame, salts: Int, saltFrom: String = "event_id"): DataFrame =
    logs
      .withColumn("_salt", pmod(hash(col(saltFrom)), lit(salts)))
      .groupBy(col("service"), col("_salt"))
      .agg(
        count(lit(1)).as("c"),
        count(when(col("level") === "ERROR", 1)).as("e"),
        sum(col("latency_ms").cast("decimal(18,6)")).as("l"),
        max(col("latency_ms")).as("mx"),
        min(col("latency_ms")).as("mn"))
      .groupBy(col("service"))
      .agg(
        sum(col("c")).as("total_logs"),
        sum(col("e")).as("errors"),
        round(sum(col("e")) / sum(col("c")), 4).as("error_rate"),
        round((sum(col("l")) / sum(col("c")).cast("decimal(18,6)")).cast("double"), 4).as("avg_latency"),
        max(col("mx")).as("max_latency"),
        min(col("mn")).as("min_latency"))

  // ---------------------------------------------------------------- q23
  def q23(spark: SparkSession, sfDir: String): DataFrame =
    saltedStats(Tables.logs(spark, sfDir), salts = 32)

  private val q23Sql =
    s"""WITH ${Tables.LOGS_CTE}
       |SELECT service, count(*) AS total_logs,
       |       count(CASE WHEN level = 'ERROR' THEN 1 END) AS errors,
       |       round(count(CASE WHEN level = 'ERROR' THEN 1 END) / count(*), 4) AS error_rate,
       |       round(CAST(sum(CAST(latency_ms AS DECIMAL(18,6))) / CAST(count(*) AS DECIMAL(18,6)) AS DOUBLE), 4) AS avg_latency,
       |       max(latency_ms) AS max_latency,
       |       min(latency_ms) AS min_latency
       |FROM logs GROUP BY service""".stripMargin

  // ---------------------------------------------------------------- q24
  /** Approximate p95 — the declared 100 TB path for A2 (SURVEY §7.5): a
    * mergeable quantile sketch (`percentile_approx`, O(accuracy) memory per
    * group) instead of the exact aggregator's O(window) buffer. A SEPARATE
    * operator, never silently substituted for the exact one; no DuckDB
    * oracle (sketch internals are engine-specific) — accuracy is pinned by
    * ScaleOpsSpec against the exact aggregator instead. */
  def q24(spark: SparkSession, sfDir: String): DataFrame =
    Tables.logs(spark, sfDir)
      .groupBy(col("service"), expr("ts_s div 86400 * 86400").as("window_start"))
      .agg(
        count(lit(1)).as("n_events"),
        percentile_approx(col("latency_ms"), lit(0.95), lit(10000)).as("p95_approx"))

  // ---------------------------------------------------------------- q25
  /** Approximate distinct (HLL++) next to the exact count — the standard
    * trade at scale (HLL is mergeable and O(1) per group; exact distinct
    * shuffles every key). No oracle (HLL is engine-specific); relative
    * error pinned by ScaleOpsSpec. */
  def q25(spark: SparkSession, sfDir: String): DataFrame =
    Tables.table(spark, sfDir, "events")
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        count(lit(1)).as("n_events"))

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q23_salted_agg", q23, Some(q23Sql)),
    QueryDef("q24_p95_approx_sketch", q24, None),
    QueryDef("q25_approx_distinct", q25, None)
  )
}
