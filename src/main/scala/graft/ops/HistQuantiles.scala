package graft.ops

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Histogram-exact latency quantiles (q89) — per service, the exact
  * discrete p50/p90/p99 of the 0.1 ms-quantized latency distribution,
  * computed from a BOUNDED histogram instead of buffered values. This
  * completes the repo's percentile story with the shape that actually
  * scales: A2/q03's PercentileDisc is exact but buffers every value per
  * group (the reference's own memory hazard, SURVEY §7.5); q24's sketch
  * is mergeable but approximate; THIS is exact on a declared grid with
  * O(|grid|) state per service — a trillion events per service cost the
  * same histogram as a thousand (the q72/q77 bounded-domain trick).
  *
  * Semantics: percentile_disc over the quantized values — the smallest
  * grid cell whose inclusive cumulative count reaches ⌈q·n⌉ (integer
  * ceiling arithmetic, engine-exact); quantization grain 0.1 ms is the
  * operator's declared resolution (coarsen/refine by the factor).
  *
  * Shape: ONE corpus aggregation into (service, cell) — the only
  * corpus-sized exchange, with map-side partials — then cumulative +
  * pick windows over the BOUNDED histogram. No value buffering, no
  * corpus sort.
  */
object HistQuantiles {

  /** (service, n_events, p50, p90, p99) with percentiles in ms at 0.1
    * resolution. */
  def latencyQuantilesOf(logs: DataFrame): DataFrame = {
    val hist = logs
      .select(col("service"), expr("CAST(round(latency_ms * 10) AS BIGINT)").as("cell"))
      .groupBy(col("service"), col("cell")).agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("service")).orderBy(col("cell"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("service"))
    hist
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      .groupBy(col("service"))
      .agg(
        max(col("n")).as("n_events"),
        (min(when(col("cum") * 2 >= col("n"), col("cell"))).cast("double") / 10).as("p50"),
        (min(when(col("cum") * 10 >= col("n") * 9, col("cell"))).cast("double") / 10).as("p90"),
        (min(when(col("cum") * 100 >= col("n") * 99, col("cell"))).cast("double") / 10).as("p99"))
  }

  // ---------------------------------------------------------------- q89
  def q89(spark: SparkSession, sfDir: String): DataFrame =
    latencyQuantilesOf(Tables.logs(spark, sfDir))

  private val q89Sql =
    s"""WITH ${Tables.LOGS_CTE},
       |h AS (SELECT service, CAST(round(latency_ms * 10) AS BIGINT) AS cell,
       |             count(*) AS c
       |      FROM logs GROUP BY 1, 2),
       |e AS (SELECT service, cell, c,
       |             sum(c) OVER (PARTITION BY service ORDER BY cell
       |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |             sum(c) OVER (PARTITION BY service) AS n
       |      FROM h)
       |SELECT service,
       |       CAST(max(n) AS BIGINT) AS n_events,
       |       CAST(min(CASE WHEN cum * 2 >= n THEN cell END) AS DOUBLE) / 10 AS p50,
       |       CAST(min(CASE WHEN cum * 10 >= n * 9 THEN cell END) AS DOUBLE) / 10 AS p90,
       |       CAST(min(CASE WHEN cum * 100 >= n * 99 THEN cell END) AS DOUBLE) / 10 AS p99
       |FROM e GROUP BY service""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q89_latency_quantiles", q89, Some(q89Sql))
  )
}
