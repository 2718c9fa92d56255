package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-source winsorization audit (q97) — discrete p05/p95 of document
  * length per source plus the clipped-tail statistics (how many docs each
  * tail clips, and the winsorized length mass). The feature-normalization
  * step before length-sensitive curation (q58's budget select, q79's
  * curriculum): heavy-tailed sources otherwise dominate token budgets
  * through a handful of mega-documents.
  *
  * Shape: the q89 histogram discipline — ONE corpus aggregation onto the
  * bounded (source, n_chars) grain, then EVERYTHING (thresholds via
  * cumulative windows, clip counts, winsorized sum) derives from that
  * persisted histogram; the corpus is never rescanned and no per-row
  * buffering happens (contrast A2/PercentileDisc, which this pairs with in
  * the README operator table). Threshold attach is a broadcast
  * |sources|-row join.
  *
  * Semantics: percentile_disc lower convention — smallest cell whose
  * inclusive cumulative count reaches ⌈q·n⌉ (cum·20 ≥ n / cum·20 ≥ 19·n,
  * integer-exact, same as q89). All outputs BIGINT.
  */
object Winsorize {

  /** (source, n_docs, p05, p95, n_clipped_low, n_clipped_high,
    * sum_winsorized) from any (source, n_chars) frame. */
  def winsorizeOf(docs: DataFrame): DataFrame = {
    val h = Tables.swapPersist("q97_hist", docs
      .select(col("source"), col("n_chars").as("cell"))
      .groupBy(col("source"), col("cell")).agg(count(lit(1)).as("c")))
    val wCum = Window.partitionBy(col("source")).orderBy(col("cell"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("source"))
    val thr = h
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      .groupBy(col("source"))
      .agg(max(col("n")).as("n_docs"),
        min(when(col("cum") * 20 >= col("n"), col("cell"))).as("p05"),
        min(when(col("cum") * 20 >= col("n") * 19, col("cell"))).as("p95"))
    h.join(broadcast(thr), "source")
      .groupBy(col("source"))
      .agg(max(col("n_docs")).as("n_docs"), max(col("p05")).as("p05"),
        max(col("p95")).as("p95"),
        sum(when(col("cell") < col("p05"), col("c")).otherwise(0L)).as("n_clipped_low"),
        sum(when(col("cell") > col("p95"), col("c")).otherwise(0L)).as("n_clipped_high"),
        sum(col("c") * greatest(col("p05"), least(col("p95"), col("cell")))).as("sum_winsorized"))
  }

  // ---------------------------------------------------------------- q97
  def q97(spark: SparkSession, sfDir: String): DataFrame =
    winsorizeOf(Tables.table(spark, sfDir, "documents"))

  private val q97Sql =
    """WITH h AS (SELECT source, n_chars AS cell, count(*) AS c
      |           FROM documents GROUP BY source, n_chars),
      |e AS (SELECT source, cell, c,
      |             sum(c) OVER (PARTITION BY source ORDER BY cell
      |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |             sum(c) OVER (PARTITION BY source) AS n
      |      FROM h),
      |t AS (SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
      |             min(CASE WHEN cum * 20 >= n THEN cell END) AS p05,
      |             min(CASE WHEN cum * 20 >= n * 19 THEN cell END) AS p95
      |      FROM e GROUP BY source)
      |SELECT t.source, t.n_docs, t.p05, t.p95,
      |       CAST(sum(CASE WHEN cell < p05 THEN c ELSE 0 END) AS BIGINT) AS n_clipped_low,
      |       CAST(sum(CASE WHEN cell > p95 THEN c ELSE 0 END) AS BIGINT) AS n_clipped_high,
      |       CAST(sum(c * greatest(p05, least(p95, cell))) AS BIGINT) AS sum_winsorized
      |FROM h JOIN t ON h.source = t.source
      |GROUP BY t.source, t.n_docs, t.p05, t.p95""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q97_winsorize", q97, Some(q97Sql))
  )
}
