package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quality-decile audit (q105) — exact rank deciles of the corpus quality
  * distribution with per-decile document and token mass: the table behind
  * "what would training only on the top 30% cost me in tokens?" (quality
  * ablation planning). NTILE semantics WITHOUT a corpus sort: a global
  * `ntile(10) OVER (ORDER BY score)` range-exchanges and sorts 100 TB;
  * here the corpus aggregates once into the bounded score-cell histogram
  * (q77/q89's discipline — quality_score is 4-dp-quantized, so ≤ 10⁴+1
  * cells at ANY corpus size), ranks are recovered from the histogram's
  * cumulative counts, and every decile edge is integer arithmetic on
  * census rows.
  *
  * Decile rule, exact and deterministic: rank r ∈ 1..n maps to decile
  * ((r−1)·10) div n + 1; a CELL (all docs sharing a 4-dp score) is
  * assigned the decile of its LAST rank — ties never straddle a decile
  * boundary, so decile populations deviate from n/10 only by tie mass
  * (documented; the price of exactness on a quantized grid).
  *
  * Scale shape: ONE corpus aggregation to (q10k, docs, toks) with
  * map-side partials; cumulative window, decile assignment, and the
  * decile roll-up all run on the ≤ 10⁴-row census. No corpus sort, no
  * range exchange, nothing collected.
  */
object QualityDeciles {

  /** (decile, n_docs, n_tokens, lo_q10k, hi_q10k) over any (doc_id,
    * text) frame. */
  def qualityDecilesOf(docs: DataFrame): DataFrame = {
    val hist = TextOps.scoredDocs(docs)
      .select(expr("CAST(round(quality_score * 10000) AS BIGINT)").as("q10k"),
        col("n_words"))
      .groupBy(col("q10k"))
      .agg(count(lit(1)).as("docs"), sum(col("n_words")).as("toks"))
    val wCum = Window.orderBy(col("q10k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum", sum(col("docs")).over(wCum))
      .withColumn("n", sum(col("docs")).over(Window.partitionBy()))
      .withColumn("decile", expr("(cum - 1) * 10 div n + 1"))
      .groupBy(col("decile"))
      .agg(sum(col("docs")).as("n_docs"), sum(col("toks")).as("n_tokens"),
        min(col("q10k")).as("lo_q10k"), max(col("q10k")).as("hi_q10k"))
  }

  // ---------------------------------------------------------------- q105
  def q105(spark: SparkSession, sfDir: String): DataFrame =
    qualityDecilesOf(Tables.table(spark, sfDir, "documents"))

  private val q105Sql =
    """WITH dd AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |ss AS (SELECT doc_id,
      |         len(ws)::BIGINT AS n_words,
      |         round(len(list_distinct(ws)) / len(ws), 4) AS ttr,
      |         round(len(list_filter(ws, w -> w in ('the', 'a', 'of', 'and', 'to', 'in'))) / len(ws), 4) AS stop_ratio
      |       FROM dd),
      |sc AS (SELECT doc_id, n_words,
      |         CAST(round(floor((0.4 * ttr + 0.3 * least(n_words / 100.0, 1.0) + 0.3 * (1.0 - stop_ratio)) * 10000) / 10000 * 10000) AS BIGINT) AS q10k
      |       FROM ss),
      |h AS (SELECT q10k, count(*) AS docs, CAST(sum(n_words) AS BIGINT) AS toks
      |      FROM sc GROUP BY q10k),
      |c AS (SELECT q10k, docs, toks,
      |             sum(docs) OVER (ORDER BY q10k
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |             sum(docs) OVER () AS n
      |      FROM h)
      |SELECT CAST((cum - 1) * 10 // n + 1 AS BIGINT) AS decile,
      |       CAST(sum(docs) AS BIGINT) AS n_docs,
      |       CAST(sum(toks) AS BIGINT) AS n_tokens,
      |       min(q10k) AS lo_q10k, max(q10k) AS hi_q10k
      |FROM c GROUP BY 1""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q105_quality_deciles", q105, Some(q105Sql))
  )
}
