package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget-constrained selection (q58) — greedy quality-first data
  * selection under a per-source token budget: within every source, rank
  * documents by quality (best first), accumulate their estimated token
  * counts in rank order, and keep the prefix that fits the budget. This
  * is the mixture-building step AFTER per-doc gates — q16 scores, q42
  * re-weights sources, q58 decides WHICH documents spend each source's
  * token allowance (budgeted curation, the "data mixing under a token
  * target" stage of a training pipeline).
  *
  * Determinism: quality_score is q16's floor-truncated composite (shared
  * [[TextOps.scoredDocs]] code — the formula cannot drift), the rank
  * tie-breaks on doc_id, token counts are q17's integer BPE estimate
  * (`(len+3) div 4` per word), and the running sum is over an explicit
  * ROWS frame — so the kept set is bit-identical across engines, re-runs
  * and partitionings.
  *
  * Scale shape: scoring and token estimation are per-row expression work;
  * the cumulative sum is ONE shuffle on source + a per-source sort — the
  * ordered-prefix semantic is inherently a per-source order statistic, so
  * the sort IS the operator. Parallelism is bounded by |sources| and a
  * giant source makes a giant partition: for skewed corpora run the
  * two-phase variant — per-source quality-threshold search (an aggregate)
  * to pre-drop the mass that cannot fit, then sort only the boundary
  * stratum. At training-mixture cardinalities (dozens–thousands of
  * sources, each a manageable slice) the direct window is the right plan.
  */
object BudgetSelect {

  /** (doc_id, source, quality_score, est_tokens, cum_tokens, keep) over
    * any (doc_id, source, text) frame: keep = 1 iff the doc fits within
    * its source's `budgetTokens` when admitted best-quality-first. */
  def budgetSelectOf(docs: DataFrame, budgetTokens: Long = 1000L): DataFrame = {
    val scored = TextOps.scoredDocs(docs)
      .withColumn("est_tokens",
        expr("aggregate(ws, 0L, (acc, w) -> acc + (length(w) + 3) div 4)"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality_score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored.select(col("doc_id"), col("source"), col("quality_score"),
        col("est_tokens"), sum(col("est_tokens")).over(w).as("cum_tokens"))
      .withColumn("keep", (col("cum_tokens") <= budgetTokens).cast("int"))
  }

  // ---------------------------------------------------------------- q58
  def q58(spark: SparkSession, sfDir: String): DataFrame =
    budgetSelectOf(Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text")))

  private def q58Sql(budgetTokens: Long = 1000L): String =
    s"""WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
       |s AS (SELECT doc_id, source,
       |        floor((0.4 * round(len(list_distinct(ws)) / len(ws), 4)
       |             + 0.3 * least(len(ws) / 100.0, 1.0)
       |             + 0.3 * (1.0 - round(len(list_filter(ws, w -> w in ('the', 'a', 'of', 'and', 'to', 'in'))) / len(ws), 4))) * 10000) / 10000 AS quality_score,
       |        CAST(list_sum(list_transform(ws, w -> (length(w) + 3) // 4)) AS BIGINT) AS est_tokens
       |      FROM d),
       |c AS (SELECT doc_id, source, quality_score, est_tokens,
       |        CAST(sum(est_tokens) OVER (PARTITION BY source
       |               ORDER BY quality_score DESC, doc_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
       |      FROM s)
       |SELECT doc_id, source, quality_score, est_tokens, cum_tokens,
       |       CASE WHEN cum_tokens <= $budgetTokens THEN 1 ELSE 0 END AS keep
       |FROM c""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q58_budget_select", q58, Some(q58Sql()))
  )
}
