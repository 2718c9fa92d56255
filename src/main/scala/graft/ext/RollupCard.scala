package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-grain corpus card (q114) — the (source, lang) release report at
  * every grain in ONE pass: per-(source, lang) cells, per-source
  * subtotals, and the corpus total, via `ROLLUP`. The first multi-grain
  * aggregation in the surface (the reference has no grouping sets at
  * all): computing the three grains as three queries scans the corpus
  * three times and re-exchanges each — ROLLUP plans ONE scan and lets
  * the engine expand grains internally, which is exactly what a 100 TB
  * release card wants.
  *
  * Subtotal rows mark rolled-up columns NULL (both engines' convention);
  * `lvl` re-derives the grain portably (0 = cell, 1 = source subtotal,
  * 3 = grand total) from the NULL pattern rather than engine-specific
  * GROUPING() bitmasks — fixture dims are non-NULL by contract
  * (FixtureSchemaSpec), so the NULL pattern is unambiguous.
  *
  * All measures integer: doc counts, token sums, and mean quality in
  * micro-units (Σq10k·10² div n — exact integer division of exact
  * integer sums, order-free).
  */
object RollupCard {

  /** (source, lang, lvl, n_docs, n_tokens, mean_q_micro) at every rollup
    * grain of any (doc_id, text, lang, source) frame. */
  def rollupCardOf(docs: DataFrame): DataFrame =
    TextOps.scoredDocs(docs)
      .select(col("source"), col("lang"), col("n_words"),
        expr("CAST(round(quality_score * 10000) AS BIGINT)").as("q10k"))
      .rollup(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_tokens"),
        expr("sum(q10k) * 100 div count(1)").as("mean_q_micro"))
      .withColumn("lvl", expr(
        "CAST(CASE WHEN source IS NULL THEN 2 ELSE 0 END + CASE WHEN lang IS NULL THEN 1 ELSE 0 END AS BIGINT)"))
      .select(col("source"), col("lang"), col("lvl"),
        col("n_docs"), col("n_tokens"), col("mean_q_micro"))

  // ---------------------------------------------------------------- q114
  def q114(spark: SparkSession, sfDir: String): DataFrame =
    rollupCardOf(Tables.table(spark, sfDir, "documents"))

  private val q114Sql =
    """WITH dd AS (SELECT doc_id, source, lang, string_split(text, ' ') AS ws FROM documents),
      |ss AS (SELECT doc_id, source, lang,
      |         len(ws)::BIGINT AS n_words,
      |         round(len(list_distinct(ws)) / len(ws), 4) AS ttr,
      |         round(len(list_filter(ws, w -> w in ('the', 'a', 'of', 'and', 'to', 'in'))) / len(ws), 4) AS stop_ratio
      |       FROM dd),
      |sc AS (SELECT source, lang, n_words,
      |         CAST(round(floor((0.4 * ttr + 0.3 * least(n_words / 100.0, 1.0) + 0.3 * (1.0 - stop_ratio)) * 10000) / 10000 * 10000) AS BIGINT) AS q10k
      |       FROM ss)
      |SELECT source, lang,
      |       CAST(CASE WHEN source IS NULL THEN 2 ELSE 0 END
      |            + CASE WHEN lang IS NULL THEN 1 ELSE 0 END AS BIGINT) AS lvl,
      |       count(*) AS n_docs,
      |       CAST(sum(n_words) AS BIGINT) AS n_tokens,
      |       CAST(sum(q10k) * 100 // count(*) AS BIGINT) AS mean_q_micro
      |FROM sc GROUP BY ROLLUP (source, lang)""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q114_rollup_card", q114, Some(q114Sql))
  )
}
