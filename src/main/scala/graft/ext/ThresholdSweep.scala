package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Quality-threshold sweep (q68) — gate calibration: before committing a
  * corpus to a quality cutoff (q16's scorer feeding q35/q52's gates), a
  * pipeline operator sweeps a grid of candidate thresholds and reads off,
  * per source, how many documents and what token mass each cut would
  * retain — the keep-rate curve that decides "0.6 keeps 80% of web but
  * 99% of books". One run answers every "what if we cut at t?" question
  * the mixture designer asks.
  *
  * Scale shape: the corpus is scanned ONCE and never shuffled by grid —
  * each threshold is a pair of conditional partial aggregates
  * (docs-kept, tokens-kept) inside the single per-source hash
  * aggregation, so the map side emits one |grid|-wide row per
  * source × partition, not |corpus| × |grid| exploded rows; the
  * |sources|-row wide result unpivots in-row (stack) after the
  * exchange. Output cardinality |sources| × |grid|. Shares are integer
  * basis points ((kept * 10000) div total) — engine-exact, no FP
  * division hazard. */
object ThresholdSweep {

  val defaultGrid: Seq[Double] = Seq(0.55, 0.60, 0.63, 0.66, 0.70)

  /** General form over any (doc_id, source, text) frame: one row per
    * source × threshold — docs kept, token mass kept, and both as basis
    * points of the source's totals. */
  def thresholdSweepOf(docs: DataFrame,
                       thresholds: Seq[Double] = defaultGrid): DataFrame = {
    require(thresholds.nonEmpty, "thresholdSweepOf: empty grid")
    require(thresholds == thresholds.distinct.sorted,
      "thresholdSweepOf: grid must be strictly increasing")
    val scored = TextOps.scoredDocs(
        docs.select(col("doc_id"), col("source"), col("text")))
      .select(col("source"), col("n_words"), col("quality_score"))
    val perThreshold = thresholds.zipWithIndex.flatMap { case (t, i) => Seq(
      sum(when(col("quality_score") >= t, 1L).otherwise(0L)).as(s"dk_$i"),
      sum(when(col("quality_score") >= t, col("n_words")).otherwise(0L)).as(s"tk_$i")) }
    val wide = scored.groupBy(col("source"))
      .agg(count(lit(1)).as("docs_total"),
        (sum(col("n_words")).as("tokens_total") +: perThreshold): _*)
    val stackArgs = thresholds.zipWithIndex
      .map { case (t, i) => s"CAST($t AS DOUBLE), dk_$i, tk_$i" }.mkString(", ")
    wide.selectExpr("source", "docs_total", "tokens_total",
        s"stack(${thresholds.size}, $stackArgs) AS (threshold, docs_kept, tokens_kept)")
      .selectExpr("source", "threshold", "docs_kept",
        "(docs_kept * 10000) div docs_total AS docs_share_bp",
        "tokens_kept",
        "(tokens_kept * 10000) div tokens_total AS tokens_share_bp")
  }

  // ---------------------------------------------------------------- q68
  def q68(spark: SparkSession, sfDir: String): DataFrame =
    thresholdSweepOf(Tables.table(spark, sfDir, "documents"))

  private def q68Sql(thresholds: Seq[Double] = defaultGrid): String = {
    val grid = thresholds.map(t => s"(CAST($t AS DOUBLE))").mkString(", ")
    s"""WITH d AS (SELECT doc_id, source, text, string_split(text, ' ') AS ws
       |           FROM documents),
       |s AS (SELECT doc_id, source,
       |        len(ws)::BIGINT AS n_words,
       |        round(len(list_distinct(ws)) / len(ws), 4) AS ttr,
       |        round(len(list_filter(ws, w -> w in ('the', 'a', 'of', 'and', 'to', 'in'))) / len(ws), 4) AS stop_ratio
       |      FROM d),
       |sc AS (SELECT source, n_words,
       |         floor((0.4 * ttr + 0.3 * least(n_words / 100.0, 1.0) +
       |                0.3 * (1.0 - stop_ratio)) * 10000) / 10000 AS q
       |       FROM s),
       |t(threshold) AS (VALUES $grid),
       |agg AS (SELECT source, threshold,
       |          count(*) AS docs_total,
       |          sum(n_words)::BIGINT AS tokens_total,
       |          count(*) FILTER (WHERE q >= threshold) AS docs_kept,
       |          coalesce(sum(n_words) FILTER (WHERE q >= threshold), 0)::BIGINT AS tokens_kept
       |        FROM sc CROSS JOIN t GROUP BY source, threshold)
       |SELECT source, threshold, docs_kept,
       |       (docs_kept * 10000) // docs_total AS docs_share_bp,
       |       tokens_kept,
       |       (tokens_kept * 10000) // tokens_total AS tokens_share_bp
       |FROM agg""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q68_threshold_sweep", q68, Some(q68Sql()))
  )
}
