package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-source quality-score calibration (q77): map every document's raw
  * quality score to its exact within-source ECDF rank, so one global
  * threshold means the same thing in every domain. The problem it solves:
  * raw quality scores are NOT comparable across sources (a web-crawl 0.6
  * and a reference-text 0.6 describe different quality), so a single
  * global cutoff silently over-prunes some domains and under-prunes
  * others — the standard fix is per-domain quantile normalization before
  * thresholding (the practice behind per-source quality buckets in
  * CCNet-style pipelines: filter within language/domain strata, not
  * globally).
  *
  * Exactness WITHOUT per-source sorting: the raw score is already
  * 4-dp-quantized (q16's floor ×10⁴ — an integer in [0, 10⁴]), so the
  * per-source score distribution is EXACTLY representable as a histogram
  * over ≤ 10⁴+1 integer cells. One corpus aggregation builds it
  * ((source, q10k) → count); a cumulative window over that BOUNDED
  * histogram (≤ |sources|·10⁴ rows — kilobytes, never corpus-scale)
  * yields every distinct score's inclusive ECDF; docs then broadcast-join
  * back on (source, q10k). No corpus window, no per-source buffering —
  * the shape survives a source with 10¹² rows because the histogram size
  * depends on the score DOMAIN, not the row count (the q72 trick).
  */
object Calibrate {

  /** (doc_id, source, q10k, n_source, cum_le, calib) for every doc:
    * `q10k` = the 4-dp score as an integer, `cum_le` = docs in this
    * source scoring ≤ mine, `calib` = inclusive ECDF floor-truncated to
    * 4 dp. */
  def calibrateBySource(docs: DataFrame): DataFrame = {
    val scored = TextOps.scoredDocs(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("quality_score"))
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      // exact integer cell: quality_score is floor(x·10⁴)/10⁴, so ·10⁴
      // rounds to the integer it was floored to (round, not cast: the
      // division can land a hair below the integer in binary)
      .withColumn("q10k", expr("CAST(round(quality_score * 10000) AS BIGINT)"))
    val hist = scored.groupBy(col("source"), col("q10k"))
      .agg(count(lit(1)).as("c"))
    // cumulative ECDF over the bounded histogram (window input is
    // ≤ |sources|·(10⁴+1) rows by construction — never corpus-scale)
    val wCum = Window.partitionBy(col("source"))
      .orderBy(col("q10k")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("source"))
    val ecdf = hist
      .withColumn("cum_le", sum(col("c")).over(wCum))
      .withColumn("n_source", sum(col("c")).over(wAll))
      .select(col("source"), col("q10k"), col("cum_le"), col("n_source"))
    scored.join(broadcast(ecdf), Seq("source", "q10k"))
      .select(col("doc_id"), col("source"), col("q10k"), col("n_source"),
        col("cum_le"),
        (floor(col("cum_le") * 10000.0 / col("n_source")) / 10000.0).as("calib"))
  }

  // ---------------------------------------------------------------- q77
  def q77(spark: SparkSession, sfDir: String): DataFrame =
    calibrateBySource(Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("source")))

  private val q77Sql =
    """WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS ws, text FROM documents),
      |s AS (SELECT doc_id, source,
      |        len(ws)::BIGINT AS n_words,
      |        round(len(list_distinct(ws)) / len(ws), 4) AS ttr,
      |        round(len(list_filter(ws, w -> w in ('the', 'a', 'of', 'and', 'to', 'in'))) / len(ws), 4) AS stop_ratio
      |      FROM d),
      |q AS (SELECT doc_id, source,
      |        CAST(round(floor((0.4 * ttr + 0.3 * least(n_words / 100.0, 1.0) + 0.3 * (1.0 - stop_ratio)) * 10000) / 10000 * 10000) AS BIGINT) AS q10k
      |      FROM s),
      |hist AS (SELECT source, q10k, count(*) AS c FROM q GROUP BY 1, 2),
      |ecdf AS (SELECT source, q10k,
      |           sum(c) OVER (PARTITION BY source ORDER BY q10k
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_le,
      |           sum(c) OVER (PARTITION BY source) AS n_source
      |         FROM hist)
      |SELECT q.doc_id, q.source, q.q10k,
      |       CAST(e.n_source AS BIGINT) AS n_source,
      |       CAST(e.cum_le AS BIGINT) AS cum_le,
      |       floor(e.cum_le * 10000.0 / e.n_source) / 10000.0 AS calib
      |FROM q JOIN ecdf e ON q.source = e.source AND q.q10k = e.q10k""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q77_score_calibration", q77, Some(q77Sql))
  )
}
