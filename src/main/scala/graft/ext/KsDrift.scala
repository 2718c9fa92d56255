package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-source distribution drift (q101) — the exact two-sample
  * Kolmogorov–Smirnov statistic between each source's quality-score
  * distribution and the whole corpus': sup over the score grid of
  * |ECDF_source − ECDF_corpus|, reported in basis points with the cell
  * where the sup is attained. The monitoring primitive behind "did this
  * crawl batch drift?": mean/variance summaries (q72's card) miss
  * shape changes; KS is the standard distribution-level alarm, and on the
  * 4-dp-quantized score grid it is EXACT, not a sampled approximation.
  *
  * Exactness without doubles: the sup is attained on a grid cell, and
  * each candidate difference compares two rationals —
  * cum_s/n_s vs cum_c/n_c — cross-multiplied to integers
  * (|cum_s·n_c − cum_c·n_s|, bounded by n_s·n_c ≤ 3.6·10¹¹ at sf0.1,
  * well inside int64 even ×10⁴ for the bp), so the argmax and the final
  * ks_bp = 10⁴·max/(n_s·n_c) are integer-exact on both engines. The
  * sup-cell tie breaks to the SMALLEST cell (deterministic).
  *
  * Shape: q77's histogram discipline — ONE corpus aggregation to the
  * bounded (source, cell) histogram (persisted; the corpus histogram
  * derives from it, never a second scan); the sources×grid evaluation
  * frame is |sources|·|cells| ≤ |sources|·10⁴+1 rows (kilobytes at any
  * corpus size); windows and the argmax join run on that bounded frame.
  * The corpus ECDF includes the source under test (population reference,
  * not leave-one-out) — documented semantics.
  */
object KsDrift {

  /** (source, n_source, n_corpus, ks_bp, ks_cell) over any corpus with
    * TextOps quality scores. */
  def ksDriftOf(docs: DataFrame): DataFrame = {
    val hist = Tables.swapPersist("q101_hist",
      Calibrate.scoredCells(docs).groupBy(col("source"), col("q10k"))
        .agg(count(lit(1)).as("c")))
    // corpus histogram + inclusive ECDF, derived from the bounded hist
    val wC = Window.orderBy(col("q10k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val corpus = hist.groupBy(col("q10k")).agg(sum(col("c")).as("cc"))
      .withColumn("cum_c", sum(col("cc")).over(wC))
      .withColumn("n_c", sum(col("cc")).over(Window.partitionBy()))
    val sources = hist.select(col("source")).distinct()
    // every source evaluated on the FULL corpus grid (zero-filled cells)
    val wS = Window.partitionBy(col("source")).orderBy(col("q10k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val full = sources.crossJoin(corpus)
      .join(hist, Seq("source", "q10k"), "left")
      .withColumn("c0", coalesce(col("c"), lit(0L)))
      .withColumn("cum_s", sum(col("c0")).over(wS))
      .withColumn("n_s", sum(col("c0")).over(Window.partitionBy(col("source"))))
      .withColumn("diff", abs(col("cum_s") * col("n_c") - col("cum_c") * col("n_s")))
    val fullP = Tables.swapPersist("q101_full", full)
    val mx = fullP
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_source"), max(col("n_c")).as("n_corpus"),
        max(col("diff")).as("ks_num"))
    mx.join(fullP.select(col("source").as("s2"), col("q10k"), col("diff")),
        col("source") === col("s2") && col("diff") === col("ks_num"))
      .groupBy(col("source"), col("n_source"), col("n_corpus"), col("ks_num"))
      .agg(min(col("q10k")).as("ks_cell"))
      .select(col("source"), col("n_source"), col("n_corpus"),
        expr("(ks_num * 10000) div (n_source * n_corpus)").as("ks_bp"),
        col("ks_cell"))
  }

  // ---------------------------------------------------------------- q101
  def q101(spark: SparkSession, sfDir: String): DataFrame =
    ksDriftOf(Tables.table(spark, sfDir, "documents"))

  private val q101Sql =
    """WITH dd AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
      |ss AS (SELECT doc_id, source,
      |         len(ws)::BIGINT AS n_words,
      |         round(len(list_distinct(ws)) / len(ws), 4) AS ttr,
      |         round(len(list_filter(ws, w -> w in ('the', 'a', 'of', 'and', 'to', 'in'))) / len(ws), 4) AS stop_ratio
      |       FROM dd),
      |sc AS (SELECT doc_id, source,
      |         CAST(round(floor((0.4 * ttr + 0.3 * least(n_words / 100.0, 1.0) + 0.3 * (1.0 - stop_ratio)) * 10000) / 10000 * 10000) AS BIGINT) AS q10k
      |       FROM ss),
      |h AS (SELECT source, q10k, CAST(count(*) AS BIGINT) AS c FROM sc GROUP BY source, q10k),
       |co AS (SELECT q10k, CAST(sum(c) AS BIGINT) AS cc FROM h GROUP BY q10k),
       |ce AS (SELECT q10k, cc,
       |              sum(cc) OVER (ORDER BY q10k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c,
       |              sum(cc) OVER () AS n_c
       |       FROM co),
       |srcs AS (SELECT DISTINCT source FROM h),
       |f AS (SELECT s.source, g.q10k, g.cum_c, g.n_c, coalesce(h.c, 0) AS c0
       |      FROM srcs s CROSS JOIN ce g
       |      LEFT JOIN h ON h.source = s.source AND h.q10k = g.q10k),
       |e AS (SELECT source, q10k, cum_c, n_c,
       |             sum(c0) OVER (PARTITION BY source ORDER BY q10k
       |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_s,
       |             sum(c0) OVER (PARTITION BY source) AS n_s
       |      FROM f),
       |d AS (SELECT source, q10k, CAST(abs(cum_s * n_c - cum_c * n_s) AS BIGINT) AS diff,
       |             CAST(n_s AS BIGINT) AS n_s, CAST(n_c AS BIGINT) AS n_c
       |      FROM e),
       |m AS (SELECT source, max(n_s) AS n_source, max(n_c) AS n_corpus,
       |             max(diff) AS ks_num
       |      FROM d GROUP BY source)
       |SELECT m.source, m.n_source, m.n_corpus,
       |       (m.ks_num * 10000) // (m.n_source * m.n_corpus) AS ks_bp,
       |       min(d.q10k) AS ks_cell
       |FROM m JOIN d ON d.source = m.source AND d.diff = m.ks_num
       |GROUP BY m.source, m.n_source, m.n_corpus, m.ks_num""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q101_ks_drift", q101, Some(q101Sql))
  )
}
