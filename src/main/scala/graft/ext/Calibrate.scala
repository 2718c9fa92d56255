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

  /** (doc_id, source, q10k) — the score quantized to its exact integer
    * cell. Pure map-side (streaming-safe): quality_score is
    * floor(x·10⁴)/10⁴, so ·10⁴ rounds to the integer it was floored to
    * (round, not cast: the division can land a hair below the integer in
    * binary). */
  private[ext] def scoredCells(docs: DataFrame): DataFrame =
    TextOps.scoredDocs(docs)
      .select(col("doc_id"), col("source"),
        expr("CAST(round(quality_score * 10000) AS BIGINT)").as("q10k"))

  /** Per-source inclusive ECDF of the score histogram:
    * (source, q10k, cum_le, n_source) — ≤ |sources|·(10⁴+1) rows by
    * construction (score DOMAIN, not corpus size). */
  private[ext] def ecdfOf(docs: DataFrame): DataFrame = {
    val hist = scoredCells(docs).groupBy(col("source"), col("q10k"))
      .agg(count(lit(1)).as("c"))
    // cumulative windows run over the bounded histogram only
    val wCum = Window.partitionBy(col("source"))
      .orderBy(col("q10k")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("source"))
    hist
      .withColumn("cum_le", sum(col("c")).over(wCum))
      .withColumn("n_source", sum(col("c")).over(wAll))
      .select(col("source"), col("q10k"), col("cum_le"), col("n_source"))
  }

  /** (doc_id, source, q10k, n_source, cum_le, calib) for every doc:
    * `q10k` = the 4-dp score as an integer, `cum_le` = docs in this
    * source scoring ≤ mine, `calib` = inclusive ECDF floor-truncated to
    * 4 dp. */
  def calibrateBySource(docs: DataFrame): DataFrame =
    scoredCells(docs).join(broadcast(ecdfOf(docs)), Seq("source", "q10k"))
      .select(col("doc_id"), col("source"), col("q10k"), col("n_source"),
        col("cum_le"),
        (floor(col("cum_le") * 10000.0 / col("n_source")) / 10000.0).as("calib"))

  /** Stream-static calibration gate — q77's ingestion-time face (the
    * q39/q74 gate pattern): the per-source ECDF is fit ONCE on the static
    * corpus, collected (it is domain-bounded: ≤ |sources|·(10⁴+1) cells —
    * the same literal-size precondition as the decontamination gate's
    * broadcast vocabulary), and every ARRIVING doc is scored and ranked
    * against the frozen reference entirely map-side — zero streaming
    * aggregation state, append-mode composable. Because an arrival's
    * exact cell need not exist in the reference histogram, the rank is
    * the reference ECDF evaluated AT the arrival's cell (largest
    * reference cell ≤ mine — a fold over the source's cell array), which
    * on the fitting corpus itself reproduces [[calibrateBySource]]
    * exactly. Docs from sources absent in the reference emit
    * known_source=false with null rank (the caller routes them to a
    * cold-start path). Frozen-reference semantics by design — re-fit at
    * corpus checkpoints, as with the other gates. */
  def calibrateGateStreamStatic(streamDocs: DataFrame, staticDocs: DataFrame): DataFrame = {
    val ref = ecdfOf(staticDocs).collect()
    val cells: Map[String, Seq[(Long, Long)]] = ref.groupBy(_.getString(0))
      .map { case (s, rs) =>
        s -> rs.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq }
    val ns: Map[String, Long] =
      ref.map(r => r.getString(0) -> r.getLong(3)).toMap
    val cellsLit = typedLit(cells)
    val nsLit = typedLit(ns)
    scoredCells(streamDocs)
      .withColumn("_cells", element_at(cellsLit, col("source")))
      .withColumn("n_source", element_at(nsLit, col("source")))
      .withColumn("cum_le", expr(
        "aggregate(filter(_cells, c -> c._1 <= q10k), 0L, (acc, c) -> greatest(acc, c._2))"))
      .select(col("doc_id"), col("source"), col("q10k"),
        col("_cells").isNotNull.as("known_source"), col("n_source"), col("cum_le"),
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
