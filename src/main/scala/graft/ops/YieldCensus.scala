package graft.ops

import graft.ext.TextOps
import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline yield census (q138) — the accounting view of the whole
  * curation funnel, per source: raw docs → near-dup survivors (q14's
  * pairs under the min-id keeper rule) → quality survivors (q16's
  * composite ≥ floor) → tokens actually delivered after context
  * clipping (q127's pricing at the training window). Answers the
  * question every data-mixture meeting starts with: "after all the
  * filters, how many tokens does each source actually contribute?" —
  * as one number per source with the losses attributed to stages, not
  * discovered after a 100 TB run.
  *
  * Stage rules, exactly: removed = any doc that appears as the HIGHER
  * id (doc_b) of a q14 pair — the greedy min-id keeper (q38's CC
  * closure is the transitive refinement; this census uses the pair
  * rule so its numbers reconcile with q14 directly). Quality floor and
  * context window are parameters.
  *
  * Scale shape: the doc projection persists ONCE and feeds both the
  * scoring pass and q14's pair machinery (two readers — without the
  * keyed persist the corpus parses twice); the removed set is
  * dup-rate-sized and attaches by LEFT ANTI join; the rollup is a
  * ≤|sources|-row census. Integer token arithmetic throughout.
  */
object YieldCensus {

  /** (source, n_raw, n_unique, n_quality, toks_raw, toks_final,
    * yield_bp) with near-dup removal, quality floor and context clip. */
  def yieldCensusOf(docs: DataFrame, qualityFloorQ10k: Long = 5500L,
                    ctxLen: Long = 128L): DataFrame = {
    val base = Tables.swapPersist("q138_base",
      docs.select(col("doc_id"), col("source"), col("text")))
    val scored = TextOps.scoredDocs(base)
      .select(col("doc_id"), col("source"),
        expr("CAST(round(quality_score * 10000) AS BIGINT)").as("q10k"),
        expr("aggregate(split(text, ' '), 0L, (acc, w) -> acc + (length(w) + 3) div 4)")
          .as("toks"))
    val removed = TextOps.ngramJaccardOf(base)
      .select(col("doc_b").as("doc_id")).distinct()
    val survivors = scored.join(removed, Seq("doc_id"), "left_anti")
      .withColumn("is_q", (col("q10k") >= qualityFloorQ10k).cast("long"))
    val rawSide = scored.groupBy(col("source"))
      .agg(count(lit(1)).as("n_raw"), sum(col("toks")).as("toks_raw"))
    val outSide = survivors.groupBy(col("source"))
      .agg(count(lit(1)).as("n_unique"),
        sum(col("is_q")).as("n_quality"),
        sum(when(col("is_q") === 1L, least(col("toks"), lit(ctxLen)))
          .otherwise(lit(0L))).as("toks_final"))
    rawSide.join(outSide, Seq("source"), "left")
      .select(col("source"), col("n_raw"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"),
        coalesce(col("n_quality"), lit(0L)).as("n_quality"),
        col("toks_raw"),
        coalesce(col("toks_final"), lit(0L)).as("toks_final"))
      // a source whose docs are ALL empty-text prices to zero tokens:
      // Spark's div would NULL but DuckDB's // ERRORS — agree on NULL
      .withColumn("yield_bp", expr(
        "CASE WHEN toks_raw = 0 THEN NULL ELSE toks_final * 10000 div toks_raw END"))
  }

  // ---------------------------------------------------------------- q138
  def q138(spark: SparkSession, sfDir: String): DataFrame =
    yieldCensusOf(Tables.table(spark, sfDir, "documents"))

  private def q138Sql(qualityFloorQ10k: Long = 5500L, ctxLen: Long = 128L): String =
    s"""WITH dd AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
       |ss AS (SELECT doc_id, source,
       |         len(ws)::BIGINT AS n_words,
       |         round(len(list_distinct(ws)) / len(ws), 4) AS ttr,
       |         round(len(list_filter(ws, w -> w in ('the', 'a', 'of', 'and', 'to', 'in'))) / len(ws), 4) AS stop_ratio,
       |         CAST(list_sum(list_transform(ws, w -> (length(w) + 3) // 4)) AS BIGINT) AS toks
       |       FROM dd),
       |sc AS (SELECT doc_id, source, toks,
       |         CAST(round(floor((0.4 * ttr + 0.3 * least(n_words / 100.0, 1.0) + 0.3 * (1.0 - stop_ratio)) * 10000) / 10000 * 10000) AS BIGINT) AS q10k
       |       FROM ss),
       |rm AS (SELECT DISTINCT doc_b AS doc_id FROM (${TextOps.q14SqlText}) p),
       |sv AS (SELECT sc.*, CASE WHEN sc.q10k >= $qualityFloorQ10k THEN 1 ELSE 0 END AS is_q
       |       FROM sc LEFT JOIN rm ON sc.doc_id = rm.doc_id
       |       WHERE rm.doc_id IS NULL),
       |raw AS (SELECT source, count(*) AS n_raw, CAST(sum(toks) AS BIGINT) AS toks_raw
       |        FROM sc GROUP BY 1),
       |outp AS (SELECT source, count(*) AS n_unique,
       |               CAST(sum(is_q) AS BIGINT) AS n_quality,
       |               CAST(sum(CASE WHEN is_q = 1 THEN least(toks, $ctxLen) ELSE 0 END) AS BIGINT) AS toks_final
       |        FROM sv GROUP BY 1)
       |SELECT raw.source, raw.n_raw,
       |       coalesce(outp.n_unique, 0) AS n_unique,
       |       coalesce(outp.n_quality, 0) AS n_quality,
       |       raw.toks_raw,
       |       coalesce(outp.toks_final, 0) AS toks_final,
       |       CASE WHEN raw.toks_raw = 0 THEN NULL ELSE CAST(coalesce(outp.toks_final, 0) * 10000 // raw.toks_raw AS BIGINT) END AS yield_bp
       |FROM raw LEFT JOIN outp ON raw.source = outp.source""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q138_yield_census", q138, Some(q138Sql()))
  )
}
