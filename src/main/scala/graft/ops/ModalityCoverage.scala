package graft.ops

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-modal completeness census (q125) — referential integrity between
  * the text corpus and its embedding table: per source, how many documents
  * actually HAVE an embedding, and how many embeddings point at no
  * document at all. The first audit a multimodal/RAG pipeline runs after
  * every embedding backfill: a partial backfill shows up as coverage_bp
  * dropping on exactly the sources the backfill skipped, and a
  * misaligned id space shows up as a non-empty `(unmatched)` row. (The
  * reference carries no second modality — cf. its single-stream
  * payloads, log_producer.py — this is beyond-reference surface for the
  * training-data pipeline target.)
  *
  * Classification is a FULL OUTER join of the two id sets (the q104
  * snapshot-diff discipline pointed across modalities instead of across
  * versions): n_both / n_doc_only per source; vec-only rows have no
  * source to attribute to and aggregate under the literal `(unmatched)`.
  *
  * Scale shape: both sides project to their key column(s) before the
  * join — (doc_id, source) and (vec_id) — so only ids and a dictionary
  * string cross the wire, never text or vectors; ONE co-keyed SMJ
  * exchange pair; the rollup is a ≤|sources|+1-row census with map-side
  * partials. No windows, no sorts beyond the join's.
  */
object ModalityCoverage {

  /** (source, n_docs, n_covered, n_vec_only, coverage_bp) over any
    * (doc_id, source) docs frame and (vec_id) embeddings frame. */
  def modalityCoverageOf(docs: DataFrame, embeds: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id"), col("source"))
    val v = embeds.select(col("vec_id"))
    d.join(v, col("doc_id") === col("vec_id"), "full_outer")
      .select(
        coalesce(col("source"), lit("(unmatched)")).as("source"),
        col("doc_id").isNotNull.cast("long").as("is_doc"),
        (col("doc_id").isNotNull && col("vec_id").isNotNull).cast("long").as("is_both"),
        (col("doc_id").isNull && col("vec_id").isNotNull).cast("long").as("is_vec_only"))
      .groupBy(col("source"))
      .agg(
        sum(col("is_doc")).as("n_docs"),
        sum(col("is_both")).as("n_covered"),
        sum(col("is_vec_only")).as("n_vec_only"))
      .select(col("source"), col("n_docs"), col("n_covered"), col("n_vec_only"),
        expr("CASE WHEN n_docs = 0 THEN NULL ELSE n_covered * 10000 div n_docs END")
          .as("coverage_bp"))
  }

  // ---------------------------------------------------------------- q125
  def q125(spark: SparkSession, sfDir: String): DataFrame =
    modalityCoverageOf(
      Tables.table(spark, sfDir, "documents"),
      Tables.table(spark, sfDir, "embeddings"))

  private val q125Sql =
    """WITH j AS (
      |  SELECT d.doc_id, d.source, e.vec_id
      |  FROM (SELECT doc_id, source FROM documents) d
      |  FULL OUTER JOIN (SELECT vec_id FROM embeddings) e
      |    ON d.doc_id = e.vec_id),
      |g AS (
      |  SELECT coalesce(source, '(unmatched)') AS source,
      |         CAST(sum(CASE WHEN doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
      |         CAST(sum(CASE WHEN doc_id IS NOT NULL AND vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
      |         CAST(sum(CASE WHEN doc_id IS NULL AND vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_vec_only
      |  FROM j GROUP BY 1)
      |SELECT source, n_docs, n_covered, n_vec_only,
      |       CASE WHEN n_docs = 0 THEN NULL
      |            ELSE CAST(n_covered * 10000 // n_docs AS BIGINT) END AS coverage_bp
      |FROM g""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q125_modality_coverage", q125, Some(q125Sql))
  )
}
