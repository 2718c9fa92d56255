package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-source duplication matrix (q119) — q14's near-dup pairs
  * attributed to their SOURCES: for every (source_a, source_b) pair, how
  * many near-dup pairs straddle it, normalized per million candidate
  * cross pairs. The provenance question behind a dedup result: q117 says
  * how much duplication exists, THIS says who is feeding it — a mirror
  * crawl shows up as a hot off-diagonal cell, a template-happy source as
  * a hot diagonal one, and the ppm normalization makes cells comparable
  * across source sizes (raw counts just echo the biggest sources).
  *
  * Scale shape: the pair table is dup-rate-sized by construction (q14's
  * df-capped inverted index — never all-pairs); sources attach by two
  * broadcast-able doc→source lookups ONLY for docs appearing in pairs
  * (dup-rate-sized again, never the corpus); the matrix aggregation is
  * ≤ |sources|² rows; the per-source doc census for the ppm denominator
  * is |sources| rows crossed twice. Source pairs normalize to
  * (min, max) so the matrix is upper-triangular — deterministic in both
  * engines.
  */
object DupSources {

  /** (src_a, src_b, n_pairs, ppm) with src_a ≤ src_b; ppm = near-dup
    * pairs per million candidate pairs between the two sources
    * (n_a·n_b cross pairs; n·(n−1)/2 within one source). */
  def dupSourcesOf(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val src = docs.select(col("doc_id"), col("source"))
    val attributed = pairs
      .join(src.withColumnRenamed("doc_id", "da").withColumnRenamed("source", "sa"),
        col("doc_a") === col("da"))
      .join(src.withColumnRenamed("doc_id", "db").withColumnRenamed("source", "sb"),
        col("doc_b") === col("db"))
      .select(least(col("sa"), col("sb")).as("src_a"),
        greatest(col("sa"), col("sb")).as("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_pairs"))
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
    attributed
      .join(broadcast(counts.select(col("source").as("src_a"), col("n").as("na"))), "src_a")
      .join(broadcast(counts.select(col("source").as("src_b"), col("n").as("nb"))), "src_b")
      .select(col("src_a"), col("src_b"), col("n_pairs"),
        expr("""CASE WHEN src_a = src_b
                THEN n_pairs * 1000000 div (na * (na - 1) div 2)
                ELSE n_pairs * 1000000 div (na * nb) END""").as("ppm"))
  }

  // ---------------------------------------------------------------- q119
  def q119(spark: SparkSession, sfDir: String): DataFrame =
    dupSourcesOf(Tables.table(spark, sfDir, "documents"),
      TextOps.ngramJaccard(spark, sfDir).select(col("doc_a"), col("doc_b")))

  private val q119Sql =
    s"""WITH pairs AS (SELECT doc_a, doc_b FROM (${TextOps.q14SqlText}) q14),
       |src AS (SELECT doc_id, source FROM documents),
       |att AS (
       |  SELECT least(a.source, b.source) AS src_a,
       |         greatest(a.source, b.source) AS src_b,
       |         count(*) AS n_pairs
       |  FROM pairs
       |  JOIN src a ON pairs.doc_a = a.doc_id
       |  JOIN src b ON pairs.doc_b = b.doc_id
       |  GROUP BY 1, 2),
       |c AS (SELECT source, count(*) AS n FROM documents GROUP BY source)
       |SELECT att.src_a, att.src_b, att.n_pairs,
       |       CAST(CASE WHEN att.src_a = att.src_b
       |            THEN att.n_pairs * 1000000 // (ca.n * (ca.n - 1) // 2)
       |            ELSE att.n_pairs * 1000000 // (ca.n * cb.n) END AS BIGINT) AS ppm
       |FROM att
       |JOIN c ca ON ca.source = att.src_a
       |JOIN c cb ON cb.source = att.src_b""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q119_dup_sources", q119, Some(q119Sql))
  )
}
