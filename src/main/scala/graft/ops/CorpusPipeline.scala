package graft.ops

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed preprocessing pipeline a corpus actually goes through —
  * exact dedup → quality gate → language selection → per-slice stats — as
  * ONE declarative plan, not four materialized passes.
  *
  * The point of composing inside a single DataFrame program: Catalyst sees
  * the whole chain, so the documents scan happens once, dedup's hash
  * aggregation and the quality expressions pipeline inside the same stages,
  * and the final rollup reuses the dedup join's partitioning where it can.
  * Running the same four steps as separate jobs re-scans and re-shuffles
  * the corpus at every boundary — at 100 TB that is the difference between
  * one pass and four.
  *
  * Components share code with their standalone queries (dedup = q11's
  * min-id-per-hash rule, scoring = [[graft.ext.TextOps.scoredDocs]] — the
  * identical expression tree as q16) so the composition cannot drift from
  * the operators it composes. The full chain is DuckDB-checked as q35.
  */
object CorpusPipeline {

  val QualityFloor = 0.64          // fixture median is 0.645 — both gates live
  val Langs: Seq[String] = Seq("en", "de", "fr")

  /** Surviving per-doc frame: dedup winners, quality ≥ floor, lang ∈ Langs,
    * with (doc_id, source, lang, n_words, quality_score). Dedup is q11's
    * min-id-per-content-hash rule expressed as a window over the hash —
    * ONE corpus scan and ONE shuffle (by the high-cardinality hash, so
    * fully parallel), where the groupBy+self-join formulation scans the
    * corpus twice and shuffles a second time on doc_id. */
  def survivors(docs: DataFrame,
                qualityFloor: Double = QualityFloor,
                langs: Seq[String] = Langs): DataFrame = {
    val byHash = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
    val kept = docs.withColumn("h", sha2(col("text"), 256))
      .withColumn("_keep", min(col("doc_id")).over(byHash))
      .filter(col("doc_id") === col("_keep"))
    graft.ext.TextOps.scoredDocs(kept)
      .filter(col("quality_score") >= qualityFloor &&
        col("lang").isInCollection(langs))
      .select(col("doc_id"), col("source"), col("lang"),
        col("n_words"), col("quality_score"))
  }

  // ---------------------------------------------------------------- q35
  def q35(spark: SparkSession, sfDir: String): DataFrame =
    survivors(Tables.table(spark, sfDir, "documents"))
      .groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("tokens"),
        // mean quality in integer milli-units (floor): quality_score is an
        // exact multiple of 1e-4, so sum/avg in BIGINT sidesteps the
        // half-boundary double-rounding drift between engines entirely
        expr("sum(cast(round(quality_score * 10000, 0) AS BIGINT)) div count(*)")
          .as("avg_quality_x1e4"))

  private val q35Sql =
    s"""WITH d AS (SELECT doc_id, source, lang, text, sha256(text) AS h FROM documents),
       |w AS (SELECT h, min(doc_id) AS doc_id FROM d GROUP BY h),
       |kept AS (SELECT d.* FROM d JOIN w ON d.doc_id = w.doc_id),
       |s AS (SELECT doc_id, source, lang,
       |        len(string_split(text, ' '))::BIGINT AS n_words,
       |        round(len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' ')), 4) AS ttr,
       |        round(len(list_filter(string_split(text, ' '), x -> x in ('the', 'a', 'of', 'and', 'to', 'in'))) / len(string_split(text, ' ')), 4) AS stop_ratio
       |      FROM kept),
       |q AS (SELECT doc_id, source, lang, n_words,
       |        floor((0.4 * ttr + 0.3 * least(n_words / 100.0, 1.0) + 0.3 * (1.0 - stop_ratio)) * 10000) / 10000 AS quality_score
       |      FROM s)
       |SELECT source, lang, count(*) AS n_docs,
       |       CAST(sum(n_words) AS BIGINT) AS tokens,
       |       CAST(sum(CAST(round(quality_score * 10000, 0) AS BIGINT)) // count(*) AS BIGINT) AS avg_quality_x1e4
       |FROM q
       |WHERE quality_score >= $QualityFloor AND lang IN ('en', 'de', 'fr')
       |GROUP BY source, lang""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q35_corpus_pipeline", q35, Some(q35Sql))
  )
}
