package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-source capped selection (q66) — domain balancing's hard-cap face:
  * keep at most N docs per source, best [[TextOps.scoredDocs]] quality
  * first (ties to the lower doc_id), and report each survivor's rank.
  * Complements the soft rebalancers: q42 resamples by source-mass ratio,
  * q55 thins clusters toward a target, q58 fills a token budget in
  * quality order — this is the crawl-side "no domain exceeds N docs"
  * rule, the standard defense against one boilerplate-heavy domain
  * swamping a mixture.
  *
  * Scale shape: the per-source ranking is the bounded
  * [[graft.agg.TopK]] aggregator, NOT a
  * `row_number().over(partitionBy(source))` window — the window
  * formulation shuffles EVERY scored doc to its source's reducer and
  * sorts there before discarding all but N; the aggregator's map-side
  * `reduce` keeps at most N (score, id) pairs per source × partition at
  * the exchange, so a billion-doc domain ships N·partitions tuples, not
  * 10⁹ rows (the q29/TopK contract). Scoring is in-row; the single
  * exchange is the low-cardinality source hash-agg. Output order inside
  * a source IS the buffer's sort — rank = array position, no second
  * sort anywhere. */
object DomainCap {

  /** General form over any (doc_id, source, text) frame. Output: one row
    * per KEPT doc — (source, rank, doc_id, quality_score), rank 1..≤cap
    * by (quality desc, doc_id asc) within the source. */
  def domainCapOf(docs: DataFrame, maxPerSource: Int = 40): DataFrame =
    TextOps.scoredDocs(docs.select(col("doc_id"), col("source"), col("text")))
      .groupBy(col("source"))
      .agg(graft.agg.TopK(maxPerSource)(col("quality_score"), col("doc_id")).as("top"))
      .select(col("source"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("source"), (col("pos") + 1).cast("long").as("rank"),
        col("t.id").as("doc_id"), col("t.score").as("quality_score"))

  // ---------------------------------------------------------------- q66
  // fixture binds the cap at a NON-default 15 (< the 25 docs per source),
  // so the cut is live in the graded plan (the q12 fixture-cap pattern)
  def q66(spark: SparkSession, sfDir: String): DataFrame =
    domainCapOf(Tables.table(spark, sfDir, "documents"), maxPerSource = 15)

  private def q66Sql(maxPerSource: Int = 15): String =
    s"""WITH d AS (SELECT doc_id, source, text, string_split(text, ' ') AS ws
       |           FROM documents),
       |s AS (SELECT doc_id, source,
       |        len(ws)::BIGINT AS n_words,
       |        round(len(list_distinct(ws)) / len(ws), 4) AS ttr,
       |        round(len(list_filter(ws, w -> w in ('the', 'a', 'of', 'and', 'to', 'in'))) / len(ws), 4) AS stop_ratio
       |      FROM d),
       |sc AS (SELECT doc_id, source,
       |         floor((0.4 * ttr + 0.3 * least(n_words / 100.0, 1.0) +
       |                0.3 * (1.0 - stop_ratio)) * 10000) / 10000 AS quality_score
       |       FROM s),
       |r AS (SELECT source, doc_id, quality_score,
       |        row_number() OVER (PARTITION BY source
       |                           ORDER BY quality_score DESC, doc_id) AS rank
       |      FROM sc)
       |SELECT source, rank, doc_id, quality_score FROM r
       |WHERE rank <= $maxPerSource""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q66_domain_cap", q66, Some(q66Sql()))
  )
}
