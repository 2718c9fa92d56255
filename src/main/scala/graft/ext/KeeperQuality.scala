package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup keeper-quality audit (q134) — does the canonical-keeper rule
  * (min doc_id, the q11/q57/q67 convention) keep the BETTER copy? Per
  * similarity band of q14's near-dup pairs: how often the keeper scores
  * below the document it displaces, and the net quality delta. A dedup
  * policy that systematically discards the higher-quality twin is
  * quietly degrading the corpus — this is the audit that catches it
  * before q67's canonicalization runs at scale (where the fix is a
  * quality-aware keeper rule, not min-id).
  *
  * Scale shape: q14's join-free inverted-index pairs (dup-rate-sized)
  * attach per-doc quality by TWO co-keyed id joins against the ONE
  * persisted score projection (two readers — the keyed persist prevents
  * the doubled scoring pass); the rollup is a ≤10-row band census.
  * Quality is the 4-dp composite on the q118 integer q10k grid, so the
  * deltas are exact integers.
  */
object KeeperQuality {

  /** (band, n_pairs, n_keeper_worse, worse_bp, sum_delta_q10k) over any
    * (doc_id, text) frame; band = floor(jaccard·10), keeper = doc_a
    * (the lower id — q14 emits ordered pairs). */
  def keeperQualityOf(docs: DataFrame): DataFrame = {
    val scores = Tables.swapPersist("q134_scores",
      TextOps.scoredDocs(docs).select(col("doc_id"),
        expr("CAST(round(quality_score * 10000) AS BIGINT)").as("q10k")))
    TextOps.ngramJaccardOf(docs)
      .join(scores.select(col("doc_id").as("ida"), col("q10k").as("qa")),
        col("doc_a") === col("ida"))
      .join(scores.select(col("doc_id").as("idb"), col("q10k").as("qb")),
        col("doc_b") === col("idb"))
      .groupBy(expr("CAST(floor(jaccard * 10) AS BIGINT)").as("band"))
      .agg(count(lit(1)).as("n_pairs"),
        count(when(col("qa") < col("qb"), 1)).as("n_keeper_worse"),
        sum(col("qa") - col("qb")).as("sum_delta_q10k"))
      .select(col("band"), col("n_pairs"), col("n_keeper_worse"),
        expr("n_keeper_worse * 10000 div n_pairs").as("worse_bp"),
        col("sum_delta_q10k"))
  }

  // ---------------------------------------------------------------- q134
  def q134(spark: SparkSession, sfDir: String): DataFrame =
    keeperQualityOf(Tables.table(spark, sfDir, "documents"))

  private def q134Sql: String =
    s"""WITH dd AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |ss AS (SELECT doc_id,
       |         len(ws)::BIGINT AS n_words,
       |         round(len(list_distinct(ws)) / len(ws), 4) AS ttr,
       |         round(len(list_filter(ws, w -> w in ('the', 'a', 'of', 'and', 'to', 'in'))) / len(ws), 4) AS stop_ratio
       |       FROM dd),
       |sc AS (SELECT doc_id,
       |         CAST(round(floor((0.4 * ttr + 0.3 * least(n_words / 100.0, 1.0) + 0.3 * (1.0 - stop_ratio)) * 10000) / 10000 * 10000) AS BIGINT) AS q10k
       |       FROM ss),
       |b AS (SELECT CAST(floor(p.jaccard * 10) AS BIGINT) AS band,
       |             sa.q10k AS qa, sb.q10k AS qb
       |      FROM (${TextOps.q14SqlText}) p
       |      JOIN sc sa ON p.doc_a = sa.doc_id
       |      JOIN sc sb ON p.doc_b = sb.doc_id)
       |SELECT band, count(*) AS n_pairs,
       |       CAST(count(CASE WHEN qa < qb THEN 1 END) AS BIGINT) AS n_keeper_worse,
       |       CAST(count(CASE WHEN qa < qb THEN 1 END) * 10000 // count(*) AS BIGINT) AS worse_bp,
       |       CAST(sum(qa - qb) AS BIGINT) AS sum_delta_q10k
       |FROM b GROUP BY band""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q134_keeper_quality", q134, Some(q134Sql))
  )
}
