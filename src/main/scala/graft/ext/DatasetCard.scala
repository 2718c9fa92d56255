package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-card report (q72) — the per-source composition summary every
  * curated-dataset release ships: document and token counts, the quality
  * distribution's quartiles, and the dominant language with its share.
  * One row per source; the table a mixture designer reads before setting
  * q42/q58/q66's knobs, and the "what is this corpus" page of a release.
  *
  * Scale shape: the thin (source, lang, n_words, qbp) frame persists once
  * (single corpus scan inside the cache — the q65 pattern) and feeds
  * three SMALL aggregations. Quartiles are computed from a per-source
  * HISTOGRAM of quality basis points: the score domain is bounded
  * (0..10000 after the scorer's 4-dp floor), so percentile state is
  * O(|sources| × domain) — never corpus-sized, unlike value-buffering
  * exact percentile (justified on thin frames in q65; unnecessary here).
  * The rank→value pick is a cumulative window over that tiny histogram.
  * Language mix aggregates at (source, lang) grain (small by
  * construction) with a struct-argmax. Final assembly joins ≤ |sources|
  * rows. Shares are integer basis points — engine-exact. */
object DatasetCard {

  /** General form over any (doc_id, source, lang, text) frame: one row
    * per source — (source, n_docs, n_tokens, q25_bp, q50_bp, q75_bp,
    * top_lang, top_lang_share_bp). Quartiles are exact discrete
    * (`sorted[floor(q·(n−1))]`, the PercentileDisc definition) over
    * quality basis points; top_lang ties break to the
    * lexicographically-larger code. */
  def datasetCardOf(docs: DataFrame): DataFrame = {
    val base = Tables.swapPersist("card_base",
      TextOps.scoredDocs(docs.select(col("doc_id"), col("source"), col("lang"), col("text")))
        // round, not truncate: quality_score is floor_int/1e4, so ×1e4 is
        // within 1e-9 of the integer but possibly BELOW it — a cast would
        // land on n−1 on the wrong side
        .select(col("source"), col("lang"), col("n_words"),
          round(col("quality_score") * 10000).cast("long").as("qbp")))
    val stats = base.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_tokens"))
    val hist = base.groupBy(col("source"), col("qbp")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(col("source")).orderBy(col("qbp"))))
      .withColumn("cnt", sum(col("c")).over(Window.partitionBy(col("source"))))
    def pick(q: Double): Column =
      min(when(col("cum") >= floor(lit(q) * (col("cnt") - 1)) + 1, col("qbp")))
    val quartiles = hist.groupBy(col("source"))
      .agg(pick(0.25).as("q25_bp"), pick(0.50).as("q50_bp"), pick(0.75).as("q75_bp"))
    val topLang = base.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("lc"))
      .groupBy(col("source"))
      .agg(max(struct(col("lc"), col("lang"))).as("w"))
      .select(col("source"), col("w.lang").as("top_lang"), col("w.lc").as("top_lang_docs"))
    stats.join(quartiles, "source").join(topLang, "source")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("q25_bp"), col("q50_bp"), col("q75_bp"), col("top_lang"),
        expr("(top_lang_docs * 10000) div n_docs").as("top_lang_share_bp"))
  }

  // ---------------------------------------------------------------- q72
  def q72(spark: SparkSession, sfDir: String): DataFrame =
    datasetCardOf(Tables.table(spark, sfDir, "documents"))

  private val q72Sql =
    s"""WITH d AS (SELECT doc_id, source, lang, string_split(text, ' ') AS ws
       |           FROM documents),
       |s AS (SELECT doc_id, source, lang,
       |        len(ws)::BIGINT AS n_words,
       |        round(len(list_distinct(ws)) / len(ws), 4) AS ttr,
       |        round(len(list_filter(ws, w -> w in ('the', 'a', 'of', 'and', 'to', 'in'))) / len(ws), 4) AS stop_ratio
       |      FROM d),
       |sc AS (SELECT source, lang, n_words,
       |         CAST(floor((0.4 * ttr + 0.3 * least(n_words / 100.0, 1.0) +
       |                     0.3 * (1.0 - stop_ratio)) * 10000) AS BIGINT) AS qbp
       |       FROM s),
       |st AS (SELECT source, count(*) AS n_docs, sum(n_words)::BIGINT AS n_tokens
       |       FROM sc GROUP BY source),
       |r AS (SELECT source, qbp,
       |        row_number() OVER (PARTITION BY source ORDER BY qbp) AS rn,
       |        count(*) OVER (PARTITION BY source) AS cnt
       |      FROM sc),
       |pct AS (SELECT source,
       |          max(CASE WHEN rn = CAST(floor(0.25 * (cnt - 1)) AS BIGINT) + 1 THEN qbp END) AS q25_bp,
       |          max(CASE WHEN rn = CAST(floor(0.50 * (cnt - 1)) AS BIGINT) + 1 THEN qbp END) AS q50_bp,
       |          max(CASE WHEN rn = CAST(floor(0.75 * (cnt - 1)) AS BIGINT) + 1 THEN qbp END) AS q75_bp
       |        FROM r GROUP BY source),
       |lc AS (SELECT source, lang, count(*) AS lcnt FROM sc GROUP BY source, lang),
       |tl AS (SELECT source, lang AS top_lang, lcnt AS top_lang_docs FROM (
       |         SELECT source, lang, lcnt,
       |           row_number() OVER (PARTITION BY source
       |                              ORDER BY lcnt DESC, lang DESC) AS rn
       |         FROM lc) WHERE rn = 1)
       |SELECT st.source, n_docs, n_tokens, q25_bp, q50_bp, q75_bp, top_lang,
       |       (top_lang_docs * 10000) // n_docs AS top_lang_share_bp
       |FROM st JOIN pct USING (source) JOIN tl USING (source)""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q72_dataset_card", q72, Some(q72Sql))
  )
}
