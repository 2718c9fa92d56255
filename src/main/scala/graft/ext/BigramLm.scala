package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interpolated bigram LM surprisal (q85) — the sequence-aware upgrade of
  * q43's unigram scorer: each token is scored by
  *   P(wᵢ | wᵢ₋₁) = λ · c(wᵢ₋₁wᵢ)/c_head(wᵢ₋₁) + (1−λ) · c(wᵢ)/N
  * (document-initial tokens by the unigram term alone), with the model
  * fit on the corpus being scored. Repetitive/templated text is much
  * more predictable under a bigram model than a unigram one, so this
  * separates boilerplate from fluent-but-rare text where q43 cannot —
  * the standard perplexity-filter signal (CCNet-style) one modeling
  * class up.
  *
  * Shape (the q43 family): the token stream is exploded ONCE, in-row
  * (prev, cur) pairing — no self-join to form bigrams — and immediately
  * compressed to the (doc, prev, cur, tf) grain; the three model tables
  * (bigram counts, history counts, unigram counts + corpus total) all
  * derive FROM that compressed table, attach back by gram keys
  * (vocabulary-sized exchanges, never corpus-token-sized), and the
  * per-doc rollup sums INTEGER millibits (round(log2 · 1e3) — order-free,
  * engine-exact modulo the accepted last-ulp ln boundary the whole
  * microbit family shares). λ = 3/4 exactly representable in binary, so
  * the interpolation arithmetic is identical on both engines.
  */
object BigramLm {

  /** (doc_id, n_words, sum_millibits, bits_per_word) per doc. */
  def bigramSurprisalOf(docs: DataFrame): DataFrame = {
    val tf = Tables.fanned(docs
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), explode(expr(
          "transform(ws, (w, i) -> struct(w AS cur, CASE WHEN i = 0 THEN CAST(NULL AS STRING) ELSE element_at(ws, i) END AS prev))"))
          .as("g")))
      .select(col("doc_id"), col("g.cur").as("cur"), col("g.prev").as("prev"))
      .groupBy(col("doc_id"), col("prev"), col("cur"))
      .agg(count(lit(1)).as("tf"))
    val uni = tf.groupBy(col("cur")).agg(sum(col("tf")).as("cw"))
    val total = uni.agg(coalesce(sum(col("cw")), lit(0L)).as("n"))
    val big = tf.filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("cur")).agg(sum(col("tf")).as("cb"))
    val heads = big.groupBy(col("prev")).agg(sum(col("cb")).as("ch"))
    tf.join(uni, "cur")
      .join(big, Seq("prev", "cur"), "left")
      .join(heads, Seq("prev"), "left")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("tf"), expr(
        """CAST(round(ln(1e0 / (CASE WHEN prev IS NULL THEN CAST(cw AS DOUBLE) / n
          |                          ELSE 75e-2 * cb / ch + 25e-2 * cw / n END))
          |           / ln(2) * 1000) AS BIGINT)""".stripMargin).as("mb"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_words"),
        sum(expr("tf * mb")).as("sum_millibits"))
      .select(col("doc_id"), col("n_words"), col("sum_millibits"),
        (floor(col("sum_millibits") / (col("n_words") * 1000.0) * 10000) / 10000)
          .as("bits_per_word"))
  }

  // ---------------------------------------------------------------- q85
  def q85(spark: SparkSession, sfDir: String): DataFrame =
    bigramSurprisalOf(Tables.table(spark, sfDir, "documents"))

  private val q85Sql =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |g AS (SELECT doc_id,
      |             unnest(list_transform(ws, (w, i) -> struct_pack(
      |               cur := w,
      |               prev := CASE WHEN i = 1 THEN NULL ELSE ws[i - 1] END))) AS u
      |      FROM d),
      |tf AS (SELECT doc_id, u.prev AS prev, u.cur AS cur, count(*) AS tf
      |       FROM g GROUP BY 1, 2, 3),
      |uni AS (SELECT cur, CAST(sum(tf) AS BIGINT) AS cw FROM tf GROUP BY cur),
      |tot AS (SELECT CAST(coalesce(sum(cw), 0) AS BIGINT) AS n FROM uni),
      |big AS (SELECT prev, cur, CAST(sum(tf) AS BIGINT) AS cb
      |        FROM tf WHERE prev IS NOT NULL GROUP BY 1, 2),
      |heads AS (SELECT prev, CAST(sum(cb) AS BIGINT) AS ch FROM big GROUP BY prev),
      |mb AS (SELECT tf.doc_id, tf.tf,
      |         CAST(round(ln(1e0 / (CASE WHEN tf.prev IS NULL THEN CAST(uni.cw AS DOUBLE) / tot.n
      |                                    ELSE 75e-2 * big.cb / heads.ch + 25e-2 * uni.cw / tot.n END))
      |                    / ln(2) * 1000) AS BIGINT) AS mb
      |       FROM tf
      |       JOIN uni ON uni.cur = tf.cur
      |       LEFT JOIN big ON big.prev = tf.prev AND big.cur = tf.cur
      |       LEFT JOIN heads ON heads.prev = tf.prev
      |       CROSS JOIN tot),
      |doc AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_words,
      |               CAST(sum(tf * mb) AS BIGINT) AS sum_millibits
      |        FROM mb GROUP BY doc_id)
      |SELECT doc_id, n_words, sum_millibits,
      |       floor(sum_millibits / (n_words * 1000.0) * 10000) / 10000 AS bits_per_word
      |FROM doc""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q85_bigram_surprisal", q85, Some(q85Sql))
  )
}
