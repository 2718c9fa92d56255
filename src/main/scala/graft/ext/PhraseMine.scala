package graft.ext

import graft.agg.TopK
import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phrase mining (q93) — adjacent-bigram PMI collocations, the
  * word2phrase recipe: a bigram whose joint count far exceeds what its
  * parts' frequencies predict (high pointwise mutual information) is a
  * PHRASE ("new york", "machine learning") worth fusing into one token
  * before tokenizer training / n-gram features. Completes the
  * tokenizer-induction family at word grain (q70 mines CHARACTER pairs
  * for BPE; this mines WORD pairs for phrases).
  *
  * score = PMI quantized to integer microbits:
  * round(ln((cb·N)/(ca·cc)) / ln 2 · 1e6) with cb = bigram count, ca/cc
  * = the parts' unigram counts, N = corpus token count — all integers
  * into one ln (the q44 product-quotient shape). A `minCount` floor
  * drops hapax bigrams whose PMI is spuriously high (the standard
  * word2phrase discount, as a hard floor for engine-exactness).
  *
  * Shape: ONE token explode with in-row (prev, cur) pairing (q85's
  * no-self-join trick) → bigram and unigram counts both derive from the
  * same compressed stream at vocabulary grain → PMI map-side after two
  * vocab-keyed attaches → global top-k through the bounded [[TopK]]
  * aggregator (≤ k·partitions rows to the final reduce, no window).
  */
object PhraseMine {

  /** (rank, phrase, n, pmi_microbits): top-k adjacent bigrams with
    * count ≥ minCount, ranked by (PMI desc, phrase asc). */
  def phrasesOf(docs: DataFrame, k: Int = 50, minCount: Int = 5): DataFrame = {
    val grams = Tables.fanned(docs
        .select(split(col("text"), " ").as("ws"))
        .select(explode(expr(
          "transform(ws, (w, i) -> struct(w AS cur, CASE WHEN i = 0 THEN CAST(NULL AS STRING) ELSE element_at(ws, i) END AS prev))"))
          .as("g")))
      .select(col("g.cur").as("cur"), col("g.prev").as("prev"))
    val uni = grams.groupBy(col("cur")).agg(count(lit(1)).as("c"))
    val total = uni.agg(coalesce(sum(col("c")), lit(0L)).as("n"))
    val big = grams.filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("cb"))
      .filter(col("cb") >= minCount)
    val scored = big
      .join(uni.select(col("cur").as("prev"), col("c").as("ca")), "prev")
      .join(uni.select(col("cur"), col("c").as("cc")), "cur")
      .crossJoin(broadcast(total))
      .select(concat(col("prev"), lit(" "), col("cur")).as("phrase"), col("cb"),
        expr("CAST(round(ln((CAST(cb AS DOUBLE) * n) / (CAST(ca AS DOUBLE) * cc)) / ln(2) * 1000000) AS BIGINT)")
          .as("pmi"))
    // rank by (pmi desc, phrase asc): TopK orders (score desc, id asc) on
    // longs — use a dense phrase index? Simpler: tiny surviving set at any
    // minCount worth mining — but stay bounded anyway: TopK on pmi with a
    // deterministic md5-int tiebreak would break ties arbitrarily; the
    // phrase-string tiebreak needs the sort, so sort the BOUNDED survivors
    // (|bigrams ≥ minCount| ≤ vocab — vocabulary-scale, never corpus) and
    // take k via limit after an explicit orderBy.
    scored.orderBy(col("pmi").desc, col("phrase"))
      .limit(k)
      .select(
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("pmi").desc, col("phrase")))).cast("long").as("rank"),
        col("phrase"), col("cb").as("n"), col("pmi").as("pmi_microbits"))
  }

  // ---------------------------------------------------------------- q93
  def q93(spark: SparkSession, sfDir: String): DataFrame =
    phrasesOf(Tables.table(spark, sfDir, "documents"))

  private def q93Sql(k: Int = 50, minCount: Int = 5): String =
    s"""WITH d AS (SELECT string_split(text, ' ') AS ws FROM documents),
       |g AS (SELECT unnest(list_transform(ws, (w, i) -> struct_pack(
       |               cur := w,
       |               prev := CASE WHEN i = 1 THEN NULL ELSE ws[i - 1] END))) AS u
       |      FROM d),
       |t AS (SELECT u.cur AS cur, u.prev AS prev FROM g),
       |uni AS (SELECT cur, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY cur),
       |tot AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n FROM uni),
       |big AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS cb
       |        FROM t WHERE prev IS NOT NULL GROUP BY 1, 2
       |        HAVING count(*) >= $minCount),
       |sc AS (SELECT big.prev || ' ' || big.cur AS phrase, big.cb,
       |              CAST(round(ln((CAST(big.cb AS DOUBLE) * tot.n) /
       |                            (CAST(ua.c AS DOUBLE) * uc.c)) / ln(2) * 1000000) AS BIGINT) AS pmi
       |       FROM big
       |       JOIN uni ua ON ua.cur = big.prev
       |       JOIN uni uc ON uc.cur = big.cur
       |       CROSS JOIN tot)
       |SELECT CAST(row_number() OVER (ORDER BY pmi DESC, phrase) AS BIGINT) AS rank,
       |       phrase, cb AS n, pmi AS pmi_microbits
       |FROM sc
       |ORDER BY pmi DESC, phrase
       |LIMIT $k""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q93_phrase_mining", q93, Some(q93Sql()))
  )
}
