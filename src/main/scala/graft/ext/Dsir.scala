package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DSIR-style importance resampling (q76) — select raw documents whose
  * hashed-n-gram feature distribution looks like a TARGET domain (Xie et
  * al., "Data Selection for Language Models via Importance Resampling",
  * 2023: importance weights from bag-of-hashed-ngrams models of target vs
  * raw). The data-selection face of the curation stack: q42 reweights
  * whole SOURCES, q58 thresholds on a per-doc quality score; this scores
  * each doc by WHICH DISTRIBUTION its n-grams favor — the standard recipe
  * for "more like Wikipedia, less like crawl sludge" corpus shaping.
  *
  * Shape (the q43/q44 integer-log family, one corpus explode):
  *   1. gram stream: unigrams + adjacent bigrams per doc, hashed to one of
  *      `numBuckets` md5 buckets (the q54 hexVal idiom — engine-exact).
  *   2. tf: ONE explode + ONE exchange → (doc_id, bucket, count), held in
  *      the keyed persist registry (the q12/q52 persisted-base pattern —
  *      withOUT it, pushing the raw-side filter through the aggregate
  *      specializes the two tf consumers into TWO corpus explodes; the
  *      PlanSpec pin guards the single-scan shape).
  *   3. bucket stats FROM tf: ≤ numBuckets rows of (target count, raw
  *      count); add-one smoothed log-ratio quantized to integer MICROBITS
  *      (round(log2 · 1e6)) — summation is exact integer arithmetic,
  *      order-independent, so Spark and DuckDB hash identically.
  *   4. score: raw docs' tf ⋈ broadcast lr (≤ numBuckets rows) → per-doc
  *      integer weight; `selected` = the doc's bits-per-gram beats the
  *      raw-corpus AVERAGE bits-per-gram (the deterministic stand-in for
  *      DSIR's importance resampling: keep what looks more target-like
  *      than the corpus at large; an absolute `> 0` cut is meaningless
  *      under add-one smoothing, which biases every weight negative when
  *      the target slice is much smaller than the raw corpus). The
  *      compare is double-vs-double from exact integer sums — identical
  *      bits in both engines. Nothing unbounded ever collects or
  *      broadcasts beyond the B-row ratio table and two 1-row censuses.
  *
  * At 100 TB: the gram stream is exploded and shuffled exactly once into
  * the persisted tf; bucket stats are a numBuckets-bounded aggregation;
  * the scoring join is map-side against a ~KB broadcast; the per-doc
  * rollup exchanges the compressed (doc, bucket) table once, and AQE
  * reuses that stage for the corpus-average census. No window, no
  * all-pairs.
  */
object Dsir {

  /** Per-raw-doc importance verdicts. `targetCol` must be a boolean
    * column already on `docs` marking the target-domain exemplars (they
    * fit the target model and are excluded from the output). */
  def dsirResampleOf(docs: DataFrame, targetCol: String = "is_target",
                     numBuckets: Int = 256): DataFrame = {
    val grams = docs
      .select(col("doc_id"), col(targetCol).as("t"),
        split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("t"), explode(expr(
        "concat(ws, CASE WHEN size(ws) >= 2 THEN " +
          "transform(slice(ws, 1, size(ws) - 1), (w, i) -> concat(w, '_', element_at(ws, i + 2))) " +
          "ELSE CAST(array() AS ARRAY<STRING>) END)")).as("g"))
    val tf = Tables.swapPersist("dsir_tf", Tables.fanned(grams)
      .withColumn("h", md5(col("g")))
      .withColumn("b", expr(s"${TextOps.hexVal("h", 1, duck = false)} % $numBuckets"))
      .groupBy(col("doc_id"), col("t"), col("b"))
      .agg(count(lit(1)).as("tf")))
    val stats = tf.groupBy(col("b")).agg(
      sum(when(col("t"), col("tf")).otherwise(0L)).as("tc"),
      sum(when(!col("t"), col("tf")).otherwise(0L)).as("rc"))
    val totals = stats.agg(
      coalesce(sum(col("tc")), lit(0L)).as("tt"),
      coalesce(sum(col("rc")), lit(0L)).as("rt"))
    // add-one smoothing over the bucket space; single ln of a double
    // product-quotient (the q44 shape), quantized to microbits. CAST to
    // DOUBLE before the +1.0: Spark parses a bare `1.0` as DECIMAL and
    // would run the whole ratio in decimal arithmetic, whose rounding
    // diverges from DuckDB's at the microbit scale (observed ±1 in 87 of
    // 256 buckets); in pure IEEE double every step is correctly rounded
    // on identical inputs, so both engines produce the same bits
    val lr = stats.crossJoin(broadcast(totals))
      .select(col("b"), expr(
        s"CAST(round(ln(((CAST(tc AS DOUBLE) + 1.0) * (rt + $numBuckets)) / ((CAST(rc AS DOUBLE) + 1.0) * (tt + $numBuckets))) / ln(2) * 1000000) AS BIGINT)")
        .as("lr"))
    val perDoc = tf.filter(!col("t"))
      .join(broadcast(lr), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_grams"),
        sum(col("tf") * col("lr")).as("w_microbits"))
    // raw-corpus average census (1 row; AQE reuses perDoc's exchange)
    val corpus = perDoc.agg(
      coalesce(sum(col("w_microbits")), lit(0L)).as("sw"),
      coalesce(sum(col("n_grams")), lit(0L)).as("sg"))
    perDoc.crossJoin(broadcast(corpus))
      // floor-truncation on the identical double — the q43 4-dp idiom
      .select(col("doc_id"), col("n_grams"), col("w_microbits"),
        (floor(col("w_microbits") / (col("n_grams") * 100.0)) / 10000.0).as("w_bits_per_gram"),
        (col("w_microbits").cast("double") / col("n_grams") >
          col("sw").cast("double") / col("sg")).cast("int").as("selected"))
  }

  // ---------------------------------------------------------------- q76
  /** Fixture instantiation: target domain = source 'src7'; every other
    * doc is raw and gets a verdict. */
  def q76(spark: SparkSession, sfDir: String): DataFrame =
    dsirResampleOf(Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"),
        (col("source") === "src7").as("is_target")))

  private def q76Sql(numBuckets: Int = 256): String =
    s"""WITH d AS (
       |  SELECT doc_id, source = 'src7' AS t, string_split(text, ' ') AS ws
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, t,
       |         unnest(list_concat(ws, CASE WHEN len(ws) >= 2 THEN
       |           list_transform(range(1, len(ws)), i -> ws[i] || '_' || ws[i+1])
       |           ELSE []::VARCHAR[] END)) AS g
       |  FROM d),
       |tf AS (
       |  SELECT doc_id, t, ${TextOps.hexVal("md5(g)", 1, duck = true)} % $numBuckets AS b,
       |         count(*) AS tf
       |  FROM g GROUP BY 1, 2, 3),
       |st AS (
       |  SELECT b, sum(CASE WHEN t THEN tf ELSE 0 END) AS tc,
       |            sum(CASE WHEN NOT t THEN tf ELSE 0 END) AS rc
       |  FROM tf GROUP BY b),
       |tot AS (
       |  SELECT coalesce(sum(tc), 0) AS tt, coalesce(sum(rc), 0) AS rt FROM st),
       |lr AS (
       |  SELECT b, CAST(round(ln(((CAST(tc AS DOUBLE) + 1.0) * (rt + $numBuckets)) /
       |                         ((CAST(rc AS DOUBLE) + 1.0) * (tt + $numBuckets))) / ln(2) * 1000000) AS BIGINT) AS lr
       |  FROM st CROSS JOIN tot),
       |dd AS (
       |  SELECT tf.doc_id,
       |         CAST(sum(tf.tf) AS BIGINT) AS n_grams,
       |         CAST(sum(tf.tf * lr.lr) AS BIGINT) AS w_microbits
       |  FROM tf JOIN lr USING (b)
       |  WHERE NOT tf.t
       |  GROUP BY tf.doc_id),
       |ct AS (
       |  SELECT CAST(coalesce(sum(w_microbits), 0) AS BIGINT) AS sw,
       |         CAST(coalesce(sum(n_grams), 0) AS BIGINT) AS sg
       |  FROM dd)
       |SELECT doc_id, n_grams, w_microbits,
       |       floor(w_microbits / (n_grams * 100.0)) / 10000.0 AS w_bits_per_gram,
       |       CASE WHEN CAST(w_microbits AS DOUBLE) / n_grams >
       |                 CAST(sw AS DOUBLE) / sg THEN 1 ELSE 0 END AS selected
       |FROM dd CROSS JOIN ct""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q76_dsir_resample", q76, Some(q76Sql()))
  )
}
