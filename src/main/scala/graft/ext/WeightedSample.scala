package graft.ext

import graft.agg.TopK
import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Weighted sampling without replacement (q83) — exact-size per-source
  * samples where a document's inclusion probability is proportional to
  * its weight, via the Efraimidis–Spirakis key: key = ln(u) / w with u a
  * per-doc deterministic uniform; the k LARGEST keys per group are
  * precisely a weight-proportional k-sample without replacement. This is
  * the principled exact-k cousin of the repo's Bernoulli md5-threshold
  * family (q26/q42/q58): those hit a RATE, this hits a SIZE — "give me
  * exactly 10k docs per source, quality-weighted" is the curation ask it
  * answers.
  *
  * Determinism: u derives from the q54 md5-hexVal idiom ((h+0.5)/2³²,
  * never 0 or 1), w is q16's 4-dp quality score, and the key is
  * floor-quantized to integer NANO units before ranking — the same
  * quantize-before-compare defense the microbit family uses against
  * last-ulp ln() divergence between engines; ties at the quantized grain
  * break by doc_id.
  *
  * Scale shape: scoring is pure map-side; the per-source top-k reduces
  * through the bounded [[TopK]] aggregator, so the single exchange
  * carries ≤ k·partitions rows per source — never a corpus window (the
  * row_number formulation would shuffle and sort every doc of a
  * billion-doc source first).
  */
object WeightedSample {

  /** (source, rank, doc_id, key_nano): the k docs per source with the
    * largest ES keys, rank 1..k by (key desc, doc_id asc). Docs with
    * non-positive weight are excluded (zero weight = never sampled). */
  def weightedSampleOf(docs: DataFrame, k: Int = 5): DataFrame = {
    val keyed = TextOps.scoredDocs(docs)
      .filter(col("quality_score") > 0)
      .select(col("doc_id"), col("source"), col("quality_score"),
        md5(concat(lit("wsamp|"), col("doc_id"))).as("h"))
      .withColumn("u", expr(
        s"(CAST(${TextOps.hexVal("h", 1, duck = false)} AS DOUBLE) + 5e-1) / 4294967296e0"))
      .withColumn("key_nano", expr(
        "CAST(floor(ln(u) / quality_score * 1e9) AS BIGINT)"))
    keyed
      .groupBy(col("source"))
      .agg(TopK(k)(col("key_nano").cast("double"), col("doc_id")).as("top"))
      .select(col("source"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("source"), (col("i") + 1).cast("long").as("rank"),
        col("t.id").as("doc_id"), col("t.score").cast("long").as("key_nano"))
  }

  // ---------------------------------------------------------------- q83
  def q83(spark: SparkSession, sfDir: String): DataFrame =
    weightedSampleOf(Tables.table(spark, sfDir, "documents"))

  private def q83Sql(k: Int = 5): String =
    s"""WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
       |s AS (SELECT doc_id, source,
       |        len(ws)::BIGINT AS n_words,
       |        round(len(list_distinct(ws)) / len(ws), 4) AS ttr,
       |        round(len(list_filter(ws, w -> w in ('the', 'a', 'of', 'and', 'to', 'in'))) / len(ws), 4) AS stop_ratio
       |      FROM d),
       |q AS (SELECT doc_id, source,
       |        floor((0.4 * ttr + 0.3 * least(n_words / 100.0, 1.0) + 0.3 * (1.0 - stop_ratio)) * 10000) / 10000 AS quality_score
       |      FROM s),
       |ky AS (SELECT doc_id, source,
       |         CAST(floor(ln((CAST(${TextOps.hexVal("md5('wsamp|' || doc_id)", 1, duck = true)} AS DOUBLE) + 5e-1) / 4294967296e0)
       |                    / quality_score * 1e9) AS BIGINT) AS key_nano
       |       FROM q WHERE quality_score > 0),
       |r AS (SELECT source, doc_id, key_nano,
       |             row_number() OVER (PARTITION BY source
       |                                ORDER BY key_nano DESC, doc_id) AS rank
       |      FROM ky)
       |SELECT source, CAST(rank AS BIGINT) AS rank, doc_id, key_nano
       |FROM r WHERE rank <= $k""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q83_weighted_sample", q83, Some(q83Sql()))
  )
}
