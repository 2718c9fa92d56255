package graft.ext

import graft.agg.PercentileDisc
import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Robust per-source outlier filtering (q65) — median / MAD (median
  * absolute deviation), the robust-statistics quality gate: a doc is an
  * outlier within its source when its length deviates from the source
  * MEDIAN by more than k × the source's MAD. Unlike mean/stddev z-scores
  * (which the outliers themselves drag — one 10 MB page shifts a crawl
  * source's mean), the median/MAD pair has a 50% breakdown point, which
  * is why production length-filtering uses it; k = 3 ≈ the classic
  * "3 robust sigmas". A degenerate source (MAD = 0: over half the docs
  * share one length) flags EVERY deviating doc — the conservative
  * convention. Both location and scale are the repo's exact discrete
  * percentile ([[PercentileDisc]], `sorted[floor(0.5·(n−1))]`), so every
  * output column is an exact integer and the oracle is hash-exact with
  * no rounding idiom needed.
  *
  * Scale shape: the thin (doc_id, source, x) feature frame persists ONCE
  * (keyed; the median pass and both deviation passes read the cache —
  * the single parquet scan lives inside it). Each percentile pass is a
  * source-keyed aggregation with map-side partial buffers (one buffer
  * per source × partition reaches the exchange) whose ≤ |sources|-row
  * result is `localCheckpoint`ed (eager tiny job, the OutlierPrune
  * threshold precedent — so the aggregate never re-executes per
  * reference) and broadcast back; the verdict is map-side integer
  * arithmetic. The exact-percentile buffer is O(source) — at 100 TB swap
  * the q24 sketch percentile as an explicitly-chosen operator (the
  * OutlierPrune `approx` precedent), never a silent substitution. */
object RobustOutlier {

  /** General form over any (doc_id, source, text) frame. Output: one row
    * per doc — (doc_id, source, n_words, med, deviation, mad,
    * is_outlier). */
  def madOutliersOf(docs: DataFrame, k: Double = 3.0): DataFrame = {
    val f = Tables.swapPersist("mad_base",
      docs.select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("x")))
    val med = f.groupBy(col("source"))
      .agg(PercentileDisc.at(0.5)(col("x").cast("double")).cast("long").as("med"))
      .localCheckpoint()
    val dev = f.join(broadcast(med), "source")
      .withColumn("dv", abs(col("x") - col("med")))
    val mad = dev.groupBy(col("source"))
      .agg(PercentileDisc.at(0.5)(col("dv").cast("double")).cast("long").as("mad"))
      .localCheckpoint()
    dev.join(broadcast(mad), "source")
      .select(col("doc_id"), col("source"), col("x").as("n_words"),
        col("med"), col("dv").as("deviation"), col("mad"),
        (col("dv") > lit(k) * col("mad")).cast("int").as("is_outlier"))
  }

  // ---------------------------------------------------------------- q65
  def q65(spark: SparkSession, sfDir: String): DataFrame =
    madOutliersOf(Tables.table(spark, sfDir, "documents"))

  private def q65Sql(k: Double = 3.0): String =
    s"""WITH f AS (SELECT doc_id, source,
       |             CAST(len(string_split(text, ' ')) AS BIGINT) AS x
       |           FROM documents),
       |med AS (
       |  SELECT source, x AS med FROM (
       |    SELECT source, x,
       |           row_number() OVER (PARTITION BY source ORDER BY x) AS rn,
       |           count(*) OVER (PARTITION BY source) AS cnt
       |    FROM f) t
       |  WHERE rn = CAST(floor(0.5 * (cnt - 1)) AS BIGINT) + 1),
       |dev AS (
       |  SELECT f.doc_id, f.source, f.x, m.med, abs(f.x - m.med) AS dv
       |  FROM f JOIN med m USING (source)),
       |mad AS (
       |  SELECT source, dv AS mad FROM (
       |    SELECT source, dv,
       |           row_number() OVER (PARTITION BY source ORDER BY dv) AS rn,
       |           count(*) OVER (PARTITION BY source) AS cnt
       |    FROM dev) t
       |  WHERE rn = CAST(floor(0.5 * (cnt - 1)) AS BIGINT) + 1)
       |SELECT d.doc_id, d.source, d.x AS n_words, d.med, d.dv AS deviation,
       |       a.mad, CASE WHEN d.dv > $k * a.mad THEN 1 ELSE 0 END AS is_outlier
       |FROM dev d JOIN mad a USING (source)""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q65_mad_outliers", q65, Some(q65Sql()))
  )
}
