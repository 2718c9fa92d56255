package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-dup threshold sweep (q80) — pick the dedup cutoff with evidence:
  * for each candidate Jaccard threshold, one run reads off how many
  * candidate pairs survive, how many documents sit in at least one
  * surviving pair, and the token mass those documents carry — the
  * keep/remove exposure curve that decides "0.8 only touches boilerplate
  * twins, 0.3 would rewrite a third of the corpus" BEFORE q38/q67 commit
  * to clustering at one cutoff. The q68/q78 calibration family, applied
  * to the dedup stack.
  *
  * Scale shape: the pair table comes from q14's df-capped inverted index
  * (never all-pairs) and is persisted ONCE (two grid consumers — pair
  * counts and the per-doc max-similarity rollup — would otherwise rebuild
  * it); similarities quantize to integer 1e4 cells so every threshold
  * compare is integer-exact. Per-doc max-sim is a pair-table-sized
  * aggregation (corpus-fraction = dup rate); the token attach is a keyed
  * equi-join of the corpus against that small table; every per-threshold
  * measure is a conditional sum inside ONE aggregation of each input (the
  * grid never multiplies rows). Output |grid| rows.
  */
object DedupSweep {

  val defaultGrid: Seq[Double] = Seq(0.2, 0.3, 0.5, 0.7, 0.9)

  /** One row per candidate threshold over any (doc_id, text) frame.
    * Thresholds must be ≥ 0.2 (q14's pair emission floor — below it the
    * pair table itself is the bound). */
  def dedupSweepOf(docs: DataFrame, thresholds: Seq[Double] = defaultGrid,
                   dfCap: Int = TextOps.DefaultDfCap): DataFrame = {
    require(thresholds.nonEmpty && thresholds == thresholds.distinct.sorted,
      "dedupSweepOf: grid must be strictly increasing")
    require(thresholds.head >= 0.2, "dedupSweepOf: grid below the pair emission floor")
    val grid = thresholds.zipWithIndex.map { case (t, i) =>
      (t, math.round(t * 10000), i) }
    val pairs = Tables.swapPersist("q80_pairs",
      TextOps.ngramJaccardOf(docs, dfCap)
        .select(col("doc_a"), col("doc_b"),
          expr("CAST(round(jaccard * 10000) AS BIGINT)").as("j10k")))
    val pairMeasures = grid.map { case (_, t10k, i) =>
      coalesce(sum(when(col("j10k") >= t10k, 1L).otherwise(0L)), lit(0L)).as(s"np_$i") }
    val pairAgg = pairs.agg(pairMeasures.head, pairMeasures.tail: _*)
    val docMax = pairs
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"), col("j10k"))
      .groupBy(col("doc_id")).agg(max(col("j10k")).as("m"))
    val toks = docs.select(col("doc_id"), expr(
      "aggregate(split(text, ' '), 0L, (acc, w) -> acc + (length(w) + 3) div 4)").as("tok"))
    val docMeasures = grid.flatMap { case (_, t10k, i) => Seq(
      coalesce(sum(when(col("m") >= t10k, 1L).otherwise(0L)), lit(0L)).as(s"da_$i"),
      coalesce(sum(when(col("m") >= t10k, col("tok")).otherwise(0L)), lit(0L)).as(s"ta_$i")) }
    val docAgg = toks.join(docMax, "doc_id")
      .agg(docMeasures.head, docMeasures.tail: _*)
    val totals = toks.agg(count(lit(1)).as("n_docs"),
      coalesce(sum(col("tok")), lit(0L)).as("tokens_total"))
    val stackArgs = grid
      .map { case (t, _, i) => s"CAST($t AS DOUBLE), np_$i, da_$i, ta_$i" }.mkString(", ")
    pairAgg.crossJoin(docAgg).crossJoin(totals)
      .selectExpr("n_docs", "tokens_total",
        s"stack(${grid.size}, $stackArgs) AS (threshold, n_pairs, docs_affected, tokens_affected)")
      .selectExpr("threshold", "n_pairs", "docs_affected",
        "CASE WHEN n_docs = 0 THEN 0 ELSE (docs_affected * 10000) div n_docs END AS docs_share_bp",
        "tokens_affected",
        "CASE WHEN tokens_total = 0 THEN 0 ELSE (tokens_affected * 10000) div tokens_total END AS tokens_share_bp")
  }

  // ---------------------------------------------------------------- q80
  def q80(spark: SparkSession, sfDir: String): DataFrame =
    dedupSweepOf(Tables.table(spark, sfDir, "documents"))

  private def q80Sql(thresholds: Seq[Double] = defaultGrid): String = {
    val values = thresholds
      .map(t => s"(CAST($t AS DOUBLE), ${math.round(t * 10000)})").mkString(", ")
    s"""WITH pairs AS (
       |  SELECT doc_a, doc_b, CAST(round(jaccard * 10000) AS BIGINT) AS j10k
       |  FROM (${TextOps.q14SqlText.replace("\n", "\n  ")}) q14),
       |g(threshold, t10k) AS (VALUES $values),
       |pa AS (SELECT threshold,
       |         CAST(count(j10k) FILTER (WHERE j10k >= t10k) AS BIGINT) AS n_pairs
       |       FROM g LEFT JOIN pairs ON true GROUP BY threshold),
       |dm AS (SELECT doc_id, max(j10k) AS m
       |       FROM (SELECT doc_a AS doc_id, j10k FROM pairs
       |             UNION ALL SELECT doc_b, j10k FROM pairs)
       |       GROUP BY doc_id),
       |toks AS (SELECT doc_id,
       |           CAST(list_sum(list_transform(string_split(text, ' '), w -> (length(w) + 3) // 4)) AS BIGINT) AS tok
       |         FROM documents),
       |da AS (SELECT threshold,
       |         CAST(count(m) FILTER (WHERE m >= t10k) AS BIGINT) AS docs_affected,
       |         CAST(coalesce(sum(tok) FILTER (WHERE m >= t10k), 0) AS BIGINT) AS tokens_affected
       |       FROM g LEFT JOIN (SELECT toks.tok, dm.m FROM toks JOIN dm USING (doc_id)) j ON true
       |       GROUP BY threshold),
       |tot AS (SELECT count(*) AS n_docs,
       |               CAST(coalesce(sum(tok), 0) AS BIGINT) AS tokens_total FROM toks)
       |SELECT g.threshold, pa.n_pairs, da.docs_affected,
       |       CASE WHEN tot.n_docs = 0 THEN 0
       |            ELSE (da.docs_affected * 10000) // tot.n_docs END AS docs_share_bp,
       |       da.tokens_affected,
       |       CASE WHEN tot.tokens_total = 0 THEN 0
       |            ELSE (da.tokens_affected * 10000) // tot.tokens_total END AS tokens_share_bp
       |FROM g JOIN pa USING (threshold) JOIN da USING (threshold) CROSS JOIN tot""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q80_dedup_sweep", q80, Some(q80Sql()))
  )
}
