package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Context-length sweep (q78) — the "pick the training context length"
  * audit: for each candidate sequence length L, one pass over the corpus
  * reads off how much token mass survives truncation at L, how many
  * documents overflow, the bin lower bound for packing at L, and the
  * padding waste that bound implies. The decision it feeds: a longer
  * context keeps more of each long document but pads more of every short
  * one (q33's packer then executes whatever L wins).
  *
  * Scale shape (the q68 grid-in-agg trick): token counts are an in-row
  * fold (q17's BPE-ish (len+3) div 4 — no explode), and every candidate L
  * is a triple of conditional partial aggregates inside ONE global hash
  * aggregation — the map side emits one |grid|-wide row per partition,
  * never |corpus| × |grid| exploded rows; the single-row wide result
  * unpivots in-row (stack) after the 1-row exchange. All derived measures
  * are integer arithmetic (basis points via `div`) — engine-exact.
  *
  * `bins_lb` is the ceil(tokens/L) LOWER bound on bins (any packer,
  * including q33's deterministic lane packer, uses at least that many);
  * `pad_waste_bp` is the padding share AT that bound — the best-case
  * waste, honest about being a bound rather than a simulation of one
  * packer's behavior. */
object ContextSweep {

  val defaultGrid: Seq[Long] = Seq(128L, 256L, 512L, 1024L, 2048L)

  /** One row per candidate L over any (doc_id, text) frame. */
  def contextSweepOf(docs: DataFrame, grid: Seq[Long] = defaultGrid): DataFrame = {
    require(grid.nonEmpty && grid == grid.distinct.sorted && grid.head > 0,
      "contextSweepOf: grid must be positive, strictly increasing")
    val toks = docs.select(expr(
      "aggregate(split(text, ' '), 0L, (acc, w) -> acc + (length(w) + 3) div 4)").as("tok"))
    val perL = grid.zipWithIndex.flatMap { case (l, i) => Seq(
      coalesce(sum(when(col("tok") > l, 1L).otherwise(0L)), lit(0L)).as(s"ov_$i"),
      coalesce(sum(least(col("tok"), lit(l))), lit(0L)).as(s"tk_$i"),
      coalesce(sum(greatest(col("tok") - l, lit(0L))), lit(0L)).as(s"tc_$i")) }
    val wide = toks.agg(count(lit(1)).as("n_docs"),
      (coalesce(sum(col("tok")), lit(0L)).as("tokens_total") +: perL): _*)
    val stackArgs = grid.zipWithIndex
      .map { case (l, i) => s"CAST($l AS BIGINT), ov_$i, tk_$i, tc_$i" }.mkString(", ")
    wide.selectExpr("n_docs", "tokens_total",
        s"stack(${grid.size}, $stackArgs) AS (context_len, docs_over, tokens_kept, tokens_clipped)")
      .selectExpr("context_len", "n_docs", "docs_over",
        "tokens_total", "tokens_kept", "tokens_clipped",
        "(tokens_kept + context_len - 1) div context_len AS bins_lb",
        """CASE WHEN tokens_kept = 0 THEN 0
          |     ELSE ((((tokens_kept + context_len - 1) div context_len) * context_len - tokens_kept) * 10000)
          |          div (((tokens_kept + context_len - 1) div context_len) * context_len) END AS pad_waste_bp""".stripMargin,
        "CASE WHEN tokens_total = 0 THEN 0 ELSE (tokens_clipped * 10000) div tokens_total END AS trunc_share_bp")
  }

  // ---------------------------------------------------------------- q78
  def q78(spark: SparkSession, sfDir: String): DataFrame =
    contextSweepOf(Tables.table(spark, sfDir, "documents"))

  private def q78Sql(grid: Seq[Long] = defaultGrid): String = {
    val values = grid.map(l => s"(CAST($l AS BIGINT))").mkString(", ")
    s"""WITH d AS (SELECT string_split(text, ' ') AS ws FROM documents),
       |tok AS (SELECT CAST(list_sum(list_transform(ws, w -> (length(w) + 3) // 4)) AS BIGINT) AS tok
       |        FROM d),
       |g(context_len) AS (VALUES $values),
       |agg AS (SELECT context_len,
       |          count(tok) AS n_docs,
       |          CAST(coalesce(sum(tok), 0) AS BIGINT) AS tokens_total,
       |          CAST(count(*) FILTER (WHERE tok > context_len) AS BIGINT) AS docs_over,
       |          CAST(coalesce(sum(least(tok, context_len)), 0) AS BIGINT) AS tokens_kept,
       |          CAST(coalesce(sum(greatest(tok - context_len, 0)), 0) AS BIGINT) AS tokens_clipped
       |        FROM g LEFT JOIN tok ON true
       |        GROUP BY context_len)
       |SELECT context_len, n_docs, docs_over, tokens_total, tokens_kept, tokens_clipped,
       |       (tokens_kept + context_len - 1) // context_len AS bins_lb,
       |       CASE WHEN tokens_kept = 0 THEN 0
       |            ELSE ((((tokens_kept + context_len - 1) // context_len) * context_len - tokens_kept) * 10000)
       |                 // (((tokens_kept + context_len - 1) // context_len) * context_len) END AS pad_waste_bp,
       |       CASE WHEN tokens_total = 0 THEN 0
       |            ELSE (tokens_clipped * 10000) // tokens_total END AS trunc_share_bp
       |FROM agg""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q78_context_sweep", q78, Some(q78Sql()))
  )
}
