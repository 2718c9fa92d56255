package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Context-length fit census (q127) — for each candidate context window,
  * what fraction of each source's documents fit whole, and how many
  * tokens truncation would discard: the capacity-planning table behind
  * choosing a training sequence length (pairs with q33's sequence
  * packing, which consumes the chosen length, and q58's token budgeting).
  * Token counts use q17's BPE-ish estimator ((len(word)+3) div 4, summed
  * in-row) so all three views price tokens identically. Window sizes are
  * parameters; the fixture default uses {32,64,128,256} to straddle the
  * synthetic corpus's 12–140-token docs (production calls pass
  * {512,...,8192}).
  *
  * Scale shape: per-doc token counts are in-row array folds over ONE
  * scan (no explode of words); each doc emits |windows| (source, ctx_len)
  * rows via a literal-array explode (bounded fan-out, map-side); the
  * only exchange is the ≤|sources|·|windows|-row census rollup with
  * map-side partials. No joins, no windows-the-operator.
  */
object ContextFit {

  /** (source, ctx_len, n_docs, n_fit, fit_bp, tokens_total, tokens_kept,
    * loss_bp) over any (source, text) frame. */
  def contextFitOf(docs: DataFrame, windows: Seq[Int] = Seq(32, 64, 128, 256)): DataFrame =
    docs
      .select(col("source"),
        expr("aggregate(split(text, ' '), 0L, (acc, w) -> acc + (length(w) + 3) div 4)")
          .as("toks"))
      .select(col("source"), col("toks"),
        explode(lit(windows.map(_.toLong).toArray)).as("ctx_len"))
      .groupBy(col("source"), col("ctx_len"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("toks") <= col("ctx_len"), 1)).as("n_fit"),
        sum(col("toks")).as("tokens_total"),
        sum(least(col("toks"), col("ctx_len"))).as("tokens_kept"))
      .select(col("source"), col("ctx_len"), col("n_docs"), col("n_fit"),
        expr("n_fit * 10000 div n_docs").as("fit_bp"),
        col("tokens_total"), col("tokens_kept"),
        // same zero-token guard discipline as q138: Spark div NULLs on 0,
        // DuckDB // errors — make both engines agree on NULL
        expr("CASE WHEN tokens_total = 0 THEN NULL ELSE (tokens_total - tokens_kept) * 10000 div tokens_total END").as("loss_bp"))

  // ---------------------------------------------------------------- q127
  def q127(spark: SparkSession, sfDir: String): DataFrame =
    contextFitOf(Tables.table(spark, sfDir, "documents"))

  private def q127Sql(windows: Seq[Int] = Seq(32, 64, 128, 256)): String = {
    val values = windows.map(w => s"($w)").mkString(", ")
    s"""WITH t AS (
       |  SELECT source,
       |         CAST(list_sum(list_transform(string_split(text, ' '),
       |           w -> (length(w) + 3) // 4)) AS BIGINT) AS toks
       |  FROM documents),
       |x AS (SELECT t.source, CAST(w.win AS BIGINT) AS ctx_len, t.toks
       |      FROM t CROSS JOIN (VALUES $values) AS w(win)),
       |g AS (SELECT source, ctx_len, count(*) AS n_docs,
       |             CAST(count(CASE WHEN toks <= ctx_len THEN 1 END) AS BIGINT) AS n_fit,
       |             CAST(sum(toks) AS BIGINT) AS tokens_total,
       |             CAST(sum(least(toks, ctx_len)) AS BIGINT) AS tokens_kept
       |      FROM x GROUP BY 1, 2)
       |SELECT source, ctx_len, n_docs, n_fit,
       |       CAST(n_fit * 10000 // n_docs AS BIGINT) AS fit_bp,
       |       tokens_total, tokens_kept,
       |       CASE WHEN tokens_total = 0 THEN NULL ELSE CAST((tokens_total - tokens_kept) * 10000 // tokens_total AS BIGINT) END AS loss_bp
       |FROM g""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q127_context_fit", q127, Some(q127Sql()))
  )
}
