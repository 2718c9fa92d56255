package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Joint length × quality decile matrix (q118) — the 2D companion to
  * q105's marginal deciles and q108's scalar r²: a ≤10×10 contingency
  * table of (length decile, quality decile) document counts, each cell
  * alongside its independence expectation (row·col/n in micro-units).
  * Where q108 says "how correlated", this says WHERE the mass sits —
  * e.g. a quality filter that only bites in the shortest two length
  * deciles shows up as an L-shaped ridge here and nowhere else. The
  * cells are exactly what a chi-square independence test consumes.
  *
  * Both decile assignments use q105's histogram discipline: lengths and
  * 4-dp quality scores live on bounded integer grids, so each axis's
  * rank deciles are recovered from ONE bounded histogram (cumulative
  * windows over the census) and the per-doc assignment is an equi-join
  * of the doc's cell value against the broadcast cell→decile map — no
  * corpus sort, no NTILE range exchange, ties never straddle.
  *
  * Scale shape: the scored corpus persists once (three cache readers:
  * two histograms + the final assignment); the only corpus-sized
  * exchanges are the two bounded histogram aggregations and the final
  * ≤100-row matrix rollup. Expectations are exact integer arithmetic on
  * the matrix's own marginals.
  */
object DecileMatrix {

  /** cell→decile map from a bounded (cell) histogram: decile of the
    * cell's LAST rank, the q105 rule. */
  private def decileMap(cells: DataFrame, cellCol: String): DataFrame = {
    val wCum = Window.orderBy(col(cellCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.groupBy(col(cellCol)).agg(count(lit(1)).as("docs"))
      .withColumn("cum", sum(col("docs")).over(wCum))
      .withColumn("n", sum(col("docs")).over(Window.partitionBy()))
      .select(col(cellCol), expr("(cum - 1) * 10 div n + 1").as(s"${cellCol}_decile"))
  }

  /** (len_decile, q_decile, n_docs, exp_micro) over any (doc_id, text)
    * frame; exp_micro = row_total·col_total·10⁶ div n — the independence
    * expectation in micro-docs. */
  def decileMatrixOf(docs: DataFrame): DataFrame = {
    val scored = Tables.swapPersist("q118_scored",
      TextOps.scoredDocs(docs).select(col("n_words"),
        expr("CAST(round(quality_score * 10000) AS BIGINT)").as("q10k")))
    val obs = scored
      .join(broadcast(decileMap(scored, "n_words")), "n_words")
      .join(broadcast(decileMap(scored, "q10k")), "q10k")
      .groupBy(col("n_words_decile").as("len_decile"),
        col("q10k_decile").as("q_decile"))
      .agg(count(lit(1)).as("n_docs"))
    val wL = Window.partitionBy(col("len_decile"))
    val wQ = Window.partitionBy(col("q_decile"))
    obs
      .withColumn("row_tot", sum(col("n_docs")).over(wL))
      .withColumn("col_tot", sum(col("n_docs")).over(wQ))
      .withColumn("n", sum(col("n_docs")).over(Window.partitionBy()))
      // the marginal product is computed in DECIMAL(38,0): row_tot·col_tot
      // is ~n²/100 and ×10⁶ overflows int64 once the corpus passes ~3e7
      // docs (ANSI mode would abort). The decimal staging matches the
      // DuckDB mirror exactly — there sum(BIGINT) widens to HUGEINT — and
      // `div` still emits BIGINT. The RESULT fits int64 as long as
      // n·10⁶ < 2⁶³ (exp_micro ≤ min(row,col)·10⁶ ≤ n·10⁶), i.e. up to
      // ~9e12 docs — the same documented bound family as q106/q107/q120.
      .select(col("len_decile"), col("q_decile"), col("n_docs"),
        expr("CAST(row_tot AS DECIMAL(38,0)) * col_tot * 1000000 div n")
          .as("exp_micro"))
  }

  // ---------------------------------------------------------------- q118
  def q118(spark: SparkSession, sfDir: String): DataFrame =
    decileMatrixOf(Tables.table(spark, sfDir, "documents"))

  private val q118Sql =
    """WITH dd AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |ss AS (SELECT doc_id,
      |         len(ws)::BIGINT AS n_words,
      |         round(len(list_distinct(ws)) / len(ws), 4) AS ttr,
      |         round(len(list_filter(ws, w -> w in ('the', 'a', 'of', 'and', 'to', 'in'))) / len(ws), 4) AS stop_ratio
      |       FROM dd),
      |sc AS (SELECT n_words,
      |         CAST(round(floor((0.4 * ttr + 0.3 * least(n_words / 100.0, 1.0) + 0.3 * (1.0 - stop_ratio)) * 10000) / 10000 * 10000) AS BIGINT) AS q10k
      |       FROM ss),
      |lh AS (SELECT n_words, count(*) AS docs FROM sc GROUP BY n_words),
      |lm AS (SELECT n_words,
      |              (sum(docs) OVER (ORDER BY n_words ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
      |                * 10 // (sum(docs) OVER ()) + 1 AS len_decile
      |       FROM lh),
      |qh AS (SELECT q10k, count(*) AS docs FROM sc GROUP BY q10k),
      |qm AS (SELECT q10k,
      |              (sum(docs) OVER (ORDER BY q10k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
      |                * 10 // (sum(docs) OVER ()) + 1 AS q_decile
      |       FROM qh),
      |obs AS (SELECT CAST(lm.len_decile AS BIGINT) AS len_decile,
      |               CAST(qm.q_decile AS BIGINT) AS q_decile,
      |               count(*) AS n_docs
      |        FROM sc JOIN lm USING (n_words) JOIN qm USING (q10k)
      |        GROUP BY 1, 2)
      |SELECT len_decile, q_decile, n_docs,
      |       CAST(sum(n_docs) OVER (PARTITION BY len_decile)
      |            * sum(n_docs) OVER (PARTITION BY q_decile)
      |            * 1000000 // sum(n_docs) OVER () AS BIGINT) AS exp_micro
      |FROM obs""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q118_decile_matrix", q118, Some(q118Sql))
  )
}
