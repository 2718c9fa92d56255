package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto skyline (q123) — the classic SKYLINE operator over
  * (length, quality): the documents no other document dominates (≥ in
  * both dimensions, > in at least one, maximizing both). The
  * data-selection face: frontier docs are the best quality available at
  * every length budget, and the frontier's SHAPE says whether quality
  * must be traded for length in this corpus at all. Completes the
  * operator classes: joins, windows, sets (q122), grouping sets (q114),
  * top-k (q115) — and now preference queries.
  *
  * Block-nested-loop skyline algorithms compare pairs; this corpus
  * never pairs: both dimensions live on bounded integer grids (word
  * count, 4-dp score), so the corpus aggregates ONCE to the
  * (n_words → max q10k) census and the frontier is a strict
  * running-max scan over it — a cell survives iff its best quality
  * strictly exceeds every LONGER cell's best (ties dominate toward the
  * longer doc, the standard skyline convention). Census windows only;
  * no pairwise pass, no corpus sort.
  *
  * Output carries the doc count at each frontier point (several docs
  * can share the frontier cell).
  */
object Skyline {

  /** (n_words, q10k, n_docs) — the Pareto-frontier cells, maximizing
    * both dimensions, over any (doc_id, text) frame. */
  def skylineOf(docs: DataFrame): DataFrame = {
    // persisted: the census branch and the frontier attach both read the
    // scored rows, not the scoring expressions twice (the q113 lesson)
    val scored = Tables.swapPersist("q123_scored",
      TextOps.scoredDocs(docs)
        .select(col("n_words"),
          expr("CAST(round(quality_score * 10000) AS BIGINT)").as("q10k")))
    val cells = scored.groupBy(col("n_words"))
      .agg(max(col("q10k")).as("best_q"))
    // strict running max over STRICTLY longer cells: rows with no longer
    // cell get NULL -> frontier by definition
    val wLonger = Window.orderBy(col("n_words").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = cells
      .withColumn("best_longer", max(col("best_q")).over(wLonger))
      .filter(col("best_longer").isNull || col("best_q") > col("best_longer"))
      .select(col("n_words"), col("best_q").as("q10k"))
    scored.join(broadcast(frontier), Seq("n_words", "q10k"))
      .groupBy(col("n_words"), col("q10k"))
      .agg(count(lit(1)).as("n_docs"))
  }

  // ---------------------------------------------------------------- q123
  def q123(spark: SparkSession, sfDir: String): DataFrame =
    skylineOf(Tables.table(spark, sfDir, "documents"))

  private val q123Sql =
    """WITH dd AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |ss AS (SELECT doc_id,
      |         len(ws)::BIGINT AS n_words,
      |         round(len(list_distinct(ws)) / len(ws), 4) AS ttr,
      |         round(len(list_filter(ws, w -> w in ('the', 'a', 'of', 'and', 'to', 'in'))) / len(ws), 4) AS stop_ratio
      |       FROM dd),
      |sc AS (SELECT n_words,
      |         CAST(round(floor((0.4 * ttr + 0.3 * least(n_words / 100.0, 1.0) + 0.3 * (1.0 - stop_ratio)) * 10000) / 10000 * 10000) AS BIGINT) AS q10k
      |       FROM ss),
      |c AS (SELECT n_words, max(q10k) AS best_q FROM sc GROUP BY n_words),
      |f AS (SELECT n_words, best_q AS q10k,
      |             max(best_q) OVER (ORDER BY n_words DESC
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_longer
      |      FROM c)
      |SELECT sc.n_words, sc.q10k, count(*) AS n_docs
      |FROM sc JOIN f ON sc.n_words = f.n_words AND sc.q10k = f.q10k
      |WHERE f.best_longer IS NULL OR f.q10k > f.best_longer
      |GROUP BY sc.n_words, sc.q10k""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q123_skyline", q123, Some(q123Sql))
  )
}
