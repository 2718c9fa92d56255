package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** N-gram novelty scoring (q59) — per-document "how much of this text
  * exists nowhere else in the corpus": the fraction of a document's
  * distinct word 3-grams whose corpus document-frequency is exactly 1.
  * The inverse of dedup's signal — near-dups and boilerplate-heavy docs
  * score ≈ 0, fresh content scores ≈ 1 — and the standard cheap
  * diversity/memorization-risk feature next to TF-IDF (q29 ranks terms
  * WITHIN a doc; q59 scores the DOC against the corpus).
  *
  * Shares [[TextOps.shingleArr]] with q12/q14 (native `word_ngrams`,
  * in-row distinct, docs under 3 words dropped) so "3-gram" cannot drift
  * between the dedup and novelty sides. The ratio is floor-truncated to
  * 4 dp (the q16 idiom) for a cross-engine-exact oracle.
  *
  * Scale shape: the shingle base is materialized ONCE (keyed persist —
  * the q12 pattern; both derivations read the cache). The denominator
  * never leaves the row (`size(sarr)`); the numerator only needs df = 1
  * shingles, whose posting "list" is BY DEFINITION a single doc_id — so
  * the shingle stream is aggregated once on the shingle key
  * (count + min(doc_id), map-side partials) and singletons roll up
  * per-doc, with NO df column ever joined back through a shingle-keyed
  * corpus×corpus join and no posting-list pair expansion (hence no dfCap:
  * cost is linear in distinct shingle instances). The final attach is a
  * thin doc-keyed left join of the ≤ |docs|-row unique-count table.
  */
object Novelty {

  /** (doc_id, n_ngrams, n_unique, novelty) over any (doc_id, text) frame;
    * docs with fewer than 3 words have no 3-grams and are dropped (the
    * shingleArr contract q12/q14 share). */
  def ngramNoveltyOf(docs: DataFrame): DataFrame = {
    val base = Tables.swapPersist("novelty_base",
      TextOps.shingleArr(docs, distinct = true))
    val perDoc = base.select(col("doc_id"), size(col("sarr")).cast("long").as("n_ngrams"))
    val uniq = base.select(col("doc_id"), explode(col("sarr")).as("s"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("owner"))
      .filter(col("df") === 1)
      .groupBy(col("owner").as("doc_id"))
      .agg(count(lit(1)).as("n_unique"))
    perDoc.join(uniq, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_ngrams"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"),
        (floor(coalesce(col("n_unique"), lit(0L)) / col("n_ngrams") * 10000) / 10000)
          .as("novelty"))
  }

  // ---------------------------------------------------------------- q59
  def q59(spark: SparkSession, sfDir: String): DataFrame =
    ngramNoveltyOf(Tables.table(spark, sfDir, "documents"))

  private val q59Sql =
    s"""WITH ${TextOps.shingleCte},
       |uniq AS (SELECT min(doc_id) AS doc_id FROM shing GROUP BY s HAVING count(*) = 1),
       |peru AS (SELECT doc_id, count(*) AS n_unique FROM uniq GROUP BY doc_id)
       |SELECT c.doc_id, c.n AS n_ngrams,
       |       coalesce(p.n_unique, 0) AS n_unique,
       |       floor(coalesce(p.n_unique, 0) / c.n * 10000) / 10000 AS novelty
       |FROM shcnt c LEFT JOIN peru p USING (doc_id)""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q59_ngram_novelty", q59, Some(q59Sql))
  )
}
