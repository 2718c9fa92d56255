package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bag-of-words dedup (q57) — order-insensitive exact dedup: two documents
  * are duplicates iff they contain the SAME word multiset after
  * normalization (lowercase, strip non-alphanumerics, collapse runs of
  * whitespace). This closes the gap between q11 (byte-exact — misses any
  * reordering) and q12/q14 (Jaccard near-dup — probabilistic, shingle
  * -threshold-tuned): template-shuffled spam, word-order-permuted scrapes
  * and punctuation/case variants all collapse to one canonical form that
  * simple hashing catches exactly. (On the pristine fixture corpus the
  * normalization is a no-op by construction; the word-sort is the live
  * ingredient — sf0.1 contains real shuffled-word duplicate pairs — and
  * the spec covers case/punctuation variants.)
  *
  * Canonical form: `md5(concat_ws(" ", array_sort(words)))`. Word arrays
  * here are ASCII lowercase, where Spark's `array_sort` (codepoint order)
  * and DuckDB's `list_sort` (binary collation) agree; both engines'
  * `lower`/`trim`/regexp semantics agree on this class (DuckDB needs the
  * explicit 'g' flag Spark defaults to).
  *
  * Scale shape: canonicalization is per-row expression work (the sort is
  * over one document's words — no explode); the only exchange is the
  * hash groupBy on the 32-byte canonical hash, with map-side partial
  * aggregation. The group table (hash → keeper, size) joins back on the
  * same key, so AQE plans the second side over the same partitioning —
  * the q11 layout, inheriting its 100 TB shape.
  */
object BowDedup {

  /** The canonical bag hash as a column — public so the STREAMING dedup
    * gate ([[graft.ops.StreamingDedup]]) can key on the same canonical
    * form: `dedup(docs.withColumn("bh", bowHashCol(col("text"))), Seq("bh"))`
    * catches word-order-shuffled re-ingests that an exact content hash
    * admits (StreamingSpec pins this composition). */
  def bowHashCol(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    md5(concat_ws(" ", array_sort(split(trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " ")), " "))))

  private def canonCol(text: org.apache.spark.sql.Column) = bowHashCol(text)

  /** (doc_id, bow_hash, group_size, is_dup) over any (doc_id, text)
    * frame: keeper = min doc_id per word-multiset group. */
  def bowDedupOf(docs: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id"), canonCol(col("text")).as("bow_hash"))
    d.groupBy(col("bow_hash"))
      .agg(count(lit(1)).as("group_size"), min(col("doc_id")).as("keep_id"))
      .join(d, "bow_hash")
      .select(col("doc_id"), col("bow_hash"), col("group_size"),
        (col("doc_id") =!= col("keep_id")).cast("int").as("is_dup"))
  }

  // ---------------------------------------------------------------- q57
  def q57(spark: SparkSession, sfDir: String): DataFrame =
    bowDedupOf(Tables.table(spark, sfDir, "documents"))

  private val q57Sql =
    """WITH d AS (
      |  SELECT doc_id,
      |         md5(list_aggregate(list_sort(string_split(trim(
      |           regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
      |                          ' +', ' ', 'g')), ' ')), 'string_agg', ' ')) AS bow_hash
      |  FROM documents),
      |g AS (SELECT bow_hash, count(*) AS group_size, min(doc_id) AS keep_id
      |      FROM d GROUP BY bow_hash)
      |SELECT doc_id, d.bow_hash, group_size,
      |       CASE WHEN doc_id != keep_id THEN 1 ELSE 0 END AS is_dup
      |FROM d JOIN g ON d.bow_hash = g.bow_hash""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q57_bow_dedup", q57, Some(q57Sql))
  )
}
