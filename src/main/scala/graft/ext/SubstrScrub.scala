package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Repeated-substring span scrubbing (q63) — sub-document exact dedup,
  * the span-level member of the dedup family (q11 exact doc, q57 bag,
  * q12/q14 near-dup, q13 fingerprint, q53 semantic): find every L-word
  * window whose exact text occurs ≥ 2 times ANYWHERE in the corpus
  * (across docs or repeated within one), mark the words those windows
  * cover, and emit per-doc coverage stats plus the scrubbed text with
  * covered spans removed. This is the "deduplicating training data"
  * exact-substring pass (suffix-array dedup's semantics re-expressed as
  * stride-1 window hashing): cross-doc boilerplate and within-doc
  * repetition are both caught, and overlapping duplicated windows merge
  * naturally because coverage is per-word, not per-window.
  *
  * Scale shape: the tokenized corpus + in-row window-hash array is
  * materialized ONCE (keyed persist; the occurrence stream and the final
  * attach both read the cache). The window stream is n_words rows — the
  * documented linear cost of stride-1 windowing — and makes exactly ONE
  * corpus-wide exchange: the hash-keyed occurrence count (map-side
  * partials). Duplicated hashes join BACK to the occurrence stream
  * co-keyed on the same hash (exchange reuse, linear — a hash occurring
  * m times contributes m rows, never m² pairs), collapse to per-doc
  * sorted start lists (bounded by the doc's own length), and attach
  * doc-keyed; the coverage test and the scrub are in-row higher-order
  * functions over (starts, words). No corpus-wide window function, sort,
  * or cartesian anywhere. md5 keeps the window key engine-portable for
  * the oracle; a production deployment would swap `xxhash64` (8-byte
  * key, same plan).
  */
object SubstrScrub {

  /** In-row stride-1 L-word window hashes over a tokenized `ws` column;
    * docs shorter than L get an empty array (they can't contain an L-gram,
    * so they pass every span filter untouched). Shared by q63 (within-corpus
    * occurrence counting) and q102 (eval-vocabulary span matching). */
  private[ext] def windowHashes(L: Int) = expr(
    s"""CASE WHEN size(ws) >= $L
       |THEN transform(sequence(0, size(ws) - $L),
       |               i -> md5(concat_ws(' ', slice(ws, i + 1, $L))))
       |ELSE array() END""".stripMargin)

  /** Per-word scrub of a tokenized doc given the sorted start positions of
    * flagged L-word windows: keeps exactly the words no flagged window
    * covers. In-row higher-order functions — shared q63/q102 tail. */
  private[ext] def scrubTail(df: DataFrame, L: Int, nWindowsName: String,
                             ratioName: String): DataFrame =
    df.withColumn("starts", coalesce(col("starts"), expr("array()")))
      .withColumn("kept", expr(
        s"filter(ws, (w, j) -> NOT exists(starts, s -> s <= j AND j < s + $L))"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        size(col("starts")).cast("long").as(nWindowsName),
        (size(col("ws")) - size(col("kept"))).cast("long").as("n_covered"),
        (floor((size(col("ws")) - size(col("kept"))) / size(col("ws"))
          .cast("double") * 10000) / 10000).as(ratioName),
        concat_ws(" ", col("kept")).as("clean_text"))

  /** General form over any (doc_id, text) frame. Output: one row per doc
    * — (doc_id, n_words, n_dup_windows, n_covered, dup_ratio,
    * clean_text); docs shorter than L words pass through untouched. */
  def substrScrubOf(docs: DataFrame, L: Int = 5, minOcc: Int = 2): DataFrame = {
    val base = Tables.swapPersist("substr_base",
      docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
        .withColumn("harr", windowHashes(L)))
    val occ = base.select(col("doc_id"), posexplode(col("harr")).as(Seq("pos", "h")))
    val dup = occ.groupBy(col("h")).agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= minOcc).select(col("h"))
    val starts = occ.join(dup, "h")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("pos"))).as("starts"))
    scrubTail(base.join(starts, Seq("doc_id"), "left"), L,
      "n_dup_windows", "dup_ratio")
  }

  // ---------------------------------------------------------------- q63
  def q63(spark: SparkSession, sfDir: String): DataFrame =
    substrScrubOf(Tables.table(spark, sfDir, "documents"))

  private def q63Sql(L: Int = 5, minOcc: Int = 2): String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |win AS (
       |  SELECT doc_id, i AS pos, md5(array_to_string(ws[i+1:i+$L], ' ')) AS h
       |  FROM d, unnest(range(0, len(ws) - $L + 1)) AS t(i)),
       |dup AS (SELECT h FROM win GROUP BY h HAVING count(*) >= $minOcc),
       |ds AS (SELECT DISTINCT w.doc_id, w.pos FROM win w JOIN dup USING (h)),
       |nds AS (SELECT doc_id, count(*) AS n_dup_windows FROM ds GROUP BY doc_id),
       |words AS (
       |  SELECT doc_id, j AS pos, ws[j+1] AS w, len(ws) AS n
       |  FROM d, unnest(range(0, len(ws))) AS t(j)),
       |cov AS (
       |  SELECT wo.doc_id, wo.pos, min(wo.w) AS w, min(wo.n) AS n,
       |         max(CASE WHEN ds.pos IS NOT NULL THEN 1 ELSE 0 END) AS covered
       |  FROM words wo LEFT JOIN ds
       |    ON ds.doc_id = wo.doc_id AND ds.pos <= wo.pos AND wo.pos < ds.pos + $L
       |  GROUP BY wo.doc_id, wo.pos)
       |SELECT c.doc_id, min(c.n) AS n_words,
       |       coalesce(min(nds.n_dup_windows), 0) AS n_dup_windows,
       |       CAST(sum(c.covered) AS BIGINT) AS n_covered,
       |       floor(sum(c.covered) / min(c.n) * 10000) / 10000 AS dup_ratio,
       |       coalesce(string_agg(CASE WHEN c.covered = 0 THEN c.w END,
       |                           ' ' ORDER BY c.pos), '') AS clean_text
       |FROM cov c LEFT JOIN nds ON nds.doc_id = c.doc_id
       |GROUP BY c.doc_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q63_substring_scrub", q63, Some(q63Sql()))
  )
}
