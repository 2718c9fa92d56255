package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Span-level benchmark decontamination (q102) — the surgical counterpart
  * to q39's doc-level flag: instead of DROPPING a training document whose
  * shingles overlap the eval set, find the exact L-word spans that occur
  * verbatim in any eval document and SCRUB just those spans, keeping the
  * rest of the document. This is the span-removal decontamination pass used
  * before LLM training runs when whole-doc dropping would waste too much
  * clean text (the reference has no decontamination surface at all —
  * log-analytics only; this extends its text handling to curation).
  *
  * Relation to siblings: q39 answers "is this doc contaminated?" (drop
  * verdict, ≥-half-shingles predicate); q63 scrubs spans repeated WITHIN
  * the training corpus (self-dedup); q102 scrubs spans shared WITH the
  * eval set (leakage removal). q63 and q102 share the stride-1
  * window-hash machinery and the per-word coverage/scrub tail
  * ([[SubstrScrub.windowHashes]]/[[SubstrScrub.scrubTail]]) — overlapping
  * flagged windows merge naturally because coverage is per-word.
  *
  * Scale shape: the eval side collapses to its DISTINCT window-hash
  * vocabulary — eval sets are ~10⁴ docs regardless of corpus size (the
  * q39 broadcast argument), so the vocabulary is BROADCAST and matching is
  * a map-side semi-join: the training corpus is scanned ONCE (keyed
  * persist; the window stream and the final attach both read the cache),
  * never shuffled by window hash. The only hash exchange is the per-doc
  * flagged-start collection (bounded by each doc's own length). Pass
  * `broadcastVocab = false` to decontaminate against a corpus-scale
  * reference instead (shuffle semi-join, nothing collected). md5 keeps the
  * window key engine-portable for the oracle; production would swap
  * `xxhash64` (8-byte key, same plan).
  */
object EvalSpanScrub {

  /** General form: scrub from `trainDocs` every L-word span occurring
    * verbatim in `evalDocs`. Both args are (doc_id, text) frames. Output:
    * one row per TRAINING doc — (doc_id, n_words, n_eval_windows,
    * n_covered, contam_ratio, clean_text); docs shorter than L words pass
    * through untouched; eval docs are not emitted. */
  def evalSpanScrubOf(trainDocs: DataFrame, evalDocs: DataFrame, L: Int = 5,
                      broadcastVocab: Boolean = true): DataFrame = {
    val vocab = evalDocs.select(split(col("text"), " ").as("ws"))
      .select(explode(SubstrScrub.windowHashes(L)).as("h")).distinct()
    val base = Tables.swapPersist("evalspan_base",
      trainDocs.select(col("doc_id"), split(col("text"), " ").as("ws"))
        .withColumn("harr", SubstrScrub.windowHashes(L)))
    val occ = base.select(col("doc_id"), posexplode(col("harr")).as(Seq("pos", "h")))
    val starts = occ.join(if (broadcastVocab) broadcast(vocab) else vocab, "h")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("pos"))).as("starts"))
    SubstrScrub.scrubTail(base.join(starts, Seq("doc_id"), "left"), L,
      "n_eval_windows", "contam_ratio")
  }

  /** Stream-static eval-span gate — q102's ingestion-time face (the
    * q41/delta-dedup gate pattern): the eval set's window-hash vocabulary
    * is packed ONCE into a bloom bitset (kilobytes for millions of
    * windows, eager 1-row leaf), and every ARRIVING document probes its
    * own L-word window hashes in-row against the broadcast words — zero
    * streaming aggregation state, append-mode safe. Emits (doc_id,
    * n_words, n_flagged_windows, guaranteed_clean).
    *
    * Bloom direction, documented: no false negatives — a doc with
    * `guaranteed_clean = true` shares NO L-word span with the eval set
    * and can ingest unscrubbed; flagged docs route to the exact batch
    * [[evalSpanScrubOf]] (false positives only cost a re-check, never a
    * leak). */
  /** The eval set's distinct window-hash vocabulary as a bloom-keyed
    * frame (h, h1, h2) — shared by the standalone gate and the composed
    * ingestion gate ([[graft.ops.IngestGates]]). */
  private[graft] def windowVocabKeyed(evalDocs: DataFrame, L: Int): DataFrame =
    evalDocs.select(split(col("text"), " ").as("ws"))
      .select(explode(SubstrScrub.windowHashes(L)).as("h")).distinct()
      .withColumn("h1", expr(TextOps.hexVal("h", 1, duck = false)))
      .withColumn("h2", expr(TextOps.hexVal("h", 9, duck = false)))

  /** Adds (n_words, n_flagged_windows, guaranteed_clean) to a tokenized
    * `ws` frame carrying a broadcast `bitsCol` — the in-row verdict
    * block, stackable with other verdicts in ONE projection. */
  private[graft] def spanVerdict(df: DataFrame, L: Int, mBits: Int,
                                 bitsCol: String): DataFrame = {
    val probe = CurationOps.bloomProbePredicate(mBits, "h", bitsCol)
    df.withColumn("harr", SubstrScrub.windowHashes(L))
      .withColumn("n_flagged_windows",
        expr(s"size(filter(harr, h -> $probe))").cast("long"))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn("guaranteed_clean", col("n_flagged_windows") === 0)
  }

  def evalSpanGateStreamStatic(streamDocs: DataFrame, evalDocs: DataFrame,
                               L: Int = 5, mBits: Int = 1 << 20): DataFrame = {
    val bitmap = CurationOps.bloomBitmap(windowVocabKeyed(evalDocs, L), mBits)
    spanVerdict(
      streamDocs.select(col("doc_id"), split(col("text"), " ").as("ws"))
        .crossJoin(broadcast(bitmap)),
      L, mBits, "bits")
      .select(col("doc_id"), col("n_words"), col("n_flagged_windows"),
        col("guaranteed_clean"))
  }

  // ---------------------------------------------------------------- q102
  /** Fixture form: eval set = the q39 pseudo-eval slice `doc_id % 20 == 7`
    * (~5% of docs at every SF), training corpus = the rest. */
  def q102(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.table(spark, sfDir, "documents")
    evalSpanScrubOf(
      docs.filter(col("doc_id") % 20 =!= 7),
      docs.filter(col("doc_id") % 20 === 7))
  }

  private def q102Sql(L: Int = 5): String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |ev AS (SELECT DISTINCT md5(array_to_string(ws[i+1:i+$L], ' ')) AS h
       |       FROM d, unnest(range(0, len(ws) - $L + 1)) AS t(i)
       |       WHERE doc_id % 20 = 7),
       |tr AS (SELECT doc_id, ws FROM d WHERE doc_id % 20 <> 7),
       |win AS (
       |  SELECT doc_id, i AS pos, md5(array_to_string(ws[i+1:i+$L], ' ')) AS h
       |  FROM tr, unnest(range(0, len(ws) - $L + 1)) AS t(i)),
       |ds AS (SELECT DISTINCT w.doc_id, w.pos FROM win w JOIN ev USING (h)),
       |nds AS (SELECT doc_id, count(*) AS n_eval_windows FROM ds GROUP BY doc_id),
       |words AS (
       |  SELECT doc_id, j AS pos, ws[j+1] AS w, len(ws) AS n
       |  FROM tr, unnest(range(0, len(ws))) AS t(j)),
       |cov AS (
       |  SELECT wo.doc_id, wo.pos, min(wo.w) AS w, min(wo.n) AS n,
       |         max(CASE WHEN ds.pos IS NOT NULL THEN 1 ELSE 0 END) AS covered
       |  FROM words wo LEFT JOIN ds
       |    ON ds.doc_id = wo.doc_id AND ds.pos <= wo.pos AND wo.pos < ds.pos + $L
       |  GROUP BY wo.doc_id, wo.pos)
       |SELECT c.doc_id, min(c.n) AS n_words,
       |       coalesce(min(nds.n_eval_windows), 0) AS n_eval_windows,
       |       CAST(sum(c.covered) AS BIGINT) AS n_covered,
       |       floor(sum(c.covered) / min(c.n) * 10000) / 10000 AS contam_ratio,
       |       coalesce(string_agg(CASE WHEN c.covered = 0 THEN c.w END,
       |                           ' ' ORDER BY c.pos), '') AS clean_text
       |FROM cov c LEFT JOIN nds ON nds.doc_id = c.doc_id
       |GROUP BY c.doc_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q102_eval_span_scrub", q102, Some(q102Sql()))
  )
}
