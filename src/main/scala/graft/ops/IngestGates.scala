package graft.ops

import graft.ext.{CurationOps, EvalSpanScrub, VocabGrowth}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composed ingestion gate — the claim the per-gate docs make ("zero
  * streaming state, so it composes into an append-mode curation chain"),
  * actually composed: ONE continuous query computes the eval-span leak
  * verdict AND the out-of-vocabulary share for every arriving document in
  * a single projection. Both reference artifacts are frozen bloom bitsets
  * built once at construction (eager 1-row leaves) and ride the same
  * broadcast; the stream tokenizes once and every verdict is an in-row
  * fold — no joins between gates, no state, no second pass over arrivals.
  *
  * Output per arriving doc: (doc_id, n_words, n_flagged_windows,
  * guaranteed_clean, n_oov, oov_bp) — each column bit-identical to the
  * corresponding standalone gate (pinned by spec), so downstream routing
  * logic written against a single gate ports unchanged.
  *
  * At 1000 executors this is the shape you want at the ingest edge: one
  * narrow stage per micro-batch, broadcast artifacts shared across every
  * task, verdict cost linear in the arriving bytes.
  */
object IngestGates {

  def composedGateStreamStatic(streamDocs: DataFrame, staticDocs: DataFrame,
                               evalDocs: DataFrame, L: Int = 5,
                               mBitsSpan: Int = 1 << 20,
                               mBitsVocab: Int = 1 << 20): DataFrame = {
    val spanBits = CurationOps
      .bloomBitmap(EvalSpanScrub.windowVocabKeyed(evalDocs, L), mBitsSpan)
      .withColumnRenamed("bits", "span_bits")
    val vocabBits = CurationOps
      .bloomBitmap(VocabGrowth.vocabKeyed(staticDocs), mBitsVocab)
      .withColumnRenamed("bits", "vocab_bits")
    val tok = streamDocs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .crossJoin(broadcast(spanBits))
      .crossJoin(broadcast(vocabBits))
    VocabGrowth.oovVerdict(
      EvalSpanScrub.spanVerdict(tok, L, mBitsSpan, "span_bits"),
      mBitsVocab, "vocab_bits")
      .select(col("doc_id"), col("n_words"), col("n_flagged_windows"),
        col("guaranteed_clean"), col("n_oov"), col("oov_bp"))
  }
}
