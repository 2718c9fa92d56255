package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sliding-window chunking (q69) — the long-document face of sequence
  * preparation: q33 packs whole (short) docs into fixed bins; here a doc
  * LONGER than the training context is cut into overlapping windows
  * (stride < window ⇒ each boundary is seen with context on both sides
  * — the standard pretraining move), emitting one row per chunk with its
  * word offset and reconstructed text.
  *
  * Scale shape: pure map-side generate — split, an in-row `sequence` of
  * window starts, one `explode`, and an in-row `slice`+`array_join` per
  * chunk. ZERO exchanges at any corpus size; output rows ≈ corpus ×
  * (n_words/stride), each produced where its document was read. The
  * chunk text is sliced from the already-split array — the document is
  * tokenized once, not once per chunk. */
object Chunker {

  /** General form over any (doc_id, text) frame. Chunks start at word
    * offsets 0, stride, 2·stride, … < n_words; each covers up to
    * `chunkWords` words (the tail chunk may be shorter). stride ≤ chunk
    * ⇒ full coverage, overlap = chunk − stride words. */
  def chunkOf(docs: DataFrame, chunkWords: Int = 40,
              strideWords: Int = 30): DataFrame = {
    require(chunkWords >= 1 && strideWords >= 1 && strideWords <= chunkWords,
      "chunkOf: need 1 <= strideWords <= chunkWords")
    docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .filter(col("n_words") > 0)
      .select(col("doc_id"), col("ws"), col("n_words"),
        explode(sequence(lit(0L), col("n_words") - 1L, lit(strideWords.toLong)))
          .as("start_word"))
      .select(col("doc_id"),
        (col("start_word") / strideWords).cast("long").as("chunk_id"),
        col("start_word"),
        least(lit(chunkWords.toLong), col("n_words") - col("start_word")).as("chunk_words"),
        array_join(slice(col("ws"), (col("start_word") + 1).cast("int"), lit(chunkWords)), " ")
          .as("chunk_text"))
  }

  // ---------------------------------------------------------------- q69
  def q69(spark: SparkSession, sfDir: String): DataFrame =
    chunkOf(Tables.table(spark, sfDir, "documents").select(col("doc_id"), col("text")))

  private def q69Sql(chunkWords: Int = 40, strideWords: Int = 30): String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |n AS (SELECT doc_id, ws, len(ws)::BIGINT AS n_words FROM d WHERE len(ws) > 0),
       |c AS (SELECT doc_id, ws, n_words,
       |        unnest(range(0, n_words, $strideWords)) AS start_word
       |      FROM n)
       |SELECT doc_id,
       |       start_word // $strideWords AS chunk_id,
       |       start_word,
       |       least($chunkWords, n_words - start_word) AS chunk_words,
       |       array_to_string(list_slice(ws, start_word + 1, start_word + $chunkWords), ' ') AS chunk_text
       |FROM c""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q69_doc_chunks", q69, Some(q69Sql()))
  )
}
