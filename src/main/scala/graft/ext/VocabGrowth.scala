package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vocabulary growth curve (q103) — Heaps'-law audit: split the corpus
  * into B deterministic md5 ingestion buckets and report, per bucket, the
  * token mass and the number of NEW distinct words (words whose first
  * bucket it is), plus both cumulative curves. The tokenizer/corpus-health
  * primitive behind "is this crawl still adding vocabulary, or only
  * repeating itself?": a healthy corpus grows vocab ~ tokens^β (β≈0.5);
  * a saturated or looping crawl's new-word curve collapses. The reference
  * has no vocabulary surface at all; this extends its counting analytics
  * to corpus-composition monitoring.
  *
  * Exactness: bucket assignment is the repo's md5-threshold idiom
  * (deterministic, engine-portable, replay-stable — never `rand()`), and
  * every output is an integer count — no FP anywhere.
  *
  * Scale shape: ONE corpus explode compressed immediately to the
  * (bucket, word) grain — the q44 single-word-stream discipline — and
  * persisted; token mass, first-bucket-per-word (vocab grain), and
  * new-word counts all derive from that compressed frame, so the corpus
  * is scanned once and the only corpus-sized exchange is the
  * (bucket, word) aggregation (map-side partials). The cumulative windows
  * run on the ≤ B-row census only.
  */
object VocabGrowth {

  /** (bucket, toks, toks_cum, new_words, vocab_cum) over any (doc_id,
    * text) frame; buckets with no documents emit no row (cumulatives are
    * over present buckets — identical in both engines). */
  def vocabGrowthOf(docs: DataFrame, buckets: Int = 10): DataFrame = {
    val toks = docs
      .select(md5(concat(lit("vg|"), col("doc_id"))).as("h"),
        split(col("text"), " ").as("ws"))
      .withColumn("bucket",
        expr(s"CAST(${TextOps.hexVal("h", 1, duck = false)} % $buckets AS INT)"))
      .select(col("bucket"), explode(col("ws")).as("w"))
    val bw = Tables.swapPersist("q103_bw",
      toks.groupBy(col("bucket"), col("w")).agg(count(lit(1)).as("c")))
    val tokCounts = bw.groupBy(col("bucket")).agg(sum(col("c")).as("toks"))
    val newWords = bw.groupBy(col("w")).agg(min(col("bucket")).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("new_words"))
    val wCum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tokCounts.join(newWords, Seq("bucket"), "left")
      .withColumn("new_words", coalesce(col("new_words"), lit(0L)))
      .select(col("bucket"), col("toks"),
        sum(col("toks")).over(wCum).as("toks_cum"),
        col("new_words"),
        sum(col("new_words")).over(wCum).as("vocab_cum"))
  }

  /** Stream-static out-of-vocabulary gate — q103's ingestion-time face:
    * the static corpus's distinct-word vocabulary is packed ONCE into a
    * bloom bitset (the q41 packed-int64-words broadcast, kilobytes for
    * millions of words), and every ARRIVING document computes its OOV
    * share entirely in-row (per-word md5 + O(1) shift-mask probes against
    * the broadcast words) — zero streaming aggregation state, append-mode
    * safe. Emits (doc_id, n_words, n_oov, oov_bp).
    *
    * Bloom direction, documented: the bitset has no false negatives, so
    * every in-vocabulary word HITS — a word reported OOV really is new.
    * False positives make known-new words look seen, so `n_oov`/`oov_bp`
    * are LOWER bounds that tighten as mBits grows (same declared trade as
    * the q41/delta-dedup gates' frozen reference side). */
  /** The static corpus's distinct-word vocabulary as a bloom-keyed frame
    * (h, h1, h2) — shared by the standalone gate and the composed
    * ingestion gate ([[graft.ops.IngestGates]]). */
  private[graft] def vocabKeyed(staticDocs: DataFrame): DataFrame =
    staticDocs
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct()
      .withColumn("h", md5(col("w")))
      .withColumn("h1", expr(TextOps.hexVal("h", 1, duck = false)))
      .withColumn("h2", expr(TextOps.hexVal("h", 9, duck = false)))

  /** Adds (n_words, n_oov, oov_bp) to a tokenized `ws` frame carrying a
    * broadcast `bitsCol` — the in-row verdict block, factored so the
    * composed gate can stack it with other verdicts in ONE projection. */
  private[graft] def oovVerdict(df: DataFrame, mBits: Int,
                                bitsCol: String): DataFrame = {
    val probe = CurationOps.bloomProbePredicate(mBits, "h", bitsCol)
    df.withColumn("n_oov", expr(
        s"size(filter(transform(ws, x -> md5(x)), h -> NOT $probe))").cast("long"))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn("oov_bp", expr("n_oov * 10000L div size(ws)"))
  }

  def oovGateStreamStatic(streamDocs: DataFrame, staticDocs: DataFrame,
                          mBits: Int = 1 << 20): DataFrame = {
    val bitmap = CurationOps.bloomBitmap(vocabKeyed(staticDocs), mBits)
    oovVerdict(
      streamDocs.select(col("doc_id"), split(col("text"), " ").as("ws"))
        .crossJoin(broadcast(bitmap)),
      mBits, "bits")
      .select(col("doc_id"), col("n_words"), col("n_oov"), col("oov_bp"))
  }

  // ---------------------------------------------------------------- q103
  def q103(spark: SparkSession, sfDir: String): DataFrame =
    vocabGrowthOf(Tables.table(spark, sfDir, "documents"))

  private def q103Sql(buckets: Int = 10): String =
    s"""WITH d AS (
       |  SELECT md5('vg|' || doc_id) AS h, string_split(text, ' ') AS ws
       |  FROM documents),
       |b AS (SELECT CAST(${TextOps.hexVal("h", 1, duck = true)} % $buckets AS INT) AS bucket, ws FROM d),
       |t AS (SELECT bucket, unnest(ws) AS w FROM b),
       |bw AS (SELECT bucket, w, count(*) AS c FROM t GROUP BY bucket, w),
       |tc AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS toks FROM bw GROUP BY bucket),
       |fw AS (SELECT w, min(bucket) AS bucket FROM bw GROUP BY w),
       |nw AS (SELECT bucket, count(*) AS new_words FROM fw GROUP BY bucket)
       |SELECT tc.bucket, tc.toks,
       |       CAST(sum(tc.toks) OVER (ORDER BY tc.bucket
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS toks_cum,
       |       coalesce(nw.new_words, 0) AS new_words,
       |       CAST(sum(coalesce(nw.new_words, 0)) OVER (ORDER BY tc.bucket
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS vocab_cum
       |FROM tc LEFT JOIN nw USING (bucket)""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q103_vocab_growth", q103, Some(q103Sql()))
  )
}
