package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q177/q178 — BPE merge LEARNING and ENCODING (r14 verdict Next #2):
  * q70 computes the first merge's pair ranking (the inner statistic);
  * this module runs the actual tokenizer-induction loop — repeatedly
  * merge the most frequent adjacent token pair — and then APPLIES the
  * learned merges table, so token counts stop being the ceil(len/4)
  * estimates q17 ships and become exact encodings under the corpus's
  * own tokenizer.
  *
  * Distribution shape (the scale story): the corpus compresses to its
  * word VOCABULARY once (one explode+exchange on word — Zipf: vocab ≪
  * corpus), and the ENTIRE merge loop runs over vocab rows — each round
  * is a vocab-grain pair census plus a driver-side top-1 decision (ONE
  * collected row per round; BPE training is inherently sequential in
  * the merge order, and this is exactly the "driver-side, vocab-sized
  * merge loop" q70's doc deferred to). The chosen pair lands back in
  * the plan as a LITERAL `replace` — no joins, no broadcast, pure
  * map-side string work per round, with the vocab localCheckpointed so
  * round k's plan does not re-analyze rounds 1..k−1.
  *
  * Token-sequence representation: each word's tokens as a single string
  * with every token wrapped in `` separators ("␟a␟␟b␟" for
  * [a, b]) — chr(31) never occurs in text. A merge (a, b) → ab is then
  * ONE literal `replace("␟a␟␟b␟" → "␟ab␟")`, and because `replace`
  * scans left-to-right non-overlapping in both engines, it implements
  * exactly BPE's greedy leftmost application ("aaa" under (a,a) →
  * [aa, a]). Pair identity keys (a, b) separately ("a␟b"), never the
  * concatenation (which would conflate ("ab","c") with ("a","bc"));
  * ties break by (count DESC, pair ASC) — byte order, both engines.
  *
  * The oracle mirrors the loop as [[MergeRounds]] unrolled CTE stages
  * (the SpectralDelta discipline): per round a pair census, an
  * `ORDER BY c DESC, pair LIMIT 1` merge pick, and the same literal
  * replace via LEFT JOIN ON TRUE (a round with no pairs left passes the
  * vocab through unchanged — both engines). Hash-matching q177 pins the
  * learned MERGES; q178 pins the ENCODED corpus. */
object BpeEncode {

  /** Token separator — chr(31), not in any fixture text. */
  val Sep = "\u001f"

  /** Fixed merge budget — deterministic, engine-mirrorable. */
  val MergeRounds = 12

  /** One learned merge. */
  final case class Merge(round: Int, a: String, b: String, pair_count: Long)

  /** (word, wc, ts): the corpus compressed to its vocabulary, each word
    * as the wrapped char-token string. */
  private def vocabOf(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .withColumn("ts",
        concat(lit(Sep), array_join(split(col("word"), ""), Sep + Sep), lit(Sep)))

  /** Adjacent-pair census of the current vocab state: (pair, c) with
    * pair = a␟b, c = Σ wc over positions (overlapping positions count,
    * the standard BPE statistic — q70's convention). */
  private def pairCensus(v: DataFrame): DataFrame =
    v.withColumn("tk", split(trim(col("ts"), Sep), Sep + Sep))
      .select(col("wc"), explode(expr(
        s"CASE WHEN size(tk) >= 2 THEN transform(sequence(1, size(tk) - 1), " +
          s"i -> concat(element_at(tk, i), chr(31), element_at(tk, i + 1))) " +
          s"ELSE CAST(array() AS ARRAY<STRING>) END")).as("pair"))
      .groupBy(col("pair")).agg(sum(col("wc")).as("c"))

  /** Run the merge loop: returns (merges, final vocab state). The vocab
    * frame is vocab-grain throughout; each round costs one vocab pass +
    * one 1-row collect. */
  def fit(docs: DataFrame, rounds: Int = MergeRounds): (Seq[Merge], DataFrame) = {
    var v = vocabOf(docs).localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var exhausted = false
    (1 to rounds).foreach { k =>
      if (!exhausted) {
        val top = pairCensus(v).orderBy(col("c").desc, col("pair")).limit(1).collect()
        if (top.isEmpty) exhausted = true
        else {
          val Array(a, b) = top(0).getString(0).split(Sep, 2)
          merges += Merge(k, a, b, top(0).getLong(1))
          v = v.withColumn("ts",
              replace(col("ts"), lit(s"$Sep$a$Sep$Sep$b$Sep"), lit(s"$Sep$a$b$Sep")))
            .localCheckpoint()
        }
      }
    }
    (merges.result(), v)
  }

  /** Per-source EXACT encoded token counts under the learned merges —
    * the q17 refinement (BpeEncodeSpec cross-pins n_words ≤ exact ≤
    * n_chars per source). One corpus explode joined vocab-grain. */
  def encodedCountsOf(docs: DataFrame, finalVocab: DataFrame): DataFrame = {
    val toks = finalVocab
      .withColumn("n_tok", size(split(trim(col("ts"), Sep), Sep + Sep)).cast("long"))
      .select(col("word"), col("n_tok"))
    docs.select(col("source"), explode(split(col("text"), " ")).as("word"))
      .join(toks, Seq("word"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_tok")).as("enc_tokens"))
  }

  // ---------------------------------------------------------------- q177
  /** The learned merges table: (round, a, b, pair_count). */
  def q177(spark: SparkSession, sfDir: String): DataFrame = {
    val (merges, _) = fit(Tables.table(spark, sfDir, "documents").select(col("text")))
    import spark.implicits._
    merges.toDF("round", "a", "b", "pair_count")
  }

  // ---------------------------------------------------------------- q178
  /** The encoded corpus's token census: top 50 tokens by total count
    * after applying the learned merges — (rank, token, tok_count). */
  def q178(spark: SparkSession, sfDir: String, topN: Int = 50): DataFrame = {
    val (_, v) = fit(Tables.table(spark, sfDir, "documents").select(col("text")))
    v.withColumn("tk", split(trim(col("ts"), Sep), Sep + Sep))
      .select(col("wc"), explode(col("tk")).as("token"))
      .groupBy(col("token")).agg(sum(col("wc")).as("tok_count"))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("tok_count").desc, col("token"))).cast("long"))
      .filter(col("rank") <= topN)
      .select(col("rank"), col("token"), col("tok_count"))
  }

  // ---------------------------------------------------------------- q181
  /** Tokenizer FERTILITY census — the standard tokenizer-health metric a
    * corpus team watches per stratum: exact encoded tokens per word
    * (fert_micro) and chars per token (cpt_micro) by (source, lang),
    * under the corpus's own learned merges. A stratum whose fertility
    * spikes is one the tokenizer serves badly (its text fragments into
    * char-grain tokens) — the signal that drives per-language merge
    * budgets. Integer micro ratios, census-grain after one corpus
    * explode joined against the vocab's token counts. */
  def q181(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.table(spark, sfDir, "documents")
    val (_, v) = fit(docs.select(col("text")))
    val toks = v
      .withColumn("n_tok", size(split(trim(col("ts"), Sep), Sep + Sep)).cast("long"))
      .select(col("word"), col("n_tok"))
    docs.select(col("source"), col("lang"),
        explode(split(col("text"), " ")).as("word"))
      .join(toks, Seq("word"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_tok")).as("enc_tokens"),
        sum(length(col("word")).cast("long")).as("n_chars"))
      .select(col("source"), col("lang"), col("n_words"), col("enc_tokens"),
        expr("enc_tokens * 1000000 div n_words").as("fert_micro"),
        expr("n_chars * 1000000 div enc_tokens").as("cpt_micro"))
  }

  // ------------------------------------------------------------- oracles

  /** The unrolled merge-loop CTE stack through round `rounds`; the
    * caller selects off v$rounds / the m$k merge CTEs. */
  private def loopCtes(rounds: Int): String = {
    val sep = "chr(31)"
    def round(k: Int): String =
      s"""p$k AS MATERIALIZED (
         |  SELECT pair, CAST(sum(wc) AS BIGINT) AS c FROM (
         |    SELECT wc, unnest(list_transform(range(1, len(tk)),
         |                 i -> tk[i] || $sep || tk[i + 1])) AS pair
         |    FROM (SELECT wc, string_split(trim(ts, $sep), $sep || $sep) AS tk
         |          FROM v${k - 1}))
         |  GROUP BY pair),
         |m$k AS MATERIALIZED (SELECT split_part(pair, $sep, 1) AS a,
         |               split_part(pair, $sep, 2) AS b, c
         |        FROM p$k ORDER BY c DESC, pair LIMIT 1),
         |v$k AS MATERIALIZED (SELECT word, wc,
         |          CASE WHEN m.a IS NULL THEN ts
         |               ELSE replace(ts, $sep || m.a || $sep || $sep || m.b || $sep,
         |                            $sep || m.a || m.b || $sep) END AS ts
         |        FROM v${k - 1} LEFT JOIN m$k m ON TRUE)""".stripMargin
    s"""w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
       |v0 AS MATERIALIZED (SELECT word, count(*) AS wc,
       |         $sep || array_to_string(string_split(word, ''), $sep || $sep) || $sep AS ts
       |       FROM w WHERE length(word) >= 1 GROUP BY word),
       |${(1 to rounds).map(round).mkString(",\n")}""".stripMargin
  }

  private def q177Sql(rounds: Int = MergeRounds): String =
    s"""WITH ${loopCtes(rounds)}
       |${(1 to rounds).map(k =>
            s"SELECT CAST($k AS INT) AS round, a, b, CAST(c AS BIGINT) AS pair_count FROM m$k")
          .mkString("", "\nUNION ALL\n", "")}""".stripMargin

  private def q178Sql(rounds: Int = MergeRounds, topN: Int = 50): String =
    s"""WITH ${loopCtes(rounds)},
       |tc AS (
       |  SELECT token, CAST(sum(wc) AS BIGINT) AS tok_count FROM (
       |    SELECT wc, unnest(string_split(trim(ts, chr(31)), chr(31) || chr(31))) AS token
       |    FROM v$rounds)
       |  GROUP BY token),
       |r AS (SELECT token, tok_count,
       |        row_number() OVER (ORDER BY tok_count DESC, token) AS rank FROM tc)
       |SELECT rank, token, tok_count FROM r WHERE rank <= $topN""".stripMargin

  private def q181Sql(rounds: Int = MergeRounds): String =
    s"""WITH ${loopCtes(rounds)},
       |tw AS (SELECT word, len(string_split(trim(ts, chr(31)), chr(31) || chr(31))) AS n_tok
       |       FROM v$rounds),
       |dw AS (SELECT source, lang, unnest(string_split(text, ' ')) AS word
       |       FROM documents),
       |j AS (SELECT source, lang, dw.word, n_tok FROM dw JOIN tw ON dw.word = tw.word),
       |g AS (SELECT source, lang,
       |        CAST(count(*) AS BIGINT) AS n_words,
       |        CAST(sum(n_tok) AS BIGINT) AS enc_tokens,
       |        CAST(sum(length(word)) AS BIGINT) AS n_chars
       |      FROM j GROUP BY 1, 2)
       |SELECT source, lang, n_words, enc_tokens,
       |       CAST(enc_tokens * 1000000 // n_words AS BIGINT) AS fert_micro,
       |       CAST(n_chars * 1000000 // enc_tokens AS BIGINT) AS cpt_micro
       |FROM g""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q177_bpe_merges", q177, Some(q177Sql())),
    QueryDef("q178_bpe_encode", q178(_, _), Some(q178Sql())),
    QueryDef("q181_bpe_fertility", q181, Some(q181Sql())))
}
