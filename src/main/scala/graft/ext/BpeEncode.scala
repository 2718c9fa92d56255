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
    // r17 (guide §1.2/§7.3, verdict item 4): two changes to the
    // training economics, NEITHER changing a single emitted merge.
    //
    // 1. LAZY localCheckpoints — each census collect materializes the
    //    current vocab state's blocks as a side effect of the same job
    //    (the census is a full per-partition pass), so the per-round
    //    eager checkpoint's separate vocab-pass job is gone.
    //
    // 2. EXACT sequential batching — per census collect, emit as many
    //    sequential-argmax merges as the census PROVES, not just one.
    //    The proof rides two facts about one merge (a,b)→ab:
    //      · a pair sharing no token with {a,b} keeps its count exactly
    //        (replace only rewrites a/b tokens; disjoint adjacencies are
    //        untouched), and the merged pair's own count drops to 0
    //        (every adjacency occurrence is consumed — greedy leftmost);
    //      · every pair whose count CAN change (it shares a token with a
    //        merged one, or is newly minted like (x,ab) from an (x,a)
    //        adjacency) is bounded by the OLD count of some census
    //        candidate sharing a token with the merged set — or by the
    //        census cutoff cMin if that candidate was below the top-C.
    //    Scanning candidates in the census's exact (count DESC, pair
    //    ASC) order: a token-disjoint candidate whose count STRICTLY
    //    exceeds that bound is the next sequential argmax verbatim
    //    (strictness also kills name-order ties against renamed pairs),
    //    and its reported pair_count is its unchanged census count. The
    //    first candidate of a census is always exact (truncation keeps
    //    the (c DESC, pair ASC)-first rows, so ties below the cut sort
    //    after). The moment the bound can't be proven, re-census.
    //    Applying the batch as a chained replace in emit order IS the
    //    sequential application (each merge's pattern is token-disjoint
    //    from the earlier ones in the chain). The DuckDB oracle still
    //    unrolls one argmax per round — the hash match at three SFs is
    //    the proof the batching is invisible.
    var v = vocabOf(docs).localCheckpoint(false)
    val merges = Seq.newBuilder[Merge]
    var k = 1
    var exhausted = false
    while (k <= rounds && !exhausted) {
      val rows = pairCensus(v)
        .orderBy(col("c").desc, col("pair")).limit(TopC).collect()
      if (rows.isEmpty) exhausted = true
      else {
        val cands = rows.map(r => (r.getString(0), r.getLong(1)))
        val cMin = if (rows.length >= TopC) cands.last._2 else Long.MinValue
        val involved = scala.collection.mutable.Set[String]()
        val emittedPairs = scala.collection.mutable.Set[String]()
        val batch = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
        var stop = false
        var i = 0
        while (!stop && i < cands.length && k + batch.length <= rounds) {
          val (pair, c) = cands(i)
          val Array(a, b) = pair.split(Sep, 2)
          if (!involved(a) && !involved(b)) {
            // bound on every count that may have changed since the census
            val t = cands.iterator
              .filter { case (p, _) =>
                !emittedPairs(p) && {
                  val Array(x, y) = p.split(Sep, 2)
                  involved(x) || involved(y)
                }
              }
              .foldLeft(cMin) { case (m, (_, pc)) => math.max(m, pc) }
            if (batch.isEmpty || c > t) {
              batch += ((a, b, c))
              emittedPairs += pair
              involved += a; involved += b
            } else stop = true
          }
          i += 1
        }
        batch.zipWithIndex.foreach { case ((a, b, c), j) =>
          merges += Merge(k + j, a, b, c)
        }
        k += batch.length
        val applied = batch.foldLeft(col("ts")) { case (acc, (a, b, _)) =>
          replace(acc, lit(s"$Sep$a$Sep$Sep$b$Sep"), lit(s"$Sep$a$b$Sep"))
        }
        v = v.withColumn("ts", applied).localCheckpoint(false)
      }
    }
    (merges.result(), v)
  }

  // ------------------------------------------------- batched training

  /** Sweep budget for the batched trainer (q182) — sized so the
    * smallest fixture (sf0.001: early sweeps yield few merges because
    * tokens are still single chars and disjointness caps a sweep at
    * token-vocab/2) still learns ≥64 effective merges (spec-pinned). */
  val BatchSweeps = 8

  /** Per-sweep merge cap — bounds the replace-chain depth of one vocab
    * pass (keeps the projection inside codegen limits). */
  val SweepCap = 32

  /** Census prefix shipped to the greedy selector per sweep: candidates
    * are the top [[TopC]] pairs by rank key. Bounds the driver collect
    * and the oracle's fold, independent of corpus scale. */
  val TopC = 4096

  /** One batched-trainer merge: rnk is the within-sweep application
    * order (count DESC, pair ASC). */
  final case class BatchMerge(sweep: Int, rnk: Long, a: String, b: String, pair_count: Long)

  /** Sort-key separator for the census rank key — chr(30), distinct
    * from the token separator so the key splits unambiguously. */
  private val KSep = "\u001e"

  /** Greedy token-disjoint matching over a rank-ordered candidate list:
    * scan in (count DESC, pair ASC) order, select a pair unless it
    * shares a token with an ALREADY-selected pair, stop at `cap`. The
    * selected set is pairwise token-disjoint by construction — the
    * property that makes one-pass chained application safe. Pure
    * function of the ordered candidates; the oracle runs the SAME scan
    * as a list_reduce fold. */
  private[graft] def greedySelect(cands: Seq[(String, String, Long)], cap: Int): Seq[(String, String, Long)] = {
    val taken = scala.collection.mutable.Set[String]()
    val out = Seq.newBuilder[(String, String, Long)]
    var n = 0
    cands.foreach { case (a, b, c) =>
      if (n < cap && !taken(a) && !taken(b)) {
        out += ((a, b, c)); taken += a; taken += b; n += 1
      }
    }
    out.result()
  }

  /** q182 — merge-BATCHED BPE training (r15 verdict Next #1): [[fit]]
    * pays one Spark job + one driver collect PER MERGE, which cannot
    * reach a production ~30k-merge budget. This trainer learns a whole
    * BATCH of merges per vocab pass — the standard batched-BPE
    * approximation: per sweep, ship the top-[[TopC]] census prefix to
    * the driver ONCE (rank key k = lpad(MAXC − c) ∥ chr(30) ∥ pair;
    * string order ≡ (count DESC, pair ASC) in both engines' binary
    * collation), [[greedySelect]] a token-DISJOINT batch from it, and
    * apply the whole batch in ONE vocab pass as a chained literal
    * replace in rank order (a token minted by an earlier merge in the
    * sweep is visible to later ones — both engines chain identically).
    *
    * SEMANTICS vs [[fit]] (documented divergence, spec-pinned): batch
    * members beyond the first carry sweep-START counts — sequential
    * BPE would recount between them. At cap = 1 the top candidate IS
    * the global argmax and the trainer degenerates to [[fit]] exactly
    * (BpeEncodeSpec cross-pins the 12-round prefix).
    *
    * ECONOMICS (the point): one census collect + one localCheckpoint
    * per SWEEP for up to [[SweepCap]] merges — jobs-per-merge ≪ 1
    * (spec-measured via job-group accounting; BASELINE.md records the
    * ratio), vs [[fit]]'s per-merge census. A 30k-merge budget rides
    * ~30000/|batch| sweeps. */
  def fitBatched(docs: DataFrame, sweeps: Int = BatchSweeps, cap: Int = SweepCap): (Seq[BatchMerge], DataFrame) = {
    // lazy checkpoints — materialized by each sweep's census collect in
    // the same job (see [[fit]]'s r17 note): 1 job per sweep, not 2
    var v = vocabOf(docs).localCheckpoint(false)
    val merges = Seq.newBuilder[BatchMerge]
    var exhausted = false
    (1 to sweeps).foreach { s =>
      if (!exhausted) {
        val cands = pairCensus(v)
          .withColumn("k",
            concat(lpad((lit(999999999999999L) - col("c")).cast("string"), 15, "0"),
              lit(KSep), col("pair")))
          .orderBy(col("k")).limit(TopC)
          .collect().sortBy(_.getString(2))
          .map { r =>
            val Array(a, b) = r.getString(0).split(Sep, 2)
            (a, b, r.getLong(1))
          }.toSeq
        val sel = greedySelect(cands, cap)
        if (sel.isEmpty) exhausted = true // empty census: training is done
        else {
          sel.zipWithIndex.foreach { case ((a, b, c), i) =>
            merges += BatchMerge(s, (i + 1).toLong, a, b, c)
          }
          val applied = sel.foldLeft(col("ts")) { case (acc, (a, b, _)) =>
            replace(acc, lit(s"$Sep$a$Sep$Sep$b$Sep"), lit(s"$Sep$a$b$Sep"))
          }
          v = v.withColumn("ts", applied).localCheckpoint(false)
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

  // ---------------------------------------------------------------- q182
  /** The batched trainer's merge table: (sweep, rnk, a, b, pair_count)
    * — rnk is within-sweep application order. ≥64 effective merges at
    * every SF under the default budget (spec-pinned), at 2 jobs per
    * SWEEP instead of per merge. */
  def q182(spark: SparkSession, sfDir: String): DataFrame = {
    val (merges, _) = fitBatched(Tables.table(spark, sfDir, "documents").select(col("text")))
    import spark.implicits._
    merges.toDF("sweep", "rnk", "a", "b", "pair_count")
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

  /** The batched loop unrolled: per sweep a census, the top-C candidate
    * list in rank-key order, the greedy token-disjoint scan as a
    * list_reduce fold (acc = selected pairs in WRAPPED form "␟a␟␟b␟"
    * joined by chr(29); membership test = contains(acc, "␟tok␟") —
    * exact because tokens never contain chr(31) and chr(29) breaks any
    * cross-pair span), then one list_reduce replace-fold application in
    * selection order. Mirrors [[fitBatched]]+[[greedySelect]] exactly —
    * same key, same tie-break, same conflict rule, same cap, same chain
    * order. Every CTE MATERIALIZED (the twice-referenced-CTE inlining
    * trap, BASELINE.md). */
  private[ext] def batchedCtes(sweeps: Int, cap: Int, where: String = ""): String = {
    val sep = "chr(31)"
    def wrapped(m: String) =
      s"$sep || split_part($m, $sep, 1) || $sep || $sep || split_part($m, $sep, 2) || $sep"
    def sweep(k: Int): String =
      s"""bp$k AS MATERIALIZED (
         |  SELECT pair, CAST(sum(wc) AS BIGINT) AS c FROM (
         |    SELECT wc, unnest(list_transform(range(1, len(tk)),
         |                 i -> tk[i] || $sep || tk[i + 1])) AS pair
         |    FROM (SELECT wc, string_split(trim(ts, $sep), $sep || $sep) AS tk
         |          FROM bv${k - 1}))
         |  GROUP BY pair),
         |bc$k AS MATERIALIZED (
         |  SELECT list(pair ORDER BY k) AS cands FROM (
         |    SELECT pair, lpad(CAST(999999999999999 - c AS VARCHAR), 15, '0') || chr(30) || pair AS k
         |    FROM bp$k
         |    QUALIFY row_number() OVER (ORDER BY k) <= $TopC)),
         |bg$k AS MATERIALIZED (
         |  SELECT list_reduce(
         |    list_prepend('', COALESCE(cands, [])),
         |    (acc, m) -> CASE
         |      WHEN length(acc) - length(replace(acc, chr(29), '')) >= $cap THEN acc
         |      WHEN contains(acc, $sep || split_part(m, $sep, 1) || $sep)
         |        OR contains(acc, $sep || split_part(m, $sep, 2) || $sep) THEN acc
         |      ELSE acc || chr(29) || ${wrapped("m")} END) AS selstr
         |  FROM bc$k),
         |bs$k AS MATERIALIZED (
         |  SELECT split_part(trim(wp, $sep), $sep || $sep, 1) AS a,
         |         split_part(trim(wp, $sep), $sep || $sep, 2) AS b,
         |         CAST(rnk AS BIGINT) AS rnk
         |  FROM (
         |    SELECT unnest(lst) AS wp, unnest(range(1, len(lst) + 1)) AS rnk
         |    FROM (SELECT CASE WHEN selstr = '' THEN CAST([] AS VARCHAR[])
         |                      ELSE string_split(substr(selstr, 2), chr(29)) END AS lst
         |          FROM bg$k))),
         |bv$k AS MATERIALIZED (
         |  SELECT word, wc, list_reduce(
         |    list_prepend(ts, (SELECT COALESCE(list(a || $sep || b ORDER BY rnk), []) FROM bs$k)),
         |    (acc, m) -> replace(acc, ${wrapped("m")},
         |      $sep || split_part(m, $sep, 1) || split_part(m, $sep, 2) || $sep)) AS ts
         |  FROM bv${k - 1})""".stripMargin
    s"""bw AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents $where),
       |bv0 AS MATERIALIZED (SELECT word, count(*) AS wc,
       |         $sep || array_to_string(string_split(word, ''), $sep || $sep) || $sep AS ts
       |       FROM bw WHERE length(word) >= 1 GROUP BY word),
       |${(1 to sweeps).map(sweep).mkString(",\n")}""".stripMargin
  }

  private def q182Sql(sweeps: Int = BatchSweeps, cap: Int = SweepCap): String =
    s"""WITH ${batchedCtes(sweeps, cap)}
       |${(1 to sweeps).map(k =>
            s"SELECT CAST($k AS INT) AS sweep, s.rnk, s.a, s.b, " +
              s"CAST(p.c AS BIGINT) AS pair_count " +
              s"FROM bs$k s JOIN bp$k p ON p.pair = s.a || chr(31) || s.b")
          .mkString("", "\nUNION ALL\n", "")}""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q177_bpe_merges", q177, Some(q177Sql())),
    QueryDef("q178_bpe_encode", q178(_, _), Some(q178Sql())),
    QueryDef("q181_bpe_fertility", q181, Some(q181Sql())),
    QueryDef("q182_bpe_batch_merges", q182, Some(q182Sql())))
}
