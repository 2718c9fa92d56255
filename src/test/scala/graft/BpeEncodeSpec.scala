package graft

import graft.ext.BpeEncode
import graft.oracle.{Registry, Tables}
import org.apache.spark.sql.functions._

/** q177/q178 — BPE learn + encode, pinned against an independent plain-
  * Scala reference implementation (token lists, no strings-with-
  * separators, no Spark) and cross-pinned to q17's estimates. */
class BpeEncodeSpec extends SparkSpec {

  import spark.implicits._

  /** Reference BPE: per round count adjacent pairs over token lists
    * (overlapping positions, weighted by word count), merge the
    * (count DESC, pair ASC) winner greedily leftmost. Deliberately a
    * DIFFERENT formulation from the engine's replace-over-wrapped-
    * strings — agreement pins the representation tricks. */
  private def refBpe(words: Map[String, Long], rounds: Int)
      : (Seq[(Int, String, String, Long)], Map[String, Seq[String]]) = {
    var toks: Map[String, Seq[String]] =
      words.map { case (w, _) => w -> w.map(_.toString) }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    (1 to rounds).foreach { k =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      toks.foreach { case (w, ts) =>
        ts.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + words(w)
        }
      }
      if (counts.nonEmpty) {
        val ((a, b), c) = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a + BpeEncode.Sep + b) }
        merges += ((k, a, b, c))
        toks = toks.map { case (w, ts) =>
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < ts.size) {
            if (i + 1 < ts.size && ts(i) == a && ts(i + 1) == b) {
              out += (a + b); i += 2 // greedy leftmost, non-overlapping
            } else { out += ts(i); i += 1 }
          }
          w -> out.toSeq
        }
      }
    }
    (merges.result(), toks)
  }

  private def fitOn(texts: Seq[String], rounds: Int) =
    BpeEncode.fit(texts.toDF("text"), rounds)

  test("hand fixture: learned merges == reference BPE, including greedy-leftmost overlap handling") {
    val texts = Seq("aaa bab aaa ab", "aa bab banana", "banana aaa")
    val words = texts.flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }
    val rounds = 6
    val (refMerges, refToks) = refBpe(words, rounds)
    val (gotMerges, v) = fitOn(texts, rounds)
    assert(gotMerges.map(m => (m.round, m.a, m.b, m.pair_count)) == refMerges,
      s"merges diverged from reference:\n got $gotMerges\n ref $refMerges")
    // final token sequences word-for-word
    val gotToks = v.select(col("word"), col("ts")).collect()
      .map(r => r.getString(0) ->
        r.getString(1).stripPrefix(BpeEncode.Sep).stripSuffix(BpeEncode.Sep)
          .split(BpeEncode.Sep + BpeEncode.Sep).toSeq).toMap
    assert(gotToks == refToks,
      s"encodings diverged:\n got $gotToks\n ref $refToks")
    // the overlap case explicitly: after merging (a, a), "aaa" must be
    // [aa, a] (greedy leftmost), never [a, aa]
    val (_, v1) = fitOn(Seq("aaa aaa aa"), 1)
    val aaa = v1.filter(col("word") === "aaa").select(col("ts")).head().getString(0)
    assert(aaa == s"${BpeEncode.Sep}aa${BpeEncode.Sep}${BpeEncode.Sep}a${BpeEncode.Sep}",
      s"greedy-leftmost violated: $aaa")
  }

  test("merge exhaustion: a vocab with fewer merges than rounds stops cleanly, encode still works") {
    // single 2-char word: round 1 merges it whole, rounds 2+ find no pairs
    val (merges, v) = fitOn(Seq("ab ab"), 5)
    assert(merges.map(m => (m.a, m.b)) == Seq(("a", "b")))
    assert(v.select(col("ts")).head().getString(0) ==
      s"${BpeEncode.Sep}ab${BpeEncode.Sep}")
  }

  test("batched trainer at cap=1 degenerates to exact sequential BPE: the 12-round prefix == q177's merges") {
    // at cap 1 the local-max top-1 IS the global argmax, so the batched
    // trainer must reproduce fit()'s merge sequence EXACTLY — this is
    // the cross-pin that the batching changes economics, not the
    // underlying statistic
    val docs = Tables.table(spark, sf0001, "documents").select(col("text"))
    val (seq12, _) = BpeEncode.fit(docs, BpeEncode.MergeRounds)
    val (bat12, _) = BpeEncode.fitBatched(docs, sweeps = BpeEncode.MergeRounds, cap = 1)
    assert(bat12.map(m => (m.sweep, m.a, m.b, m.pair_count)) ==
      seq12.map(m => (m.round, m.a, m.b, m.pair_count)),
      s"cap=1 batched trainer diverged from sequential BPE:\n bat $bat12\n seq $seq12")
    assert(bat12.forall(_.rnk == 1L))
    graft.oracle.Tables.releasePersisted()
  }

  test("batched trainer: >=64 effective merges, per-sweep selections token-disjoint, jobs-per-merge << 1") {
    val docs = Tables.table(spark, sf0001, "documents").select(col("text"))
    val group = "bpe-batch-econ"
    spark.sparkContext.setJobGroup(group, "batched-BPE economics", interruptOnCancel = false)
    val (merges, _) =
      try BpeEncode.fitBatched(docs) finally spark.sparkContext.clearJobGroup()
    assert(merges.size >= 64,
      s"default budget must learn >=64 effective merges at sf0.001, got ${merges.size}")
    // local-max selections are pairwise token-DISJOINT within a sweep —
    // the property that makes one-pass chained application safe
    merges.groupBy(_.sweep).foreach { case (s, ms) =>
      val owners = ms.flatMap(m => Set(m.a, m.b).toSeq.map(_ -> m.rnk))
      owners.groupBy(_._1).foreach { case (tok, os) =>
        assert(os.map(_._2).distinct.size == 1,
          s"sweep $s: token '$tok' shared across selected pairs ${os.map(_._2)}")
      }
    }
    // economics: Spark jobs during the whole fit, per merge learned.
    // The status store is listener-fed (async) — poll until stable.
    def groupJobs(): Int = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
    var jobs = groupJobs(); var stable = 0; var waited = 0
    while (stable < 2 && waited < 50) {
      Thread.sleep(100); waited += 1
      val j = groupJobs()
      if (j == jobs) stable += 1 else { stable = 0; jobs = j }
    }
    val perMerge = jobs.toDouble / merges.size
    info(f"batched BPE: ${merges.size} merges, $jobs Spark jobs, $perMerge%.2f jobs/merge")
    assert(jobs > 0, "job-group accounting must see the fit's jobs")
    assert(perMerge < 1.0,
      f"batched training must be sub-linear in jobs per merge, got $perMerge%.2f ($jobs jobs / ${merges.size} merges)")
    graft.oracle.Tables.releasePersisted()
  }

  test("corpus cross-pin: exact encoded token counts refine q17's estimates per source") {
    val docs = Tables.table(spark, sf0001, "documents")
    val (merges, v) = BpeEncode.fit(docs.select(col("text")))
    assert(merges.size == BpeEncode.MergeRounds, "fixture vocab must sustain all rounds")
    val enc = BpeEncode.encodedCountsOf(docs, v).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val q17 = Registry.byName("q17_token_counts").run(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(enc.keySet == q17.keySet)
    enc.foreach { case (src, (nWords, encTokens)) =>
      val (wsTokens, bpeEst) = q17(src)
      assert(nWords == wsTokens, s"$src: word counts must agree with q17")
      // every word is >= 1 token; ceil(len/4) estimates mean
      // 4*bpe_tokens >= total chars >= exact encoded tokens
      assert(encTokens >= wsTokens,
        s"$src: exact $encTokens below the whitespace lower bound $wsTokens")
      assert(encTokens <= 4 * bpeEst,
        s"$src: exact $encTokens above the char-count upper bound ${4 * bpeEst}")
    }
    // the merges actually compressed: exact < the char-token total
    val charToks = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .agg(sum(length(col("w")))).head().getLong(0)
    val total = enc.values.map(_._2).sum
    assert(total < charToks,
      s"12 merges must compress below the char-grain total ($total vs $charToks)")
    graft.oracle.Tables.releasePersisted()
  }
}
