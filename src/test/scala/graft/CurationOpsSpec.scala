package graft

import graft.ext.CurationOps
import org.apache.spark.sql.functions._

class CurationOpsSpec extends SparkSpec {

  private def tmpDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_curation").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q39: a training doc copying a benchmark doc is flagged; the benchmark doc is not emitted") {
    import spark.implicits._
    // doc 7 (doc_id % 20 == 7) is the benchmark slice; doc 1 copies it
    // verbatim (ratio 1.0), doc 2 shares nothing
    val dir = tmpDocs(Seq(
      (7L, "alpha beta gamma delta epsilon zeta eta", "en", "src0", 41L),
      (1L, "alpha beta gamma delta epsilon zeta eta", "en", "src0", 41L),
      (2L, "one two three four five six seven", "en", "src0", 33L)))
    val out = CurationOps.decontamination(spark, dir)
      .select(col("doc_id"), col("overlap_ratio")).as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> 1.0), s"expected only the verbatim copy flagged, got $out")
  }

  test("q39: fixture output satisfies the threshold and excludes the benchmark slice") {
    import spark.implicits._
    val rows = CurationOps.decontamination(spark, sf0001)
      .select(col("doc_id"), col("n_shingles"), col("n_overlap")).as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty, "fixture should contain contaminated docs")
    rows.foreach { case (id, n, o) =>
      assert(id % 20 != 7, s"benchmark doc $id leaked into the training output")
      assert(2 * o >= n && o <= n, s"doc $id violates the threshold: o=$o n=$n")
    }
  }

  test("q40: mode via sorted-run scan matches a brute-force count, ties break to the smallest word") {
    import spark.implicits._
    val dir = tmpDocs(Seq(
      (0L, "b b a a c", "en", "src0", 9L),            // tie a/b at 2 -> 'a'
      (1L, "x y x y x y x z", "en", "src0", 15L)))    // 'x' 4 of 8; 'x y' 3 of 7 2-grams
    val out = CurationOps.repetitionStats(spark, dir)
      .select(col("doc_id"), col("top_word"), col("top_word_n"), col("top_2gram_n"), col("flagged"))
      .as[(Long, String, Long, Long, Int)].collect().map(r => r._1 -> r).toMap
    assert(out(0L)._2 == "a" && out(0L)._3 == 2L, s"tie should break to 'a': ${out(0L)}")
    assert(out(1L)._2 == "x" && out(1L)._3 == 4L && out(1L)._4 == 3L, s"${out(1L)}")
    assert(out(1L)._5 == 1, "50% top-word doc must be flagged")

    // brute-force the fixture: per-doc max word count from a plain groupBy
    val docs = graft.oracle.Tables.table(spark, sf0001, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "w").count()
      .groupBy("doc_id").agg(max("count").as("mc"))
      .as[(Long, Long)].collect().toMap
    val got = CurationOps.repetitionStats(spark, sf0001)
      .select(col("doc_id"), col("top_word_n")).as[(Long, Long)].collect().toMap
    assert(got == docs, "sorted-run mode diverges from groupBy mode on the fixture")
  }

  test("q41: no false negatives — every exact duplicate is a bloom hit; flags are consistent") {
    import spark.implicits._
    val rows = CurationOps.bloomDedup(spark, sf0001)
      .select(col("doc_id"), col("bloom_hit"), col("exact_dup"), col("false_positive"))
      .as[(Long, Int, Int, Int)].collect()
    assert(rows.nonEmpty && rows.exists(_._3 == 1), "fixture should contain exact dups")
    rows.foreach { case (id, bh, ed, fp) =>
      assert(id % 5 == 0, s"corpus doc $id leaked into the incoming batch")
      assert(ed <= bh, s"FALSE NEGATIVE at doc $id: exact_dup=$ed bloom_hit=$bh")
      assert(fp == (if (bh == 1 && ed == 0) 1 else 0), s"fp flag inconsistent at $id")
    }
  }

  test("q41: a tiny filter saturates into all-hits but still never false-negatives") {
    import spark.implicits._
    // 8 bits, 4 probes, 20 corpus keys: bitmap saturates, FP rate ~1 —
    // degenerate but SAFE (the no-FN invariant is structural)
    val rows = CurationOps.bloomDedup(spark, sf0001, mBits = 8)
      .select(col("bloom_hit"), col("exact_dup")).as[(Int, Int)].collect()
    rows.foreach { case (bh, ed) => assert(ed <= bh) }
  }

  test("q42: rates are valid per-mil, flatten monotonically, and land near the token budget") {
    import spark.implicits._
    val out = CurationOps.mixtureResample(spark, sf0001)
      .select(col("source"), col("src_tok"), col("rate_pm"), col("n_kept"), col("kept_tokens"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.length > 1)
    out.foreach { case (s, _, r, k, _) =>
      assert(r >= 0 && r <= 1000, s"$s rate out of range: $r")
      assert(k > 0, s"$s sampled to zero")
    }
    // temperature alpha=0.5 flattens: the keep rate follows w/tok with
    // w = floor(sqrt(tok)) — floor is monotone, so whenever wa/toka >=
    // wb/tokb (exact integer cross-multiply) the rates must be ordered too.
    // (Strict 1/sqrt(tok) monotonicity does NOT hold: floor(sqrt) jumps at
    // square boundaries, e.g. 1441->37 vs 1466->38 in the fixture.)
    def w(t: Long) = math.floor(math.sqrt(t.toDouble)).toLong
    for { (sa, ta, ra, _, _) <- out; (sb, tb, rb, _, _) <- out if w(ta) * tb >= w(tb) * ta }
      assert(ra >= rb, s"rate ordering violated: $sa($ta t, $ra pm) vs $sb($tb t, $rb pm)")
    // the hash threshold is uniform, so kept tokens approximate the budget
    val docs = graft.oracle.Tables.table(spark, sf0001, "documents")
    val corpusTok = docs.select(sum(size(split(col("text"), " ")))).as[Long].head()
    val kept = out.map(_._5).sum
    assert(math.abs(kept - corpusTok / 2.0) / corpusTok < 0.10,
      s"kept $kept vs budget ${corpusTok / 2}")
  }

  test("q43: planted corpus matches hand-computed surprisal millibits exactly") {
    import spark.implicits._
    // corpus: 7 occurrences of 'x', 1 of 'y' (N=8): surprisal(x)=log2(8/7),
    // surprisal(y)=log2(8)=3.0 exactly
    val dir = tmpDocs(Seq(
      (0L, "x x x x", "en", "src0", 7L),
      (1L, "x x x y", "en", "src0", 7L)))
    val mbX = math.round(math.log(8.0 / 7) / math.log(2) * 1000) // 193
    val got = CurationOps.surprisalScore(spark, dir)
      .select(col("doc_id"), col("sum_millibits")).as[(Long, Long)].collect().toMap
    assert(got(0L) == 4 * mbX, s"doc 0: ${got(0L)} vs ${4 * mbX}")
    assert(got(1L) == 3 * mbX + 3000, s"doc 1: ${got(1L)} vs ${3 * mbX + 3000}")
  }

  test("q43: fixture flags are consistent with the integer threshold") {
    import spark.implicits._
    val rows = CurationOps.surprisalScore(spark, sf0001)
      .select(col("n_words"), col("sum_millibits"), col("flagged")).as[(Long, Long, Int)].collect()
    assert(rows.length == 500)
    rows.foreach { case (nw, smb, f) =>
      assert(f == (if (smb > nw * 5000L) 1 else 0), s"flag drift at nw=$nw smb=$smb")
    }
    assert(rows.exists(_._3 == 1) && rows.exists(_._3 == 0), "threshold should split the fixture")
  }

  test("q44: identical source distributions have exactly zero KL; fixture KL is near-nonnegative") {
    import spark.implicits._
    // two sources with the SAME text -> p_s == p_corpus -> every term ln(1)=0
    val dir = tmpDocs(Seq(
      (0L, "a b c a", "en", "src0", 7L),
      (1L, "a b c a", "en", "src1", 7L)))
    val zero = CurationOps.sourceDivergence(spark, dir)
      .select(col("source"), col("kl_microbits")).as[(String, Long)].collect().toMap
    assert(zero == Map("src0" -> 0L, "src1" -> 0L), s"expected exact zero KL, got $zero")

    // per-term microbit rounding is +-0.5, so a true-zero-or-positive KL can
    // only dip half a microbit per vocab term below zero
    val rows = CurationOps.sourceDivergence(spark, sf0001)
      .select(col("vocab_used"), col("kl_microbits")).as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (v, kl) => assert(kl * 2 >= -v, s"KL below rounding floor: $kl (vocab $v)") }
  }

  test("q48: near-dup cluster members never straddle splits; proportions roughly 90/5/5") {
    import spark.implicits._
    val split = graft.ops.Components.q48(spark, sf0001)
      .select(col("doc_id"), col("root"), col("split")).as[(Long, Long, String)].collect()
    assert(split.length == 500)
    // same root -> same split (the leakage guarantee), and clustered docs
    // (root != self for at least one member) exercise it on the fixture
    val byRoot = split.groupBy(_._2)
    assert(byRoot.exists(_._2.length > 1), "fixture should contain multi-doc clusters")
    byRoot.foreach { case (root, ms) =>
      assert(ms.map(_._3).distinct.length == 1, s"cluster $root straddles splits: $ms")
    }
    val frac = split.groupBy(_._3).view.mapValues(_.length / 500.0).toMap
    assert(frac("train") > 0.8 && frac("train") < 0.97, s"proportions off: $frac")
    assert(frac.getOrElse("val", 0.0) + frac.getOrElse("test", 0.0) > 0.03, s"$frac")
  }

  test("general forms honor their parameters: quarter budget, stricter contamination share") {
    import spark.implicits._
    val docs = graft.oracle.Tables.table(spark, sf0001, "documents")
    // quarter token budget keeps roughly half of what the half budget keeps
    val quarter = CurationOps.mixtureResampleOf(docs, budgetNum = 1L, budgetDen = 4L)
      .agg(sum(col("kept_tokens"))).as[Long].head()
    val half = CurationOps.mixtureResampleOf(docs)
      .agg(sum(col("kept_tokens"))).as[Long].head()
    assert(quarter < half * 0.7, s"quarter budget kept $quarter vs half's $half")
    // a 90% share threshold flags a subset of the 50% threshold's docs
    val strict = CurationOps.decontaminationAgainst(
        docs.filter(col("doc_id") % 20 =!= 7), docs.filter(col("doc_id") % 20 === 7),
        minShareNum = 9, minShareDen = 10)
      .select(col("doc_id")).as[Long].collect().toSet
    val loose = CurationOps.decontamination(spark, sf0001)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(strict.subsetOf(loose), s"stricter threshold admitted new docs: ${strict -- loose}")
  }

  test("decontaminationAgainst: broadcastVocab=false shuffle path returns identical rows") {
    val docs = graft.oracle.Tables.table(spark, sf0001, "documents")
    val train = docs.filter(col("doc_id") % 20 =!= 7)
    val bench = docs.filter(col("doc_id") % 20 === 7)
    val broadcastRows = CurationOps.decontaminationAgainst(train, bench)
      .collect().map(_.toSeq).toSet
    // force the planner off broadcast so the shuffle join actually runs —
    // at fixture size the unhinted path would still auto-broadcast
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = CurationOps.decontaminationAgainst(train, bench, broadcastVocab = false)
      assert(df.queryExecution.executedPlan.toString.contains("SortMergeJoin"),
        s"expected the shuffle-join shape:\n${df.queryExecution.executedPlan}")
      assert(df.collect().map(_.toSeq).toSet == broadcastRows)
      assert(broadcastRows.nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("q71: strongest eval match, hit count and tie-break match a brute-force recomputation") {
    val texts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingles(t: String): Set[String] = {
      val ws = t.split(" ", -1)
      (0 to ws.length - 3).map(i => ws.slice(i, i + 3).mkString(" ")).toSet
    }
    val evalSh = texts.collect { case (id, t) if id % 20 == 7 => id -> shingles(t) }
    val expected = texts.collect { case (id, t) if id % 20 != 7 =>
      val sh = shingles(t)
      val hits = evalSh.map { case (eid, es) => eid -> (sh & es).size }
        .filter(_._2 >= 3).toSeq
      id -> (sh.size, hits)
    }.filter(_._2._2.nonEmpty).map { case (id, (n, hits)) =>
      val (topEval, topN) = hits.sortBy { case (eid, c) => (-c, eid) }.head
      (id, n.toLong, topEval, topN.toLong, hits.length.toLong)
    }.toSet
    val got = CurationOps.contaminationAttribution(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected, s"attribution diverges: got ${got.size} vs ${expected.size} rows")
    assert(got.nonEmpty, "fixture contamination must attribute")
  }

  test("q71: every q39-contaminated doc attributes at minOverlap=1; planted copy attributes to its source") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val flagged = CurationOps.decontaminationAgainst(
      docs.filter(col("doc_id") % 20 =!= 7), docs.filter(col("doc_id") % 20 === 7))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val attributed = CurationOps.contaminationAttributionAgainst(
      docs.filter(col("doc_id") % 20 =!= 7), docs.filter(col("doc_id") % 20 === 7),
      minOverlap = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged.subsetOf(attributed),
      s"q39-flagged docs missing from attribution: ${flagged -- attributed}")
    // planted: train doc 1 copies eval doc 7's text, shares one 3-gram with
    // eval doc 27; the top match must be 7, with both evals counted as hits
    val eval7 = "alpha beta gamma delta epsilon zeta eta theta"
    val train = Seq((1L, eval7 + " tail words here"), (2L, "nothing shared at all obviously"))
      .toDF("doc_id", "text")
    val bench = Seq((7L, eval7), (27L, "alpha beta gamma UNRELATED ending")).toDF("doc_id", "text")
    val out = CurationOps.contaminationAttributionAgainst(train, bench, minOverlap = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(4)))).toMap
    assert(out.keySet == Set(1L), s"only the copying doc attributes: $out")
    assert(out(1L) == ((7L, 2L)), s"top match must be the copied eval doc, 2 evals hit: $out")
  }

  test("q42: deterministic under re-execution (hash-threshold, not rand)") {
    val a = CurationOps.mixtureResample(spark, sf0001).orderBy("source").collect().toSeq
    val b = CurationOps.mixtureResample(spark, sf0001).orderBy("source").collect().toSeq
    assert(a == b)
  }
}
