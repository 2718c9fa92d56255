package graft

import graft.ext.{Calibrate, Dsir}
import org.apache.spark.sql.functions._

/** Behavior + plan-shape coverage for the DSIR importance resampler (q76)
  * and the per-source ECDF calibrator (q77). */
class DsirCalibrateSpec extends SparkSpec {

  test("q76 dsir: raw docs matching the target distribution are selected, off-distribution docs are not") {
    import spark.implicits._
    // target model: 'alpha'-world bigrams; raw: two alpha-ish docs, two
    // beta-ish docs. The alpha-ish raws share hashed grams with the
    // target → positive log-ratio weight; beta grams only ever appear in
    // raw → negative
    val docs = Seq(
      (1L, "alpha one alpha two alpha three alpha four", true),
      (2L, "alpha two alpha three alpha five alpha one", true),
      (10L, "alpha one alpha two alpha three alpha six", false),
      (11L, "alpha two alpha one alpha four alpha three", false),
      (12L, "beta gray beta blue beta green beta red", false),
      (13L, "beta blue beta gray beta pink beta red", false)
    ).toDF("doc_id", "text", "is_target")
    val out = Dsir.dsirResampleOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(4))).toMap
    assert(out.keySet == Set(10L, 11L, 12L, 13L), "target docs are excluded from the output")
    assert(out(10L)._3 == 1 && out(11L)._3 == 1, s"alpha-ish raws must be selected: $out")
    assert(out(12L)._3 == 0 && out(13L)._3 == 0, s"beta-ish raws must not: $out")
    // unigrams + adjacent bigrams: 8 words -> 8 + 7 grams
    assert(out(10L)._1 == 15, s"gram count wrong: ${out(10L)}")
    // absolute weights are all smoothing-depressed (tiny target slice);
    // the SIGNAL is relative: target-like raws far outweigh the rest
    assert(out(10L)._2 > out(12L)._2 && out(11L)._2 > out(13L)._2,
      "weights carry the distribution signal")
  }

  test("q76 dsir: total on degenerate docs (single word, no target exemplars)") {
    import spark.implicits._
    // single-word doc: no bigrams — still scored; empty target partition:
    // every bucket ratio is the same smoothed constant, weights still total
    val out = Dsir.dsirResampleOf(
      Seq((1L, "solo", false), (2L, "alpha beta", false)).toDF("doc_id", "text", "is_target"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 3L), s"gram counts: $out")
  }

  test("q76 plan: ONE corpus explode into the persisted tf, ratio table broadcast — no corpus-keyed join shuffle") {
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val df = Dsir.q76(spark, sf0001)
    val withCache = df.queryExecution.withCachedData
    // every tf consumer (bucket stats, scoring, corpus census) reads the
    // SAME persisted materialization; without the keyed persist, filter
    // pushdown specializes them into separate corpus explodes (observed)
    val ims = withCache.collect { case r: InMemoryRelation => r }
    assert(ims.nonEmpty && ims.map(_.cacheBuilder).distinct.length == 1,
      s"tf consumers must share ONE materialization:\n$withCache")
    assert(withCache.collect { case l: LogicalRelation => l }.isEmpty,
      s"a corpus scan escaped the persisted tf:\n$withCache")
    val cached = ims.head.cacheBuilder.cachedPlan.toString
    assert(cached.sliding("Scan parquet".length).count(_ == "Scan parquet") == 1,
      s"persisted tf must be a single corpus explode:\n$cached")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"lr table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus shuffled to meet a <=256-row table:\n$p")
  }

  test("q77 calibrate: ECDF is within-source, inclusive, and tie-stable") {
    import spark.implicits._
    // srcA: four docs with strictly increasing quality (longer = higher
    // score here: score rewards length and type-token ratio); srcB: two
    // IDENTICAL docs (exact ties) plus one longer
    val mk = (n: Int) => (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, mk(4), "srcA"), (2L, mk(8), "srcA"), (3L, mk(16), "srcA"), (4L, mk(32), "srcA"),
      (10L, mk(6), "srcB"), (11L, mk(6), "srcB"), (12L, mk(24), "srcB")
    ).toDF("doc_id", "text", "source")
    val out = Calibrate.calibrateBySource(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // srcA: distinct scores -> ranks 1..4 of 4
    assert(out(1L) == (4L, 1L, 0.25) && out(2L) == (4L, 2L, 0.5) &&
      out(3L) == (4L, 3L, 0.75) && out(4L) == (4L, 4L, 1.0), s"srcA ecdf: $out")
    // srcB: the two ties share cum_le = 2 (inclusive ECDF), top doc = 1.0
    assert(out(10L) == (3L, 2L, 0.6666) && out(11L) == out(10L) && out(12L)._3 == 1.0,
      s"srcB ties: $out")
  }

  test("q77 plan: ecdf histogram broadcast back, corpus never windowed") {
    val df = Calibrate.q77(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"ecdf table must broadcast:\n$p")
    // exactly one Window node, and it runs over the bounded histogram
    // (input to the window is an aggregation, never a raw corpus scan)
    val win = p.linesIterator.count(_.trim.startsWith("Window "))
    assert(win <= 2, s"unexpected extra windows:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian crept in:\n$p")
  }
}
