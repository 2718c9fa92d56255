package graft

import graft.ops.YieldCensus
import org.apache.spark.sql.functions._

/** q138: per-source pipeline yield accounting. */
class YieldCensusSpec extends SparkSpec {

  import spark.implicits._

  test("hand corpus: stage losses attributed exactly") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, "s1", base + " one"),            // keeper of the near-dup pair
      (2L, "s1", base + " two"),            // removed (doc_b of the pair)
      (3L, "s1", "the the the the the the the the"), // unique but low quality
      (4L, "s2", "rich diverse content with many distinct informative words here"))
      .toDF("doc_id", "source", "text")
    val got = YieldCensus.yieldCensusOf(docs, qualityFloorQ10k = 5500L, ctxLen = 8L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val s1 = got("s1")
    assert(s1._1 == 3L, "three raw docs")
    assert(s1._2 == 2L, "doc 2 removed as the higher near-dup id")
    assert(s1._3 == 1L, "the stopword doc fails the quality floor")
    assert(s1._5 <= 8L, "final tokens clipped to the context window")
    val s2 = got("s2")
    assert(s2 == ((1L, 1L, 1L, s2._4, 8L, 8L * 10000L / s2._4)),
      s"clean source passes every stage: $s2")
  }

  test("fixture reconciliation: removals == q14's distinct higher-id docs") {
    val y = YieldCensus.q138(spark, sf0001).collect()
    val removedTotal = y.map(r => r.getLong(1) - r.getLong(2)).sum
    val pairRemoved = graft.ext.TextOps.ngramJaccard(spark, sf0001)
      .select(col("doc_b")).distinct().count()
    assert(removedTotal == pairRemoved,
      s"yield removals $removedTotal vs q14 distinct doc_b $pairRemoved")
    y.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2) && r.getLong(2) <= r.getLong(1))
      assert(r.getLong(6) <= 10000L, "clipping makes yield a true sub-fraction")
    }
  }
}
