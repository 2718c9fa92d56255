package graft

import graft.ext.ContextSweep
import org.apache.spark.sql.functions._

class ContextSweepSpec extends SparkSpec {

  test("q78: per-L measures are exact on hand-computed docs") {
    import spark.implicits._
    // BPE-ish tokens = sum over words of (len+3) div 4:
    // "aaaa bb" -> 1 + 1 = 2; "aaaaaaaa" (8 chars) -> 2; 12-char word -> 3
    val docs = Seq(
      (1L, "aaaa bb"),                    // 2 tokens
      (2L, "aaaaaaaa aaaaaaaa aaaaaaaa"), // 6 tokens
      (3L, "aaaaaaaaaaaa")                // 3 tokens
    ).toDF("doc_id", "text")
    val out = ContextSweep.contextSweepOf(docs, grid = Seq(4L, 8L)).collect()
      .map(r => r.getLong(0) -> r).toMap
    // L=4: doc2 overflows (6>4): kept = 2+4+3 = 9, clipped = 2,
    //      bins_lb = ceil(9/4) = 3, waste = (12-9)/12 = 2500bp, trunc = 2*10000 div 11
    val l4 = out(4L)
    assert(l4.getLong(1) == 3 && l4.getLong(2) == 1 && l4.getLong(3) == 11 &&
      l4.getLong(4) == 9 && l4.getLong(5) == 2 && l4.getLong(6) == 3 &&
      l4.getLong(7) == 2500 && l4.getLong(8) == 1818, s"L=4 wrong: $l4")
    // L=8: nothing overflows: kept = 11, bins_lb = ceil(11/8) = 2,
    //      waste = (16-11)/16 = 3125bp, trunc = 0
    val l8 = out(8L)
    assert(l8.getLong(4) == 11 && l8.getLong(5) == 0 && l8.getLong(6) == 2 &&
      l8.getLong(7) == 3125 && l8.getLong(8) == 0, s"L=8 wrong: $l8")
  }

  test("q78 plan: one corpus scan, no per-L row explosion — grid lives inside the single aggregation") {
    val df = ContextSweep.q78(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    def count(sub: String) = p.sliding(sub.length).count(_ == sub)
    assert(count("Scan parquet") == 1, s"grid must not multiply scans:\n$p")
    // the only Generate is the stack unpivot ABOVE the aggregation (it
    // runs over ONE wide row); a Generate below the aggregate would be a
    // corpus × grid blowup, and any Join would be the grid meeting the
    // corpus row-wise
    assert(count("Generate ") == 1 && p.indexOf("Generate ") < p.indexOf("HashAggregate"),
      s"grid-in-agg shape lost (corpus x grid blowup):\n$p")
    assert(!p.contains("Join"), s"grid joined against the corpus:\n$p")
  }

  test("q78: total on an empty frame (all-zero rows per L, no division error)") {
    import spark.implicits._
    val out = ContextSweep.contextSweepOf(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), grid = Seq(4L)).collect()
    assert(out.length == 1 && out(0).getLong(1) == 0 && out(0).getLong(7) == 0,
      s"empty corpus must yield zero rows-measures: ${out.toSeq}")
  }
}
