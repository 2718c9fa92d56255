package graft

import graft.ext.Containment

class ContainmentSpec extends SparkSpec {

  test("q90: a quoted subset scores containment ~1 where jaccard stays low") {
    import spark.implicits._
    // doc 2 = the first 6 words of doc 1 (4 shingles, all inside doc 1's 10)
    val long = (1 to 12).map(i => s"w$i").mkString(" ")
    val quote = (1 to 6).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, long), (2L, quote),
      (3L, (1 to 12).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val out = Containment.containmentOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.keySet == Set((1L, 2L)), s"only the quote pair: $out")
    val (inter, contLong, contQuote) = out((1L, 2L))
    assert(inter == 4 && contQuote == 1.0, s"quote wholly contained: $out")
    assert(contLong == 0.4, s"long side containment 4/10: $out")
    // the same pair's jaccard = 4/(10+4-4) = 0.4 — containment is the
    // signal that flags it as a subset-dup at a 0.5+ threshold
    assert(contQuote > 0.5 && contLong < 0.5)
  }

  test("q90: threshold is max-direction — pairs below it in BOTH directions are dropped") {
    import spark.implicits._
    // overlap of 3 shingles between two 10-shingle docs: 0.3 both ways < 0.5
    val a = ((1 to 5).map(i => s"c$i") ++ (1 to 7).map(i => s"a$i")).mkString(" ")
    val b = ((1 to 5).map(i => s"c$i") ++ (1 to 7).map(i => s"b$i")).mkString(" ")
    val out = Containment.containmentOf(Seq((1L, a), (2L, b)).toDF("doc_id", "text")).collect()
    assert(out.isEmpty, s"sub-threshold overlap must not emit: ${out.toSeq}")
  }
}
