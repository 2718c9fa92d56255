package graft

import graft.ext.BigramLm

class BigramLmSpec extends SparkSpec {

  test("q85: millibits match a hand-computed interpolated bigram model") {
    import spark.implicits._
    // corpus: "a b" and "a c". Model: N=4; c(a)=2, c(b)=1, c(c)=1;
    // bigrams: a->b 1, a->c 1, heads c(a..)=2.
    // doc 1 = "a b": token 'a' (initial) P = 2/4;
    //   token 'b' after 'a': P = .75*(1/2) + .25*(1/4) = 0.4375
    val out = BigramLm.bigramSurprisalOf(
      Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def mb(p: Double): Long = math.round(math.log(1.0 / p) / math.log(2) * 1000)
    val expected1 = mb(0.5) + mb(0.4375)
    assert(out(1L) == (2L, expected1), s"doc1: ${out(1L)} != (2, $expected1)")
    assert(out(2L) == (2L, expected1), "doc2 is symmetric")
  }

  test("q85: repetitive text scores far more predictable than diverse text under the bigram model") {
    import spark.implicits._
    val repetitive = (1 to 20).map(_ => "spam ham").mkString(" ")
    val diverse = (1 to 40).map(i => s"u$i").mkString(" ")
    val out = BigramLm.bigramSurprisalOf(
      Seq((1L, repetitive), (2L, diverse)).toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // NB the margin is modest on a self-scored model: a once-seen bigram
    // is itself perfectly predictable (cb/ch = 1); the unigram mixture
    // term is what separates the two here
    assert(out(1L) < out(2L),
      s"boilerplate must be cheaper per word: $out")
  }

  test("q85 plan: token stream exploded once, model tables reuse the tf exchange") {
    val df = BigramLm.q85(spark, sf0001)
    df.collect() // finalize AQE
    val p = df.queryExecution.executedPlan.toString
    def count(sub: String) = p.sliding(sub.length).count(_ == sub)
    val executed = { val i = p.indexOf("== Initial Plan =="); if (i >= 0) p.take(i) else p }
    assert(executed.sliding("Generate ".length).count(_ == "Generate ") <= 1 ||
      p.contains("ReusedQueryStage") || p.contains("ReusedExchange"),
      s"model tables must derive from ONE exploded token stream:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian crept in:\n$p")
  }
}
