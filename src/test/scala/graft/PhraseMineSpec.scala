package graft

import graft.ext.PhraseMine

class PhraseMineSpec extends SparkSpec {

  test("q93: a true collocation outranks frequent-but-independent pairs") {
    import spark.implicits._
    // 'new york' always co-occurs (PMI high); 'the' precedes many
    // different words, so 'the cat' is frequent but weakly associated;
    // hapax pair 'rare gem' is dropped by minCount
    val docs = (1 to 10).map(i => (i.toLong,
      "new york " + (if (i % 2 == 0) "the cat sat here now" else "the dog ran far away"))) ++
      (11 to 20).map(i => (i.toLong, s"the w$i goes on")) :+ (99L, "rare gem")
    val out = PhraseMine.phrasesOf(docs.toDF("doc_id", "text"), k = 15, minCount = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(!out.exists(_._2 == "rare gem"), "hapax bigram dropped by minCount")
    val pmi = out.map(t => t._2 -> t._4).toMap
    assert(pmi.contains("new york"), s"phrase mined: $pmi")
    assert(pmi("new york") > pmi.getOrElse("the cat", Long.MinValue),
      s"collocation must beat the weakly-associated frequent pair: $pmi")
    // ranks contiguous from 1 in pmi-desc order
    assert(out.map(_._1).toSeq == (1L to out.length).toSeq)
    assert(out.map(_._4).toSeq == out.map(_._4).sortBy(-_).toSeq)
  }

  test("q93: total when nothing clears minCount") {
    import spark.implicits._
    val out = PhraseMine.phrasesOf(
      Seq((1L, "just one tiny doc")).toDF("doc_id", "text"), minCount = 5).collect()
    assert(out.isEmpty, s"no qualifying bigrams: ${out.toSeq}")
  }
}
