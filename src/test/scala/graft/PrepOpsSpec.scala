package graft

import graft.ext.{BpePairs, Chunker}
import org.apache.spark.sql.functions._

/** q69 sliding-window chunking, q70 BPE pair counting — semantics vs
  * in-memory recomputation plus the parameter/edge contracts. */
class PrepOpsSpec extends SparkSpec {

  // ---------------------------------------------------------------- q69

  test("q69: chunks are exactly the stride grid with sliced text; full word coverage (brute force)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = Chunker.chunkOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val expected = texts.toSeq.flatMap { case (id, text) =>
      val ws = text.split(" ", -1)
      (0 until ws.length by 30).map { start =>
        val take = math.min(40, ws.length - start)
        (id, (start / 30).toLong, start.toLong, take.toLong,
          ws.slice(start, start + take).mkString(" "))
      }
    }
    assert(got.sorted.toSeq == expected.sorted.toSeq)
    // stride < chunk => every word index of every doc is inside >= 1 chunk
    for ((id, text) <- texts) {
      val n = text.split(" ", -1).length
      val covered = got.filter(_._1 == id)
        .flatMap(c => c._3 until (c._3 + c._4)).toSet
      assert(covered == (0L until n).toSet, s"doc $id: coverage hole")
    }
    assert(got.exists(_._2 >= 1L), "fixture docs are long enough to multi-chunk")
  }

  test("q69: stride == chunk partitions exactly; short docs emit one whole-text chunk; bad stride throws") {
    import spark.implicits._
    val one = Seq((1L, "just five words right here")).toDF("doc_id", "text")
    val whole = Chunker.chunkOf(one).collect()
    assert(whole.length == 1 && whole.head.getString(4) == "just five words right here")
    val part = Chunker.chunkOf(
      Seq((2L, (1 to 10).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text"),
      chunkWords = 4, strideWords = 4).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getString(4))).sortBy(_._1)
    assert(part.map(_._1).toSeq == Seq(0L, 4L, 8L), "starts on the exact grid")
    assert(part.map(_._2).toSeq == Seq(4L, 4L, 2L), "tail chunk is short, not dropped")
    assert(part.flatMap(_._3.split(" ")).toSeq == (1 to 10).map(i => s"w$i"), "no overlap at stride == chunk")
    intercept[IllegalArgumentException] {
      Chunker.chunkOf(one, chunkWords = 10, strideWords = 11)
    }
  }

  // ---------------------------------------------------------------- q70

  test("q70: pair counts are word-frequency weighted; ties rank lexicographically (planted)") {
    import spark.implicits._
    // vocab: aa x2, bb x1, aab x1 -> pairs: aa = 2 + 1, ab = 1, bb = 1
    val docs = Seq("aa aa bb", "aab").toDF("text")
    val got = BpePairs.bpePairsOf(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, "aa", 3L), (2L, "ab", 1L), (3L, "bb", 1L)))
  }

  test("q70: fixture ranking matches an in-memory census; topN bounds the output") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").select(col("text"))
    val counts = scala.collection.mutable.Map[String, Long]()
    for (r <- docs.collect(); w <- r.getString(0).split(" ", -1) if w.length >= 2;
         i <- 0 until w.length - 1)
      counts(w.substring(i, i + 2)) = counts.getOrElse(w.substring(i, i + 2), 0L) + 1L
    val expect = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(50)
    val got = BpePairs.bpePairsOf(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(got.length == 50, "fixture has >= 50 distinct pairs")
    assert(got.map(t => (t._2, t._3)).toSeq == expect)
    assert(got.map(_._1).toSeq == (1L to 50L))
    assert(BpePairs.bpePairsOf(docs, topN = 7).count() == 7)
  }

  // ---------------------------------------------------------------- q72

  test("q72: per-source card matches an in-memory recomputation (counts, exact quartiles, lang mix)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
    val scored = graft.ext.TextOps.scoredDocs(docs).collect()
      .map(r => (r.getString(r.fieldIndex("source")), r.getString(r.fieldIndex("lang")),
        r.getLong(r.fieldIndex("n_words")),
        math.round(r.getDouble(r.fieldIndex("quality_score")) * 10000)))
    val expected = scored.groupBy(_._1).map { case (src, ms) =>
      val qs = ms.map(_._4).sorted
      def pick(q: Double) = qs(math.floor(q * (qs.length - 1)).toInt)
      val (lang, lc) = ms.groupBy(_._2).map { case (l, g) => (l, g.length) }
        .toSeq.maxBy { case (l, c) => (c, l) }
      (src, ms.length.toLong, ms.map(_._3).sum, pick(0.25), pick(0.5), pick(0.75),
        lang, lc.toLong * 10000 / ms.length)
    }.toSet
    val got = graft.ext.DatasetCard.datasetCardOf(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6), r.getLong(7))).toSet
    assert(got == expected, s"card diverges:\n got      $got\n expected $expected")
    assert(got.size == 20)
  }

  test("q72: planted quartiles land on exact ranks; a lang tie breaks to the larger code") {
    import spark.implicits._
    // 5 docs, distinct quality by construction via word-count ramp; langs
    // split 2/2/1 with 'en' and 'fr' tied -> top must be 'fr'
    val docs = Seq(
      (1L, "s", "en", "one two three four five six seven eight nine ten"),
      (2L, "s", "fr", (1 to 20).map(i => s"mot$i").mkString(" ")),
      (3L, "s", "en", (1 to 40).map(i => s"word$i word$i").mkString(" ")),
      (4L, "s", "fr", (1 to 60).map(i => s"term$i").mkString(" ")),
      (5L, "s", "de", "the a of and to in the a of and"))
      .toDF("doc_id", "source", "lang", "text")
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
    val card = graft.ext.DatasetCard.datasetCardOf(docs).collect()
    assert(card.length == 1)
    val r = card.head
    val qs = graft.ext.TextOps.scoredDocs(docs).collect()
      .map(x => math.round(x.getDouble(x.fieldIndex("quality_score")) * 10000)).sorted
    // n=5: floor(q*(n-1)) ranks = 1, 2, 3 (0-indexed)
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) == ((qs(1), qs(2), qs(3))))
    assert(r.getString(6) == "fr" && r.getLong(7) == 4000L,
      s"lang tie must break to the larger code: ${r.getString(6)}")
  }
}
