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
}
