package graft

import graft.ext.{TextOps, VocabGrowth}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Vocabulary growth curve (q103) + the stream-static OOV gate. */
class VocabGrowthSpec extends SparkSpec {

  import spark.implicits._

  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("q103 curves match a brute-force recomputation over collected buckets") {
    val docs = graft.oracle.Tables.table(spark, sf0001, "documents")
    // recompute each doc's bucket with the operator's own md5 idiom, then
    // count in plain Scala
    val rows = docs
      .select(md5(concat(lit("vg|"), col("doc_id"))).as("h"), col("text"))
      .withColumn("bucket", expr(s"CAST(${TextOps.hexVal("h", 1, duck = false)} % 10 AS INT)"))
      .collect().map(r => (r.getAs[Int]("bucket"), r.getAs[String]("text").split(" ").toSeq))
    val toksPer = rows.groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2.size.toLong).sum }
    val firstB = rows.flatMap { case (b, ws) => ws.map(_ -> b) }
      .groupBy(_._1).map { case (w, bs) => w -> bs.map(_._2).min }
    val newPer = firstB.groupBy(_._2).map { case (b, ws) => b -> ws.size.toLong }
    val got = VocabGrowth.q103(spark, sf0001).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == toksPer.keySet)
    val order = got.keySet.toSeq.sorted
    var (tc, vc) = (0L, 0L)
    order.foreach { b =>
      tc += toksPer(b); vc += newPer.getOrElse(b, 0L)
      assert(got(b) == (toksPer(b), tc, newPer.getOrElse(b, 0L), vc), s"bucket $b")
    }
  }

  test("q103 invariants: cumulative curves end at corpus totals") {
    val docs = graft.oracle.Tables.table(spark, sf0001, "documents")
    val totToks = docs.select(explode(split(col("text"), " "))).count()
    val totVocab = docs.select(explode(split(col("text"), " ")).as("w")).distinct().count()
    val last = VocabGrowth.q103(spark, sf0001)
      .orderBy(col("bucket").desc).limit(1).collect()(0)
    assert(last.getAs[Long]("toks_cum") == totToks)
    assert(last.getAs[Long]("vocab_cum") == totVocab)
  }

  test("oov gate: known words never flag, novel words flag (no false negatives)") {
    val corpus = Seq((1L, "alpha beta gamma delta"), (2L, "beta epsilon")).toDF("doc_id", "text")
    val arrivals = Seq(
      (10L, "alpha beta epsilon"),      // all known -> 0 OOV, guaranteed
      (11L, "alpha zeta999 theta888"),  // 2 novel
      (12L, "qq11 ww22 ee33 rr44")).toDF("doc_id", "text")
    val out = VocabGrowth.oovGateStreamStatic(arrivals, corpus, mBits = 1 << 16)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(10L) == ((3L, 0L, 0L)), s"in-vocab words must all hit: $out")
    assert(out(11L)._1 == 3L && out(11L)._2 <= 2L && out(11L)._2 >= 1L)
    assert(out(12L)._2 >= 3L, s"fresh words should flag (tiny FP chance at 64Ki bits): $out")
    assert(out(12L)._3 == out(12L)._2 * 10000L / 4L)
  }

  test("oov gate: streaming arrivals == batch on the same frozen vocabulary") {
    val corpus = (1L to 30L).map(i => (i, s"base$i shared common words")).toDF("doc_id", "text")
    val arrivals = Seq((100L, "shared common novelword1"), (101L, "base3 words"),
      (102L, "all new tokens here"))
    val stream = MemoryStream[(Long, String)]
    val sq = VocabGrowth.oovGateStreamStatic(
        stream.toDF().toDF("doc_id", "text"), corpus)
      .writeStream.format("memory").queryName("oov_gate")
      .outputMode("append").start()
    try {
      stream.addData(arrivals)
      sq.processAllAvailable()
    } finally sq.stop()
    val streamed = spark.table("oov_gate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = VocabGrowth.oovGateStreamStatic(
        arrivals.toDF("doc_id", "text"), corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch, s"stream != batch: $streamed vs $batch")
    assert(streamed.map(_._1) == Set(100L, 101L, 102L))
  }
}
