package graft

import graft.ext.{EvalSpanScrub, VocabGrowth}
import graft.ops.IngestGates
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Composed ingestion gate: both verdicts in ONE continuous query. */
class IngestGatesSpec extends SparkSpec {

  import spark.implicits._

  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val corpus = (1L to 25L).map(i =>
    (i, s"base$i shared common corpus words here")).toDF("doc_id", "text")
  private val eval = Seq(
    (100L, "pre LEAK1 LEAK2 LEAK3 LEAK4 LEAK5 post")).toDF("doc_id", "text")
  private val arrivals = Seq(
    (200L, "a b LEAK1 LEAK2 LEAK3 LEAK4 LEAK5 y z"), // leaks a span, novel words
    (201L, "shared common corpus words here"),        // clean + fully in-vocab
    (202L, "zz1 zz2 zz3 zz4"))                        // clean + fully OOV

  test("composed verdicts are column-identical to the standalone gates") {
    val in = arrivals.toDF("doc_id", "text")
    val composed = IngestGates.composedGateStreamStatic(in, corpus, eval)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4), r.getLong(5))).toMap
    val span = EvalSpanScrub.evalSpanGateStreamStatic(in, eval)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    val oov = VocabGrowth.oovGateStreamStatic(in, corpus)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    arrivals.map(_._1).foreach { id =>
      assert(composed(id)._1 == span(id)._1 && composed(id)._2 == span(id)._2 &&
        composed(id)._3 == span(id)._3, s"span columns diverge for $id")
      assert(composed(id)._4 == oov(id)._1 && composed(id)._5 == oov(id)._2,
        s"oov columns diverge for $id")
    }
    assert(!composed(200L)._3 && composed(201L)._3 && composed(202L)._3)
    assert(composed(201L)._4 == 0L && composed(202L)._4 == 4L)
  }

  test("one continuous append query carries both verdicts, stream == batch") {
    val stream = MemoryStream[(Long, String)]
    val sq = IngestGates.composedGateStreamStatic(
        stream.toDF().toDF("doc_id", "text"), corpus, eval)
      .writeStream.format("memory").queryName("composed_gate")
      .outputMode("append").start()
    try {
      stream.addData(arrivals)
      sq.processAllAvailable()
      // zero stateful operators in the continuous query
      val progress = sq.lastProgress
      assert(progress.stateOperators.isEmpty,
        s"composed gate must be stateless: ${progress.stateOperators.mkString}")
    } finally sq.stop()
    val streamed = spark.table("composed_gate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getLong(4), r.getLong(5))).toSet
    val batch = IngestGates.composedGateStreamStatic(
        arrivals.toDF("doc_id", "text"), corpus, eval).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(streamed == batch, s"stream != batch: $streamed vs $batch")
  }
}
