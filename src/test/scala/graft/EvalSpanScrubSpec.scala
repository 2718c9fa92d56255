package graft

import graft.ext.EvalSpanScrub
import org.apache.spark.sql.functions._

/** Span-level benchmark decontamination (q102). */
class EvalSpanScrubSpec extends SparkSpec {

  import spark.implicits._

  private def df(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("a planted eval 5-gram is scrubbed from a training doc, rest kept") {
    val train = df((1L, "a b LEAK1 LEAK2 LEAK3 LEAK4 LEAK5 y z"))
    val eval = df((100L, "pre LEAK1 LEAK2 LEAK3 LEAK4 LEAK5 post"))
    val out = EvalSpanScrub.evalSpanScrubOf(train, eval).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("n_eval_windows") == 1L)
    assert(r.getAs[Long]("n_covered") == 5L)
    assert(r.getAs[String]("clean_text") == "a b y z")
  }

  test("overlapping matched windows merge through per-word coverage") {
    // eval contains a 6-word phrase -> two overlapping 5-windows in train
    val train = df((1L, "x L1 L2 L3 L4 L5 L6 y"))
    val eval = df((100L, "L1 L2 L3 L4 L5 L6"))
    val r = EvalSpanScrub.evalSpanScrubOf(train, eval).collect()(0)
    assert(r.getAs[Long]("n_eval_windows") == 2L)
    assert(r.getAs[Long]("n_covered") == 6L) // merged, not 10
    assert(r.getAs[String]("clean_text") == "x y")
  }

  test("clean docs and sub-L docs pass through untouched; eval docs not emitted") {
    val train = df((1L, "nothing shared here at all today"), (2L, "too short"))
    val eval = df((100L, "entirely different eval content words here"))
    val out = EvalSpanScrub.evalSpanScrubOf(train, eval)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L).getAs[Long]("n_covered") == 0L)
    assert(out(1L).getAs[String]("clean_text") == "nothing shared here at all today")
    assert(out(2L).getAs[Long]("n_eval_windows") == 0L)
    assert(out(2L).getAs[String]("clean_text") == "too short")
  }

  test("eval-span gate: planted leak flags, fresh doc is guaranteed clean, flags agree with batch scrub") {
    val eval = df((100L, "pre LEAK1 LEAK2 LEAK3 LEAK4 LEAK5 post"))
    val arrivals = Seq(
      (1L, "a b LEAK1 LEAK2 LEAK3 LEAK4 LEAK5 y z"),
      (2L, "completely fresh content with nothing shared at all"),
      (3L, "too short"))
    val out = EvalSpanScrub.evalSpanGateStreamStatic(
        arrivals.toDF("doc_id", "text"), eval)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(out(1L)._1 >= 1L && !out(1L)._2, "planted leak must flag")
    assert(out(3L) == ((0L, true)), "sub-L docs cannot leak a span")
    // no false negatives: every doc q102 would scrub is flagged here
    val scrubbed = EvalSpanScrub.evalSpanScrubOf(arrivals.toDF("doc_id", "text"), eval)
      .filter(col("n_eval_windows") > 0).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(scrubbed.subsetOf(out.filter(!_._2._2).keySet),
      s"gate missed a doc the batch scrub flags: $scrubbed vs $out")
  }

  test("eval-span gate: streaming arrivals == batch on the same frozen vocabulary") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val eval = df((100L, "E1 E2 E3 E4 E5 E6"))
    val arrivals = Seq((1L, "x E1 E2 E3 E4 E5 E6 y"), (2L, "clean text runs here today"))
    val stream = MemoryStream[(Long, String)]
    val sq = EvalSpanScrub.evalSpanGateStreamStatic(
        stream.toDF().toDF("doc_id", "text"), eval)
      .writeStream.format("memory").queryName("evalspan_gate")
      .outputMode("append").start()
    try {
      stream.addData(arrivals)
      sq.processAllAvailable()
    } finally sq.stop()
    val streamed = spark.table("evalspan_gate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    val batch = EvalSpanScrub.evalSpanGateStreamStatic(
        arrivals.toDF("doc_id", "text"), eval).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(streamed == batch, s"stream != batch: $streamed vs $batch")
  }

  test("q102 fixture form covers every non-eval doc exactly once") {
    val docs = graft.oracle.Tables.table(spark, sf0001, "documents")
    val nTrain = docs.filter(col("doc_id") % 20 =!= 7).count()
    val out = EvalSpanScrub.q102(spark, sf0001)
    assert(out.count() == nTrain)
    assert(out.select("doc_id").distinct().count() == nTrain)
  }
}
