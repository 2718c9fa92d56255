package graft

import graft.ops.{Backbone, BackboneDrift, Triangles}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-static drift gate (q152's ingestion face): arriving
  * co-transition edges classified against the frozen corpus structure —
  * strong (in the backbone), weak (in the census, below the cut), novel
  * (never seen). Hand verdicts, a reconciliation against the batch
  * backbone on real fixture data, and the stateless stream == batch
  * contract. */
class DriftGateSpec extends SparkSpec {

  import spark.implicits._

  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def walk(user: Long, items: Seq[Long]) =
    items.zipWithIndex.map { case (it, i) =>
      (user * 1000L + i, user, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${i}%02d"),
        s"""{"k": $it}""")
    }

  /** u1 bounces 1→2→1→2 (edge (1,2) w=3), u5 walks 2→3 (edge (2,3)
    * w=1). τ over {3, 1} at top-decile = 3 → backbone = {(1,2)} only.
    * last: u1=2, u5=3. */
  private def staticEv = (walk(1, Seq(1, 2, 1, 2)) ++ walk(5, Seq(2, 3)))
    .toDF("event_id", "user_id", "ts", "props")

  private def arrive(rows: (Long, Long, Long)*) =
    rows.toSeq.map { case (e, u, k) => (e, u, s"""{"k": $k}""") }
      .toDF("event_id", "user_id", "props")

  private def gate(arrivals: (Long, Long, Long)*) =
    BackboneDrift.driftGateStreamStatic(arrive(arrivals: _*), staticEv,
        unix_micros(col("ts")), minW = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5))).toSet

  test("hand verdicts: strong on the backbone edge, weak below the cut, novel off-census") {
    val out = gate(
      (9001L, 1L, 1L), // u1 last=2, item 1 → (1,2) w=3 → strong
      (9002L, 5L, 2L), // u5 last=3, item 2 → (2,3) w=1 < τ=3 → weak
      (9003L, 1L, 9L), // u1 last=2, item 9 → (2,9) unseen → novel
      (9004L, 1L, 2L), // self-transition → silent
      (9005L, 99L, 1L)) // unknown user → silent
    assert(out == Set(
      (1L, 9001L, 1L, 2L, 3L, "strong"),
      (5L, 9002L, 2L, 3L, 1L, "weak"),
      (1L, 9003L, 2L, 9L, 0L, "novel")), s"got $out")
  }

  test("reconciliation on fixture data: every verdict matches the batch census/backbone sets") {
    val ev = graft.oracle.Tables.table(spark, sf0001, "events")
    val tUs = graft.oracle.Tables.tsMicros(ev)
    val pw = Triangles.weightedItemGraphOf(ev, tUs, minW = 1L)
    val census = pw.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val backbone = Backbone.backboneOf(pw, 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // replay the corpus's own item events as arrivals
    val arrivals = ev
      .select(col("event_id"), col("user_id"), col("props"))
    val out = BackboneDrift.driftGateStreamStatic(arrivals, ev, tUs, minW = 1L)
      .collect()
    assert(out.nonEmpty)
    val verdicts = out.map(_.getString(5)).toSet
    assert(verdicts.contains("strong") && verdicts.contains("weak"),
      s"fixture replay must exercise at least strong+weak: $verdicts")
    out.foreach { r =>
      val e = (r.getLong(2), r.getLong(3))
      val expected =
        if (backbone(e)) "strong" else if (census(e)) "weak" else "novel"
      assert(r.getString(5) == expected, s"edge $e: ${r.getString(5)} != $expected")
    }
  }

  test("streaming append: stateless, stream == batch") {
    val arrivals = (1 to 40).map(i =>
      (8000L + i, if (i % 2 == 0) 1L else 5L, s"""{"k": ${(i % 4) + 1}}"""))
    val stream = MemoryStream[(Long, Long, String)]
    val sq = BackboneDrift.driftGateStreamStatic(
        stream.toDF().toDF("event_id", "user_id", "props"),
        staticEv, unix_micros(col("ts")), minW = 1L)
      .writeStream.format("memory").queryName("drift_gate")
      .outputMode("append").start()
    try {
      val (a, b) = arrivals.splitAt(20)
      stream.addData(a); sq.processAllAvailable()
      stream.addData(b); sq.processAllAvailable()
      assert(sq.lastProgress.stateOperators.isEmpty,
        s"drift gate must be stateless: ${sq.lastProgress.stateOperators.mkString}")
    } finally sq.stop()
    val streamed = spark.table("drift_gate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))).toSet
    val batch = BackboneDrift.driftGateStreamStatic(
        arrivals.toDF("event_id", "user_id", "props"),
        staticEv, unix_micros(col("ts")), minW = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))).toSet
    assert(streamed == batch, "stream != batch")
    assert(streamed.nonEmpty, "replay must produce alerts")
  }
}
