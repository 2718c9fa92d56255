package graft

import graft.ops.Triangles
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-static triadic-closure gate (the q144/q145 ingestion face):
  * frozen co-transition graph + two-hop wedge index + per-user last item;
  * arriving events alert when their candidate edge closes triangles. The
  * load-bearing reconciliation: restricted to frozen-graph edges, the
  * gate's wedge index must EQUAL q145's compact-forward embeddedness —
  * two independent computations of triangle support. */
class TriadGateSpec extends SparkSpec {

  import spark.implicits._

  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def walk(user: Long, items: Seq[Long]) =
    items.zipWithIndex.map { case (it, i) =>
      (user * 1000L + i, user, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${i}%02d"),
        s"""{"k": $it}""")
    }

  /** Static fixture (minW = 1): u1 walks 2→1→3→2 (triangle {1,2,3}),
    * u3 walks 4→1 (pendant edge (1,4)); u2/u4 are single-event users
    * contributing last items only. last: u1=2, u2=2, u3=1, u4=4. */
  private def staticEv = (walk(1, Seq(2, 1, 3, 2)) ++ walk(2, Seq(2)) ++
    walk(3, Seq(4, 1)) ++ walk(4, Seq(4)))
    .toDF("event_id", "user_id", "ts", "props")

  private def arrive(rows: (Long, Long, Long)*) =
    rows.toSeq.map { case (e, u, k) => (e, u, s"""{"k": $k}""") }
      .toDF("event_id", "user_id", "props")

  private def gateRows(arrivals: (Long, Long, Long)*) =
    Triangles.triadGateStreamStatic(arrive(arrivals: _*), staticEv,
        unix_micros(col("ts")), minW = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).toSet

  test("hand case: triad-closing arrivals alert with exact closure counts") {
    val out = gateRows(
      (9001L, 2L, 1L), // u2 last=2, item 1 → edge (1,2): closes via 3, known
      (9002L, 2L, 9L), // edge (2,9): no common neighbor → silent
      (9003L, 1L, 3L), // u1 last=2, item 3 → edge (2,3): closes via 1, known
      (9004L, 4L, 3L), // u4 last=4, item 3 → edge (3,4): NOT in graph, closes via 1
      (9005L, 3L, 1L), // u3 last=1 == item → self-transition, silent
      (9006L, 99L, 2L)) // unknown user: no frozen last item, silent
    assert(out == Set(
      (2L, 9001L, 1L, 2L, 1L, true),
      (1L, 9003L, 2L, 3L, 1L, true),
      (4L, 9004L, 3L, 4L, 1L, false)), s"got $out")
  }

  test("reconciliation: wedge index == compact-forward embeddedness on every frozen edge") {
    val ev = graft.oracle.Tables.table(spark, sf0001, "events")
    val g = Triangles.itemGraphOf(ev, graft.oracle.Tables.tsMicros(ev), minW = 1)
    val emb = Triangles.perEdgeEmbeddedness(g, "triad_recon")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val wi = Triangles.wedgeIndexOf(g)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(emb.nonEmpty && emb.values.exists(_ > 0L),
      s"fixture graph must carry triangles for this test to bite (${emb.size} edges)")
    emb.foreach { case (k, e) =>
      assert(wi.getOrElse(k, 0L) == e,
        s"edge $k: wedge index ${wi.getOrElse(k, 0L)} != embeddedness $e")
    }
  }

  test("streaming append: stateless, stream == batch") {
    val arrivals = (1 to 60).map(i =>
      (8000L + i, (i % 4).toLong + 1L, s"""{"k": ${(i % 5) + 1}}"""))
    val stream = MemoryStream[(Long, Long, String)]
    val sq = Triangles.triadGateStreamStatic(
        stream.toDF().toDF("event_id", "user_id", "props"),
        staticEv, unix_micros(col("ts")), minW = 1)
      .writeStream.format("memory").queryName("triad_gate")
      .outputMode("append").start()
    try {
      val (a, b) = arrivals.splitAt(30)
      stream.addData(a); sq.processAllAvailable()
      stream.addData(b); sq.processAllAvailable()
      assert(sq.lastProgress.stateOperators.isEmpty,
        s"triad gate must be stateless: ${sq.lastProgress.stateOperators.mkString}")
    } finally sq.stop()
    val streamed = spark.table("triad_gate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSet
    val batch = Triangles.triadGateStreamStatic(
        arrivals.toDF("event_id", "user_id", "props"),
        staticEv, unix_micros(col("ts")), minW = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSet
    assert(streamed == batch, "stream != batch")
    assert(streamed.nonEmpty, "replay must produce at least one alert")
  }
}
