package graft

import graft.ops.{Backbone, PmiNeighbors, Triangles, WalkPairs, WalkPmi}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-static link-materialization gate (q157's ingestion face):
  * arriving co-transitions that realize a predicted-but-never-observed
  * pair alert with the prediction's score. Structural hand fixture (the
  * bipartite co-transition graph whose walk matrix predicts the two
  * never-transitioned diagonals), batch reconciliation (alerts ==
  * candidates ∩ predicted-novel set, every alert outside pw), and the
  * stateless stream == batch contract. */
class LinkGateSpec extends SparkSpec {

  import spark.implicits._

  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def walk(user: Long, items: Seq[Long]) =
    items.zipWithIndex.map { case (it, i) =>
      (user * 1000L + i, user, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${i}%02d"),
        s"""{"k": $it}""")
    }

  /** Triangle {1,2,3} + hub 4 with satellites 5, 6 + bridge 3–4, one
    * co-transition per edge — pw = {12,13,23,34,45,46}. The satellites
    * NEVER co-transition, but walks visit them in the hub's company, so
    * their PPMI rows are parallel (cos² = 10⁴ exactly) and (5,6) is the
    * one predicted-novel pair — the classic shared-hub link prediction.
    * (A symmetric bipartite pattern does NOT work here: its co-visit
    * census matches independence, every pmi is negative and the matrix
    * is empty.) last: u1=2, u2=3, u3=3, u4=5, u6=6, u7=4. */
  private def staticEv =
    (walk(1, Seq(1, 2)) ++ walk(2, Seq(2, 3)) ++ walk(3, Seq(1, 3)) ++
      walk(4, Seq(4, 5)) ++ walk(6, Seq(4, 6)) ++ walk(7, Seq(3, 4)))
      .toDF("event_id", "user_id", "ts", "props")

  /** The frozen predicted-novel pair set, computed batch-side through
    * the same public pipeline the gate freezes. */
  private def predSet: Map[(Long, Long), Long] = {
    val pw = Triangles.weightedItemGraphOf(staticEv, unix_micros(col("ts")), 1L)
    val nn = PmiNeighbors.neighborsOf(
      WalkPmi.pmiOf(WalkPairs.walkPairsOf(Backbone.backboneOf(pw))))
    val pwSet = pw.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    nn.collect()
      .map(r => (math.min(r.getAs[Long]("node"), r.getAs[Long]("nbr")),
        math.max(r.getAs[Long]("node"), r.getAs[Long]("nbr"))) ->
        r.getAs[Long]("cos2_bp"))
      .filterNot { case (p, _) => pwSet(p) }
      .toMap
  }

  private def gate(arrivals: (Long, Long, Long)*) =
    PmiNeighbors.linkGateStreamStatic(
        arrivals.toSeq.map { case (e, u, k) => (e, u, s"""{"k": $k}""") }
          .toDF("event_id", "user_id", "props"),
        staticEv, unix_micros(col("ts")), minW = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  test("shared-hub fixture: the satellites are the one predicted-novel pair, and only they alert") {
    val pred = predSet
    assert(pred == Map((5L, 6L) -> 10000L),
      s"the satellites' parallel rows must be the sole prediction, at exact cos2 10^4: $pred")
    val out = gate(
      (9001L, 4L, 6L), // u4 last=5, arriving 6 → (5,6) predicted-novel → alert
      (9002L, 4L, 4L), // (4,5): co-transitioned in the corpus → silent
      (9003L, 4L, 5L), // self-transition → silent
      (9004L, 1L, 3L), // (2,3): a known edge → silent
      (9005L, 99L, 6L)) // unknown user → silent
    assert(out == Set((4L, 9001L, 5L, 6L, 10000L)), s"got $out")
  }

  test("batch reconciliation: alerts == candidate pairs ∩ predicted-novel, never inside pw") {
    val pred = predSet
    val pw = Triangles.weightedItemGraphOf(staticEv, unix_micros(col("ts")), 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // arrivals sweeping every item for every known user
    val users = Seq(1L, 2L, 3L, 4L, 6L, 7L)
    val arrivals = for (u <- users; k <- 1L to 6L)
      yield (u * 100L + k, u, k)
    val out = gate(arrivals: _*)
    out.foreach { case (_, _, a, b, s) =>
      assert(pred.get((a, b)).contains(s), s"alert ($a,$b,$s) not in pred")
      assert(!pw((a, b)), s"alert ($a,$b) is a known co-transition")
    }
    // and completeness: every candidate that hits pred alerts
    val last = Map(1L -> 2L, 2L -> 3L, 3L -> 3L, 4L -> 5L, 6L -> 6L, 7L -> 4L)
    val expected = arrivals.flatMap { case (e, u, k) =>
      val l = last(u)
      if (l == k) None
      else {
        val p = (math.min(l, k), math.max(l, k))
        pred.get(p).map(s => (u, e, p._1, p._2, s))
      }
    }.toSet
    assert(out == expected)
    assert(out.nonEmpty)
  }

  test("streaming append: stateless, stream == batch") {
    val users = Seq(1L, 2L, 3L, 4L, 6L, 7L)
    val arrivals = (0 until 36).map(i =>
      (8000L + i, users(i % 6), s"""{"k": ${(i / 6) + 1}}"""))
    val stream = MemoryStream[(Long, Long, String)]
    val sq = PmiNeighbors.linkGateStreamStatic(
        stream.toDF().toDF("event_id", "user_id", "props"),
        staticEv, unix_micros(col("ts")), minW = 1L)
      .writeStream.format("memory").queryName("link_gate")
      .outputMode("append").start()
    try {
      val (a, b) = arrivals.splitAt(16)
      stream.addData(a); sq.processAllAvailable()
      stream.addData(b); sq.processAllAvailable()
      assert(sq.lastProgress.stateOperators.isEmpty,
        s"link gate must be stateless: ${sq.lastProgress.stateOperators.mkString}")
    } finally sq.stop()
    val streamed = spark.table("link_gate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val batch = PmiNeighbors.linkGateStreamStatic(
        arrivals.toDF("event_id", "user_id", "props"),
        staticEv, unix_micros(col("ts")), minW = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(streamed == batch, "stream != batch")
    assert(streamed.nonEmpty, "the sweep must realize at least one predicted pair")
  }
}
