package graft

import graft.model.{EscalationEvent, IncidentAlert, P95Window}
import graft.stateful.{BreachDetector, Escalator, Processors}
import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming crash-recovery (round-11 verdict #2): the reference's whole
  * durability story is Flink's 30 s checkpointing (error_rate_detector.py:116,
  * incident_aggregator.py:72) — state survives a job kill and the restarted
  * job continues as if uninterrupted. The Spark-native equivalent is the
  * `checkpointLocation` offset+state log. Each test here stops a running
  * stateful query at a point where the ONLY copy of progress is the
  * checkpointed state (a half-built breach run / escalation count), restarts
  * from the same checkpointLocation, feeds the rest of the stream, and pins
  * the combined output == the uninterrupted run. The cut points are chosen
  * so state LOSS would produce a DIFFERENT answer (fewer alerts, a different
  * deterministic incident id, an untagged escalation) — a restart that
  * silently reset state cannot pass. Covers both mechanisms: fMGWS
  * (HDFS-backed state store) and transformWithState on RocksDB.
  *
  * Sink: `foreachBatch` into a driver-side buffer — the memory sink REFUSES
  * checkpoint recovery (recoverQueryFromCheckpointUnsupportedError), and
  * foreachBatch is the repo's production sink surface anyway (S5). */
class RecoverySpec extends SparkSpec {

  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def withRocksDB[A](f: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def ckptDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_ckpt_$tag").toString

  /** foreachBatch collector: rows land in a thread-safe driver buffer. */
  private class Collector[T] {
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[T]()
    def sinkOf(ds: Dataset[T], ckpt: String): StreamingQuery =
      ds.writeStream
        .foreachBatch((batch: Dataset[T], _: Long) => batch.collect().foreach(buf.add))
        .outputMode("update").option("checkpointLocation", ckpt).start()
    def size: Int = buf.size()
    def rows: Seq[T] = { import scala.jdk.CollectionConverters._; buf.asScala.toSeq }
    def await(n: Int, timeoutMs: Long = 60000): Unit = {
      val deadline = System.currentTimeMillis() + timeoutMs
      while (size < n && System.currentTimeMillis() < deadline) Thread.sleep(200)
      assert(size >= n, s"collector did not reach $n rows in ${timeoutMs}ms (got $size)")
    }
  }

  val T0 = 1767680040L
  private def w(i: Int, p95: Double) =
    P95Window("auth-service", T0 + i * 60L, T0 + (i + 1) * 60L, p95)
  private def alert(s: String, i: Int) =
    IncidentAlert(s"inc-$s-$i", s, "ERROR_RATE_SPIKE", "HIGH",
      None, None, T0 + i * 10L, T0 + i * 10L + 20, Some(0.05), Some(200L))

  /** 7-window ST1 scenario. Cut after the first 2 breaches: the count=2
    * state exists only in the checkpoint at the stop. Uninterrupted truth
    * (batch replay — stream==batch pinned in StreamingSpec/ProcessorsSpec):
    * alerts at windows 2 and 6. If the restart lost state, window 2 would
    * count as the FIRST breach, window 3 resets, and the only alert would
    * fire at window 6 — one alert instead of two. */
  private val st1Head = Seq(w(0, 150), w(1, 160))
  private val st1Tail = Seq(w(2, 170), w(3, 40), w(4, 150), w(5, 155), w(6, 160))

  private def runSt1Restart(
      tag: String,
      detect: Dataset[P95Window] => Dataset[IncidentAlert]): Unit = {
    import spark.implicits._
    val ckpt = ckptDir(tag)
    val stream = MemoryStream[P95Window]
    val col = new Collector[IncidentAlert]

    val q1 = col.sinkOf(detect(stream.toDS()), ckpt)
    try { stream.addData(st1Head: _*); q1.processAllAvailable() } finally q1.stop()
    assert(col.size == 0, "no alert before the crash point")

    stream.addData(st1Tail: _*)
    val q2 = col.sinkOf(detect(stream.toDS()), ckpt)
    try q2.processAllAvailable() finally q2.stop()

    val got = col.rows.sortBy(_.window_start)
    val uninterrupted = detect((st1Head ++ st1Tail).toDS())
      .collect().toSeq.sortBy(_.window_start)
    assert(uninterrupted.length == 2, s"scenario truth: $uninterrupted")
    assert(got == uninterrupted,
      s"restart output diverged from the uninterrupted run: $got vs $uninterrupted")
    // the first alert's breach run straddles the crash: it can only fire
    // post-restart if count=2 was recovered from the checkpoint
    assert(got.head.window_start == T0 + 2 * 60L, "straddling alert fired after restart")
  }

  test("ST1 fMGWS: restart from checkpointLocation == uninterrupted run") {
    runSt1Restart("rec_st1_fmgws", ds => BreachDetector.detect(ds))
  }

  test("ST1 transformWithState/RocksDB: restart from checkpointLocation == uninterrupted run") {
    withRocksDB {
      runSt1Restart("rec_st1_tws", ds => Processors.detectBreaches(ds))
    }
  }

  /** ST2 scenario: 2 alerts, crash, 1 more. The 3rd must come back tagged
    * ESCALATED — possible only if count=2 survived the restart (a reset
    * counter would see it as the 1st). */
  test("ST2 fMGWS: escalation count survives restart (3rd alert tagged)") {
    import spark.implicits._
    val ckpt = ckptDir("rec_st2_fmgws")
    val stream = MemoryStream[IncidentAlert]
    val col = new Collector[EscalationEvent]

    val q1 = col.sinkOf(Escalator.escalate(stream.toDS(), ttlMs = None), ckpt)
    try { stream.addData(alert("a", 0), alert("a", 1)); q1.processAllAvailable() } finally q1.stop()
    stream.addData(alert("a", 2))
    val q2 = col.sinkOf(Escalator.escalate(stream.toDS(), ttlMs = None), ckpt)
    try q2.processAllAvailable() finally q2.stop()

    val got = col.rows.sortBy(_.window_start)
    val uninterrupted = Escalator.escalate(
      Seq(alert("a", 0), alert("a", 1), alert("a", 2)).toDS(), ttlMs = None)
      .collect().toSeq.sortBy(_.window_start)
    assert(got == uninterrupted)
    assert(got.count(_.severity == "ESCALATED") == 1 &&
      got.last.escalation_reason.contains("MULTIPLE_INCIDENTS"),
      s"3rd alert must be escalated from recovered count: $got")
  }

  test("ST2 TWS/RocksDB: TTL keeps running WHILE the query is down — state expired at restart") {
    import spark.implicits._
    withRocksDB {
      val ckpt = ckptDir("rec_ttl")
      val stream = MemoryStream[IncidentAlert]
      val col = new Collector[EscalationEvent]
      def start(): StreamingQuery =
        col.sinkOf(Processors.escalate(stream.toDS(),
          ttl = java.time.Duration.ofSeconds(2)), ckpt)

      val q1 = start()
      try { stream.addData(alert("a", 0), alert("a", 1)); col.await(2) } finally q1.stop()
      // the 2 s TTL elapses while the query is DOWN: TWS TTL timestamps
      // are absolute processing time (write time + duration), so the
      // restarted query must see the counter EXPIRED — Flink's
      // full-snapshot TTL cleanup behaves the same across a restore
      Thread.sleep(3500)
      stream.addData(alert("a", 2), alert("a", 3), alert("a", 4))
      val q2 = start()
      try col.await(5) finally q2.stop()

      val esc = col.rows.filter(_.severity == "ESCALATED").map(_.incident_id)
      // expired counter restarted at 0: the tag lands on the 3rd POST-GAP
      // alert (inc-a-4), not the 3rd overall (inc-a-2, which a surviving
      // count=2 would have tagged)
      assert(esc == Seq("inc-a-4"),
        s"TTL must expire across the downtime (counter reset): got $esc")
    }
  }

  test("ST2 transformWithState/RocksDB: escalation count survives restart") {
    import spark.implicits._
    withRocksDB {
      val ckpt = ckptDir("rec_st2_tws")
      val stream = MemoryStream[IncidentAlert]
      val col = new Collector[EscalationEvent]

      // TimeMode.ProcessingTime: processAllAvailable never settles (TTL
      // batches keep scheduling) — poll the collector instead
      val q1 = col.sinkOf(Processors.escalate(stream.toDS()), ckpt)
      try { stream.addData(alert("a", 0), alert("a", 1)); col.await(2) } finally q1.stop()
      stream.addData(alert("a", 2))
      val q2 = col.sinkOf(Processors.escalate(stream.toDS()), ckpt)
      try col.await(3) finally q2.stop()

      val got = col.rows.sortBy(_.window_start)
      assert(got.length == 3, s"all alerts forwarded across the restart: $got")
      assert(got.count(_.severity == "ESCALATED") == 1 &&
        got.last.severity == "ESCALATED" &&
        got.last.escalation_reason.contains("MULTIPLE_INCIDENTS"),
        s"3rd alert must be escalated from recovered RocksDB count: $got")
    }
  }
}
