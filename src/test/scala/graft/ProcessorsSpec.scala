package graft

import graft.model.{IncidentAlert, P95Window}
import graft.stateful.Processors
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

/** transformWithState (Spark 4.x StatefulProcessor) variants of ST1/ST2,
  * driven as real streaming queries over the RocksDB state store. */
class ProcessorsSpec extends SparkSpec {

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

  val T0 = 1767680040L

  test("TWS breach processor: state machine across micro-batches on RocksDB") {
    import spark.implicits._
    withRocksDB {
      val w = (i: Int, p95: Double) => P95Window("auth-service", T0 + i * 60L, T0 + (i + 1) * 60L, p95)
      val stream = MemoryStream[P95Window]
      val sq = Processors.detectBreaches(stream.toDS())
        .writeStream.format("memory").queryName("tws_breaches").outputMode("update").start()
      try {
        stream.addData(w(0, 150), w(1, 160))
        sq.processAllAvailable()
        assert(spark.table("tws_breaches").count() == 0)
        stream.addData(w(2, 170)) // 3rd consecutive -> emit + clear
        sq.processAllAvailable()
        assert(spark.table("tws_breaches").count() == 1)
        stream.addData(w(3, 40), w(4, 150), w(5, 155), w(6, 160)) // reset then 3 more
        sq.processAllAvailable()
        assert(spark.table("tws_breaches").count() == 2)
      } finally sq.stop()
      val a = spark.table("tws_breaches").as[IncidentAlert].collect().head
      assert(a.`type` == "LATENCY_SLO_BREACH" && a.breach_count.contains(3))
    }
  }

  /** TimeMode.ProcessingTime keeps scheduling batches (TTL evaluation), so
    * `processAllAvailable` never settles — poll the sink instead. */
  private def awaitRows(table: String, n: Long, timeoutMs: Long = 60000): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (spark.table(table).count() < n && System.currentTimeMillis() < deadline)
      Thread.sleep(200)
    assert(spark.table(table).count() >= n, s"$table did not reach $n rows in ${timeoutMs}ms")
  }

  test("TWS escalator with native TTL: counts, tags every 3rd, forwards all") {
    import spark.implicits._
    withRocksDB {
      val mk = (s: String, i: Int) => IncidentAlert(s"inc-$s-$i", s, "ERROR_RATE_SPIKE", "HIGH",
        None, None, T0 + i * 10L, T0 + i * 10L + 20, Some(0.05), Some(200L))
      val stream = MemoryStream[IncidentAlert]
      val sq = Processors.escalate(stream.toDS())
        .writeStream.format("memory").queryName("tws_esc").outputMode("update").start()
      try {
        stream.addData(mk("a", 0), mk("a", 1))
        awaitRows("tws_esc", 2)
        stream.addData(mk("a", 2), mk("b", 0)) // a: 3rd -> tag
        awaitRows("tws_esc", 4)
      } finally sq.stop()
      val out = spark.table("tws_esc")
      assert(out.count() == 4, "all alerts forwarded")
      val esc = out.filter(col("severity") === "ESCALATED")
      assert(esc.select("incident_id").as[String].collect().toSeq == Seq("inc-a-2"))
    }
  }

  test("TWS escalator TTL expiry: idle beyond TTL resets the counter (incident_aggregator.py:27-33)") {
    import spark.implicits._
    withRocksDB {
      val mk = (i: Int) => IncidentAlert(s"inc-t-$i", "ttl-svc", "ERROR_RATE_SPIKE", "HIGH",
        None, None, T0 + i * 10L, T0 + i * 10L + 20, Some(0.05), Some(200L))
      val stream = MemoryStream[IncidentAlert]
      val sq = Processors.escalate(stream.toDS(), ttl = java.time.Duration.ofSeconds(2))
        .writeStream.format("memory").queryName("tws_ttl").outputMode("update").start()
      try {
        stream.addData(mk(0), mk(1)) // count -> 2
        awaitRows("tws_ttl", 2)
        Thread.sleep(3500)           // exceed the 2 s TTL: state must expire
        stream.addData(mk(2), mk(3), mk(4)) // fresh counter: tag fires on the 3rd of THESE
        awaitRows("tws_ttl", 5)
      } finally sq.stop()
      import org.apache.spark.sql.functions.col
      val esc = spark.table("tws_ttl").filter(col("severity") === "ESCALATED")
        .select("incident_id").as[String].collect().toSeq
      // without expiry the 3rd overall (inc-t-2) would be tagged; with
      // expiry the counter restarted, so the tag lands on inc-t-4
      assert(esc == Seq("inc-t-4"), s"got $esc")
    }
  }

  test("TWS and fMGWS breach detectors agree on a batch-replayed sequence") {
    import spark.implicits._
    // batch mode: transformWithState also runs on batch Datasets
    val seq = Seq(150.0, 160.0, 170.0, 40.0, 150.0, 150.0, 150.0, 150.0, 150.0, 150.0)
      .zipWithIndex.map { case (p, i) => P95Window("s", T0 + i * 60L, T0 + (i + 1) * 60L, p) }
    val viaFmgws = graft.stateful.BreachDetector.detect(seq.toDS()).collect().sortBy(_.window_start)
    val viaTws = Processors.detectBreaches(seq.toDS()).collect().sortBy(_.window_start)
    assert(viaFmgws.toSeq == viaTws.toSeq)
    assert(viaFmgws.length == 3) // breaches at windows 2, 6, 9
  }
}
