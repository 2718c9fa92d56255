package graft.stateful

import graft.model.{EscalationEvent, IncidentAlert, P95Window}
import graft.stateful.BreachDetector.BreachState
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Spark 4.x-native `transformWithState` implementations of ST1/ST2 (the
  * SURVEY §2.5 preferred mechanism; `flatMapGroupsWithState` versions in
  * [[BreachDetector]]/[[Escalator]] remain as the fallback). Streaming use
  * requires the RocksDB state store provider:
  *
  *   spark.sql.streaming.stateStore.providerClass =
  *     org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider
  *
  * — which is also the right provider at scale (incremental checkpoints,
  * state larger than heap). Both processors share the pure transition
  * functions with the fallback path, so semantics are pinned by one set of
  * unit tests.
  */
object Processors {

  /** ST1 via StatefulProcessor + ValueState (no TTL — breach sequences are
    * event-time logic; latency_slo_monitor.py keeps no TTL either). */
  class BreachProcessor(threshold: Double, limit: Int)
      extends StatefulProcessor[String, P95Window, IncidentAlert] {
    @transient private var state: ValueState[BreachState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[BreachState](
        "breach", Encoders.product[BreachState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[P95Window],
                                 timers: TimerValues): Iterator[IncidentAlert] = {
      var st = Option(state.get()).getOrElse(BreachState(0, Long.MinValue))
      val out = List.newBuilder[IncidentAlert]
      rows.toSeq.sortBy(_.window_start).foreach { w =>
        val (st2, alert) = BreachDetector.step(st, w, threshold, limit)
        st = st2
        alert.foreach(out += _)
      }
      state.update(st)
      out.result().iterator
    }
  }

  def detectBreaches(p95s: Dataset[P95Window],
                     threshold: Double = BreachDetector.P95ThresholdMs,
                     limit: Int = BreachDetector.BreachLimit): Dataset[IncidentAlert] = {
    import p95s.sparkSession.implicits._
    p95s.groupByKey(_.service)
      .transformWithState(new BreachProcessor(threshold, limit),
        TimeMode.None(), OutputMode.Update())
  }

  /** ST2 via StatefulProcessor + ValueState with NATIVE TTL — the exact
    * Flink semantics (incident_aggregator.py:27-33): 1 h time-to-live,
    * refreshed on every write (Spark TWS TTL restarts on update), lazy
    * cleanup. No processing-time timers involved, so unlike the
    * GroupStateTimeout fallback this variant doesn't starve
    * `processAllAvailable` in tests. */
  class EscalatorProcessor(limit: Int, ttl: java.time.Duration)
      extends StatefulProcessor[String, IncidentAlert, EscalationEvent] {
    @transient private var count: ValueState[Int] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val ttlConf = if (ttl == null) TTLConfig.NONE else TTLConfig(ttl)
      count = getHandle.getValueState[Int]("alert_count", Encoders.scalaInt, ttlConf)
    }

    override def handleInputRows(key: String, rows: Iterator[IncidentAlert],
                                 timers: TimerValues): Iterator[EscalationEvent] = {
      var c = Option(count.get()).map(_.asInstanceOf[Int]).getOrElse(0)
      val out = rows.toSeq.sortBy(a => (a.window_start, a.incident_id)).map { a =>
        val (c2, esc) = Escalator.step(c, limit)
        c = c2
        Escalator.tag(a, esc)
      }
      count.update(c)
      out.iterator
    }
  }

  def escalate(alerts: Dataset[IncidentAlert],
               limit: Int = Escalator.EscalationLimit,
               ttl: java.time.Duration = java.time.Duration.ofHours(1)): Dataset[EscalationEvent] = {
    import alerts.sparkSession.implicits._
    alerts.groupByKey(_.service)
      .transformWithState(new EscalatorProcessor(limit, ttl),
        TimeMode.ProcessingTime(), OutputMode.Update())
  }
}
