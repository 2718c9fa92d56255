package graft.stateful

import graft.model.{EscalationEvent, IncidentAlert}
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ST2 — count-to-N escalation with TTL
  * (flink/incident_aggregator.py:22-66): every alert increments a per-service
  * counter; at `limit` the alert is tagged severity=ESCALATED /
  * escalation_reason=MULTIPLE_INCIDENTS and the counter clears. ALL alerts
  * are forwarded, tagged or not (the unconditional yield at :64-66 — the
  * README claims otherwise; code wins, SURVEY §8.2).
  *
  * TTL parity (incident_aggregator.py:27-33): Flink's 1 h OnCreateAndWrite
  * TTL ≡ a processing-time timeout refreshed on every write — idle services
  * lose their counter after `ttlMs`, matching full-snapshot cleanup.
  *
  * Determinism: a group's micro-batch slice is sorted by
  * (window_start, incident_id) before counting, so replays tag the same
  * alerts (the reference's arrival-order counting is nondeterministic under
  * Kafka repartitioning; SURVEY §7.5).
  */
object Escalator {

  val EscalationLimit = 3            // incident_aggregator.py:55
  val TtlMs: Long = 3600 * 1000L     // incident_aggregator.py:29

  /** Pure transition: (count before) → (count after, escalated?). */
  def step(count: Int, limit: Int): (Int, Boolean) = {
    val c = count + 1
    if (c >= limit) (0, true) else (c, false)
  }

  def tag(a: IncidentAlert, escalated: Boolean): EscalationEvent =
    if (escalated)
      EscalationEvent(a.incident_id, a.service, a.`type`, "ESCALATED",
        a.p95_latency, a.breach_count, a.window_start, a.window_end,
        a.error_rate, a.total_logs, Some("MULTIPLE_INCIDENTS"))
    else
      EscalationEvent(a.incident_id, a.service, a.`type`, a.severity,
        a.p95_latency, a.breach_count, a.window_start, a.window_end,
        a.error_rate, a.total_logs, None)

  /** `ttlMs = None` disables the processing-time TTL (deterministic tests;
    * also the right call when the caller replays bounded history where
    * wall-clock TTL is meaningless). Production wiring uses the default 1 h.
    *
    * NB with a processing-time timeout the micro-batch engine keeps
    * scheduling empty timeout-check batches, so `processAllAvailable` on a
    * test query never settles — the reason the TTL path is covered by the
    * pure [[step]]/batch tests instead. */
  def escalate(alerts: Dataset[IncidentAlert],
               limit: Int = EscalationLimit,
               ttlMs: Option[Long] = Some(TtlMs)): Dataset[EscalationEvent] = {
    import alerts.sparkSession.implicits._
    val timeoutConf =
      if (ttlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    alerts.groupByKey(_.service)
      .flatMapGroupsWithState(OutputMode.Update, timeoutConf) {
        (_: String, rows: Iterator[IncidentAlert], state: GroupState[Int]) =>
          if (state.hasTimedOut) { // TTL expiry == Flink state cleanup
            state.remove()
            Iterator.empty
          } else {
            var count = state.getOption.getOrElse(0)
            val out = rows.toSeq.sortBy(a => (a.window_start, a.incident_id)).map { a =>
              val (c2, esc) = step(count, limit)
              count = c2
              tag(a, esc)
            }
            state.update(count)
            // refresh TTL on every write (OnCreateAndWrite); no-op in batch
            ttlMs.foreach { t =>
              try state.setTimeoutDuration(t) catch { case _: UnsupportedOperationException => () }
            }
            out.iterator
          }
      }
  }
}
