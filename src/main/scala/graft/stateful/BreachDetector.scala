package graft.stateful

import graft.model.{IncidentAlert, P95Window}
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ST1 — consecutive-breach state machine
  * (flink/latency_slo_monitor.py:68-109): per service, a window result with
  * p95 > threshold increments a counter, a healthy window resets it, and the
  * `limit`-th consecutive breach emits a CRITICAL alert and clears.
  *
  * Order sensitivity (SURVEY §7.5): Spark hands a group's micro-batch slice
  * in arbitrary order, so the processor sorts by window_start and rejects
  * windows at-or-before the last processed one (`lastWindowStart` regression
  * guard) — making the operator deterministic under replays and re-delivery.
  *
  * Works identically on batch Datasets (one "micro-batch" holding all rows)
  * — the batch-replay equivalence property tested in StatefulSpec.
  */
object BreachDetector {

  val P95ThresholdMs = 100.0   // latency_slo_monitor.py:22
  val BreachLimit = 3          // latency_slo_monitor.py:23

  /** count = consecutive breaches so far; lastWindowStart = regression guard. */
  final case class BreachState(count: Int, lastWindowStart: Long)

  /** Pure per-window transition — unit-testable without Spark.
    * Returns (newState, emitted alert?). */
  def step(st: BreachState, w: P95Window, threshold: Double, limit: Int): (BreachState, Option[IncidentAlert]) =
    if (w.window_start <= st.lastWindowStart) (st, None) // replay/regression: drop
    else if (w.p95 > threshold) {
      val c = st.count + 1
      if (c >= limit)
        (BreachState(0, w.window_start), Some(mkAlert(w, c)))
      else (BreachState(c, w.window_start), None)
    } else (BreachState(0, w.window_start), None)

  private def mkAlert(w: P95Window, breaches: Int): IncidentAlert = {
    val idSrc = s"${w.service}|${w.window_start}|SLO"
    val id = "inc-" + java.security.MessageDigest.getInstance("SHA-256")
      .digest(idSrc.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    IncidentAlert(id, w.service, "LATENCY_SLO_BREACH", "CRITICAL",
      p95_latency = Some(math.round(w.p95).toInt), breach_count = Some(breaches),
      window_start = w.window_start, window_end = w.window_end,
      error_rate = None, total_logs = None)
  }

  def detect(p95s: Dataset[P95Window],
             threshold: Double = P95ThresholdMs,
             limit: Int = BreachLimit): Dataset[IncidentAlert] = {
    import p95s.sparkSession.implicits._
    p95s.groupByKey(_.service)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[P95Window], state: GroupState[BreachState]) =>
          var st = state.getOption.getOrElse(BreachState(0, Long.MinValue))
          val out = List.newBuilder[IncidentAlert]
          rows.toSeq.sortBy(_.window_start).foreach { w =>
            val (st2, alert) = step(st, w, threshold, limit)
            st = st2
            alert.foreach(out += _)
          }
          state.update(st)
          out.result().iterator
      }
  }
}
