package graft.ops

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-decayed activity counts (q88) — per service, the
  * exponentially-decayed event count Σ 2^(−age/half_life) anchored at the
  * corpus' newest event: the "what is hot NOW" ranking that a plain
  * count-over-window cannot express (a burst an hour ago and a steady
  * trickle all day can have equal window counts but very different
  * decayed mass). The batch face of streaming decayed counters; the
  * half-life is the single knob trading recency against stability.
  *
  * Engine-exactness: each event's decay weight quantizes to integer
  * MICRO-units (round(2^(−age/hl)·1e6)) before summation — per-event
  * pow() runs on identical doubles (integer age micros / double half-life)
  * so both engines agree modulo the accepted last-ulp rounding boundary
  * the microbit family shares; sums are then order-free int64. Shares are
  * integer basis points.
  *
  * Shape: one scan → 1-row max-timestamp census (broadcast back) → pure
  * map-side weights → one |services|-bounded aggregation. No window, no
  * join beyond the 1-row broadcast.
  */
object DecayedCount {

  private val HalfLifeUs = 3600000000L // 1 hour

  /** (service, n_events, decayed_micro, decayed_share_bp) — decayed_micro
    * = Σ round(2^(−age/hl)·1e6) per service; share over the corpus total. */
  def decayedCountsOf(events: DataFrame, tUs: org.apache.spark.sql.Column,
                      halfLifeUs: Long = HalfLifeUs): DataFrame = {
    val base = events.select(col("event_type").as("service"), tUs.as("t"))
    val tMax = base.agg(max(col("t")).as("tmax"))
    // |services|-bounded result, persisted so the total's second read
    // cannot re-scan the corpus (the q65/q72 thin-frame idiom)
    val per = Tables.swapPersist("q88_per", base.crossJoin(broadcast(tMax))
      .select(col("service"), expr(
        s"CAST(round(pow(2e0, -(CAST(tmax - t AS DOUBLE) / ${halfLifeUs}e0)) * 1e6) AS BIGINT)")
        .as("wmicro"))
      .groupBy(col("service"))
      .agg(count(lit(1)).as("n_events"), sum(col("wmicro")).as("decayed_micro")))
    val tot = per.agg(coalesce(sum(col("decayed_micro")), lit(0L)).as("dtot"))
    per.crossJoin(broadcast(tot))
      .selectExpr("service", "n_events", "decayed_micro",
        "CASE WHEN dtot = 0 THEN 0 ELSE (decayed_micro * 10000) div dtot END AS decayed_share_bp")
  }

  // ---------------------------------------------------------------- q88
  def q88(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.table(spark, sfDir, "events")
    decayedCountsOf(ev, Tables.tsMicros(ev))
  }

  private val q88Sql =
    s"""WITH e AS (SELECT event_type AS service, epoch_us(ts) AS t FROM events),
       |m AS (SELECT max(t) AS tmax FROM e),
       |w AS (SELECT service,
       |             CAST(round(pow(2e0, -(CAST(m.tmax - t AS DOUBLE) / ${HalfLifeUs}e0)) * 1e6) AS BIGINT) AS wmicro
       |      FROM e CROSS JOIN m),
       |p AS (SELECT service, CAST(count(*) AS BIGINT) AS n_events,
       |             CAST(sum(wmicro) AS BIGINT) AS decayed_micro
       |      FROM w GROUP BY service),
       |t AS (SELECT CAST(coalesce(sum(decayed_micro), 0) AS BIGINT) AS dtot FROM p)
       |SELECT service, n_events, decayed_micro,
       |       CASE WHEN dtot = 0 THEN 0
       |            ELSE (decayed_micro * 10000) // dtot END AS decayed_share_bp
       |FROM p CROSS JOIN t""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q88_decayed_counts", q88, Some(q88Sql))
  )
}
