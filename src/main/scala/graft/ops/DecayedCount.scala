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
  * Engine-exactness: NO libm anywhere. The exponent quantizes to integer
  * MILLI-half-lives (e3 = age·1000 div hl), then the weight is a shared
  * 1000-entry exp2 table lookup for the fractional part and an integer
  * right-shift (floor-div by 2^k) for the whole part:
  * w_micro = TAB[e3 mod 1000] div 2^(e3 div 1000). The table is generated
  * ONCE in this JVM and embedded as the SAME literal array in both the
  * Spark expression and the DuckDB oracle SQL, so the engines cannot
  * disagree even if Math.pow differs by an ulp across JVMs/libms (the
  * hazard the previous per-event-pow formulation documented; ADVICE r7).
  * Declared resolution: 1/1000 half-life exponent grid, floor semantics;
  * weights at exact half-life multiples are exact halvings (spec-pinned).
  * Sums are order-free int64; shares are integer basis points.
  *
  * Shape: one scan → 1-row max-timestamp census (broadcast back) → pure
  * map-side weights → one |services|-bounded aggregation. No window, no
  * join beyond the 1-row broadcast.
  */
object DecayedCount {

  private val HalfLifeUs = 3600000000L // 1 hour

  /** TAB[f] = round(2^(−f/1000)·1e6) — f in milli-half-lives. Generated
    * once here; BOTH engines read this exact array as a literal. */
  private[graft] val Exp2MicroTab: Array[Long] =
    (0 until 1000).map(f => math.round(math.pow(2.0, -f / 1000.0) * 1e6)).toArray

  // weights vanish once 2^k > 1e6 (k ≥ 20); e3 ≥ 20000 → 0
  private val ZeroE3 = 20000L

  private def sparkTab: String =
    Exp2MicroTab.map(v => s"${v}L").mkString("array(", ",", ")")
  private def duckTab: String =
    Exp2MicroTab.mkString("[", ",", "]")

  /** (service, n_events, decayed_micro, decayed_share_bp) — decayed_micro
    * = Σ TAB[e3%1000] div 2^(e3/1000) per service; share over the total. */
  def decayedCountsOf(events: DataFrame, tUs: org.apache.spark.sql.Column,
                      halfLifeUs: Long = HalfLifeUs): DataFrame = {
    val base = events.select(col("event_type").as("service"), tUs.as("t"))
    val tMax = base.agg(max(col("t")).as("tmax"))
    // |services|-bounded result, persisted so the total's second read
    // cannot re-scan the corpus (the q65/q72 thin-frame idiom)
    val per = Tables.swapPersist("q88_per", base.crossJoin(broadcast(tMax))
      .withColumn("e3", expr(s"(CAST(tmax - t AS BIGINT) * 1000) div $halfLifeUs"))
      .select(col("service"), expr(
        s"""CASE WHEN e3 >= $ZeroE3 THEN CAST(0 AS BIGINT)
           |ELSE element_at($sparkTab, CAST(e3 % 1000 + 1 AS INT))
           |     div shiftleft(CAST(1 AS BIGINT), CAST(e3 div 1000 AS INT)) END""".stripMargin)
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

  private def q88Sql =
    s"""WITH e AS (SELECT event_type AS service, epoch_us(ts) AS t FROM events),
       |m AS (SELECT max(t) AS tmax FROM e),
       |x AS (SELECT service, (CAST(m.tmax - t AS BIGINT) * 1000) // ${HalfLifeUs} AS e3
       |      FROM e CROSS JOIN m),
       |w AS (SELECT service,
       |             CASE WHEN e3 >= $ZeroE3 THEN CAST(0 AS BIGINT)
       |                  ELSE CAST(($duckTab)[CAST(e3 % 1000 + 1 AS INT)] AS BIGINT)
       |                       // (CAST(1 AS BIGINT) << CAST(e3 // 1000 AS INT)) END AS wmicro
       |      FROM x),
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
