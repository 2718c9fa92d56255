package graft.ops

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Support-backbone extraction over the weighted item co-transition graph
  * — the shared substrate for the round-11 graph-topology family
  * (q146 k-core, q147 link prediction, q148 harmonic centrality, q149
  * label-propagation communities).
  *
  * Why a backbone: the raw support-filtered graph densifies with data
  * volume — at sf0.1 the fixture item graph is already COMPLETE (every
  * pair co-transitions ≥ 3 times), and at 100 TB any absolute support
  * floor saturates the same way, collapsing every topological question
  * (cores, communities, distances) to a trivial answer on K_n. The
  * standard fix for co-occurrence graphs is a RELATIVE strength filter:
  * keep the top decile of edges by support. That backbone stays
  * structure-bearing at any scale because its size tracks the edge
  * census, not the corpus.
  *
  * Exact semantics (both engines, bit-identical): τ = the
  * ⌈m·topBp/10⁴⌉-th largest support counting duplicates — equivalently
  * the largest w whose ≥-w cumulative edge count reaches that target
  * (the two forms agree because a min over the equal-valued tail of a
  * ranked prefix cannot depend on tie order); keep every edge with
  * w ≥ τ, so boundary ties all survive (deterministic, no arbitrary
  * cut inside a tie class).
  *
  * Scale shape (v2): τ comes off the support-weight HISTOGRAM — one
  * map-side-combining exchange on w into |distinct supports| rows
  * (bounded by the support RANGE, typically hundreds), then the
  * cumulative window runs over that histogram, never over edges. The
  * v1 shape ranked every edge through a single-partition row_number —
  * census-bounded but still the family's one sort that grew with
  * vocab²; the histogram form removes it. τ broadcasts back as a 1-row
  * census. Callers persist the weighted census once (it feeds the
  * histogram AND the final filter). */
object Backbone {

  /** The τ census shared by [[backboneOf]] and [[backboneCensusOf]]:
    * 1 row (tau). v2 shape — τ comes off the support-weight HISTOGRAM,
    * not a per-edge row_number: the target-th largest support counting
    * duplicates equals the largest w whose ≥-w cumulative edge count
    * reaches the target, so the only ordered window runs over
    * |distinct supports| rows (bounded by the support RANGE, typically
    * hundreds) instead of the vocab²-bounded edge census — the v1
    * single-partition edge sort was the one documented scale ceiling in
    * this family, and this removes it. The histogram itself aggregates
    * map-side (one exchange on w). */
  private def tauOf(pw: DataFrame, topBp: Long): DataFrame = {
    require(topBp >= 1L && topBp <= 10000L, s"topBp out of [1,10000]: $topBp")
    pw.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(Window.orderBy(col("w").desc)))
      .withColumn("m", sum(col("c")).over(Window.partitionBy()))
      .filter(expr(s"cum >= (m * ${topBp}L + 9999L) div 10000L"))
      .agg(max(col("w")).as("tau"))
  }

  /** Top-`topBp`/10000 of edges by support weight from a weighted
    * canonical edge census (a, b, w); ties at the threshold all kept. */
  def backboneOf(pw: DataFrame, topBp: Long = 1000L): DataFrame =
    pw.crossJoin(broadcast(tauOf(pw, topBp)))
      .filter(col("w") >= col("tau"))
      .select(col("a"), col("b"))

  /** [[backboneOf]] keeping the support weight — q163's spectral-delta
    * substrate PMI-weights the surviving edges (the raw census saturates
    * to near-K_n with volume, where every PMI is ≤ 0 — measured at
    * sf0.1 — so the relative cut is what keeps the census
    * signal-bearing for the spectral stack). */
  def backboneWeightedOf(pw: DataFrame, topBp: Long = 1000L): DataFrame =
    pw.crossJoin(broadcast(tauOf(pw, topBp)))
      .filter(col("w") >= col("tau"))
      .select(col("a"), col("b"), col("w"))

  /** 1-row census of what the backbone cut keeps (q150) — the tuning
    * view a curator reads BEFORE trusting q146–q149's topology: how many
    * edges survive the top-decile cut (kept_share_bp — boundary ties can
    * push it past topBp, that's the determinism trade made explicit) and
    * how much of the total co-transition SUPPORT mass they carry
    * (mass_share_bp — on a heavy-tailed support distribution the top
    * decile of edges carries far more than 10% of the mass; a
    * mass_share_bp near kept_share_bp means the support is flat and the
    * relative cut is arbitrary, the signal to re-tune topBp). All
    * integer bp, zero-guarded (engines disagree on x/0).
    *
    * Scale shape: the same two census-grain passes as [[backboneOf]]
    * (the support-histogram τ derivation + the 1-row τ broadcast)
    * folded into ONE output row — the
    * corpus never moves; the only BNLJ is the 1-row τ broadcast. */
  def backboneCensusOf(pw: DataFrame, topBp: Long = 1000L): DataFrame = {
    pw.crossJoin(broadcast(tauOf(pw, topBp)))
      .agg(
        count(lit(1)).as("m_total"),
        coalesce(sum(when(col("w") >= col("tau"), lit(1L)).otherwise(lit(0L))), lit(0L)).as("m_kept"),
        min(col("tau")).as("tau"),
        coalesce(sum(col("w")), lit(0L)).as("w_total"),
        coalesce(sum(when(col("w") >= col("tau"), col("w")).otherwise(lit(0L))), lit(0L)).as("w_kept"))
      .select(col("m_total"), col("m_kept"), col("tau"), col("w_total"), col("w_kept"),
        when(col("m_total") > 0L, expr("m_kept * 10000 div m_total")).as("kept_share_bp"),
        when(col("w_total") > 0L, expr("w_kept * 10000 div w_total")).as("mass_share_bp"))
  }

  // ---------------------------------------------------------------- q150
  def q150(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.table(spark, sfDir, "events")
    // r16: checkpoint, not keyed persist — truncates the corpus lineage
    // out of every census-grain downstream plan (SpectralEmbed.ppmiMatOf)
    val pw = Triangles.weightedItemGraphOf(ev, Tables.tsMicros(ev))
      .localCheckpoint()
    backboneCensusOf(pw)
  }

  /** Mirror of [[backboneCensusOf]] over [[backboneCtes]]'s pw/tau. */
  private def q150Sql(topBp: Long = 1000L): String =
    s"""${backboneCtes(topBp = topBp)}
       |SELECT CAST(count(*) AS BIGINT) AS m_total,
       |       CAST(coalesce(sum(CASE WHEN w >= tau.t THEN 1 ELSE 0 END), 0) AS BIGINT) AS m_kept,
       |       CAST(min(tau.t) AS BIGINT) AS tau,
       |       CAST(coalesce(sum(w), 0) AS BIGINT) AS w_total,
       |       CAST(coalesce(sum(CASE WHEN w >= tau.t THEN w ELSE 0 END), 0) AS BIGINT) AS w_kept,
       |       CASE WHEN count(*) > 0 THEN CAST(
       |         coalesce(sum(CASE WHEN w >= tau.t THEN 1 ELSE 0 END), 0) * 10000 // count(*)
       |         AS BIGINT) END AS kept_share_bp,
       |       CASE WHEN coalesce(sum(w), 0) > 0 THEN CAST(
       |         coalesce(sum(CASE WHEN w >= tau.t THEN w ELSE 0 END), 0) * 10000 // sum(w)
       |         AS BIGINT) END AS mass_share_bp
       |FROM pw, tau""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q150_backbone_census", q150, Some(q150Sql())))

  /** DuckDB mirror of [[graft.ops.Triangles.weightedItemGraphOf]] +
    * [[backboneOf]]: CTE stack ending in `strong(a, b)`. Shared by the
    * q146–q149 oracles. */
  private[ops] def backboneCtes(minW: Long = Triangles.DefaultMinW,
                                topBp: Long = 1000L): String =
    s"""WITH e0 AS (
       |  SELECT user_id, event_id,
       |         TRY_CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item,
       |         epoch_us(ts) AS t
       |  FROM events),
       |e AS (SELECT * FROM e0 WHERE item IS NOT NULL),
       |l AS (SELECT item,
       |             lag(item) OVER (PARTITION BY user_id ORDER BY t, event_id) AS src
       |      FROM e),
       |pw AS (SELECT least(src, item) AS a, greatest(src, item) AS b,
       |              CAST(count(*) AS BIGINT) AS w
       |       FROM l WHERE src IS NOT NULL AND src <> item
       |       GROUP BY 1, 2 HAVING count(*) >= $minW),
       |wh AS (SELECT w, count(*) AS c FROM pw GROUP BY w),
       |wc AS (SELECT w, sum(c) OVER (ORDER BY w DESC) AS cum,
       |              sum(c) OVER () AS m
       |       FROM wh),
       |tau AS (SELECT max(w) AS t FROM wc WHERE cum >= (m * $topBp + 9999) // 10000),
       |strong AS (SELECT a, b FROM pw, tau WHERE w >= tau.t)""".stripMargin
}
