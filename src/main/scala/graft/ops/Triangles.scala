package graft.ops

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Local clustering coefficient over the item co-transition graph (q144)
  * — the third graph centrality on q139's graph (rank = PageRank q139/q142,
  * cohesion = this): for every item, how CLIQUEY is its neighborhood?
  * High-LCC items sit inside tight browse loops (bundles, series,
  * substitutes); high-degree/low-LCC items are hubs bridging unrelated
  * traffic (landing pages) — the standard triadic read of a co-occurrence
  * graph, and the recommender-feature counterpart of centrality
  * (reference analytics stop at windowed counts; this is the deeper
  * session-graph question the same events stream supports).
  *
  * Graph: q139's consecutive-event transitions (same per-user lag over
  * (t, event_id), same integer-valued `props.$.k` item cast — see
  * ops/PageRank.scala:55 for the cast contract), undirected via
  * least/greatest BEFORE the edge census so both directions pool, kept
  * only with support weight ≥ `minW` (absolute co-transition support, the
  * standard noise floor for co-occurrence graphs; fixture default 3).
  *
  * Triangle counting is DEGREE-ORDERED orientation (compact-forward):
  * each undirected edge points from its lower (degree, id) endpoint to
  * the higher; each triangle then has exactly ONE vertex with two
  * out-edges, so the wedge self-join on `src` enumerates every triangle
  * once, and closure is an equi-join against the canonical (a < b) edge
  * list. Out-degrees under this orientation are O(√m) for any graph
  * (arboricity bound), so wedge fan-out is Σ out-deg² ≤ m^1.5 worst-case
  * — the property that makes distributed triangle counting survive
  * skewed degree distributions where a naive src-grouped join would
  * quadratically explode on hub nodes.
  *
  * Scale shape: the corpus-sized work (per-user ordered lag) runs ONCE,
  * upstream of the persisted vocab²-bounded edge census (the q139
  * posture); degrees are node-grain; orientation is map-side over the
  * edge list; the wedge join and closure join are edge-census-grain with
  * the √m fan-out bound above; the output is node-grain (item
  * vocabulary-bounded). Nothing corpus-sized moves after the first
  * aggregation.
  *
  * Int64 bounds: lcc_bp = 2·t·10⁴ div d(d−1) with t ≤ d(d−1)/2 and
  * d < |vocab|; at a 10⁷-item vocabulary 2·t·10⁴ ≤ 10¹⁸ < 2⁶³. */
object Triangles {

  /** Absolute co-transition support an edge needs to enter the graph. */
  val DefaultMinW = 3L

  /** Undirected support-filtered item graph: (a, b) with a < b, from
    * consecutive-event transitions pooled over both directions. */
  def itemGraphOf(events: DataFrame, tUs: Column, minW: Long = DefaultMinW): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"),
        // integer-valued item keys only — see pageRankOf's cast note
        get_json_object(col("props"), "$.k").cast("long").as("item"), tUs.as("t"))
      .filter(col("item").isNotNull)
      .withColumn("src", lag(col("item"), 1).over(w))
      .filter(col("src").isNotNull && col("src") =!= col("item"))
      .select(least(col("src"), col("item")).as("a"),
        greatest(col("src"), col("item")).as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("w"))
      .filter(col("w") >= minW)
      .select(col("a"), col("b"))
  }

  /** (item, degree, n_triangles, lcc_bp) over any canonical (a < b)
    * undirected edge list; lcc_bp is NULL for degree-1 nodes (no possible
    * wedge — the engines disagree on integer x/0, so the guard is a CASE
    * on both sides, the q129 rule). */
  def localClusteringOf(pairs0: DataFrame): DataFrame = {
    val pairs = Tables.swapPersist("q144_pairs", pairs0.select(col("a"), col("b")))
    val deg = Tables.swapPersist("q144_deg",
      pairs.select(col("a").as("v")).unionAll(pairs.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("d")))
    val ed = pairs
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
    val ord = struct(col("da"), col("a")) < struct(col("db"), col("b"))
    val e = Tables.swapPersist("q144_oriented", ed.select(
      when(ord, col("a")).otherwise(col("b")).as("src"),
      when(ord, col("b")).otherwise(col("a")).as("dst"),
      when(ord, col("db")).otherwise(col("da")).as("dd")))
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.src") === col("e2.src") &&
        struct(col("e1.dd"), col("e1.dst")) < struct(col("e2.dd"), col("e2.dst")))
      .select(col("e1.src").as("x"), col("e1.dst").as("y"), col("e2.dst").as("z"))
      .join(pairs, least(col("y"), col("z")) === col("a") &&
        greatest(col("y"), col("z")) === col("b"))
      .select(col("x"), col("y"), col("z"))
    val triPerNode = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("t"))
    deg.join(triPerNode, Seq("v"), "left")
      .select(col("v").as("item"), col("d").as("degree"),
        coalesce(col("t"), lit(0L)).as("n_triangles"),
        expr("CASE WHEN d >= 2 THEN (2 * coalesce(t, 0) * 10000) div (d * (d - 1)) END")
          .as("lcc_bp"))
  }

  // ---------------------------------------------------------------- q144
  def q144(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.table(spark, sfDir, "events")
    localClusteringOf(itemGraphOf(ev, Tables.tsMicros(ev)))
  }

  /** Mirror of [[q144]]: q139's e0/lag CTEs, least/greatest edge pooling,
    * the identical (degree, id) row-value orientation, wedge + closure
    * joins, and the CASE-guarded integer lcc. */
  private def q144Sql(minW: Long = DefaultMinW): String =
    s"""WITH e0 AS (
       |  SELECT user_id, event_id,
       |         TRY_CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item,
       |         epoch_us(ts) AS t
       |  FROM events),
       |e AS (SELECT * FROM e0 WHERE item IS NOT NULL),
       |l AS (SELECT item,
       |             lag(item) OVER (PARTITION BY user_id ORDER BY t, event_id) AS src
       |      FROM e),
       |p AS (SELECT least(src, item) AS a, greatest(src, item) AS b
       |      FROM l WHERE src IS NOT NULL AND src <> item
       |      GROUP BY 1, 2 HAVING count(*) >= $minW),
       |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d
       |        FROM (SELECT a AS v FROM p UNION ALL SELECT b FROM p) u GROUP BY v),
       |o AS (SELECT CASE WHEN (da.d, p.a) < (db.d, p.b) THEN p.a ELSE p.b END AS src,
       |             CASE WHEN (da.d, p.a) < (db.d, p.b) THEN p.b ELSE p.a END AS dst,
       |             CASE WHEN (da.d, p.a) < (db.d, p.b) THEN db.d ELSE da.d END AS dd
       |      FROM p JOIN deg da ON da.v = p.a JOIN deg db ON db.v = p.b),
       |tr AS (SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
       |       FROM o e1 JOIN o e2
       |         ON e1.src = e2.src AND (e1.dd, e1.dst) < (e2.dd, e2.dst)
       |       JOIN p ON p.a = least(e1.dst, e2.dst) AND p.b = greatest(e1.dst, e2.dst)),
       |tpn AS (SELECT v, CAST(count(*) AS BIGINT) AS nt FROM (
       |          SELECT x AS v FROM tr
       |          UNION ALL SELECT y FROM tr
       |          UNION ALL SELECT z FROM tr) u GROUP BY v)
       |SELECT deg.v AS item, deg.d AS degree,
       |       CAST(COALESCE(tpn.nt, 0) AS BIGINT) AS n_triangles,
       |       CASE WHEN deg.d >= 2
       |            THEN CAST(2 * COALESCE(tpn.nt, 0) * 10000 // (deg.d * (deg.d - 1)) AS BIGINT)
       |       END AS lcc_bp
       |FROM deg LEFT JOIN tpn ON tpn.v = deg.v""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q144_local_clustering", q144, Some(q144Sql())))
}
