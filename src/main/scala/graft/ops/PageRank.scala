package graft.ops

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Item-graph PageRank (q139) — power-iteration centrality over the
  * item-transition graph that q92 builds for event TYPES, here built for
  * the item catalog (`props.k`): per user, consecutive events define a
  * directed item→item edge; PageRank over that graph ranks items by
  * where browsing mass accumulates, the classic "importance" signal for
  * recommendation candidate pools and crawl-frontier ordering in a data
  * pipeline.
  *
  * Exact semantics (both engines, bit-identical):
  *  - edges: per-user (t, event_id)-ordered consecutive item pairs,
  *    self-loops dropped, weighted by pair count;
  *  - rank in integer MICRO-units, r0 = 1_000_000 per node;
  *  - per iteration: contrib(v) = Σ_{u→v} (rank(u)·w) div out_w(u)
  *    (per-edge integer division, then sum), then
  *    rank'(v) = (10000−dampBp)·100 + (contrib(v)·dampBp) div 10000.
  *    Dangling mass (nodes with no out-edges) is dropped, not
  *    redistributed — the documented simplification vs the full Google
  *    matrix; with damping the total-mass drift is bounded and the
  *    ORDERING (what the operator is for) is unaffected at these
  *    iteration counts.
  *
  * Int64 bounds (q106/q120 discipline): rank ≤ total mass ≈ n_nodes·1e6,
  * so rank·w needs n_nodes·w_max ≤ 9.2e12 — item vocabularies are
  * bounded censuses (here 100; realistically ≤1e7) and w_max ≤ |events|,
  * so the product is safe far past the 100 TB grain; past that, stage as
  * (rank div out_w)·w at the cost of per-edge truncation order.
  *
  * Scale shape: the edge list (vocab²-bounded census, NOT corpus-sized)
  * and node list persist once and feed all `iters` rounds; each round is
  * one hash join rank⋈edges on the source key plus one aggregation on
  * the destination key — the standard distributed PageRank round. The
  * corpus-sized work (ordered per-user lag) happens exactly once,
  * upstream of the persist. Lineage is truncated every 4 rounds
  * (localCheckpoint) so the planner never sees an unbounded join chain —
  * the fitSub lesson from ext/KMeans.scala.
  */
object PageRank {

  /** (item, rank_micro) after `iters` damped power-iteration rounds over
    * the consecutive-event item graph. */
  def pageRankOf(events: DataFrame, tUs: Column, iters: Int = 3,
                 dampBp: Long = 8500L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampBp >= 0L && dampBp <= 10000L, s"dampBp out of [0,10000]: $dampBp")
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
    val hops = events
      .select(col("user_id"), col("event_id"),
        // props.k is INTEGER-VALUED in the fixtures (TESTDATA.md). On a
        // non-integer numeric string the engines diverge (Spark's
        // cast("long") truncates '12.5'→12; DuckDB's TRY_CAST rounds or
        // NULLs) — if the item key ever becomes fractional, normalize
        // both sides with an integer-pattern guard before the cast.
        get_json_object(col("props"), "$.k").cast("long").as("item"), tUs.as("t"))
      .filter(col("item").isNotNull)
      .withColumn("src", lag(col("item"), 1).over(w))
      .filter(col("src").isNotNull && col("src") =!= col("item"))
    val edges = hops.groupBy(col("src"), col("item").as("dst"))
      .agg(count(lit(1)).as("w"))
    val outW = edges.groupBy(col("src")).agg(sum(col("w")).as("out_w"))
    // vocab²-bounded census: persists once, read `iters` times
    // r16: checkpoints, not keyed persists — lineage truncation (ppmiMatOf)
    val edgesW = edges.join(outW, Seq("src")).localCheckpoint()
    val nodes =
      edgesW.select(col("src").as("item"))
        .union(edgesW.select(col("dst").as("item"))).distinct()
        .localCheckpoint()

    var rank = nodes.withColumn("rank_micro", lit(1000000L))
    // r17 (verdict What's-wrong #2): the forced broadcasts are gated on
    // the measured bytes of the checkpointed node table (rank/contrib ≤
    // one row per node) — past the cap the round degrades to the shuffle
    // join instead of an OOM; zero extra jobs (driver storage registry).
    val fits = ScaleGuard.fits(nodes)
    def gated(df: DataFrame): DataFrame = if (fits) broadcast(df) else df
    for (i <- 1 to iters) {
      // r16 optimization (guide §3.1): rank/contrib are node-bounded —
      // broadcast both so the edge census never re-shuffles per round.
      val contrib = edgesW
        .join(gated(rank.select(col("item").as("src"), col("rank_micro"))),
          Seq("src"))
        .groupBy(col("dst"))
        .agg(sum(expr("(rank_micro * w) div out_w")).as("contrib"))
      rank = nodes
        .join(gated(contrib.withColumnRenamed("dst", "item")), Seq("item"), "left")
        .select(col("item"),
          (lit((10000L - dampBp) * 100L) +
            expr(s"(coalesce(contrib, 0L) * ${dampBp}L) div 10000L"))
            .as("rank_micro"))
      if (i % 4 == 0 && i < iters) rank = rank.localCheckpoint()
    }
    rank
  }

  /** Full-Google-matrix PageRank (q142): [[pageRankOf]] plus dangling-mass
    * redistribution — the one documented simplification in q139 closed.
    * A DANGLING node (appears as a dst but never as a src; its rank has
    * nowhere to flow) leaks its mass in q139; here each round teleports it
    * uniformly: with D = Σ rank(dangling) and n = |nodes|,
    *
    *   rank'(v) = (10000−dampBp)·100 + (contrib(v)·dampBp) div 10000
    *                                 + ((D div n)·dampBp) div 10000
    *
    * (integer division order declared: per-node share D div n FIRST, then
    * damping — both engines verbatim). On a graph with no dangling nodes
    * D = 0 and q142 degenerates to q139 exactly — PageRankSpec pins both
    * that degeneracy and a hand-computed dangling graph where the two
    * diverge.
    *
    * Scale shape: q139's rounds plus, per round, ONE 1-row dangling-mass
    * census (rank ⋈ the persisted dangling-node list, vocab-bounded, then
    * a global sum) broadcast back over the node table — the same 1-row
    * census crossJoin posture as ops/Components. n comes from a second
    * 1-row census computed once. Int64: D ≤ total mass ≈ n·1e6 — the q139
    * bound; (D div n) ≤ ~1e6·(1+ε), so the damped product is safe.
    *
    * Unlike q139 (one consumer per round), each round's rank feeds TWO
    * readers — the contrib join and the dangling census — so the rank
    * table localCheckpoints EVERY intermediate round: without it the plan
    * doubles per round (2^iters copies of round 0; first build measured
    * 144 scans vs q139's 22 in PLAN_MANIFEST terms) and Spark re-executes
    * the duplicated subtrees. The checkpoint materializes ≤ |vocab| rows —
    * bounded, never corpus-sized (the q130 doubled-pass lesson). */
  def pageRankFullOf(events: DataFrame, tUs: Column, iters: Int = 3,
                     dampBp: Long = 8500L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampBp >= 0L && dampBp <= 10000L, s"dampBp out of [0,10000]: $dampBp")
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
    val hops = events
      .select(col("user_id"), col("event_id"),
        // integer-valued item keys only — see pageRankOf's cast note
        get_json_object(col("props"), "$.k").cast("long").as("item"), tUs.as("t"))
      .filter(col("item").isNotNull)
      .withColumn("src", lag(col("item"), 1).over(w))
      .filter(col("src").isNotNull && col("src") =!= col("item"))
    val edges = hops.groupBy(col("src"), col("item").as("dst"))
      .agg(count(lit(1)).as("w"))
    val outW = edges.groupBy(col("src")).agg(sum(col("w")).as("out_w"))
    // r16: checkpoints, not keyed persists — lineage truncation (ppmiMatOf)
    val edgesW = edges.join(outW, Seq("src")).localCheckpoint()
    val nodes =
      edgesW.select(col("src").as("item"))
        .union(edgesW.select(col("dst").as("item"))).distinct()
        .localCheckpoint()
    // vocab-bounded: nodes that never emit (dst-only) — the dangling set
    val dangling = nodes.join(edgesW.select(col("src").as("item")).distinct(),
      Seq("item"), "left_anti").localCheckpoint()
    val nCensus = nodes.agg(count(lit(1)).as("n_nodes"))

    var rank = nodes.withColumn("rank_micro", lit(1000000L))
    // r17: size-gated forced broadcasts — see pageRankOf's note (the
    // 1-row dMass/nCensus crossJoins stay unconditional by construction)
    val fits = ScaleGuard.fits(nodes)
    def gated(df: DataFrame): DataFrame = if (fits) broadcast(df) else df
    for (i <- 1 to iters) {
      // r16 optimization (guide §3.1): broadcast the node-bounded
      // rank/contrib — the edge census never re-shuffles (see q139 loop).
      val contrib = edgesW
        .join(gated(rank.select(col("item").as("src"), col("rank_micro"))),
          Seq("src"))
        .groupBy(col("dst"))
        .agg(sum(expr("(rank_micro * w) div out_w")).as("contrib"))
      val dMass = rank.join(dangling, Seq("item"))
        .agg(coalesce(sum(col("rank_micro")), lit(0L)).as("d_mass"))
      rank = nodes
        .join(gated(contrib.withColumnRenamed("dst", "item")), Seq("item"), "left")
        .crossJoin(broadcast(dMass))
        .crossJoin(broadcast(nCensus))
        .select(col("item"),
          (lit((10000L - dampBp) * 100L) +
            expr(s"(coalesce(contrib, 0L) * ${dampBp}L) div 10000L") +
            expr(s"((d_mass div n_nodes) * ${dampBp}L) div 10000L"))
            .as("rank_micro"))
      // two consumers next round (contrib + dangling census): checkpoint
      // so the lineage doesn't double per round — see the scaladoc
      if (i < iters) rank = rank.localCheckpoint()
    }
    rank
  }

  // ---------------------------------------------------------------- q139
  def q139(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.table(spark, sfDir, "events")
    pageRankOf(ev, Tables.tsMicros(ev))
  }

  // ---------------------------------------------------------------- q142
  def q142(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.table(spark, sfDir, "events")
    pageRankFullOf(ev, Tables.tsMicros(ev))
  }

  /** Mirror of [[pageRankOf]] with the 3 rounds unrolled as CTEs. */
  private def q139Sql(iters: Int = 3, dampBp: Long = 8500L): String = {
    val base = (10000L - dampBp) * 100L
    val head =
      s"""WITH e0 AS (
         |  SELECT user_id, event_id,
         |         TRY_CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item,
         |         epoch_us(ts) AS t
         |  FROM events),
         |e AS (SELECT * FROM e0 WHERE item IS NOT NULL),
         |l AS (
         |  SELECT item AS dst_i,
         |         lag(item, 1) OVER (PARTITION BY user_id ORDER BY t, event_id) AS src_i
         |  FROM e),
         |ed AS (
         |  SELECT src_i AS src, dst_i AS dst, CAST(count(*) AS BIGINT) AS w
         |  FROM l WHERE src_i IS NOT NULL AND src_i != dst_i GROUP BY 1, 2),
         |ow AS (SELECT src, CAST(SUM(w) AS BIGINT) AS out_w FROM ed GROUP BY 1),
         |ew AS (SELECT ed.src, ed.dst, ed.w, ow.out_w FROM ed JOIN ow USING (src)),
         |nodes AS (SELECT src AS item FROM ed UNION SELECT dst FROM ed),
         |r0 AS (SELECT item, CAST(1000000 AS BIGINT) AS rank_micro FROM nodes)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s""",
         |c$i AS (
         |  SELECT dst, CAST(SUM((rank_micro * w) // out_w) AS BIGINT) AS contrib
         |  FROM ew JOIN r${i - 1} ON ew.src = r${i - 1}.item GROUP BY 1),
         |r$i AS (
         |  SELECT n.item,
         |         CAST($base + (COALESCE(c$i.contrib, 0) * $dampBp) // 10000 AS BIGINT)
         |           AS rank_micro
         |  FROM nodes n LEFT JOIN c$i ON n.item = c$i.dst)""".stripMargin
    }.mkString
    s"$head$rounds\nSELECT item, rank_micro FROM r$iters"
  }

  /** Mirror of [[pageRankFullOf]]: q139's CTE chain plus the dangling-node
    * set, the node count, and a per-round 1-row dangling-mass CTE. */
  private def q142Sql(iters: Int = 3, dampBp: Long = 8500L): String = {
    val base = (10000L - dampBp) * 100L
    val head =
      s"""WITH e0 AS (
         |  SELECT user_id, event_id,
         |         TRY_CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item,
         |         epoch_us(ts) AS t
         |  FROM events),
         |e AS (SELECT * FROM e0 WHERE item IS NOT NULL),
         |l AS (
         |  SELECT item AS dst_i,
         |         lag(item, 1) OVER (PARTITION BY user_id ORDER BY t, event_id) AS src_i
         |  FROM e),
         |ed AS (
         |  SELECT src_i AS src, dst_i AS dst, CAST(count(*) AS BIGINT) AS w
         |  FROM l WHERE src_i IS NOT NULL AND src_i != dst_i GROUP BY 1, 2),
         |ow AS (SELECT src, CAST(SUM(w) AS BIGINT) AS out_w FROM ed GROUP BY 1),
         |ew AS (SELECT ed.src, ed.dst, ed.w, ow.out_w FROM ed JOIN ow USING (src)),
         |nodes AS (SELECT src AS item FROM ed UNION SELECT dst FROM ed),
         |dang AS (SELECT item FROM nodes WHERE item NOT IN (SELECT src FROM ed)),
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM nodes),
         |r0 AS (SELECT item, CAST(1000000 AS BIGINT) AS rank_micro FROM nodes)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s""",
         |c$i AS (
         |  SELECT dst, CAST(SUM((rank_micro * w) // out_w) AS BIGINT) AS contrib
         |  FROM ew JOIN r${i - 1} ON ew.src = r${i - 1}.item GROUP BY 1),
         |dm$i AS (
         |  SELECT CAST(COALESCE(SUM(r.rank_micro), 0) AS BIGINT) AS d_mass
         |  FROM r${i - 1} r JOIN dang USING (item)),
         |r$i AS (
         |  SELECT n.item,
         |         CAST($base + (COALESCE(c$i.contrib, 0) * $dampBp) // 10000
         |                    + ((dm$i.d_mass // nc.n_nodes) * $dampBp) // 10000 AS BIGINT)
         |           AS rank_micro
         |  FROM nodes n LEFT JOIN c$i ON n.item = c$i.dst, dm$i, nc)""".stripMargin
    }.mkString
    s"$head$rounds\nSELECT item, rank_micro FROM r$iters"
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q139_pagerank", q139, Some(q139Sql())),
    QueryDef("q142_pagerank_full", q142, Some(q142Sql())))
}
