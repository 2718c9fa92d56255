package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.oracle.{QueryDef, Tables}

/** q164 — incremental PageRank maintenance: the q163 warm-start
  * discipline applied to its second iterative operator, q142's
  * full-Google-matrix PageRank. This is the claim that the
  * incremental-maintenance arc is a reusable PATTERN, not a one-off:
  * q154 proved the census updates from settled + delta + frontier
  * without re-touching settled events; q163 proved the spectral
  * coordinates warm-start from the settled fixed point; q164 proves the
  * SAME for the rank vector — and the directed-transition census obeys
  * the same decomposition identity the pooled census did (pinned in
  * PageRankDeltaSpec: full ≡ settled + delta + directed straddle).
  *
  * Semantics (both engines, bit-identical):
  *   - e, settled/delta split at [[SpectralDelta.DeltaCutUs]] (the ~6%
  *     trailing-delta production cut, same rationale as q163).
  *   - DIRECTED transition censuses (src, dst, w) — q142's edge
  *     semantics, not q154's pooled ones; the straddle census is the
  *     directed (last settled item → first delta item) per user.
  *   - the merged census = settled + delta + straddle, summed — the
  *     production path; never a lag over settled events.
  *   - PageRank rounds: q142's arithmetic verbatim (base 150000 micro,
  *     damp 8500 bp, contribution (rank·w) div out_w, dangling mass
  *     teleported as ((D div n)·damp) div 10000, declared division
  *     order) — settled vector from uniform over the settled census;
  *     over the merged census the warm arm starts from the settled
  *     ranks (alignment contract: delta-new node → uniform 10⁶, retired
  *     node → dropped) and runs [[WarmIters]] round(s), the cold arm
  *     starts uniform and runs the full [[Iters]].
  *   - warm and cold are FUSED (the q163 pattern): one two-column
  *     state, one edges join + one two-sum contribution aggregate + one
  *     two-sum dangling census per round — half the edge-census passes
  *     of two independent loops; per-column arithmetic pinned equal to
  *     the single-column loop in PageRankDeltaSpec.
  *
  * Output: (item, rank_settled NULLABLE, rank_warm, rank_cold, drift) —
  * one row per merged-census node; rank_settled is NULL exactly on the
  * nodes the delta introduced.
  *
  * Int64 bounds: q139/q142's — rank_micro ≈ 10⁶·(1+ε), rank·w ≤ 10⁶·w
  * (int64-safe far past 100 TB at bounded per-pair support), D ≤ total
  * mass ≈ n·10⁶.
  *
  * Scale shape: ONE corpus-scale pass (the two window lags over the
  * persisted item-event frame + the user-grain frontier windows);
  * everything downstream is census-grain. Both edge censuses persist
  * with out-weights attached; the dangling sets are vocab-bounded
  * anti-joins; each round is q142's posture (edges equi-join +
  * map-side-combining contribution sum + 1-row dangling/n censuses
  * broadcast back, rank localCheckpointed every intermediate round —
  * the doubled-pass rule, two consumers per round per column). In
  * production only the warm arm recurs. */
object PageRankDelta {

  /** Warm-start rounds over the merged census — the claim is ONE round
    * from the settled ranks lands closer to the cold fixed point than
    * one round from uniform does (measured per SF in BASELINE.md). */
  val WarmIters = 1

  val Iters = 3
  val DampBp = 8500L

  /** (user_id, event_id, item, t) with non-null integer items. */
  private def itemEvents(events: DataFrame, tUs: Column): DataFrame =
    events.select(col("user_id"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"), tUs.as("t"))
      .filter(col("item").isNotNull)

  /** Directed minW=1 transition census (src, dst, w) within `e` —
    * q142's edge semantics (self-loops dropped, directions kept).
    * `private[graft]`: q166's composed daily refresh builds the SAME
    * censuses once and shares them across both warm arms, and the DLQ
    * specs pin gate lanes against it. */
  private[graft] def directedCensusOf(e: DataFrame): DataFrame =
    e.withColumn("src", lag(col("item"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))))
      .filter(col("src").isNotNull && col("src") =!= col("item"))
      .groupBy(col("src"), col("item").as("dst"))
      .agg(count(lit(1)).as("w"))

  /** The monolithic directed census of the whole corpus — the reference
    * side of the decomposition identity (spec-only reader). */
  def fullDirectedCensusOf(events: DataFrame, tUs: Column): DataFrame =
    directedCensusOf(itemEvents(events, tUs))

  /** The production-path merged census: settled + delta + the directed
    * per-user straddle, summed. PageRankDeltaSpec pins it equal to
    * [[fullDirectedCensusOf]] (the q154 identity, directed form). */
  def mergedDirectedCensusOf(events: DataFrame, tUs: Column,
                             cutUs: Long = SpectralDelta.DeltaCutUs): DataFrame = {
    val e = itemEvents(events, tUs)
    mergedOf(e.filter(col("t") < cutUs), e.filter(col("t") >= cutUs))
  }

  private def mergedOf(settled: DataFrame, delta: DataFrame): DataFrame = {
    val cs = directedCensusOf(settled)
    val cd = directedCensusOf(delta)
    val cb = Frontier.straddleOf(settled, delta)
      .filter(col("s_item") =!= col("d_item"))
      .groupBy(col("s_item").as("src"), col("d_item").as("dst"))
      .agg(count(lit(1)).as("w"))
    cs.unionByName(cd).unionByName(cb)
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
  }

  /** edges(src, dst, w) → (edges+out_w, nodes, dangling set, 1-row
    * node-count census), each materialized once for the round joins.
    * `checkpoint = true` for the FUSED arm whose graph frames enter the
    * final displayed plan (the q163 display lesson: a persisted frame in
    * the final plan nests its whole build lineage — the first manifest
    * line here read 380 displayed parquet scans; checkpoints truncate
    * it); the settled arm keeps keyed persists because its output is
    * checkpointed downstream and the extra eager jobs would buy
    * nothing. */
  private def prepGraph(edges: DataFrame, key: String, checkpoint: Boolean)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    // r16: BOTH arms checkpoint now — the keyed-persist branch kept the
    // full corpus lineage in every round plan and the driver re-optimized
    // it per action (see SpectralEmbed.ppmiMatOf); `checkpoint` is kept
    // as a (now vestigial) signature for the callers' documentation.
    def mat(name: String, df: DataFrame): DataFrame = df.localCheckpoint()
    val outW = edges.groupBy(col("src")).agg(sum(col("w")).as("out_w"))
    val edgesW = mat("ew", edges.join(outW, Seq("src")))
    val nodes = mat("nodes",
      edgesW.select(col("src").as("item"))
        .union(edgesW.select(col("dst").as("item"))).distinct())
    val dangling = mat("dang",
      nodes.join(edgesW.select(col("src").as("item")).distinct(),
        Seq("item"), "left_anti"))
    (edgesW, nodes, dangling, nodes.agg(count(lit(1)).as("n_nodes")))
  }

  /** q142's loop over an edge CENSUS (src, dst, w) from uniform —
    * byte-identical round arithmetic; the settled arm. */
  def rankOf(edges: DataFrame, key: String, iters: Int = Iters,
             dampBp: Long = DampBp): DataFrame = {
    val (edgesW, nodes, dangling, nCensus) = prepGraph(edges, key, checkpoint = false)
    loop(edgesW, nodes, dangling, nCensus,
      nodes.withColumn("rank_micro", lit(1000000L)), iters, dampBp)
  }

  /** [[rankOf]] warm-started from prior ranks `start(item, rank_micro)`
    * — the production arm of the composed daily refresh (q166): only the
    * warm refresh recurs there, so the cold audit column of
    * [[rankWarmColdOf]] is not built. Alignment contract is the fused
    * warm column's (missing node → uniform 10⁶, retired start row →
    * dropped); the round body is SHARED with [[rankOf]] ([[loop]]), so
    * the two differ only in r₀ and round count by construction. Graph
    * frames checkpoint (the q164 display lesson — this arm's frames
    * enter the final displayed plan). */
  def rankFrom(edges: DataFrame, start: DataFrame, key: String,
               iters: Int = WarmIters, dampBp: Long = DampBp): DataFrame = {
    val (edgesW, nodes, dangling, nCensus) = prepGraph(edges, key, checkpoint = true)
    val r0 = nodes
      .join(start.select(col("item"), col("rank_micro").as("r0w")), Seq("item"), "left")
      .select(col("item"), coalesce(col("r0w"), lit(1000000L)).as("rank_micro"))
      .localCheckpoint()
    loop(edgesW, nodes, dangling, nCensus, r0, iters, dampBp)
  }

  /** The shared single-column round body — q142's arithmetic verbatim. */
  private def loop(edgesW: DataFrame, nodes: DataFrame, dangling: DataFrame,
                   nCensus: DataFrame, rank0: DataFrame, iters: Int,
                   dampBp: Long): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    var rank = rank0
    // r17 (verdict What's-wrong #2): forced broadcasts gated on the
    // measured bytes of the checkpointed node table (rank/contrib are
    // node-bounded) — past the cap the round degrades to the shuffle
    // join; zero extra jobs (driver storage registry).
    val fits = ScaleGuard.fits(nodes)
    def gated(df: DataFrame): DataFrame = if (fits) broadcast(df) else df
    for (i <- 1 to iters) {
      // r16 optimization (guide §3.1): the rank vector and the per-node
      // contribution census are node-bounded — broadcast both, so the
      // edge census never re-shuffles across rounds (before, the
      // checkpointed rank was a stats-less LogicalRDD and Spark planned
      // two-sided shuffles of the edges every iteration).
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
      if (i < iters) rank = rank.localCheckpoint()
    }
    rank
  }

  /** (item, rank_warm, rank_cold): warm and cold PageRank FUSED over one
    * edge census — the q163 two-column pattern. The warm column starts
    * from `start(item, rank_micro)` (aligned: missing → uniform 10⁶) and
    * freezes after `warmIters`; the cold column starts uniform and runs
    * all `iters`. Per-column arithmetic == [[rankOf]] (pinned in spec). */
  def rankWarmColdOf(edges: DataFrame, start: DataFrame, key: String,
                     warmIters: Int = WarmIters, iters: Int = Iters,
                     dampBp: Long = DampBp): DataFrame = {
    require(warmIters >= 1 && warmIters <= iters,
      s"warmIters out of [1, $iters]: $warmIters")
    val (edgesW, nodes, dangling, nCensus) = prepGraph(edges, key, checkpoint = true)
    val base = (10000L - dampBp) * 100L
    // r17: size-gated forced broadcasts — see [[loop]]'s note
    val fits = ScaleGuard.fits(nodes)
    def gated(df: DataFrame): DataFrame = if (fits) broadcast(df) else df
    var state = nodes
      .join(start.select(col("item"), col("rank_micro").as("r0w")), Seq("item"), "left")
      .select(col("item"), coalesce(col("r0w"), lit(1000000L)).as("rw"),
        lit(1000000L).as("rc"))
      .localCheckpoint()
    var vW: DataFrame = null
    for (i <- 1 to iters) {
      if (i <= warmIters) {
        // r16 optimization: broadcast the node-bounded state/contrib —
        // the edge census never re-shuffles (see [[loop]]).
        val contrib = edgesW
          .join(gated(state.select(col("item").as("src"), col("rw"), col("rc"))),
            Seq("src"))
          .groupBy(col("dst"))
          .agg(sum(expr("(rw * w) div out_w")).as("cw"),
            sum(expr("(rc * w) div out_w")).as("cc"))
        val dMass = state.join(dangling, Seq("item"))
          .agg(coalesce(sum(col("rw")), lit(0L)).as("dw"),
            coalesce(sum(col("rc")), lit(0L)).as("dc"))
        state = nodes
          .join(gated(contrib.withColumnRenamed("dst", "item")), Seq("item"), "left")
          .crossJoin(broadcast(dMass))
          .crossJoin(broadcast(nCensus))
          .select(col("item"),
            (lit(base) + expr(s"(coalesce(cw, 0L) * ${dampBp}L) div 10000L") +
              expr(s"((dw div n_nodes) * ${dampBp}L) div 10000L")).as("rw"),
            (lit(base) + expr(s"(coalesce(cc, 0L) * ${dampBp}L) div 10000L") +
              expr(s"((dc div n_nodes) * ${dampBp}L) div 10000L")).as("rc"))
        if (i < iters) state = state.localCheckpoint()
        if (i == warmIters) vW = state.select(col("item"), col("rw"))
      } else {
        val contrib = edgesW
          .join(gated(state.select(col("item").as("src"), col("rc"))), Seq("src"))
          .groupBy(col("dst"))
          .agg(sum(expr("(rc * w) div out_w")).as("cc"))
        val dMass = state.join(dangling, Seq("item"))
          .agg(coalesce(sum(col("rc")), lit(0L)).as("dc"))
        state = nodes
          .join(gated(contrib.withColumnRenamed("dst", "item")), Seq("item"), "left")
          .crossJoin(broadcast(dMass))
          .crossJoin(broadcast(nCensus))
          .select(col("item"),
            (lit(base) + expr(s"(coalesce(cc, 0L) * ${dampBp}L) div 10000L") +
              expr(s"((dc div n_nodes) * ${dampBp}L) div 10000L")).as("rc"))
        if (i < iters) state = state.localCheckpoint()
      }
    }
    vW.join(state.select(col("item"), col("rc")), Seq("item"))
      .select(col("item"), col("rw").as("rank_warm"), col("rc").as("rank_cold"))
  }

  /** (item, rank_settled, rank_warm, rank_cold, drift) — see object doc. */
  def pageRankDeltaOf(events: DataFrame, tUs: Column,
                      cutUs: Long = SpectralDelta.DeltaCutUs): DataFrame = {
    val e = Tables.swapPersist("q164_e", itemEvents(events, tUs))
    val settled = e.filter(col("t") < cutUs)
    val delta = e.filter(col("t") >= cutUs)
    // settled census: two readers (settled rank arm + merged union)
    // r16: checkpoint — lineage truncation (ppmiMatOf note)
    val cs = directedCensusOf(settled).localCheckpoint()
    val cd = directedCensusOf(delta)
    val cb = Frontier.straddleOf(settled, delta)
      .filter(col("s_item") =!= col("d_item"))
      .groupBy(col("s_item").as("src"), col("d_item").as("dst"))
      .agg(count(lit(1)).as("w"))
    val merged = cs.unionByName(cd).unionByName(cb)
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))

    // yesterday's ranks: two readers (warm v0 + final left join)
    val vS = rankOf(cs, key = "q164s").localCheckpoint()
    val wc = rankWarmColdOf(merged, vS, key = "q164m")

    wc.join(vS.select(col("item"), col("rank_micro").as("rank_settled")),
        Seq("item"), "left")
      .select(col("item"), col("rank_settled"), col("rank_warm"), col("rank_cold"),
        abs(col("rank_warm") - col("rank_cold")).as("drift"))
  }

  // ---------------------------------------------------------------- q164
  def q164(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.table(spark, sfDir, "events")
    pageRankDeltaOf(ev, Tables.tsMicros(ev))
  }

  /** q142's graph-prep CTEs over a `(src, dst, w)` census CTE,
    * prefix-namespaced: `${p}ow/${p}ew/${p}nodes/${p}dang/${p}nc`. */
  private[ops] def stackCtes(census: String, p: String): String =
    s"""${p}ow AS (SELECT src, CAST(SUM(w) AS BIGINT) AS out_w FROM $census GROUP BY 1),
       |${p}ew AS MATERIALIZED (
       |  SELECT c.src, c.dst, c.w, o.out_w FROM $census c JOIN ${p}ow o USING (src)),
       |${p}nodes AS (SELECT src AS item FROM $census UNION SELECT dst FROM $census),
       |${p}dang AS (SELECT item FROM ${p}nodes
       |             WHERE item NOT IN (SELECT src FROM $census)),
       |${p}nc AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM ${p}nodes)""".stripMargin

  /** q142's unrolled rounds over the `$sp`-prefixed graph stack, reading
    * `${p}r0` and ending in `${p}r$iters`. */
  private[ops] def roundCtes(sp: String, p: String, iters: Int,
                        dampBp: Long = DampBp): String = {
    val base = (10000L - dampBp) * 100L
    (1 to iters).map { i =>
      s"""${p}c$i AS (
         |  SELECT dst, CAST(SUM((rank_micro * w) // out_w) AS BIGINT) AS contrib
         |  FROM ${sp}ew JOIN ${p}r${i - 1} ON ${sp}ew.src = ${p}r${i - 1}.item
         |  GROUP BY 1),
         |${p}dm$i AS (
         |  SELECT CAST(COALESCE(SUM(r.rank_micro), 0) AS BIGINT) AS d_mass
         |  FROM ${p}r${i - 1} r JOIN ${sp}dang USING (item)),
         |${p}r$i AS (
         |  SELECT n.item,
         |         CAST($base + (COALESCE(${p}c$i.contrib, 0) * $dampBp) // 10000
         |                    + ((${p}dm$i.d_mass // ${sp}nc.n_nodes) * $dampBp) // 10000
         |              AS BIGINT) AS rank_micro
         |  FROM ${sp}nodes n LEFT JOIN ${p}c$i ON n.item = ${p}c$i.dst,
         |       ${p}dm$i, ${sp}nc)""".stripMargin
    }.mkString(",\n")
  }

  private def q164Sql(cutUs: Long = SpectralDelta.DeltaCutUs): String =
    s"""WITH e AS (
       |  SELECT user_id, event_id,
       |         TRY_CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item,
       |         epoch_us(ts) AS t
       |  FROM events
       |  WHERE TRY_CAST(json_extract_string(props, '$$.k') AS BIGINT) IS NOT NULL),
       |s AS (SELECT * FROM e WHERE t < $cutUs),
       |d AS (SELECT * FROM e WHERE t >= $cutUs),
       |cs AS MATERIALIZED (
       |  SELECT src, dst, CAST(count(*) AS BIGINT) AS w
       |  FROM (SELECT item AS dst,
       |               lag(item) OVER (PARTITION BY user_id ORDER BY t, event_id) AS src
       |        FROM s)
       |  WHERE src IS NOT NULL AND src <> dst GROUP BY 1, 2),
       |cd AS (
       |  SELECT src, dst, CAST(count(*) AS BIGINT) AS w
       |  FROM (SELECT item AS dst,
       |               lag(item) OVER (PARTITION BY user_id ORDER BY t, event_id) AS src
       |        FROM d)
       |  WHERE src IS NOT NULL AND src <> dst GROUP BY 1, 2),
       |ls AS (SELECT user_id, item AS s_item FROM (
       |         SELECT user_id, item, row_number() OVER (
       |           PARTITION BY user_id ORDER BY t DESC, event_id DESC) AS rn
       |         FROM s) WHERE rn = 1),
       |fd AS (SELECT user_id, item AS d_item FROM (
       |         SELECT user_id, item, row_number() OVER (
       |           PARTITION BY user_id ORDER BY t, event_id) AS rn
       |         FROM d) WHERE rn = 1),
       |cb AS (SELECT s_item AS src, d_item AS dst, CAST(count(*) AS BIGINT) AS w
       |       FROM ls JOIN fd USING (user_id) WHERE s_item <> d_item
       |       GROUP BY 1, 2),
       |em AS MATERIALIZED (
       |  SELECT src, dst, CAST(sum(w) AS BIGINT) AS w FROM (
       |    SELECT * FROM cs UNION ALL SELECT * FROM cd UNION ALL SELECT * FROM cb)
       |  GROUP BY 1, 2),
       |${stackCtes("cs", "s_")},
       |s_r0 AS (SELECT item, CAST(1000000 AS BIGINT) AS rank_micro FROM s_nodes),
       |${roundCtes("s_", "s_", Iters)},
       |${stackCtes("em", "m_")},
       |m_r0 AS (SELECT item, CAST(1000000 AS BIGINT) AS rank_micro FROM m_nodes),
       |${roundCtes("m_", "m_", Iters)},
       |w_r0 AS (SELECT n.item, CAST(COALESCE(sr.rank_micro, 1000000) AS BIGINT) AS rank_micro
       |         FROM m_nodes n LEFT JOIN s_r$Iters sr ON n.item = sr.item),
       |${roundCtes("m_", "w_", WarmIters)}
       |SELECT c.item, sr.rank_micro AS rank_settled,
       |       w.rank_micro AS rank_warm, c.rank_micro AS rank_cold,
       |       abs(w.rank_micro - c.rank_micro) AS drift
       |FROM m_r$Iters c
       |JOIN w_r$WarmIters w ON c.item = w.item
       |LEFT JOIN s_r$Iters sr ON c.item = sr.item""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q164_pagerank_delta", q164, Some(q164Sql())))
}
