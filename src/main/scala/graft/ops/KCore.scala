package graft.ops

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k-core decomposition of the support backbone (q146) — iterative peel:
  * repeatedly delete every node whose degree in the SURVIVING subgraph is
  * < k until the edge set is stable; what remains is the k-core, the
  * maximal subgraph of minimum degree k. On a co-transition backbone the
  * 3-core is the "dense browse nucleus": items embedded in redundantly
  * strong loops (the candidate pool a recommender can trust), while
  * peeled items hang off the core by fragile chains — the graph-topology
  * complement of q144's triadic read (a long cycle is 2-core but
  * triangle-free; a hub's star is triangle-free AND coreless).
  *
  * Exact semantics (both engines): round i computes degrees within the
  * round-(i−1) edge set, keeps nodes with d ≥ k, and induces the edge
  * subset on the survivors. Spark iterates to the fixpoint (edge count
  * unchanged) with a `maxIter` cap and THROWS if unconverged — a partial
  * peel is not a k-core, so an over-deep cascade is an error, not a
  * result (the ops/Components contract). The oracle unrolls exactly
  * `maxIter` rounds: peeling is idempotent past the fixpoint, so any
  * convergence within the cap makes the two texts identical, and beyond
  * the cap the Spark side fails loudly rather than hash-mismatching.
  *
  * Scale shape: every round is one degree aggregation + one two-sided
  * semi-join, all on the vocab²-bounded edge census — the corpus-sized
  * work (per-user lag, support pooling) runs ONCE upstream inside the
  * persisted weighted census. The edge frame has TWO consumers per round
  * (the degree agg and the induce join), so it localCheckpoints EVERY
  * round (the q142 doubled-pass rule: un-checkpointed, the lazy plan
  * doubles per round); each checkpoint materializes ≤|vocab|² rows.
  * Peel depth bounds rounds; degree-peel cascades on real co-occurrence
  * graphs are shallow (each round strips a full shell, and the fixture
  * backbones converge in ≤ 4 rounds).
  *
  * Int64 bounds: degrees < |vocab|; counts are census-sized. */
object KCore {

  val DefaultK = 3L

  /** Peel-round cap, shared verbatim by the Spark loop (throws past it)
    * and the oracle's unroll. Degree-peel strips a full shell per round;
    * the fixture backbones converge in ≤ 4 — 12 is contract margin, not
    * an expected depth. */
  val DefaultMaxIter = 12

  /** (item, core_degree) for the k-core of a canonical (a < b) edge
    * list; core_degree = the node's degree within the core. Empty when
    * no k-core exists (e.g. a forest for k ≥ 2). */
  def kCoreOf(strong: DataFrame, k: Long = DefaultK, maxIter: Int = DefaultMaxIter): DataFrame = {
    require(k >= 1L, s"k must be >= 1, got $k")
    def degOf(pairs: DataFrame): DataFrame =
      pairs.select(col("a").as("v")).unionAll(pairs.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("d"))
    // eager leaf: the loop reads each round's edges twice (doubled-pass)
    var pairs = strong.select(col("a"), col("b")).localCheckpoint()
    var m = pairs.count()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val surv = degOf(pairs).filter(col("d") >= k).select(col("v"))
      val next = pairs
        .join(surv.withColumnRenamed("v", "a"), Seq("a"))
        .join(surv.withColumnRenamed("v", "b"), Seq("b"))
        .select(col("a"), col("b"))
        .localCheckpoint()
      val m2 = next.count()
      converged = m2 == m
      m = m2
      pairs = next
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"kCoreOf: edge set still shrinking after $maxIter peel rounds — " +
          "the cascade is deeper than the cap (and than the oracle's " +
          "unroll); raise maxIter on BOTH sides")
    degOf(pairs).filter(col("d") >= k)
      .select(col("v").as("item"), col("d").as("core_degree"))
  }

  // ---------------------------------------------------------------- q146
  def q146(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.table(spark, sfDir, "events")
    // r16: checkpoint, not keyed persist — truncates the corpus lineage
    // out of every census-grain downstream plan (SpectralEmbed.ppmiMatOf)
    val pw = Triangles.weightedItemGraphOf(ev, Tables.tsMicros(ev))
      .localCheckpoint()
    kCoreOf(Backbone.backboneOf(pw))
  }

  /** Mirror of [[kCoreOf]] over [[Backbone.backboneCtes]]: `maxIter`
    * peel rounds unrolled (idempotent past the fixpoint — see scaladoc). */
  private def q146Sql(k: Long = DefaultK, maxIter: Int = DefaultMaxIter): String = {
    // MATERIALIZED is load-bearing: each round references the previous
    // round's CTE three times (two degree-union arms + the induce join),
    // so DuckDB's default inlining expands the chain 3^rounds-fold — the
    // un-materialized 30-round form died on "too many open files" before
    // producing a row. Materialization makes each round one census-sized
    // table, the exact shape the Spark loop's per-round localCheckpoint
    // gives the other engine.
    val head = s"""${Backbone.backboneCtes()},
                  |g0 AS MATERIALIZED (SELECT a, b FROM strong)""".stripMargin
    val rounds = (1 to maxIter).map { i =>
      s""",
         |d$i AS MATERIALIZED (
         |        SELECT v FROM (SELECT a AS v FROM g${i - 1}
         |                       UNION ALL SELECT b FROM g${i - 1}) u
         |        GROUP BY v HAVING count(*) >= $k),
         |g$i AS MATERIALIZED (
         |        SELECT g.a, g.b FROM g${i - 1} g
         |        JOIN d$i da ON g.a = da.v JOIN d$i db ON g.b = db.v)""".stripMargin
    }.mkString
    s"""$head$rounds
       |SELECT v AS item, CAST(count(*) AS BIGINT) AS core_degree
       |FROM (SELECT a AS v FROM g$maxIter UNION ALL SELECT b FROM g$maxIter) u
       |GROUP BY v HAVING count(*) >= $k""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q146_kcore_backbone", q146, Some(q146Sql())))
}
