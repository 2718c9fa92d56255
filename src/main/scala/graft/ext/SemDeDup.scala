package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (q53): cluster the embedding
  * corpus with [[KMeans]], then WITHIN each cluster mark every vector that
  * has an earlier (lower-id) neighbor at cosine ≥ τ as a semantic
  * duplicate — keep = the cluster-local greedy-by-id representatives. This
  * is the consumer [[KMeans]] exists for (its scaladoc's "cluster, then
  * dedup WITHIN clusters"): the clustering bounds the pairwise comparison
  * to cells, so the corpus is shuffled ONCE by cluster id and the
  * quadratic term is per-cell, never global — the standard
  * billion-embedding semantic-dedup layout (k grows with n to hold cell
  * sizes constant).
  *
  * Determinism: similarity is computed over the SAME int64-quantized
  * vectors as the clustering — dot products and norms are exact integer
  * folds (≤ 2⁵³, so even a double-accumulating engine is exact), the final
  * quotient is one IEEE division + sqrt on identical inputs, rounded to
  * 6 dp before the threshold — so cluster assignment AND the dup/keep
  * decision are bit-identical across engines and re-runs, which is what
  * makes a hash-exact DuckDB oracle possible (same contract as q51).
  *
  * Scale shape: assignment is map-side (broadcast centroid row, see
  * KMeans.assign); the within-cell pairing is an equi-join on cid whose
  * two sides are the SAME map-side plan (ReuseExchange collapses them to
  * one corpus exchange); the dup attach joins the (dup-only) aggregate
  * back by vec_id. No cartesian product anywhere.
  */
object SemDeDup {

  /** Exact integer dot product of two quantized vectors as a SQL string. */
  private def intDot(a: String, b: String) =
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0L, (s, x) -> s + x)"

  /** General form over any (vec_id, embedding array<float>) frame.
    * Output: one row per vector — (vec_id, cid, is_dup, rep_of, max_sim)
    * where rep_of = the smallest earlier similar id in the cell (NULL for
    * representatives / singletons). */
  def semDedupOf(embeds: DataFrame, k: Int = 8, iters: Int = 2,
                 minSim: Double = 0.25): DataFrame = {
    val assigned = KMeans.assignments(embeds, k, iters)
      .select(col("vec_id"), col("cid"), col("q"))
      .withColumn("nrm", expr(intDot("q", "q")))
    val a = assigned.select(col("cid"), col("vec_id").as("aid"),
      col("q").as("qa"), col("nrm").as("na"))
    val b = assigned.select(col("cid"), col("vec_id").as("bid"),
      col("q").as("qb"), col("nrm").as("nb"))
    val dups = a.join(b, "cid").filter(col("aid") < col("bid"))
      .withColumn("sim", round(
        expr(intDot("qa", "qb")) / (sqrt(col("na")) * sqrt(col("nb"))), 6))
      .filter(col("sim") >= minSim)
      .groupBy(col("bid").as("vec_id"))
      .agg(min(col("aid")).as("rep_of"), max(col("sim")).as("max_sim"))
    assigned.select(col("vec_id"), col("cid"))
      .join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid").cast("long").as("cid"),
        col("rep_of").isNotNull.cast("int").as("is_dup"),
        col("rep_of"), col("max_sim"))
  }

  // ---------------------------------------------------------------- q53
  def q53(spark: SparkSession, sfDir: String): DataFrame =
    semDedupOf(Tables.table(spark, sfDir, "embeddings"))

  private def q53Sql(k: Int = 8, iters: Int = 2, dim: Int = 64,
                     minSim: Double = 0.25): String =
    s"""WITH ${KMeans.duckFitCtes(k, iters, dim)},
       |normed AS (
       |  SELECT vec_id, cid, q,
       |         CAST(list_sum(list_transform(range(1, ${dim + 1}), j -> q[j] * q[j])) AS BIGINT) AS nrm
       |  FROM fin),
       |sims AS (
       |  SELECT a.vec_id AS aid, b.vec_id AS bid,
       |         round(CAST(list_sum(list_transform(range(1, ${dim + 1}),
       |                 j -> a.q[j] * b.q[j])) AS BIGINT)
       |               / (sqrt(a.nrm) * sqrt(b.nrm)), 6) AS sim
       |  FROM normed a JOIN normed b ON a.cid = b.cid AND a.vec_id < b.vec_id),
       |dups AS (
       |  SELECT bid AS vec_id, min(aid) AS rep_of, max(sim) AS max_sim
       |  FROM sims WHERE sim >= $minSim GROUP BY bid)
       |SELECT n.vec_id, CAST(n.cid AS BIGINT) AS cid,
       |       CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END AS is_dup,
       |       d.rep_of, d.max_sim
       |FROM normed n LEFT JOIN dups d ON d.vec_id = n.vec_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q53_semdedup", q53, Some(q53Sql()))
  )
}
