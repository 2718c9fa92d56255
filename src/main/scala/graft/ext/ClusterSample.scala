package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cluster-balanced downsampling (q55) — the second consumer
  * [[KMeans.assignments]] promises ("per-cluster operators: SemDeDup's
  * within-cell dedup, cluster-stratified sampling"): cap every k-means
  * cell at a target size by deterministic hash-threshold sampling, so a
  * corpus dominated by one semantic region (the mass-near-duplicate shape
  * SemDeDup targets) comes out with its cluster mass flattened toward
  * uniform — diversity-preserving pruning, the cheap streaming-friendly
  * complement to q53's exact pairwise dedup.
  *
  * Determinism: the keep decision is the q26/q42/q48 md5-per-mil family
  * (engine-exact nibble arithmetic), the per-cell rate is exact integer
  * floor division of the cell census, and the assignment is the
  * checkpointed int64 fixed point — so the SAMPLE is reproducible across
  * engines, re-runs and partitionings, which an IID `rand()` sample is
  * not.
  *
  * Scale shape: the assignment is materialized once (keyed persist — the
  * census and the output both read it); the census is a ≤ k-row aggregate
  * joined back by BROADCAST; the keep decision is map-side expression
  * work. One corpus scan, one k-row broadcast, zero corpus shuffles.
  */
object ClusterSample {

  /** (vec_id, cid, keep) for every vector: keep = 1 iff the vector
    * survives its cell's rate — cells at or under `targetPerCell` keep
    * everything (rate 1000‰), larger cells keep ~targetPerCell members. */
  def clusterBalancedSample(embeds: DataFrame, k: Int = 8, iters: Int = 2,
                            targetPerCell: Int = 40): DataFrame = {
    val assigned = Tables.swapPersist("cluster_sample_assigned",
      KMeans.assignments(embeds, k, iters).select(col("vec_id"), col("cid")))
    val rates = assigned.groupBy(col("cid")).agg(count(lit(1)).as("n"))
      .select(col("cid").as("rcid"),
        least(lit(1000L), expr(s"(${1000L * targetPerCell}) div n")).as("keep_pm"))
    assigned.join(broadcast(rates), col("cid") === col("rcid"))
      .withColumn("hh", md5(concat(lit("csmp|"), col("vec_id"))))
      .select(col("vec_id"), col("cid").cast("long").as("cid"),
        (expr(s"${TextOps.hexVal("hh", 1, duck = false)} % 1000") < col("keep_pm"))
          .cast("int").as("keep"))
  }

  // ---------------------------------------------------------------- q55
  def q55(spark: SparkSession, sfDir: String): DataFrame =
    clusterBalancedSample(Tables.table(spark, sfDir, "embeddings"))

  private def q55Sql(k: Int = 8, iters: Int = 2, dim: Int = 64,
                     targetPerCell: Int = 40): String =
    s"""WITH ${KMeans.duckFitCtes(k, iters, dim)},
       |asg AS (SELECT vec_id, cid FROM fin),
       |rates AS (
       |  SELECT cid, least(1000, (${1000L * targetPerCell}) // count(*)) AS keep_pm
       |  FROM asg GROUP BY cid),
       |h AS (
       |  SELECT a.vec_id, a.cid, r.keep_pm, md5('csmp|' || a.vec_id) AS hh
       |  FROM asg a JOIN rates r USING (cid))
       |SELECT vec_id, CAST(cid AS BIGINT) AS cid,
       |       CASE WHEN ${TextOps.hexVal("hh", 1, duck = true)} % 1000 < keep_pm
       |            THEN 1 ELSE 0 END AS keep
       |FROM h""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q55_cluster_sample", q55, Some(q55Sql()))
  )
}
