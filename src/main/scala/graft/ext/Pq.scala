package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization codebooks (q98) — the memory side of large-scale
  * ANN (IVF-PQ): split each embedding into M contiguous subvectors, run an
  * independent k-means per subspace (k=16 codes → 4 bits/subspace), and
  * report per-(subspace, code) census: occupancy, quantization distortion
  * (integer inertia) and the centroid checksum. A 64-dim float vector
  * compresses to M=4 codes = 2 bytes — at 100 TB the difference between an
  * index that fits in executor memory and one that doesn't; q20's IVF
  * prunes WHICH cells to visit, PQ shrinks WHAT is stored per cell.
  *
  * Reuses the integer-exact Lloyd kernel (KMeans scaladoc: milli-unit
  * quantization, int64 distances, floor-division centroids, lowest-cid
  * tie-break) per subspace, so even this iterative codebook build is
  * hash-exact against the DuckDB oracle — each subspace's Lloyd loop runs
  * in its own WITH-scope, UNION'd.
  *
  * Shape: embeddings quantized ONCE behind a keyed persist; each
  * subspace's fit slices the cached frame (slice-of-quantize ≡
  * quantize-of-slice, elementwise), assignments stay map-side against
  * k-row broadcast centroids, updates exchange (cid × subdim) partials.
  * Corpus passes: 1 scan + M·(iters+1) cache reads, never M re-scans.
  */
object Pq {

  val M = 4          // subspaces
  val SubDim = 16    // 64-dim fixture / M
  val Codes = 16     // codes per subspace (4 bits)
  val Iters = 2

  /** The shared quantized corpus, persisted once per invocation. */
  private def pts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.swapPersist("q98_pts",
      KMeans.quantize(Tables.table(spark, sfDir, "embeddings")))

  private def subPts(p: DataFrame, s: Int): DataFrame =
    p.select(col("vec_id"), expr(s"slice(q, ${s * SubDim + 1}, $SubDim)").as("q"))

  // ---------------------------------------------------------------- q98
  /** (subspace, cid, n_points, inertia, centroid_checksum) — M·k rows. */
  def q98(spark: SparkSession, sfDir: String): DataFrame = {
    val p = pts(spark, sfDir)
    (0 until M).map { s =>
      KMeans.kmeansOfQuantized(subPts(p, s), Codes, Iters)
        .withColumn("subspace", lit(s.toLong))
        .select(col("subspace"), col("cid"), col("n_points"),
          col("inertia"), col("centroid_checksum"))
    }.reduce(_ unionByName _)
  }

  /** Per-vector PQ code word — (vec_id, codes: array<int> of length M,
    * distortion = Σ subspace inertia contribution). The compressed
    * representation an IVF-PQ index stores per posting. */
  def pqCodesOf(embeds: DataFrame, m: Int = M, subDim: Int = SubDim,
                codes: Int = Codes, iters: Int = Iters): DataFrame = {
    val p = Tables.swapPersist("pq_pts", KMeans.quantize(embeds))
    (0 until m).map { s =>
      val sub = p.select(col("vec_id"), expr(s"slice(q, ${s * subDim + 1}, $subDim)").as("q"))
      KMeans.assignmentsQuantized(sub, codes, iters)
        .select(col("vec_id"), lit(s).as("subspace"), col("cid"), col("dist"))
    }.reduce(_ unionByName _)
      .groupBy(col("vec_id"))
      .agg(expr("transform(array_sort(collect_list(struct(subspace, cid))), x -> x.cid)").as("codes"),
        sum(col("dist")).as("distortion"))
  }

  private def q98Sql: String = {
    val blocks = (0 until M).map { s =>
      val a = s * SubDim + 1
      val b = (s + 1) * SubDim
      s"""(WITH ${KMeans.duckFitCtes(Codes, Iters, SubDim, s"embedding[$a:$b]")},
         |cs AS (
         |  SELECT cid, CAST(list_sum(list_transform(cvec, (x, i) -> x * i)) AS BIGINT)
         |           AS centroid_checksum
         |  FROM c$Iters)
         |SELECT CAST($s AS BIGINT) AS subspace, CAST(fin.cid AS BIGINT) AS cid,
         |       count(*) AS n_points, CAST(sum(dist) AS BIGINT) AS inertia,
         |       cs.centroid_checksum
         |FROM fin JOIN cs ON cs.cid = fin.cid
         |GROUP BY fin.cid, cs.centroid_checksum)""".stripMargin
    }
    blocks.mkString("\nUNION ALL\n")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q98_pq_codebook", q98, Some(q98Sql))
  )
}
