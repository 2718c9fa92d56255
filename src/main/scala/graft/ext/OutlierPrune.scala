package graft.ext

import graft.agg.PercentileDisc
import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Centroid-distance outlier pruning (q56) — the third consumer of
  * [[KMeans.assignments]]: within every k-means cell, drop the points
  * farthest from their centroid. Prototype-distance filtering is the
  * standard cheap proxy for "does this example look like its semantic
  * neighborhood" (the SSL-prototypes / CLIP-score pruning family): a
  * vector far from every centroid is noise, OCR garbage, or an
  * out-of-distribution straggler — exactly what a curation pipeline cuts
  * before training.
  *
  * The per-cell threshold is the exact discrete percentile of the cell's
  * integer squared-L2 distances — the [[PercentileDisc]] semantic
  * (`sorted(xs)[floor(q·(n−1))]`, the q03 contract), so the value is a
  * real observed distance and the keep rule `dist ≤ thr` admits ties on
  * both engines identically. All inputs are the int64 fixed point (q51's
  * contract), so threshold AND verdict are bit-identical cross-engine —
  * a hash-exact DuckDB oracle for an outlier detector.
  *
  * Scale shape: the assignment is materialized ONCE (keyed persist — the
  * threshold aggregate and the output both read it); the thresholds are a
  * ≤ k-row aggregate joined back by BROADCAST; the verdict is a map-side
  * comparison. One corpus scan, one k·buffer shuffle (PercentileDisc
  * reduces map-side to one buffer per cell × partition), zero corpus-wide
  * sorts — the window-rank formulation the oracle uses would instead sort
  * every cell globally. O(cell) threshold-buffer memory is the q03 parity
  * trade; at 100 TB swap in the sketch percentile (q24) as an explicitly
  * different operator, never silently.
  */
object OutlierPrune {

  /** (vec_id, cid, dist, cell_thr, keep) for every vector of any
    * (vec_id, embedding array<float>) frame: keep = 1 iff the vector's
    * squared distance to its centroid is ≤ its cell's pct-percentile.
    *
    * `exactThreshold = false` is the 100 TB setting: cells are ≈ n/k rows,
    * so the exact buffer is per-CELL corpus-fraction memory; the sketch
    * path (`percentile_approx`, accuracy 10⁴ ⇒ rank error ≤ n/10⁴ — the
    * q24 Greenwald-Khanna contract) aggregates in bounded memory, and the
    * spec pins its threshold inside the exact rank band. Explicitly
    * chosen, never a silent swap — the oracle binds the exact path. */
  def centroidOutliersOf(embeds: DataFrame, k: Int = 8, iters: Int = 2,
                         pct: Double = 0.9,
                         exactThreshold: Boolean = true): DataFrame = {
    val assigned = Tables.swapPersist("outlier_prune_assigned",
      KMeans.assignments(embeds, k, iters)
        .select(col("vec_id"), col("cid"), col("dist")))
    val thrCol =
      if (exactThreshold) PercentileDisc.at(pct)(col("dist").cast("double"))
      else percentile_approx(col("dist").cast("double"), lit(pct), lit(10000))
    val thr = assigned.groupBy(col("cid"))
      .agg(thrCol.cast("long").as("cell_thr"))
      .withColumnRenamed("cid", "tcid")
    assigned.join(broadcast(thr), col("cid") === col("tcid"))
      .select(col("vec_id"), col("cid").cast("long").as("cid"), col("dist"),
        col("cell_thr"), (col("dist") <= col("cell_thr")).cast("int").as("keep"))
  }

  /** Stream-static outlier gate — the ingestion-time face of q56: the
    * model AND the per-cell thresholds are computed ONCE on the static
    * (already-ingested) corpus, then arriving vectors are labeled
    * map-side against the broadcast fixed point and gated
    * `dist ≤ their cell's threshold` in the same continuous query.
    * Both static artifacts are eager k-row leaves (`fit` checkpoints the
    * centroids; the threshold table is `localCheckpoint`ed here), so a
    * micro-batch pays one k-row broadcast join — the static corpus is
    * NEVER re-aggregated per batch. Stateless append-mode stage: composes
    * with the assignment/cell-cap/curation chain stages (StreamingSpec
    * pins stream == batch). */
  def outlierGateStreamStatic(streamEmbeds: DataFrame, staticEmbeds: DataFrame,
                              k: Int = 8, iters: Int = 2,
                              pct: Double = 0.9): DataFrame = {
    val cents = KMeans.fit(KMeans.quantize(staticEmbeds), k, iters)
    val thr = KMeans.assign(KMeans.quantize(staticEmbeds), cents)
      .groupBy(col("cid"))
      .agg(PercentileDisc.at(pct)(col("dist").cast("double")).cast("long").as("cell_thr"))
      .withColumnRenamed("cid", "tcid")
      .localCheckpoint()
    KMeans.assign(KMeans.quantize(streamEmbeds), cents)
      .join(broadcast(thr), col("cid") === col("tcid"))
      .select(col("vec_id"), col("cid").cast("long").as("cid"), col("dist"),
        col("cell_thr"), (col("dist") <= col("cell_thr")).cast("int").as("keep"))
  }

  // ---------------------------------------------------------------- q56
  def q56(spark: SparkSession, sfDir: String): DataFrame =
    centroidOutliersOf(Tables.table(spark, sfDir, "embeddings"))

  private def q56Sql(k: Int = 8, iters: Int = 2, dim: Int = 64,
                     pct: Double = 0.9): String =
    s"""WITH ${KMeans.duckFitCtes(k, iters, dim)},
       |thr AS (
       |  SELECT cid, dist AS cell_thr FROM (
       |    SELECT cid, dist,
       |           row_number() OVER (PARTITION BY cid ORDER BY dist) AS rn,
       |           count(*) OVER (PARTITION BY cid) AS cnt
       |    FROM fin) t
       |  WHERE rn = CAST(floor($pct * (cnt - 1)) AS BIGINT) + 1)
       |SELECT f.vec_id, CAST(f.cid AS BIGINT) AS cid, f.dist, t.cell_thr,
       |       CASE WHEN f.dist <= t.cell_thr THEN 1 ELSE 0 END AS keep
       |FROM fin f JOIN thr t USING (cid)""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q56_centroid_outliers", q56, Some(q56Sql()))
  )
}
