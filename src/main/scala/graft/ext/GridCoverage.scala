package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-space grid coverage census (q106) — per-label occupancy of a
  * coarse integer grid over the leading embedding dims: how many grid
  * cells a label's vectors actually occupy, how concentrated its mass is
  * (top-cell share), and the exact Simpson collision index (probability
  * two random vectors of the label share a cell, in basis points). The
  * embedding-side counterpart of q103's vocabulary curve: mode collapse /
  * duplicated-embedding pathologies show up as few occupied cells and a
  * Simpson index near 10⁴ long before any pairwise detector runs —
  * a census-priced early warning for the q53/q21 near-dup passes.
  *
  * Diversity WITHOUT logarithms: entropy needs libm (the cross-engine
  * last-ulp hazard the repo's microbit family documents); Simpson's
  * Σc²/n² is a pure integer rational and carries the same "how
  * concentrated" signal. int64-exact to ~3·10⁹ vectors per label (n²
  * bound, documented); shard labels beyond that.
  *
  * Scale shape: min/max 1-row census (broadcast) → map-side milli-unit
  * quantize + cell id (the ZOrder integer-div idiom on [[KMeans.quantize]]
  * units) → ONE exchange on the (label, cell) grain (≤ |labels|·4⁴ groups,
  * map-side partials) → |labels|-row rollup. Nothing collects, nothing
  * pairs, nothing sorts.
  */
object GridCoverage {

  val Dims = 4    // leading dims spanning the grid
  val Levels = 4  // quantization levels per dim -> 256 cells

  /** (label, n_vecs, cells_occupied, top_cell_n, top_share_bp,
    * simpson_bp) over any (vec_id, embedding, label) frame. */
  def gridCoverageOf(embeds: DataFrame): DataFrame = {
    val pts = KMeans.quantize(embeds)
      .join(embeds.select(col("vec_id").as("lv"), col("label")),
        col("vec_id") === col("lv"))
      .select(col("label"), col("q"))
    val mm = pts.agg(
      min(expr("element_at(q, 1)")).as("mn0"), max(expr("element_at(q, 1)")).as("mx0"),
      min(expr("element_at(q, 2)")).as("mn1"), max(expr("element_at(q, 2)")).as("mx1"),
      min(expr("element_at(q, 3)")).as("mn2"), max(expr("element_at(q, 3)")).as("mx2"),
      min(expr("element_at(q, 4)")).as("mn3"), max(expr("element_at(q, 4)")).as("mx3"))
    // (x - mn) * L div (mx - mn + 1) lands in 0..L-1 exactly (the ZOrder
    // quantize with an inclusive denominator, so no clamp is needed)
    val cell = (0 until Dims).map { i =>
      val lvl = s"((element_at(q, ${i + 1}) - mn$i) * $Levels div (mx$i - mn$i + 1))"
      if (i == 0) lvl else s"$lvl * ${math.pow(Levels, i).toLong}"
    }.mkString(" + ")
    pts.crossJoin(broadcast(mm))
      .withColumn("cell", expr(cell))
      .groupBy(col("label"), col("cell"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("label"))
      .agg(sum(col("c")).as("n_vecs"),
        count(lit(1)).as("cells_occupied"),
        max(col("c")).as("top_cell_n"),
        sum(col("c") * col("c")).as("c2"))
      .select(col("label").cast("long").as("label"), col("n_vecs"),
        col("cells_occupied"), col("top_cell_n"),
        expr("top_cell_n * 10000 div n_vecs").as("top_share_bp"),
        expr("c2 * 10000 div (n_vecs * n_vecs)").as("simpson_bp"))
  }

  // ---------------------------------------------------------------- q106
  def q106(spark: SparkSession, sfDir: String): DataFrame =
    gridCoverageOf(Tables.table(spark, sfDir, "embeddings"))

  private val q106Sql = {
    val lvl = (0 until Dims).map { i =>
      val e = s"((q[${i + 1}] - mn$i) * $Levels // (mx$i - mn$i + 1))"
      if (i == 0) e else s"$e * ${math.pow(Levels, i).toLong}"
    }.mkString(" + ")
    val mmCols = (0 until Dims).map(i =>
      s"min(q[${i + 1}]) AS mn$i, max(q[${i + 1}]) AS mx$i").mkString(", ")
    s"""WITH pts AS (
       |  SELECT label,
       |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT)) AS q
       |  FROM embeddings),
       |mm AS (SELECT $mmCols FROM pts),
       |cells AS (SELECT label, $lvl AS cell FROM pts CROSS JOIN mm),
       |h AS (SELECT label, cell, count(*) AS c FROM cells GROUP BY label, cell)
       |SELECT CAST(label AS BIGINT) AS label,
       |       CAST(sum(c) AS BIGINT) AS n_vecs,
       |       count(*) AS cells_occupied,
       |       CAST(max(c) AS BIGINT) AS top_cell_n,
       |       CAST(max(c) * 10000 // sum(c) AS BIGINT) AS top_share_bp,
       |       CAST(sum(c * c) * 10000 // (sum(c) * sum(c)) AS BIGINT) AS simpson_bp
       |FROM h GROUP BY label""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q106_grid_coverage", q106, Some(q106Sql))
  )
}
