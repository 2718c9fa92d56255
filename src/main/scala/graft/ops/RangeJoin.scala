package graft.ops

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyless interval-containment join (point t ∈ [lo, hi)) — the second
  * temporal join Spark lacks (after [[AsOfJoin]]). Spark plans a bare
  * `p.t >= i.lo AND p.t < i.hi` as BroadcastNestedLoop/cartesian — O(P·I)
  * comparisons, the non-starter at scale.
  *
  * Granule bucketing makes it an equi-join: replicate each interval to
  * every `granule`-sized time bucket it overlaps (ceil(width/granule)+1 ≤ 2
  * copies when granule ≥ width), bucket each point once, hash-join on the
  * bucket, refine with the exact predicate. Each point meets only the
  * intervals sharing its bucket, so comparisons scale with temporal
  * density, not |P|·|I|; no duplicate pairs by construction (a point joins
  * through exactly its own bucket).
  *
  * Scale knobs: `granule` trades interval replication (smaller granule →
  * more copies) against bucket width (larger granule → more false
  * candidates refined away); set it near the median interval width. Bursty
  * data concentrates in hot buckets — exactly the skew AQE's runtime
  * skew-join split handles (ScaleOpsSpec pins that machinery).
  */
object RangeJoin {

  /** Join each row of `points` to every `intervals` row whose
    * [loCol, hiCol) contains pointCol. Columns from both sides are kept. */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                pointCol: String, loCol: String, hiCol: String,
                granule: Long): DataFrame = {
    require(granule > 0, "granule must be positive")
    // hi is exclusive: an interval ending exactly on a bucket boundary does
    // not reach into that bucket — replicate over lo/g .. (hi-1)/g. Empty
    // intervals (hi <= lo) are dropped up front: they can never contain a
    // point, and Spark's sequence(a, b) with b < a would DESCEND, scattering
    // useless replicas across unrelated buckets
    val ip = intervals
      .filter(col(hiCol) > col(loCol))
      .withColumn("_g",
        explode(expr(s"sequence($loCol div $granule, ($hiCol - 1) div $granule)")))
    val pp = points.withColumn("_g", expr(s"$pointCol div $granule"))
    pp.join(ip, "_g")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_g")
  }

  // ---------------------------------------------------------------- q32
  /** Every click inside the 10-minute attribution window opened by any
    * purchase (keyless: windows from all users apply). Micros grain — the
    * cross-engine comparison precision (DuckDB `epoch_us`). */
  private val WindowUs = 600000000L // 10 minutes

  def q32(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.table(spark, sfDir, "events")
    // epoch-micros schema-adaptively (see Tables.tsMicros) — the grain
    // DuckDB's epoch_us compares at for every fixture encoding so far
    val tUs = Tables.tsMicros(ev)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), tUs.as("t"))
    val windows = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), tUs.as("lo"),
        (tUs + WindowUs).as("hi"))
    rangeJoin(clicks, windows, pointCol = "t", loCol = "lo", hiCol = "hi",
        granule = WindowUs)
      .select(col("click_id"), col("purchase_id"), col("t").as("ts_us"), col("lo").as("lo_us"))
  }

  private val q32Sql =
    s"""WITH p AS (SELECT event_id AS click_id, epoch_us(ts) AS t
       |           FROM events WHERE event_type = 'click'),
       |     i AS (SELECT event_id AS purchase_id, epoch_us(ts) AS lo,
       |                  epoch_us(ts) + $WindowUs AS hi
       |           FROM events WHERE event_type = 'purchase')
       |SELECT click_id, purchase_id, t AS ts_us, lo AS lo_us
       |FROM p JOIN i ON p.t >= i.lo AND p.t < i.hi""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q32_range_join", q32, Some(q32Sql))
  )
}
