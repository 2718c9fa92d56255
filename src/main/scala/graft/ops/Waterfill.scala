package graft.ops

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mixture-budget waterfilling (q100) — allocate a token budget B across
  * sources proportional to target mixture weights, CAPPED by what each
  * source actually has, with the excess redistributed to uncapped sources
  * (classic waterfilling). This is the allocator behind every "mix
  * sources at ratio w under budget B" training recipe: naive proportional
  * allocation over-asks small sources and silently under-uses the budget;
  * waterfilling finds the exact water level t where sources with
  * capacity/weight ≤ t saturate and the rest take wᵢ·t.
  *
  * Closed form on the |sources| census (no iteration): sort by the
  * saturation ratio cᵢ/wᵢ ascending; a source is capped iff its ratio ≤
  * the water level given everything before it is capped —
  * cᵢ·(W−W_{i−1}) ≤ (B−C_{i−1})·wᵢ in cross-multiplied integer form (no
  * division in the predicate). The cap set is a PREFIX of that order, so
  * one cumulative window + one 1-row census (the last capped prefix)
  * decide every row. Uncapped allocation floors wᵢ·(B−C_K)/(W−W_K);
  * the ≤|uncapped| remainder stays unallocated (documented, exact).
  *
  * Shape: ONE corpus aggregation to the (source) census; windows and the
  * threshold census run on |sources| rows. All integer → oracle-exact.
  */
object Waterfill {

  /** General form over a (source, capacity, weight) census frame.
    * Returns (source, capacity, weight, allocation, capped, fill_bp). */
  def waterfillOf(census: DataFrame, budget: Long): DataFrame = {
    val w = Window.orderBy(col("ratio_c"), col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ratio as an exact rational (c, w) pair; order by c/w ≡ order by
    // the cross-multiplied key only if comparable — use integer-scaled
    // ratio for ordering (1e6 grain) with source tiebreak: allocation
    // math itself never divides by this, so the grain only orders ties
    val ranked = census
      .withColumn("ratio_c", expr("(capacity * 1000000) div weight"))
      .withColumn("cum_c", sum(col("capacity")).over(w))
      .withColumn("cum_w", sum(col("weight")).over(w))
    val tot = ranked.agg(
      sum(col("capacity")).as("tot_c"), sum(col("weight")).as("tot_w"))
    val flagged = ranked.crossJoin(broadcast(tot))
      // capped iff c_i*(W - W_{i-1}) <= (B - C_{i-1})*w_i, prefix-closed
      .withColumn("capped", expr(
        s"capacity * (tot_w - (cum_w - weight)) <= ($budget - (cum_c - capacity)) * weight"))
    val thr = Tables.swapPersist("q100_flagged", flagged)
    val lvl = thr.agg(
      coalesce(sum(when(col("capped"), col("capacity"))), lit(0L)).as("cap_c"),
      coalesce(sum(when(col("capped"), col("weight"))), lit(0L)).as("cap_w"))
    thr.crossJoin(broadcast(lvl))
      .withColumn("allocation", expr(
        s"""CASE WHEN capped THEN capacity
           |     WHEN tot_w - cap_w = 0 THEN CAST(0 AS BIGINT)
           |     ELSE (weight * ($budget - cap_c)) div (tot_w - cap_w) END""".stripMargin))
      .select(col("source"), col("capacity"), col("weight"),
        col("allocation"), col("capped"),
        expr("CASE WHEN capacity = 0 THEN 0 ELSE (allocation * 10000) div capacity END").as("fill_bp"))
  }

  // ---------------------------------------------------------------- q100
  /** Fixture binding: capacity = Σ n_chars per source, uniform target
    * mixture (weight 1), budget = half the corpus. */
  def q100(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.table(spark, sfDir, "documents")
    val census = docs.groupBy(col("source"))
      .agg(sum(col("n_chars")).as("capacity"))
      .withColumn("weight", lit(1L))
    // integer halving on both engines (a double path would round vs
    // truncate differently at the cast); empty corpus sums to NULL →
    // budget 0 keeps the operator total (EmptyInputSpec contract)
    val row = docs.agg(expr("sum(n_chars) div 2")).collect()(0)
    val budget = if (row.isNullAt(0)) 0L else row.getLong(0)
    waterfillOf(census, budget)
  }

  /** Oracle needs the SAME budget the Spark side computed; q100's budget
    * is total/2 — derivable in SQL, so inline it as a CTE. */
  private val q100Sql =
    """WITH census AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS capacity,
      |                       CAST(1 AS BIGINT) AS weight
      |                FROM documents GROUP BY source),
      |b AS (SELECT CAST(sum(n_chars) // 2 AS BIGINT) AS budget FROM documents),
      |rk AS (SELECT census.*, budget,
      |              (capacity * 1000000) // weight AS ratio_c,
      |              sum(capacity) OVER (ORDER BY (capacity * 1000000) // weight, source
      |                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c,
      |              sum(weight) OVER (ORDER BY (capacity * 1000000) // weight, source
      |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w,
      |              sum(capacity) OVER () AS tot_c,
      |              sum(weight) OVER () AS tot_w
      |       FROM census CROSS JOIN b),
      |fl AS (SELECT *,
      |              capacity * (tot_w - (cum_w - weight)) <= (budget - (cum_c - capacity)) * weight AS capped
      |       FROM rk),
      |lvl AS (SELECT CAST(coalesce(sum(CASE WHEN capped THEN capacity END), 0) AS BIGINT) AS cap_c,
      |               CAST(coalesce(sum(CASE WHEN capped THEN weight END), 0) AS BIGINT) AS cap_w
      |        FROM fl),
      |a AS (SELECT fl.*, lvl.cap_c, lvl.cap_w,
      |             CASE WHEN capped THEN capacity
      |                  WHEN tot_w - cap_w = 0 THEN CAST(0 AS BIGINT)
      |                  ELSE (weight * (budget - cap_c)) // (tot_w - cap_w) END AS allocation
      |      FROM fl CROSS JOIN lvl)
      |SELECT source, capacity, weight, CAST(allocation AS BIGINT) AS allocation, capped,
      |       CAST(CASE WHEN capacity = 0 THEN 0
      |            ELSE (allocation * 10000) // capacity END AS BIGINT) AS fill_bp
      |FROM a""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q100_mixture_waterfill", q100, Some(q100Sql))
  )
}
