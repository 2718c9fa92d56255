package graft.ops

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout (q95) — the multi-column clustering
  * primitive behind data-skipping at 100 TB (Delta/Iceberg `OPTIMIZE
  * ZORDER BY`): interleave the bits of two rank-quantized keys so rows
  * close in EITHER dimension land in the same file bucket, then audit the
  * layout by reporting each bucket's per-dimension min/max span. A table
  * laid out this way lets a scan prune on `l_partkey` AND `l_suppkey`
  * predicates simultaneously from one sort order — the thing a single-key
  * sort cannot do. Reference has no layout ops at all (it never persists);
  * this is a rebuild-side scale citizen like q37's bucketing.
  *
  * Shape: min/max census (1 row, broadcast) → pure map-side quantize +
  * bit-spread (integer shifts/masks inside whole-stage codegen) → ONE
  * exchange on the 64-key bucket grain with map-side partial agg. The
  * write-path API [[layoutBy]] range-partitions + sorts by the same z value
  * — the audit and the layout share the curve definition.
  *
  * Engine-exactness: quantization is integer (`(x−min)·65535 div range`),
  * the Morton spread is the classic shift/mask ladder (identical `<<`,
  * `&`, `|` semantics on BIGINT in Spark and DuckDB), so every output cell
  * is integer-exact.
  */
object ZOrder {

  val Buckets = 64 // top 6 bits of the 32-bit z value

  /** One shift/mask spread step per CTE level keeps the expression tree
    * linear (nesting the whole ladder would copy the quantize expr 16×). */
  private val SpreadSteps = Seq(
    (8, 16711935L), (4, 252645135L), (2, 858993459L), (1, 1431655765L))

  /** Map-side z-value for two pre-quantized 16-bit columns, built stepwise
    * via select chains on `df`. Returns df + `zval` column. */
  def withZ(df: DataFrame, qa: Column, qb: Column): DataFrame = {
    var out = df.withColumn("_a", qa).withColumn("_b", qb)
    SpreadSteps.foreach { case (sh, mask) =>
      out = out
        .withColumn("_a", expr(s"(_a | shiftleft(_a, $sh)) & $mask"))
        .withColumn("_b", expr(s"(_b | shiftleft(_b, $sh)) & $mask"))
    }
    out.withColumn("zval", expr("_a | shiftleft(_b, 1)")).drop("_a", "_b")
  }

  /** 16-bit rank quantization against a broadcast 1-row min/max census. */
  def quantized(df: DataFrame, colA: String, colB: String): DataFrame = {
    val mm = df.agg(
      min(col(colA)).as("amin"), max(col(colA)).as("amax"),
      min(col(colB)).as("bmin"), max(col(colB)).as("bmax"))
    val q = df.crossJoin(broadcast(mm))
      .withColumn("qa", expr(
        s"(($colA - amin) * 65535) div (CASE WHEN amax > amin THEN amax - amin ELSE 1 END)"))
      .withColumn("qb", expr(
        s"(($colB - bmin) * 65535) div (CASE WHEN bmax > bmin THEN bmax - bmin ELSE 1 END)"))
    withZ(q, col("qa"), col("qb")).drop("amin", "amax", "bmin", "bmax", "qa", "qb")
  }

  /** Write-path layout: range-partition + sort by the Morton value — the
    * producer side of the audit below (same curve, same bucket count). */
  def layoutBy(df: DataFrame, colA: String, colB: String,
               buckets: Int = Buckets): DataFrame = {
    val z = quantized(df, colA, colB)
    z.repartitionByRange(buckets, col("zval")).sortWithinPartitions(col("zval"))
  }

  // ---------------------------------------------------------------- q95
  /** Per-bucket locality audit of the z-layout over (l_partkey, l_suppkey):
    * n_rows plus each dimension's min/max/span — the data-skipping quality
    * surface (small spans in BOTH dims = prunable buckets). */
  def q95(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.table(spark, sfDir, "lineitem").select("l_partkey", "l_suppkey")
    quantized(li, "l_partkey", "l_suppkey")
      .withColumn("bucket", expr(s"zval div ${1L << 26}"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("pk_min"), max(col("l_partkey")).as("pk_max"),
        min(col("l_suppkey")).as("sk_min"), max(col("l_suppkey")).as("sk_max"))
      .select(col("bucket"), col("n_rows"),
        col("pk_min"), col("pk_max"), col("sk_min"), col("sk_max"),
        expr("(pk_max - pk_min + 1) * (sk_max - sk_min + 1)").as("span_product"))
  }

  private val q95Sql = {
    val steps = SpreadSteps.zipWithIndex.map { case ((sh, mask), i) =>
      val (pa, pb) = (s"a$i", s"b$i")
      val (na, nb) = (s"a${i + 1}", s"b${i + 1}")
      s"s${i + 1} AS (SELECT *, ($pa | ($pa << $sh)) & $mask AS $na, ($pb | ($pb << $sh)) & $mask AS $nb FROM s$i)"
    }.mkString(",\n")
    s"""WITH mm AS (SELECT min(l_partkey) AS amin, max(l_partkey) AS amax,
       |                   min(l_suppkey) AS bmin, max(l_suppkey) AS bmax FROM lineitem),
       |s0 AS (SELECT l_partkey, l_suppkey,
       |              ((l_partkey - amin) * 65535) // (CASE WHEN amax > amin THEN amax - amin ELSE 1 END) AS a0,
       |              ((l_suppkey - bmin) * 65535) // (CASE WHEN bmax > bmin THEN bmax - bmin ELSE 1 END) AS b0
       |       FROM lineitem CROSS JOIN mm),
       |$steps,
       |z AS (SELECT l_partkey, l_suppkey, (a4 | (b4 << 1)) // ${1L << 26} AS bucket FROM s4)
       |SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
       |       min(l_partkey) AS pk_min, max(l_partkey) AS pk_max,
       |       min(l_suppkey) AS sk_min, max(l_suppkey) AS sk_max,
       |       (max(l_partkey) - min(l_partkey) + 1) * (max(l_suppkey) - min(l_suppkey) + 1) AS span_product
       |FROM z GROUP BY bucket""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q95_zorder_layout", q95, Some(q95Sql))
  )
}
