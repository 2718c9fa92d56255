package graft

import graft.ops.ZOrder
import org.apache.spark.sql.functions._

/** Z-order layout (q95): the Morton interleave must match the bit-level
  * definition, and the audit must cover every row exactly once. */
class ZOrderSpec extends SparkSpec {

  /** Reference Morton: interleave bits of a (even positions) and b (odd). */
  private def morton(a: Int, b: Int): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1).toLong << (2 * i)) | (((b >> i) & 1).toLong << (2 * i + 1))
    }

  test("shift/mask ladder == bit-level Morton interleave") {
    import spark.implicits._
    val cases = Seq((0, 0), (1, 0), (0, 1), (3, 5), (65535, 0), (0, 65535),
      (65535, 65535), (12345, 54321), (40000, 1))
    val df = cases.toDF("a", "b")
    val got = ZOrder.withZ(df, col("a").cast("long"), col("b").cast("long"))
      .select(col("a"), col("b"), col("zval")).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    cases.foreach { case (a, b) =>
      assert(got((a, b)) == morton(a, b), s"morton($a,$b)")
    }
  }

  test("q95 audit: buckets in range, rows fully covered, spans sane") {
    val out = ZOrder.q95(spark, sf0001).collect()
    val total = graft.oracle.Tables.table(spark, sf0001, "lineitem").count()
    assert(out.map(_.getAs[Long]("n_rows")).sum == total)
    out.foreach { r =>
      val bucket = r.getAs[Long]("bucket")
      assert(bucket >= 0 && bucket < ZOrder.Buckets)
      assert(r.getAs[Long]("pk_min") <= r.getAs[Long]("pk_max"))
      assert(r.getAs[Long]("span_product") >= 1)
    }
  }

  test("z-layout localizes both dimensions vs single-key sort (skipping audit)") {
    // On a z-layout, the AVERAGE per-bucket span product must beat the
    // single-key layout's: sorting by l_partkey alone leaves l_suppkey
    // unconstrained (span ≈ full domain) in every bucket.
    val li = graft.oracle.Tables.table(spark, sf0001, "lineitem")
      .select("l_partkey", "l_suppkey")
    val zAvg = ZOrder.q95(spark, sf0001)
      .agg(avg(col("span_product"))).collect()(0).getDouble(0)
    val singleAvg = li
      .withColumn("bucket", ntile(ZOrder.Buckets).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("l_partkey"), col("l_suppkey"))))
      .groupBy("bucket")
      .agg(expr("(max(l_partkey) - min(l_partkey) + 1) * (max(l_suppkey) - min(l_suppkey) + 1)").as("sp"))
      .agg(avg(col("sp"))).collect()(0).getDouble(0)
    assert(zAvg < singleAvg,
      s"z-order avg span product $zAvg should beat single-key $singleAvg")
  }

  test("layoutBy emits a range exchange on zval (write-path shape)") {
    val li = graft.oracle.Tables.table(spark, sf0001, "lineitem")
      .select("l_partkey", "l_suppkey")
    val plan = ZOrder.layoutBy(li, "l_partkey", "l_suppkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning(zval"), plan)
  }
}
