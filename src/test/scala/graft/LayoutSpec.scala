package graft

import graft.ops.Layout
import graft.oracle.Tables
import org.apache.spark.sql.functions._

/** Bucketed-layout contract: a join between two tables co-bucketed on the
  * key plans without any Exchange — the write-once/join-free-forever layout
  * for repeated big-table joins (see [[graft.ops.Layout]]). */
class LayoutSpec extends SparkSpec {

  test("co-bucketed join on the key is exchange-free and result-identical") {
    val orders = Tables.table(spark, sf0001, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.table(spark, sf0001, "lineitem").select("l_orderkey", "l_quantity")
    Layout.writeBucketed(orders, "orders_b", buckets = 8, key = "o_orderkey")
    Layout.writeBucketed(lineitem, "lineitem_b", buckets = 8, key = "l_orderkey")

    // force the shuffle question: no broadcast escape hatch
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"co-bucketed join still shuffles:\n$plan")

      val plain = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      assert(joined.count() == plain.count())
      val a = joined.agg(sum(col("l_quantity") * col("o_totalprice"))).head.getDouble(0)
      val b = plain.agg(sum(col("l_quantity") * col("o_totalprice"))).head.getDouble(0)
      // double summation order differs across layouts; compare relatively
      assert(math.abs(a - b) <= 1e-9 * math.max(math.abs(a), math.abs(b)))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("aggregation on the bucket key reuses the layout (no exchange before the agg)") {
    val plan = spark.table("lineitem_b").groupBy("l_orderkey")
      .agg(sum("l_quantity")).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed agg still shuffles:\n$plan")
  }
}
