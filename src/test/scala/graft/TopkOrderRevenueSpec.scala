package graft

import graft.oracle.{OlapQueries, Registry, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TPC-H Q3-style bounded top-k join revenue (q115). */
class TopkOrderRevenueSpec extends SparkSpec {

  test("q115 equals the window-rank formulation, rank-for-rank") {
    val got = Registry.byName("q115_topk_order_revenue").run(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val cust = Tables.table(spark, sf0001, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.table(spark, sf0001, "orders")
      .filter(expr("o_orderdate < CAST('1995-03-15' AS TIMESTAMP_NTZ)"))
    val li = Tables.table(spark, sf0001, "lineitem")
      .filter(expr("l_shipdate > CAST('1995-03-15' AS TIMESTAMP_NTZ)"))
    val brute = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"))
      .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,6)")), 2).cast("double").as("revenue"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("revenue").desc, col("o_orderkey"))))
      .filter(col("rank") <= 10)
      .collect().map(r => (r.getAs[Int]("rank").toLong, r.getAs[Long]("o_orderkey"),
        r.getAs[Double]("revenue")))
    assert(got.sortBy(_._1).toSeq == brute.sortBy(_._1).toSeq)
    assert(got.nonEmpty && got.length <= 10)
  }
}
