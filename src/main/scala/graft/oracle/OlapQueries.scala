package graft.oracle

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classic OLAP shapes over the TPC-H-ish fixture dims the streaming surface
  * never touches (`region`/`nation`/`supplier`/`part`) — the snowflake-join
  * and promo-share patterns every warehouse query mix contains, expressed
  * the way a 100 TB Spark plan wants them: ONE shuffle join on the fact's
  * key, every dimension broadcast (dims are bounded by construction:
  * 5 regions, 25 nations, |suppliers| ≪ |lineitem|), money math in
  * DECIMAL(18,6) so sums are order-independent across engines (q01 note).
  */
object OlapQueries {

  // ---------------------------------------------------------------- q46
  /** TPC-H Q5-style "local supplier" revenue by region/nation: revenue from
    * lineitems whose customer and supplier sit in the SAME nation, rolled up
    * the nation→region snowflake. Plan: lineitem⋈orders is the only shuffle
    * join; customer/supplier/nation⋈region all broadcast; the local-supplier
    * predicate is applied as a post-join filter on two broadcast columns. */
  def q46(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.table(spark, sfDir, "lineitem")
    val ord = Tables.table(spark, sfDir, "orders")
    val cust = Tables.table(spark, sfDir, "customer")
    val sup = Tables.table(spark, sfDir, "supplier")
    val natRegion = Tables.table(spark, sfDir, "nation")
      .join(broadcast(Tables.table(spark, sfDir, "region")),
        col("n_regionkey") === col("r_regionkey"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(natRegion), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,6)")), 2).cast("double").as("revenue"),
        count(lit(1)).as("n_items"),
        countDistinct(col("o_custkey")).as("n_customers"))
  }

  private val q46Sql =
    """SELECT r_name, n_name,
      |       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
      |       count(*) AS n_items,
      |       count(DISTINCT o_custkey) AS n_customers
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE c_nationkey = s_nationkey
      |GROUP BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------- q47
  /** TPC-H Q14-style promo revenue share per brand: fraction of each
    * brand's revenue coming from PROMO-type parts. `part` broadcast against
    * the fact scan — zero shuffle before the per-brand rollup. The share is
    * a floor-truncated 4-dp ratio of the two DECIMAL sums cast to double
    * (exact decimals → identically-rounded doubles → identical floor on
    * both engines; round() would disagree on half-boundaries). */
  def q47(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.table(spark, sfDir, "lineitem")
    val part = Tables.table(spark, sfDir, "part")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,6)")).as("total_dec"),
        sum(when(col("p_type") === "PROMO",
            (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,6)"))
          .otherwise(lit(0).cast("decimal(18,6)"))).as("promo_dec"),
        count(lit(1)).as("n_items"))
      .select(
        col("p_brand"),
        round(col("total_dec"), 2).cast("double").as("total_revenue"),
        round(col("promo_dec"), 2).cast("double").as("promo_revenue"),
        (floor(col("promo_dec").cast("double") / col("total_dec").cast("double") * 10000) / 10000)
          .as("promo_share"),
        col("n_items"))
  }

  private val q47Sql =
    """SELECT p_brand,
      |       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue,
      |       CAST(round(sum(CASE WHEN p_type = 'PROMO'
      |                           THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
      |                           ELSE CAST(0 AS DECIMAL(18,6)) END), 2) AS DOUBLE) AS promo_revenue,
      |       floor(CAST(sum(CASE WHEN p_type = 'PROMO'
      |                           THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
      |                           ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
      |             / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
      |             * 10000) / 10000 AS promo_share,
      |       count(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand""".stripMargin

  // ---------------------------------------------------------------- q115
  /** TPC-H Q3-style top-10 unshipped-order revenue — global top-k WITHOUT
    * a global sort: customer (segment-filtered) broadcasts, lineitem ⋈
    * orders is the one shuffle join, the per-order rollup REUSES the
    * join's orderkey partitioning (no second exchange), and the global
    * top-10 reduces through the bounded [[graft.agg.TopK]] aggregator —
    * ≤ k rows per partition cross the wire instead of a
    * rangepartition+sort of every qualifying order. Ties (equal 2-dp
    * revenue) break to the lower orderkey in both engines. */
  def q115(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.agg.TopK
    val cust = Tables.table(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.table(spark, sfDir, "orders")
      .filter(expr("o_orderdate < CAST('1995-03-15' AS TIMESTAMP_NTZ)"))
    val li = Tables.table(spark, sfDir, "lineitem")
      .filter(expr("l_shipdate > CAST('1995-03-15' AS TIMESTAMP_NTZ)"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"))
      .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,6)")), 2).cast("double").as("revenue"))
      .agg(TopK(10)(col("revenue"), col("o_orderkey")).as("top"))
      .select(posexplode(col("top")).as(Seq("i", "t")))
      .select((col("i") + 1).cast("long").as("rank"),
        col("t.id").as("o_orderkey"), col("t.score").as("revenue"))
  }

  private val q115Sql =
    """WITH r AS (
      |  SELECT o_orderkey,
      |         CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment = 'BUILDING'
      |    AND o_orderdate < TIMESTAMP '1995-03-15'
      |    AND l_shipdate > TIMESTAMP '1995-03-15'
      |  GROUP BY o_orderkey),
      |t AS (SELECT *, row_number() OVER (ORDER BY revenue DESC, o_orderkey) AS rank
      |      FROM r)
      |SELECT CAST(rank AS BIGINT) AS rank, o_orderkey, revenue
      |FROM t WHERE rank <= 10""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q46_snowflake_revenue", q46, Some(q46Sql)),
    QueryDef("q47_promo_share", q47, Some(q47Sql)),
    QueryDef("q115_topk_order_revenue", q115, Some(q115Sql))
  )
}
