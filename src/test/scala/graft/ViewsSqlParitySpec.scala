package graft

import graft.oracle.{Registry, Views}
import org.apache.spark.sql.DataFrame

/** SQL-surface parity (SURVEY §3.4 entry point 2): the advertised
  * `spark.sql` entry point is a TESTED contract, not just a view
  * registrar — five representative registered queries re-expressed as
  * plain SQL text over the [[Views]]-registered tables must return
  * row-identical results to their DataFrame forms. Covers one query per
  * family: core agg + filter pushdown (q01), exact dedup (q11),
  * snowflake join (q46), broadcast join + decimal discipline (q47),
  * window functions over the adaptive `events` face (q92).
  */
class ViewsSqlParitySpec extends SparkSpec {

  private def assertParity(name: String, sqlText: String): Unit = {
    Views.register(spark, sf0001)
    val viaSql = spark.sql(sqlText)
    val viaDf = Registry.byName(name).run(spark, sf0001)
    assert(viaSql.columns.sorted.sameElements(viaDf.columns.sorted),
      s"$name: column sets differ (${viaSql.columns.toSeq} vs ${viaDf.columns.toSeq})")
    val aligned: DataFrame = viaSql.select(viaDf.columns.map(org.apache.spark.sql.functions.col): _*)
    val diff = aligned.except(viaDf).count() + viaDf.except(aligned).count()
    assert(diff == 0, s"$name: SQL text and DataFrame form disagree on $diff rows")
    assert(viaDf.count() > 0, s"$name: parity must compare non-empty results")
  }

  test("q01 pricing summary: SQL text == DataFrame form") {
    assertParity("q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |       sum(l_quantity) AS sum_qty,
        |       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
        |       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       round(avg(l_extendedprice), 4) AS avg_price,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= CAST('1998-09-02' AS TIMESTAMP_NTZ)
        |GROUP BY l_returnflag, l_linestatus""".stripMargin)
  }

  test("q11 exact dedup: SQL text == DataFrame form") {
    assertParity("q11_dedup_exact",
      """WITH d AS (SELECT doc_id, sha2(text, 256) AS content_hash FROM documents),
        |g AS (SELECT content_hash, count(*) AS group_size, min(doc_id) AS keep_id
        |      FROM d GROUP BY content_hash)
        |SELECT d.doc_id, d.content_hash, g.group_size,
        |       CAST(d.doc_id <> g.keep_id AS INT) AS is_dup
        |FROM d JOIN g ON d.content_hash = g.content_hash""".stripMargin)
  }

  test("q46 snowflake revenue: SQL text == DataFrame form") {
    assertParity("q46_snowflake_revenue",
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
        |GROUP BY r_name, n_name""".stripMargin)
  }

  test("q47 promo share: SQL text == DataFrame form") {
    assertParity("q47_promo_share",
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
        |GROUP BY p_brand""".stripMargin)
  }

  test("q92 event transitions (window functions): SQL text == DataFrame form") {
    // a SQL user on the current fixture encoding writes unix_micros over
    // the NTZ ts; FixtureSchemaSpec pins that encoding, so drift fails
    // loudly there first
    assertParity("q92_event_transitions",
      """WITH e AS (
        |  SELECT user_id, event_id, event_type AS to_type,
        |         unix_micros(CAST(ts AS TIMESTAMP)) AS t
        |  FROM events),
        |lagged AS (
        |  SELECT to_type,
        |         lag(to_type, 1) OVER (PARTITION BY user_id ORDER BY t, event_id) AS from_type
        |  FROM e),
        |edges AS (
        |  SELECT from_type, to_type, count(*) AS n
        |  FROM lagged WHERE from_type IS NOT NULL
        |  GROUP BY from_type, to_type)
        |SELECT from_type, to_type, n,
        |       (n * 10000) div sum(n) OVER (PARTITION BY from_type) AS share_bp
        |FROM edges""".stripMargin)
  }
}
