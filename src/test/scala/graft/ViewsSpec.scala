package graft

import graft.oracle.{Tables, Views}
import org.apache.spark.sql.functions._

/** SQL entry point over registered fixture views. */
class ViewsSpec extends SparkSpec {

  test("every fixture table is queryable by name through spark.sql") {
    Views.register(spark, sf0001)
    Views.TableNames.foreach { t =>
      val viaSql = spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0)
      assert(viaSql == Tables.table(spark, sf0001, t).count(), s"view $t")
    }
  }

  test("a SQL aggregation matches its DataFrame twin on the same views") {
    val viaSql = Views.sql(spark, sf0001,
      """SELECT source, count(*) AS n, sum(n_chars) AS chars
        |FROM documents GROUP BY source""".stripMargin)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val viaDf = Tables.table(spark, sf0001, "documents")
      .groupBy(col("source")).agg(count(lit(1)), sum(col("n_chars")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(viaSql == viaDf)
  }

  test("the adapted logs view exposes the engine's event-time schema to SQL") {
    Views.register(spark, sf0001)
    val rows = spark.sql(
      "SELECT service, count(*) AS n FROM logs WHERE level = 'ERROR' GROUP BY service")
      .collect()
    assert(rows.nonEmpty)
    val viaDf = Tables.logs(spark, sf0001).filter(col("level") === "ERROR")
      .groupBy("service").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap == viaDf)
  }

  test("a view query keeps parquet pushdown (no plan overhead from the view)") {
    Views.register(spark, sf0001)
    val p = spark.sql("SELECT l_orderkey FROM lineitem WHERE l_quantity > 49")
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity"),
      s"filter must reach the scan through the view:\n$p")
  }
}
