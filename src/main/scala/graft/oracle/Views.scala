package graft.oracle

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry point (SURVEY §3.4, entry point 2): register the fixture
  * tables — and the schema-adapted `logs` view — as temp views so the
  * whole surface is reachable through `spark.sql(...)`. The reference has
  * no SQL text entry at all (SURVEY §2.6); the rebuild gets one for free
  * from Catalyst, and this registrar is the one line of glue a SQL user
  * needs before `SELECT ... FROM lineitem` works against the same parquet
  * the programmatic queries read (same scans, same pushdown — a view adds
  * no plan overhead).
  *
  * `logs` is registered alongside the raw tables because it is the
  * schema-adaptive face of `events` (ts encoding drifts across fixture
  * regens, TESTDATA.md) — SQL users should join/filter against `logs`
  * exactly like the engine's own pipelines do.
  */
object Views {

  val TableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Registers every fixture table plus the adapted `logs` view. */
  def register(spark: SparkSession, sfDir: String): Unit = {
    TableNames.foreach { t =>
      Tables.table(spark, sfDir, t).createOrReplaceTempView(t)
    }
    Tables.logs(spark, sfDir).createOrReplaceTempView("logs")
  }

  /** Convenience: register then run one SQL text. */
  def sql(spark: SparkSession, sfDir: String, query: String): DataFrame = {
    register(spark, sfDir)
    spark.sql(query)
  }
}
