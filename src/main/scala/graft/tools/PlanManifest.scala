package graft.tools

import graft.oracle.{Registry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Machine-readable plan-stability manifest (round-8 verdict Next #8):
  * one line per registered query counting the scale-relevant physical
  * operators — exchanges, scans, broadcasts, join strategies. PLANS.md is
  * regenerated prose for humans; this file is the diffable contract:
  * a plan regression (a new exchange, a broadcast that became a
  * sort-merge join, a cache that stopped being read) shows up as a
  * one-line `git diff` even where no hand-written PlanSpec pin exists.
  * `PlanManifestSpec` recomputes every signature live and fails on any
  * drift, naming the query and the counter.
  *
  * Counts come from the SimpleMode explain string of the lazy plan at
  * sf0.001 (AQE initial plan — operator multiplicity is partition-count
  * independent, so the signature is stable across local[4]/local[32]).
  *
  *   sbt "runMain graft.tools.PlanManifest"   # regenerate PLAN_MANIFEST.txt
  */
object PlanManifest {

  /** (counter name, substring counted in the explain output). Substrings
    * are operator names as Spark 4 prints them; counts, not positions, so
    * formatting churn across Spark versions stays survivable. */
  val Counters: Seq[(String, String)] = Seq(
    "hash_exchange" -> "Exchange hashpartitioning",
    "range_exchange" -> "Exchange rangepartitioning",
    "single_exchange" -> "Exchange SinglePartition",
    "parquet_scan" -> "Scan parquet",
    "cache_scan" -> "InMemoryTableScan",
    "rdd_scan" -> "Scan ExistingRDD",
    "broadcast" -> "BroadcastExchange",
    "bhj" -> "BroadcastHashJoin",
    "smj" -> "SortMergeJoin",
    "bnlj" -> "BroadcastNestedLoopJoin",
    "cartesian" -> "CartesianProduct",
    "reused_exchange" -> "ReusedExchange",
    "expand" -> "Expand",
    "window_op" -> "Window",
    "sort" -> "Sort ")

  private def countOcc(haystack: String, needle: String): Int = {
    var n = 0; var i = haystack.indexOf(needle)
    while (i >= 0) { n += 1; i = haystack.indexOf(needle, i + needle.length) }
    n
  }

  /** The plan signature of one DataFrame. */
  def signature(df: DataFrame): Map[String, Int] = {
    val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    Counters.map { case (name, needle) => name -> countOcc(plan, needle) }.toMap
  }

  private def fmt(name: String, sig: Map[String, Int]): String =
    name + " " + Counters.map { case (k, _) => s"$k=${sig(k)}" }.mkString(" ")

  /** All registered queries' signatures at `sfDir`, in name order, with
    * the keyed-persist registry cleared before each so one query's
    * persisted frames can't leak into the next plan. */
  def lines(spark: SparkSession, sfDir: String): Seq[String] =
    Registry.all.sortBy(_.name).map { q =>
      Tables.releasePersisted()
      spark.catalog.clearCache()
      val line = fmt(q.name, signature(q.run(spark, sfDir)))
      line
    }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = lines(spark, "/root/testdata/sf0.001")
    java.nio.file.Files.write(java.nio.file.Paths.get("PLAN_MANIFEST.txt"),
      (header ++ out).mkString("", "\n", "\n").getBytes("UTF-8"))
    println(s"[manifest] wrote PLAN_MANIFEST.txt (${out.size} queries)")
    spark.stop()
  }

  val header: Seq[String] = Seq(
    "# Plan-stability manifest: one line per registered query, counting",
    "# scale-relevant physical operators in the sf0.001 lazy plan.",
    "# Regenerate: sbt \"runMain graft.tools.PlanManifest\"  (after an",
    "# INTENDED plan change; PlanManifestSpec fails on unintended drift).")
}
