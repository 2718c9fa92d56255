package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every registered query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Methodology: one untimed warmup pass over the full query set at sf0.001
  * first — JIT + codegen compilation otherwise lands on whichever query runs
  * first and distorts per-query attribution (observed: 10× on the
  * first-executed query). Queries then run in sorted name order, each timed
  * TWICE back-to-back with the min reported: the shared host's CPU
  * availability swings ~2.5× between runs (BASELINE.md), and consecutive-
  * execution min removes the worst of that noise without changing what is
  * measured. Both executions are full cold-cache plans: the keyed persist
  * registry AND the cache are released after EVERY timed execution (not
  * just between queries) — Spark's CacheManager matches cache entries by
  * plan, so a re-invocation of a self-materializing query (the CC loop's
  * adopted labels, q12/q53's persisted bases) would otherwise silently
  * reuse the first execution's materialization and the min would report
  * a warm number as the query's floor. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    // warmup: full set at the smallest sf (untimed)
    queries.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
    }
    spark.catalog.clearCache() // drop warmup-pass caches
    val results = queries.map { case (name, fn) =>
      val dt = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val t = (System.nanoTime() - t0) / 1e9
        // full isolation after every execution: no keyed-registry frame or
        // cache entry survives for the next execution to reuse
        graft.oracle.Tables.releasePersisted()
        spark.catalog.clearCache()
        t
      }.min
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
