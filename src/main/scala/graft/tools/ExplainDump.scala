package graft.tools

import org.apache.spark.sql.SparkSession

/** Optimization-round evidence tool: write `.explain("formatted")` of
  * named registered queries to files (`plans/rNN/<query>_<tag>.txt`), so
  * before/after plan claims in OPTIMIZATION_rNN.md are checkable without
  * running Spark.
  *
  * Usage: runMain graft.tools.ExplainDump <outDir> <tag> <q1,q2,...>
  * (query names match by exact-or-`_`-prefix, the NameFilter rule). */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ExplainDump <outDir> <tag> <q1,q2,...>")
    val outDir = new java.io.File(args(0))
    outDir.mkdirs()
    val tag = args(1)
    val only = Some(args(2).split(",").toSeq)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // r16 optimization (guide §2.2/§6): let AQE re-derive CACHED plan
      // output partitioning from measured bytes. Off (the default) every
      // swapPersist'd census frame materializes with the raw
      // spark.sql.shuffle.partitions layout, so each of its readers pays
      // a fixed-partition-count map stage regardless of size (measured
      // q156 at sf0.1: 1850 tasks/run vs 82 with the conf on); on, the
      // cache's partitioning tracks data volume at ANY scale — the
      // scale-adaptive posture the optimization brief asks for.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      // r16 optimization (guide §2.2): AQE coalesce target, parameterised
      // (scale-dependent — the brief's rule). Local default 2m: at bench
      // scale the corpus-sized cached frames (a few MB) keep real
      // parallelism for their compute-dense window/JSON passes (with the
      // 64m default the cache-final stage coalesces them to ONE task —
      // measured 2.2 s serial on q166's item-event frame) while census-
      // grain frames still collapse to single-task stages. At production
      // scale set SPARK_GRAFT_ADVISORY_PARTITION_BYTES to 64m–256m so
      // shuffle blocks stay large (guide §2.2's block-count argument).
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", "2m"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.oracle.Registry.all
      .filter(q => graft.NameFilter.selected(only, q.name))
      .foreach { q =>
        val df = q.run(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val f = new java.io.File(outDir, s"${q.name}_$tag.txt")
        val w = new java.io.PrintWriter(f)
        try w.write(txt) finally w.close()
        println(s"[explain] wrote $f (${txt.length} chars)")
        graft.oracle.Tables.releasePersisted()
        spark.catalog.clearCache()
      }
    spark.stop()
  }
}
