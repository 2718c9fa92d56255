package graft

import graft.oracle.{CoreQueries, Registry, Tables}
import org.apache.spark.sql.functions._

/** Smoke + semantics checks for the batch oracle surface at sf0.001.
  * (Full DuckDB hash-compare runs via tools/local_verify.py at sf0.01.) */
class CoreQueriesSpec extends SparkSpec {

  test("q46/q47: local-supplier revenue positive; promo share a valid sub-fraction") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val q46 = graft.oracle.OlapQueries.q46(spark, sf0001)
      .select(col("revenue"), col("n_items")).as[(Double, Long)].collect()
    assert(q46.nonEmpty && q46.forall { case (r, n) => r > 0 && n > 0 })
    val q47 = graft.oracle.OlapQueries.q47(spark, sf0001)
      .select(col("total_revenue"), col("promo_revenue"), col("promo_share"))
      .as[(Double, Double, Double)].collect()
    assert(q47.nonEmpty)
    q47.foreach { case (t, p, s) =>
      assert(p >= 0 && p <= t, s"promo $p outside [0, $t]")
      assert(s >= 0 && s <= 1 && math.abs(s - p / t) < 1e-3, s"share $s vs ${p / t}")
    }
  }

  test("every registered query runs and schema-checks at sf0.001") {
    Registry.all.foreach { q =>
      val df = q.run(spark, sf0001)
      val n = df.count()
      assert(n >= 0, s"${q.name} failed")
      assert(df.columns.nonEmpty)
    }
  }

  test("oracle SQL exists for every registered query (full coverage)") {
    // Sketch-based operators have no DuckDB-expressible oracle (driver runs
    // its rows-only check); their accuracy is pinned by ScaleOpsSpec instead.
    val sketchOnly = Set("q24_p95_approx_sketch", "q25_approx_distinct")
    val missing = Registry.all.filter(q => q.oracle.isEmpty && !sketchOnly(q.name)).map(_.name)
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("logs mapping: level derives from props.k < 10, error share ~10%") {
    val logs = Tables.logs(spark, sf0001).cache()
    val bad = logs.filter(
      (col("k") < 10 && col("level") =!= "ERROR") ||
      (col("k") >= 10 && col("level") =!= "INFO")).count()
    assert(bad == 0)
    val share = logs.filter(col("level") === "ERROR").count().toDouble / logs.count()
    assert(share > 0.05 && share < 0.20, s"error share $share")
    logs.unpersist()
  }

  test("sliding window: every event lands in exactly 2 windows") {
    val logs = Tables.logs(spark, sf0001)
    val exploded = logs
      .withColumn("w0", expr("ts_s div 86400 * 86400"))
      .withColumn("ws", explode(array(col("w0"), col("w0") - 86400)))
    assert(exploded.count() == 2 * logs.count())
    // membership invariant: ws <= ts_s < ws + 2 days
    val outside = exploded.filter(!(col("ws") <= col("ts_s") && col("ts_s") < col("ws") + 172800)).count()
    assert(outside == 0)
  }

  test("spike alerts respect both thresholds") {
    val s = CoreQueries.spikes(spark, sf0001)
    assert(s.filter(col("total_logs") < 100 || col("error_rate") < 0.02).count() == 0)
  }

  test("escalation replay: every 3rd alert per (service, session) tagged, all rows forwarded") {
    val esc = CoreQueries.escalations(spark, sf0001).cache()
    val total = esc.count()
    val errs = Tables.logs(spark, sf0001).filter(col("level") === "ERROR").count()
    assert(total == errs, "passthrough: all alerts forwarded (incident_aggregator.py:64-66)")
    val tagged = esc.filter(col("severity") === "ESCALATED")
    val badReason = esc.filter(
      (col("severity") === "ESCALATED") =!= (col("escalation_reason") === "MULTIPLE_INCIDENTS"))
    assert(badReason.count() == 0)
    assert(tagged.count() < total)
    esc.unpersist()
  }
}
