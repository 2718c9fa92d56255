package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pins Bench's failure honesty: a query that throws — at analysis OR at
  * execution — must surface as an error entry, never as an elapsed-time
  * number. (Regression guard: a fixture re-encoding once broke 13 queries
  * and their ~0.05 s fast-fail latencies were recorded as best-in-repo
  * timings.) */
class BenchSpec extends SparkSpec {

  private val ok: (SparkSession, String) => DataFrame =
    (s, _) => s.range(10).toDF("id")
  private val analysisFail: (SparkSession, String) => DataFrame =
    (s, _) => s.range(1).select(col("no_such_column"))
  // in a FILTER (not a projection): count() prunes projections, so an
  // error there would never evaluate — the filter must run
  private val boom = udf((l: Long) => { if (l >= 0) sys.error("boom"); true })
  private val execFail: (SparkSession, String) => DataFrame =
    (s, _) => s.range(1).toDF("id").filter(boom(col("id")))

  test("planted failing queries land in errors, never in timings") {
    val (timings, errors, loads) = Bench.timeQueries(spark, sf0001, Seq(
      "good" -> ok, "bad_analysis" -> analysisFail, "bad_exec" -> execFail))
    assert(timings.map(_._1) == Seq("good"))
    assert(timings.head._2 >= 0.0)
    assert(errors.map(_._1).sorted == Seq("bad_analysis", "bad_exec"))
    // the message carries the failure class, not a number
    assert(errors.forall { case (_, msg) => msg.nonEmpty })
    // every query — failed or not — gets a load sample (the adjudication
    // signal must exist precisely when a reading looks wrong)
    assert(loads.keySet == Set("good", "bad_analysis", "bad_exec"))
  }

  test("all-green query set produces no error entries") {
    val (timings, errors, _) = Bench.timeQueries(spark, sf0001, Seq(
      "a" -> ok, "b" -> ok))
    assert(timings.map(_._1) == Seq("a", "b") && errors.isEmpty)
  }

  test("a failing query short-circuits its remaining reps") {
    // construction-time counter: each rep invokes the builder once, so a
    // 5-rep run that stops on the first failure builds exactly once
    var builds = 0
    val failAtBuild: (SparkSession, String) => DataFrame =
      (s, _) => { builds += 1; s.range(1).select(col("no_such_column")) }
    val (timings, errors, _) =
      Bench.timeQueries(spark, sf0001, Seq("always_bad" -> failAtBuild), reps = 5)
    assert(timings.isEmpty && errors.map(_._1) == Seq("always_bad"))
    assert(builds == 1, s"expected 1 attempt before short-circuit, got $builds")
  }

  test("Floors covers every registered query prefix") {
    // the summary line's ratio set silently skips unfloored queries — keep
    // the table in lockstep with the registry so a new query without a
    // recorded floor is a visible test failure, not a silent coverage gap
    val missing = graft.oracle.Registry.all.map(_.name)
      .filter(n => Floors.forQuery(n).isEmpty)
    assert(missing.isEmpty, s"queries without a recorded floor: $missing")
  }
}
