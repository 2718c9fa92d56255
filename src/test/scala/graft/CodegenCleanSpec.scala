package graft

import graft.oracle.Registry

/** Codegen-clean gate over the WHOLE query surface.
  *
  * Spark's whole-stage codegen fails soft by default: a Janino
  * `CompileException` logs one line and the stage silently re-executes
  * interpreted — correct results, often 5–20× slower on the hot path, and
  * nothing in the oracle or the plan-shape pins notices (the plan string
  * still prints the codegen'd tree it intended). Exactly this happened to
  * q74: a private case class reached the generated code through a product
  * encoder and the |queries|×corpus scoring loop ran interpreted for two
  * rounds (VERDICT r7 "What's wrong" #1).
  *
  * This gate runs every registered query with
  * `spark.sql.codegen.fallback=false`, which turns the silent fallback
  * into a thrown `CompileException` — so the NEXT interpreted regression
  * fails one named test here instead of surfacing as an unexplained bench
  * outlier (the FixtureSchemaSpec pattern, applied to codegen).
  *
  * `queryExecution.toRdd` forces compilation of every whole-stage span in
  * the final plan (and, under AQE, executes the intermediate stages at
  * fixture scale — sf0.001, trivially small). Expressions that are
  * `CodegenFallback` BY DESIGN (higher-order array functions, some
  * aggregates) are untouched: they evaluate interpreted INSIDE a compiled
  * stage and never trip the whole-stage fallback this gate pins.
  */
class CodegenCleanSpec extends SparkSpec {

  test("all registered queries execute with codegen fallback disabled (no silent interpreted stage)") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val failures = Registry.all.flatMap { q =>
        try {
          q.run(spark, sf0001).queryExecution.toRdd.count()
          graft.oracle.Tables.releasePersisted()
          None
        } catch {
          case t: Throwable =>
            graft.oracle.Tables.releasePersisted()
            Some(q.name -> s"${t.getClass.getSimpleName}: ${String.valueOf(t.getMessage).linesIterator.take(2).mkString(" ").take(300)}")
        }
      }
      assert(failures.isEmpty,
        failures.map { case (n, e) => s"$n -> $e" }.mkString(
          "queries with a codegen-compilation failure (would run interpreted in production):\n", "\n", ""))
    } finally {
      spark.conf.unset("spark.sql.codegen.fallback")
      spark.catalog.clearCache()
    }
  }
}
