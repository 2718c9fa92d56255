package graft

import graft.ops.Transitions
import org.apache.spark.sql.functions._

class TransitionsSpec extends SparkSpec {

  test("q92: transitions follow per-user time order, never cross users") {
    import spark.implicits._
    // user 1: view -> click -> purchase; user 2: view -> view.
    // NO edge between user 1's purchase and user 2's first view.
    val ev = Seq(
      (1L, 10L, "view", 100L), (1L, 11L, "click", 200L), (1L, 12L, "purchase", 300L),
      (2L, 20L, "view", 150L), (2L, 21L, "view", 250L))
      .toDF("user_id", "event_id", "event_type", "t")
    val out = Transitions.transitionsOf(ev, col("t")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(
      ("view", "click") -> (1L, 5000L), ("click", "purchase") -> (1L, 10000L),
      ("view", "view") -> (1L, 5000L)), s"matrix: $out")
  }

  test("q92: same-timestamp ties order by event_id deterministically") {
    import spark.implicits._
    val ev = Seq(
      (1L, 2L, "b", 100L), (1L, 1L, "a", 100L), (1L, 3L, "c", 100L))
      .toDF("user_id", "event_id", "event_type", "t")
    val out = Transitions.transitionsOf(ev, col("t")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("a", "b"), ("b", "c")), s"tie order: $out")
  }

  test("q92 plan: one user-keyed window pass, totals window over the bounded edge table") {
    val df = Transitions.q92(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.sliding("Scan parquet".length).count(_ == "Scan parquet") == 1,
      s"one corpus scan:\n$p")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      s"no self-join needed for lag:\n$p")
  }
}
