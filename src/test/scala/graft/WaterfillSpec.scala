package graft

import graft.ops.Waterfill
import org.apache.spark.sql.functions._

/** Mixture-budget waterfilling (q100). */
class WaterfillSpec extends SparkSpec {

  private def census(rows: Seq[(String, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("source", "capacity", "weight")
  }

  private def run(rows: Seq[(String, Long, Long)], budget: Long) =
    Waterfill.waterfillOf(census(rows), budget).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getBoolean(4))).toMap

  test("small source saturates, big sources split the rest by weight") {
    // B=100, uniform weights: fair share 33⅓ each; s1 (cap 10) saturates,
    // water level rises to (100-10)/2 = 45 for the other two
    val out = run(Seq(("s1", 10L, 1L), ("s2", 200L, 1L), ("s3", 200L, 1L)), 100L)
    assert(out("s1") == (10L, true))
    assert(out("s2") == (45L, false) && out("s3") == (45L, false))
  }

  test("budget >= total capacity caps everyone at capacity") {
    val out = run(Seq(("a", 5L, 1L), ("b", 7L, 3L)), 1000L)
    assert(out("a") == (5L, true) && out("b") == (7L, true))
  }

  test("weights skew the split; nobody exceeds capacity; budget never overshoots") {
    val rows = Seq(("a", 50L, 1L), ("b", 500L, 3L), ("c", 30L, 2L), ("d", 1000L, 1L))
    val budget = 600L
    val got = Waterfill.waterfillOf(census(rows), budget).collect()
    val byS = got.map(r => r.getString(0) -> r.getLong(3)).toMap
    rows.foreach { case (s, cap, _) => assert(byS(s) <= cap, s"$s over capacity") }
    val spent = byS.values.sum
    assert(spent <= budget && budget - spent < rows.length,
      s"allocated $spent of $budget (remainder must be < |sources|)")
    // brute-force the water level on doubles and sanity-compare shape:
    // c (ratio 15) caps first, then a (50); b,d split the rest 3:1
    assert(got.filter(_.getBoolean(4)).map(_.getString(0)).toSet == Set("a", "c"))
    assert(byS("b") == (600L - 80L) * 3 / 4 && byS("d") == (600L - 80L) / 4)
  }

  test("q100 fixture binding: allocations within capacity, uniform weights") {
    val out = Waterfill.q100(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1), "allocation <= capacity")
      assert(r.getLong(2) == 1L)
      val fill = r.getAs[Long]("fill_bp")
      assert(fill >= 0 && fill <= 10000)
    }
  }
}
