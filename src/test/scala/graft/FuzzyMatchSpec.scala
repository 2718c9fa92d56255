package graft

import graft.ext.FuzzyMatch
import org.apache.spark.sql.execution.SimpleMode

/** q140 blocked fuzzy matching. Pins the semantics the scaladoc declares:
  * in-block typo pairs surface with exact distance and pair_mass = n_a·n_b;
  * a ≤-maxDist pair whose last tokens differ is ABSENT (the documented
  * blocking recall trade); an over-`blockCap` block is dropped BEFORE pair
  * expansion; and the physical plan pairs via an equi-join on the block
  * key — no cartesian / broadcast-nested-loop anywhere. */
class FuzzyMatchSpec extends SparkSpec {

  import spark.implicits._

  private def named(names: String*) = names.toSeq.toDF("p_name")

  test("planted typo pair in one block: distance and pair_mass arithmetic") {
    // "bold widget" on 3 rows, "cold widget" on 2: vocabulary grain does
    // the distance ONCE; multiplicities return as pair_mass = 3·2
    val rows = FuzzyMatch.fuzzyPairsOf(
      named("bold widget", "bold widget", "bold widget",
        "cold widget", "cold widget"), "p_name").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "bold widget" && r.getString(1) == "cold widget",
      "pair ordered name_a < name_b")
    assert(r.getLong(2) == 1L, "levenshtein(bold, cold) = 1")
    assert(r.getLong(3) == 3L && r.getLong(4) == 2L && r.getLong(5) == 6L,
      s"pair_mass = n_a * n_b: $r")
  }

  test("declared recall trade: close pair straddling blocks is absent") {
    // dist("blue rod","blue rim") = 2 ≤ maxDist, but last tokens differ —
    // blocking excludes it, exactly as the oracle SQL does
    val rows = FuzzyMatch.fuzzyPairsOf(named("blue rod", "blue rim"), "p_name")
    assert(rows.isEmpty)
  }

  test("exact duplicates never self-pair and dist > maxDist is excluded") {
    // "red gear" repeats → ONE vocab entry (exact dedup's job, not fuzzy
    // match's); its only block-mate sits at dist 6 > maxDist 4
    val rows = FuzzyMatch.fuzzyPairsOf(
      named("red gear", "red gear", "crimson gear"), "p_name").collect()
    assert(rows.isEmpty)
  }

  test("over-cap block is dropped before pair expansion") {
    val blocky = named(
      "aa gadget", "ab gadget", "ac gadget", "ad gadget", // 4 distinct > cap 3
      "bold widget", "cold widget")                       // 2 distinct ≤ cap
    val rows = FuzzyMatch.fuzzyPairsOf(blocky, "p_name", maxDist = 4,
      blockCap = 3L).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("bold widget", "cold widget")),
      "gadget block (4 > cap 3) must be excluded wholesale")
  }

  test("plan: block equi-join only — no cartesian, no nested loop") {
    val plan = FuzzyMatch.q140(spark, sf0001)
      .queryExecution.explainString(SimpleMode)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("fixture run: ordered pairs, dist within [1, maxDist]") {
    val rows = FuzzyMatch.q140(spark, sf0001).collect()
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getLong(2) >= 1L && r.getLong(2) <= 4L)
      assert(r.getLong(5) == r.getLong(3) * r.getLong(4))
    }
  }
}
