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

  test("q143 hand case: transitive chain fuses into one entity; singleton stays itself") {
    // within block "rod": aa↔ab (dist 1) and ab↔zz (dist 2) chain — even
    // though dist(aa,zz)=2 also pairs directly, the ENTITY is the
    // transitive closure either way, canonical = lexicographic min.
    // "qq tube" never pairs → its own entity. Multiplicities price the
    // merge: row_mass sums rows, not names.
    val rows = FuzzyMatch.entityResolutionOf(
      named("aa rod", "aa rod", "ab rod", "zz rod", "qq tube"), "p_name")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows == Map(
      "aa rod" -> (3L, 4L), // 3 names, 2+1+1 rows
      "qq tube" -> (1L, 1L)), s"got $rows")
  }

  test("q143 blocking scopes transitivity: chains cannot cross blocks") {
    // "blue rod" and "blue rim" are dist 2 but different blocks — they
    // must land in DIFFERENT entities even though a blind transitive
    // closure over raw edit distance would merge them
    val rows = FuzzyMatch.entityResolutionOf(
      named("blue rod", "bl_e rod", "blue rim"), "p_name")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("bl_e rod" -> 2L, "blue rim" -> 1L), s"got $rows")
  }

  test("q143 census conservation on the fixture: names and rows fully partitioned") {
    val parts = graft.oracle.Tables.table(spark, sf0001, "part")
    val ents = FuzzyMatch.q143(spark, sf0001).collect()
    val totalNames = parts.select("p_name").distinct().count()
    val totalRows = parts.count()
    assert(ents.map(_.getLong(1)).sum == totalNames,
      "every distinct name belongs to exactly one entity")
    assert(ents.map(_.getLong(2)).sum == totalRows,
      "row_mass partitions the part table exactly")
    // reconciliation with q140: every paired name sits in a multi-name
    // entity, so multi-name mass ≥ the paired-name count
    val paired = FuzzyMatch.q140(spark, sf0001)
      .select("name_a").union(FuzzyMatch.q140(spark, sf0001).select("name_b"))
      .distinct().count()
    val multiMass = ents.filter(_.getLong(1) >= 2L).map(_.getLong(1)).sum
    assert(multiMass == paired,
      s"multi-name entities must contain exactly the q140-paired names: $multiMass vs $paired")
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
