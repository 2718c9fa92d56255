package graft

import graft.ext.{HardNeg, Novelty}
import org.apache.spark.sql.functions._

/** q59 n-gram novelty, q60 hard-negative mining — planted-geometry
  * semantics, NULL-negative contracts, and the maxCell kill switch. */
class MineOpsSpec extends SparkSpec {

  // ---------------------------------------------------------------- q59

  test("q59: duplicated text scores 0, unique text scores 1, partial overlap is the exact ratio") {
    import spark.implicits._
    // docs 1/2 are identical → every 3-gram has df=2 → novelty 0; doc 3 is
    // fresh → 1.0; doc 4 shares its first three words with doc 5's start
    // (one common shingle each) but diverges after
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "one two three four"),
      (4L, "red green blue cyan magenta"),
      (5L, "red green blue yellow purple")).toDF("doc_id", "text")
    val out = Novelty.ngramNoveltyOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((3L, 0L, 0.0)) && out(2L) == ((3L, 0L, 0.0)))
    assert(out(3L) == ((2L, 2L, 1.0)))
    // docs 4/5: 3 shingles each, share exactly "red green blue" → 2 unique
    assert(out(4L) == ((3L, 2L, 0.6666)) && out(5L) == ((3L, 2L, 0.6666)),
      s"partial overlap must floor-truncate to 4dp: ${out(4L)} ${out(5L)}")
  }

  test("q59: fixture novelty is a valid ratio and short docs are dropped (shingleArr contract)") {
    import spark.implicits._
    val out = Novelty.q59(spark, sf0001)
    assert(out.count() == 500)
    assert(out.filter(col("novelty") < 0 || col("novelty") > 1).count() == 0)
    assert(Novelty.ngramNoveltyOf(Seq((1L, "too short")).toDF("doc_id", "text")).count() == 0)
  }

  // ---------------------------------------------------------------- q60

  test("q60: hardest different-label in-cell neighbor, NULL when the cell is single-label") {
    import spark.implicits._
    // cell 0 (seed vec 0): anchors 0/2 (label 0) + 3 (label 1); vec 2 sits
    // between 0 and 3, so 3's hardest label-0 negative is 2, and both
    // label-0 anchors get 3. cell 1 (seed vec 1): 1/4 both label 0 → NULL.
    val embeds = Seq(
      (0L, Array(1.0f, 1.0f, 1.0f, 1.0f), 0),
      (1L, Array(-1.0f, -1.0f, -1.0f, -1.0f), 0),
      (2L, Array(1.0f, 1.0f, 1.0f, 0.9f), 0),
      (3L, Array(1.0f, 1.0f, 0.9f, 0.9f), 1),
      (4L, Array(-1.0f, -1.0f, -1.0f, -0.9f), 0)
    ).toDF("vec_id", "embedding", "label")
    val out = HardNeg.hardNegativesOf(embeds, k = 2).collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(out(0L).contains(3L) && out(2L).contains(3L),
      s"label-0 anchors must pick the only label-1 cellmate: $out")
    assert(out(3L).contains(2L), s"the label-1 anchor's hardest negative is its nearest label-0: $out")
    assert(out(1L).isEmpty && out(4L).isEmpty, s"single-label cell must yield NULL: $out")
  }

  test("q60: over-full cells are dropped by maxCell; small cells keep mining") {
    import spark.implicits._
    val dim = 4
    val big = (0L +: (2L to 301L)).map(i =>
      (i, Array.fill(dim)(1.0f), (i % 2).toInt))
    val small = Seq((1L, -1.0f, 0), (1001L, -1.0f, 1), (1002L, -1.0f, 1))
      .map { case (i, v, l) => (i, Array.fill(dim)(v), l) }
    val embeds = (big ++ small).toDF("vec_id", "embedding", "label")
    val capped = HardNeg.hardNegativesOf(embeds, k = 2, maxCell = 100).collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(capped.size == 304, "every anchor must still appear in the output")
    assert(big.forall { case (i, _, _) => capped(i).isEmpty },
      "anchors in the dropped giant cell must come back NULL")
    assert(capped(1L).contains(1001L) && capped(1001L).contains(1L) && capped(1002L).contains(1L),
      s"the small cell must keep mining under the cap: $capped")
    // default cap admits the giant cell: identical vectors, opposite labels
    val uncapped = HardNeg.hardNegativesOf(embeds, k = 2)
      .filter(col("vec_id") === 0L).collect()
    assert(Option(uncapped.head.get(3)).map(_.asInstanceOf[Long]).contains(3L),
      "uncapped: vec 0's hardest negative is the lowest odd-label id (all sims tie)")
  }
}
