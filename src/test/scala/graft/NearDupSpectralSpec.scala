package graft

import graft.ext.TextOps
import graft.ops.NearDupSpectral
import org.apache.spark.sql.functions.col

/** q162: spectral coordinate of the document near-dup graph — planted
  * clusters through the REAL q14 pair census (not a synthetic pair
  * frame), pinning the dominant-community anchor, the fringe decay and
  * the outside-the-graph drop. */
class NearDupSpectralSpec extends SparkSpec {

  import spark.implicits._

  private def run(docs: Seq[(Long, String)]): Map[Long, Long] =
    NearDupSpectral.nearDupSpectralOf(
        TextOps.ngramJaccardOf(docs.toDF("doc_id", "text")))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("vfp")))
      .toMap

  private val base = (1 to 40).map(i => s"tok$i").mkString(" ")

  test("planted clusters: the identical-text triangle anchors at 10^6, the weaker pair decays, loners drop") {
    val docs = Seq(
      // dominant cluster: three byte-identical docs → pairwise jaccard 1.0
      1L -> base, 2L -> base, 3L -> base,
      // weaker pair: second half replaced → jaccard < 1 but ≥ 0.2
      10L -> (base + " alpha beta gamma delta"),
      11L -> (base + " alpha beta gamma epsilon"),
      // loner: disjoint vocabulary → no ≥0.2 pair, outside the graph
      99L -> (1 to 40).map(i => s"other$i").mkString(" "))
    val got = run(docs)
    assert(!got.contains(99L), s"the loner must be absent: $got")
    // equal-weight triangle: uniform is the Perron vector — exactly 10^6
    assert(Seq(1L, 2L, 3L).forall(got(_) == 1000000L), s"dominant cluster anchors: $got")
    // 10/11 form their own component with smaller weight → strictly below
    assert(got(10L) == got(11L), s"symmetric pair must tie exactly: $got")
    assert(got(10L) < 1000000L && got(10L) > 0L, s"fringe decays but stays positive: $got")
    // 10/11 also pair with the triangle? They share `base` → jaccard vs
    // triangle docs is 40/(44) ≥ 0.2 → they ARE connected; the assert
    // above (strictly below 10^6) still holds because their rows are
    // lighter — pin connectivity explicitly so the fixture can't drift
    val pairs = TextOps.ngramJaccardOf(docs.toDF("doc_id", "text"))
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.exists(p => Set(1L, 2L, 3L).contains(p._1) && Set(10L, 11L).contains(p._2)
      || Set(10L, 11L).contains(p._1) && Set(1L, 2L, 3L).contains(p._2)),
      s"fixture sanity: the fringe pair connects to the cluster: $pairs")
  }

  test("two disconnected equal clusters of different weight: global max-norm separates them") {
    // cluster A: identical docs (jaccard 1.0); cluster B: overlapping docs
    // (jaccard < 1); disjoint vocabularies between A and B
    val otherBase = (1 to 40).map(i => s"bzz$i").mkString(" ")
    val docs = Seq(
      1L -> base, 2L -> base,
      20L -> (otherBase + " one two three four five six seven eight"),
      21L -> (otherBase + " one two three four nine ten eleven twelve"))
    val got = run(docs)
    assert(got(1L) == 1000000L && got(2L) == 1000000L)
    assert(got(20L) == got(21L) && got(20L) < 1000000L && got(20L) > 0L,
      s"lighter component normalizes against the global max: $got")
  }

  test("empty corpus → empty output") {
    assert(run(Seq.empty[(Long, String)]).isEmpty)
  }
}
