package graft

import graft.ext.MarginAudit
import org.apache.spark.sql.functions._

/** Cluster assignment-margin audit (q109). */
class MarginAuditSpec extends SparkSpec {

  import spark.implicits._

  test("hand geometry: center points score low margin, boundary points high") {
    // k=2 on 4-dim points: two tight groups at 0 and 1, one point midway
    def v(x: Float) = Array(x, x, x, x)
    val embeds = (Seq(
      (0L, v(0f)), (1L, v(1f)),            // seeds -> centroids settle at groups
      (2L, v(0.02f)), (3L, v(0.98f)),
      (4L, v(0.45f))                        // near-boundary straggler
    )).toDF("vec_id", "embedding")
    val out = MarginAudit.marginAuditOf(embeds, k = 2, iters = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val all = out.values.toSeq
    assert(all.map(_._1).sum == 5L)
    // the straggler (to-centroid ratio ~2964 bp) lifts its cell's mean to
    // ~1136 bp; the pure group stays ~1 bp
    assert(out.values.exists(_._2 > 800L), s"straggler must raise a cell mean: $out")
    assert(out.values.exists(_._2 < 100L), s"tight cells must stay confident: $out")
  }

  test("margins are valid ratios and cells partition the corpus") {
    val nVecs = graft.oracle.Tables.table(spark, sf0001, "embeddings").count()
    val rows = MarginAudit.q109(spark, sf0001).collect()
    assert(rows.map(_.getLong(1)).sum == nVecs)
    rows.foreach { r =>
      val (mean, share) = (r.getLong(2), r.getLong(3))
      assert(mean >= 0L && mean <= 10000L, s"margin is a d1<=d2 ratio: $r")
      assert(share >= 0L && share <= 10000L)
    }
  }

  test("a duplicated-centroid degenerate input yields NULL margins, not a crash") {
    // every point identical -> all centroids identical -> d2 = 0 everywhere
    val embeds = (0L to 5L).map(i => (i, Array.fill(4)(0.5f))).toDF("vec_id", "embedding")
    val out = MarginAudit.marginAuditOf(embeds, k = 2, iters = 1).collect()
    assert(out.map(_.getLong(1)).sum == 6L)
    out.foreach(r => assert(r.isNullAt(2), s"undefined margin must be NULL: $r"))
  }
}
