package graft

import graft.ext.GridCoverage
import org.apache.spark.sql.functions._

/** Embedding grid coverage census (q106). */
class GridCoverageSpec extends SparkSpec {

  import spark.implicits._

  test("hand-built geometry: cells, top share and Simpson index are exact") {
    // dims 0..3 drive the grid; 3 vectors of label 0 collide in one cell,
    // 1 vector sits alone in another; label 1 has two spread vectors
    def v(a: Float, b: Float, c: Float, d: Float) = Array(a, b, c, d)
    val embeds = Seq(
      (1L, v(0f, 0f, 0f, 0f), 0), (2L, v(0f, 0f, 0f, 0f), 0),
      (3L, v(0.01f, 0f, 0f, 0f), 0), // same cell as 1,2 (coarse grid)
      (4L, v(1f, 1f, 1f, 1f), 0),
      (5L, v(0f, 0f, 0f, 0f), 1), (6L, v(1f, 0f, 0f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = GridCoverage.gridCoverageOf(embeds).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    // label 0: n=4, cells {lo,hi}: 3 in low cell, 1 in high
    assert(out(0L)._1 == 4L && out(0L)._2 == 2L && out(0L)._3 == 3L)
    assert(out(0L)._4 == 3L * 10000 / 4)             // top share 7500 bp
    assert(out(0L)._5 == (9L + 1L) * 10000 / 16)     // simpson 6250 bp
    // label 1: two singleton cells -> top 5000 bp, simpson 5000 bp
    assert(out(1L) == ((2L, 2L, 1L, 5000L, 5000L)))
  }

  test("q106 on the fixture: simpson and top-share are valid and consistent") {
    val rows = GridCoverage.q106(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, cells, top, topBp, simpBp) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(cells >= 1 && cells <= math.min(n, 256L))
      assert(top * 10000 / n == topBp)
      // simpson lower bound 1/cells (uniform), upper bound top-share-ish
      assert(simpBp >= 10000 / 256 - 1 && simpBp <= 10000)
      // floor loses < 1 bp, amplified by cells: 10^4 - 256 margin
      assert(simpBp * cells >= 9700, "Cauchy-Schwarz: simpson >= 1/cells")
    }
    val nTotal = rows.map(_.getLong(1)).sum
    assert(nTotal == graft.oracle.Tables.table(spark, sf0001, "embeddings").count())
  }
}
