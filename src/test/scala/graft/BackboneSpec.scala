package graft

import graft.ops.Backbone
import org.apache.spark.sql.Row

/** q150: the backbone census — hand-computed keep/mass arithmetic plus
  * the reconciliation contract with [[Backbone.backboneOf]] (the census'
  * m_kept must equal the edge count the four q146–q149 consumers see). */
class BackboneSpec extends SparkSpec {

  import spark.implicits._

  private def census(topBp: Long, edges: (Long, Long, Long)*): Row =
    Backbone.backboneCensusOf(edges.toSeq.toDF("a", "b", "w"), topBp)
      .collect().head

  test("hand census: top decile of 10 distinct-weight edges keeps exactly the strongest") {
    // w = 9,7,7,5,3,1,1,1,1,1 → m=10, prefix 1, τ=9; Σw=36, kept mass 9
    val r = census(1000L,
      (1L, 2L, 9L), (1L, 3L, 7L), (2L, 3L, 7L), (3L, 4L, 5L), (4L, 5L, 3L),
      (5L, 6L, 1L), (6L, 7L, 1L), (7L, 8L, 1L), (8L, 9L, 1L), (9L, 10L, 1L))
    assert(r.getAs[Long]("m_total") == 10L)
    assert(r.getAs[Long]("m_kept") == 1L)
    assert(r.getAs[Long]("tau") == 9L)
    assert(r.getAs[Long]("w_total") == 36L)
    assert(r.getAs[Long]("w_kept") == 9L)
    assert(r.getAs[Long]("kept_share_bp") == 1000L)   // 1·10⁴ div 10
    assert(r.getAs[Long]("mass_share_bp") == 2500L)   // 9·10⁴ div 36
  }

  test("boundary ties push kept_share past topBp — the determinism trade, made visible") {
    // m=4, top 25% → prefix 1 → τ=5, but THREE edges carry w=5: all kept
    val r = census(2500L,
      (1L, 2L, 5L), (2L, 3L, 5L), (3L, 4L, 5L), (4L, 5L, 4L))
    assert(r.getAs[Long]("m_kept") == 3L)
    assert(r.getAs[Long]("kept_share_bp") == 7500L)   // 3·10⁴ div 4 > 2500
    assert(r.getAs[Long]("mass_share_bp") == (15L * 10000L) / 19L)
  }

  test("flat support: mass share collapses onto kept share — the re-tune signal") {
    // all weights equal → τ = that weight → EVERYTHING survives the cut
    val r = census(1000L, (1L, 2L, 4L), (2L, 3L, 4L), (3L, 4L, 4L), (4L, 5L, 4L))
    assert(r.getAs[Long]("m_kept") == 4L)
    assert(r.getAs[Long]("kept_share_bp") == 10000L)
    assert(r.getAs[Long]("mass_share_bp") == 10000L)
  }

  test("empty census: one row, zero masses, NULL τ and shares (no division blow-up)") {
    val r = Backbone.backboneCensusOf(
      Seq.empty[(Long, Long, Long)].toDF("a", "b", "w")).collect().head
    assert(r.getAs[Long]("m_total") == 0L)
    assert(r.getAs[Long]("m_kept") == 0L)
    assert(r.isNullAt(r.fieldIndex("tau")))
    assert(r.isNullAt(r.fieldIndex("kept_share_bp")))
    assert(r.isNullAt(r.fieldIndex("mass_share_bp")))
  }

  test("reconciliation: m_kept == |backboneOf| — the census counts exactly the consumers' edges") {
    // mixed weights incl. a boundary tie class, several topBp settings
    val es = Seq((1L, 2L, 9L), (1L, 3L, 7L), (2L, 3L, 7L), (3L, 4L, 7L),
      (4L, 5L, 5L), (5L, 6L, 3L), (6L, 7L, 3L), (7L, 8L, 2L), (8L, 9L, 1L))
    for (bp <- Seq(1000L, 2500L, 5000L, 10000L)) {
      val df = es.toDF("a", "b", "w")
      val kept = Backbone.backboneOf(df, bp).count()
      val cen = Backbone.backboneCensusOf(df, bp).collect().head
      assert(cen.getAs[Long]("m_kept") == kept,
        s"topBp=$bp: census m_kept=${cen.getAs[Long]("m_kept")} vs backboneOf $kept")
    }
  }
}
