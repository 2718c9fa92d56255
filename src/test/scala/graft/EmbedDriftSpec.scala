package graft

import graft.ext.EmbedDrift

/** Embedding snapshot drift (q112). */
class EmbedDriftSpec extends SparkSpec {

  import spark.implicits._

  test("a shifted label shows exact squared centroid drift; a stable label shows zero") {
    def v(x: Float) = Array(x, x, x, x)
    val snapA = Seq(
      (1L, v(0.0f), 0), (2L, v(0.2f), 0),   // label 0 centroid at 100 milli
      (3L, v(5.0f), 1), (4L, v(5.0f), 1))   // label 1 stable
      .toDF("vec_id", "embedding", "label")
    val snapB = Seq(
      (11L, v(1.0f), 0), (12L, v(1.2f), 0), // label 0 moved +1.0 -> 1100 milli
      (13L, v(5.0f), 1), (14L, v(5.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = EmbedDrift.embedDriftOf(snapA, snapB).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    // label 0: each half's centroid = mean(0,200)=100 / mean(1000,1200)=1100
    // drift = 4 dims * (1000)^2; spread per half = 4 * 2 * 100^2
    assert(out(0) == ((2L, 2L, 4L * 1000L * 1000L, 80000L, 80000L)))
    assert(out(1) == ((2L, 2L, 0L, 0L, 0L)))
  }

  test("self-drift is identically zero with equal spreads") {
    val snap = (1L to 12L).map(i =>
      (i, Array(i * 0.1f, -i * 0.05f, 1.0f, 0.3f), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
    EmbedDrift.embedDriftOf(snap, snap).collect().foreach { r =>
      assert(r.getLong(3) == 0L, s"self-drift must be 0: $r")
      assert(r.getLong(4) == r.getLong(5), s"spreads must match: $r")
    }
  }

  test("q112 fixture: both halves populated, drift and spreads non-negative") {
    val rows = EmbedDrift.q112(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
      assert(r.getLong(3) >= 0 && r.getLong(4) >= 0 && r.getLong(5) >= 0)
    }
  }
}
