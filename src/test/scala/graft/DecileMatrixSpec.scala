package graft

import graft.ext.DecileMatrix

/** Joint length x quality decile matrix (q118). */
class DecileMatrixSpec extends SparkSpec {

  test("matrix marginals reconcile with the corpus; expectations sum like counts") {
    val rows = DecileMatrix.q118(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nDocs = graft.oracle.Tables.table(spark, sf0001, "documents").count()
    assert(rows.map(_._3).sum == nDocs)
    rows.foreach { case (ld, qd, n, _) =>
      assert(ld >= 1 && ld <= 10 && qd >= 1 && qd <= 10 && n > 0)
    }
    // expectations cover only OBSERVED cells, so they undershoot n but
    // can never exceed it
    val expSum = rows.map(_._4).sum
    assert(expSum <= nDocs * 1000000L, s"expectations bounded by n: $expSum")
    // per-cell expectation = row_tot * col_tot * 1e6 / n, recomputed
    val rowTot = rows.groupBy(_._1).map { case (k, rs) => k -> rs.map(_._3).sum }
    val colTot = rows.groupBy(_._2).map { case (k, rs) => k -> rs.map(_._3).sum }
    rows.foreach { case (ld, qd, _, e) =>
      assert(e == rowTot(ld) * colTot(qd) * 1000000L / nDocs, s"cell ($ld,$qd)")
    }
  }
}
