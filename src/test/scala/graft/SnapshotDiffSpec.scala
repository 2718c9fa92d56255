package graft

import graft.ops.SnapshotDiff
import org.apache.spark.sql.functions._

/** Corpus snapshot diff (q104). */
class SnapshotDiffSpec extends SparkSpec {

  import spark.implicits._

  test("doc-level diff classifies added/removed/changed/unchanged") {
    val prev = Seq((1L, "a", "one text"), (2L, "a", "two text"),
      (3L, "b", "three")).toDF("doc_id", "source", "text")
    val cur = Seq((2L, "a", "two text CHANGED"), (3L, "b", "three"),
      (4L, "c", "four new")).toDF("doc_id", "source", "text")
    val got = SnapshotDiff.snapshotDiffOf(prev, cur).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) == (("a", "removed", 8L, 0L)))
    assert(got(2L) == (("a", "changed", 8L, 16L)))
    assert(got(3L) == (("b", "unchanged", 5L, 5L)))
    assert(got(4L) == (("c", "added", 0L, 8L)))
  }

  test("summary is the doc-level diff aggregated, delta = cur - prev") {
    val prev = Seq((1L, "a", "aaaa"), (2L, "a", "bb")).toDF("doc_id", "source", "text")
    val cur = Seq((1L, "a", "aaaa longer"), (3L, "a", "cc")).toDF("doc_id", "source", "text")
    val sums = SnapshotDiff.diffSummaryOf(prev, cur).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(sums("changed") == ((1L, 4L, 11L, 7L)))
    assert(sums("removed") == ((1L, 2L, 0L, -2L)))
    assert(sums("added") == ((1L, 0L, 2L, 2L)))
  }

  test("q104 fixture snapshots: status masses reconcile with both snapshot sizes") {
    val docs = graft.oracle.Tables.table(spark, sf0001, "documents")
    val (prev, cur) = SnapshotDiff.fixtureSnapshots(docs)
    val (nPrev, nCur) = (prev.count(), cur.count())
    val byStatus = SnapshotDiff.q104(spark, sf0001).collect()
      .groupBy(_.getString(1)).map { case (s, rs) => s -> rs.map(_.getLong(2)).sum }
    def n(s: String) = byStatus.getOrElse(s, 0L)
    assert(n("unchanged") + n("changed") + n("removed") == nPrev)
    assert(n("unchanged") + n("changed") + n("added") == nCur)
    // the deterministic revision rule actually fires on the fixture
    assert(n("changed") > 0 && n("added") > 0 && n("removed") > 0)
  }
}
