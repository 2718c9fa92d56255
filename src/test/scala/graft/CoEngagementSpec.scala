package graft

import graft.ops.CoEngagement
import org.apache.spark.sql.functions._

/** Co-engagement matrix (q121). */
class CoEngagementSpec extends SparkSpec {

  import spark.implicits._

  test("hand corpus: overlaps and Jaccard are exact; repeat events don't double-count") {
    val events = Seq(
      (1L, "click"), (1L, "click"), (1L, "buy"),      // u1: click+buy (dup click)
      (2L, "click"), (2L, "view"),
      (3L, "click"), (3L, "buy"), (3L, "view"),
      (4L, "view")).toDF("user_id", "event_type")
    val out = CoEngagement.coEngagementOf(events).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // buy users {1,3}, click users {1,2,3}, view users {2,3,4}
    assert(out(("buy", "click")) == ((2L, 2L, 3L, 2L * 10000 / 3)))
    assert(out(("buy", "view")) == ((1L, 2L, 3L, 10000L / 4)))
    assert(out(("click", "view")) == ((2L, 3L, 3L, 2L * 10000 / 4)))
    out.keySet.foreach { case (a, b) => assert(a < b, "upper-triangular") }
  }

  test("q121 matches a brute-force distinct-set intersection on the fixture") {
    val ut = graft.oracle.Tables.table(spark, sf0001, "events")
      .select(col("user_id"), col("event_type")).distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byType = ut.groupBy(_._2).map { case (t, rs) => t -> rs.map(_._1).toSet }
    val brute = (for {
      a <- byType.keys; b <- byType.keys if a < b
      both = (byType(a) & byType(b)).size.toLong if both > 0
    } yield (a, b) -> (both, byType(a).size.toLong, byType(b).size.toLong,
      both * 10000 / (byType(a).size + byType(b).size - both))).toMap
    val got = CoEngagement.q121(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == brute)
  }
}
