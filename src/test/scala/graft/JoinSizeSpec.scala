package graft

import graft.ops.JoinSize
import org.apache.spark.sql.functions._

/** Self-join size (F2) audit (q120). */
class JoinSizeSpec extends SparkSpec {

  import spark.implicits._

  test("F2 equals the actually-executed self-join's row count") {
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5), ("c", 6))
      .toDF("k", "v")
    val predicted = JoinSize.selfJoinSizeOf(df, Seq("k")).collect()(0)
    val actual = df.as("l").join(df.as("r"), col("l.k") === col("r.k")).count()
    assert(predicted.getLong(3) == actual)           // 9 + 4 + 1 = 14
    assert(predicted.getLong(3) == 14L)
    assert(predicted.getLong(2) == 3L && predicted.getLong(4) == 3L)
    assert(predicted.getLong(5) == 14L * 10000 / 6)  // blow-up 2.33x
  }

  test("q120 audits both event keys; the low-cardinality key blows up harder") {
    val rows = JoinSize.q120(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(5))).toMap
    assert(rows.keySet == Set("user_id", "event_type"))
    val n = rows("user_id")._1
    assert(rows("event_type")._1 == n)
    // event_type has ~5 values, user_id ~15: fewer keys => bigger F2
    assert(rows("event_type")._2 < rows("user_id")._2)
    assert(rows("event_type")._3 > rows("user_id")._3)
    assert(rows("event_type")._4 > 10000L, "self-join on a hot key must blow up")
  }
}
