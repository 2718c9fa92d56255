package graft

import graft.ops.Churn
import org.apache.spark.sql.functions._

/** Churn/retention set algebra (q122). */
class ChurnSpec extends SparkSpec {

  import spark.implicits._

  test("one-pass flags equal the EXCEPT/INTERSECT formulation") {
    // range 0..100 -> midpoint 50 (via (0+100+1) div 2 = 50)
    val events = Seq(
      ("click", 1L, 10L), ("click", 1L, 60L),  // retained
      ("click", 2L, 20L),                      // churned
      ("click", 3L, 80L),                      // new
      ("click", 4L, 49L), ("click", 4L, 50L),  // boundary: 49 early, 50 late -> retained
      ("buy", 9L, 0L), ("buy", 9L, 100L))      // range anchors, retained
      .toDF("event_type", "user_id", "t_us")
    val got = Churn.churnOf(events, col("t_us")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got("click") == ((3L, 3L, 1L, 2L, 1L)))
    assert(got("buy") == ((1L, 1L, 0L, 1L, 0L)))
    // cross-check with Spark's own set operators per type
    val keyed = events.withColumn("early", col("t_us") < 50)
    Seq("click", "buy").foreach { t =>
      val e = keyed.filter(col("event_type") === t && col("early")).select("user_id").distinct()
      val l = keyed.filter(col("event_type") === t && !col("early")).select("user_id").distinct()
      assert(got(t)._3 == e.except(l).count(), s"$t churned")
      assert(got(t)._4 == e.intersect(l).count(), s"$t retained")
      assert(got(t)._5 == l.except(e).count(), s"$t new")
    }
  }

  test("q122 fixture: identities hold per type") {
    Churn.q122(spark, sf0001).collect().foreach { r =>
      val (ne, nl, ch, re, nu) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
      assert(ne == ch + re, s"early = churned + retained: $r")
      assert(nl == nu + re, s"late = new + retained: $r")
    }
  }
}
