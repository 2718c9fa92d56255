package graft

import org.apache.spark.sql.functions._

/** Misra-Gries guarantees, checked under hostile partitioning: estimates
  * never overcount, undercount by ≤ n/(k+1), and every item above the
  * survivor threshold is present — for EVERY partition/merge order. */
class FreqItemsSpec extends SparkSpec {

  private def check(xs: Seq[String], k: Int, partitions: Int): Unit = {
    import spark.implicits._
    val fi = org.apache.spark.sql.functions.udaf(new graft.agg.FreqItems(k))
    val est = spark.sparkContext.parallelize(xs, partitions).toDF("w")
      .agg(fi(col("w")))
      .head.getMap[String, Long](0)
    val exact = xs.groupBy(identity).view.mapValues(_.size.toLong)
    val n = xs.size.toLong
    val bound = n / (k + 1)
    est.foreach { case (w, e) =>
      val t = exact.getOrElse(w, 0L)
      assert(e <= t, s"$w overcounted: est $e > true $t")
      assert(t - e <= bound, s"$w undercounted past bound: $t - $e > $bound")
    }
    exact.foreach { case (w, t) =>
      if (t > bound)
        assert(est.contains(w), s"survivor $w (freq $t > $bound) missing from sketch")
    }
  }

  test("zipf-ish stream: bounds hold across different partition counts") {
    val rng = new scala.util.Random(3)
    // ~40 hot items + long uniform tail
    val xs = (1 to 8000).map { _ =>
      if (rng.nextDouble() < 0.5) s"hot${rng.nextInt(40)}" else s"tail${rng.nextInt(5000)}"
    }
    Seq(1, 4, 13).foreach(p => check(xs, k = 50, partitions = p))
  }

  test("single dominant item survives maximal churn") {
    val rng = new scala.util.Random(9)
    val xs = scala.util.Random.shuffle(
      Seq.fill(500)("dominant") ++ (1 to 7500).map(_ => s"u${rng.nextInt(7000)}"))
    check(xs, k = 10, partitions = 8)
  }
}
