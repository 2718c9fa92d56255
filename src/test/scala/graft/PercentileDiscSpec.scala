package graft

import graft.agg.PercentileDisc
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Pins the reference's discrete-floor percentile semantics
  * (latency_slo_monitor.py:45-53): sorted(xs)[int(q*(len-1))]. */
class PercentileDiscSpec extends SparkSpec {

  private def brute(xs: Seq[Double], q: Double): Double =
    xs.sorted.apply(math.floor(q * (xs.length - 1)).toInt)

  test("p95 matches brute force on random lists (property)") {
    import spark.implicits._
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6))
    val params = Gen.Parameters.default
    (1 to 20).foreach { i =>
      val xs = gen(params.withSize(1 + i * 13), rng.Seed(i.toLong)).get
      val got = xs.toDF("v").agg(PercentileDisc.p95(col("v"))).head.getDouble(0)
      assert(got == brute(xs, 0.95), s"seed $i n=${xs.length}")
    }
  }

  test("p95 of singleton and of all-equal lists") {
    import spark.implicits._
    assert(Seq(42.0).toDF("v").agg(PercentileDisc.p95(col("v"))).head.getDouble(0) == 42.0)
    assert(Seq.fill(100)(7.5).toDF("v").agg(PercentileDisc.p95(col("v"))).head.getDouble(0) == 7.5)
  }

  test("p95 takes index floor(0.95*(n-1)), not linear interpolation") {
    import spark.implicits._
    // n=20: floor(0.95*19)=18 → 19th smallest = 19.0 (1-indexed values 1..20)
    val xs = (1 to 20).map(_.toDouble)
    assert(xs.toDF("v").agg(PercentileDisc.p95(col("v"))).head.getDouble(0) == 19.0)
    // Spark's built-in linear percentile would give 19.05 here — different op.
  }

  test("merge across partitions is order-insensitive") {
    import spark.implicits._
    val xs = scala.util.Random.shuffle((1 to 997).map(_.toDouble)).toList
    val got = spark.sparkContext.parallelize(xs, 7).toDF("v")
      .agg(PercentileDisc.p95(col("v"))).head.getDouble(0)
    assert(got == brute(xs, 0.95))
  }
}
