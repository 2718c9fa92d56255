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

  test("rank band always contains percentile_approx(accuracy=10000) — q24's deterministic contract") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{lit, percentile_approx}
    // adversarial distributions: heavy ties, huge gaps between adjacent
    // order statistics, tiny groups — the cases where a value-relative
    // tolerance fails but the rank band must still hold
    val rng = new scala.util.Random(42)
    val cases = Seq(
      (1 to 7).map(_.toDouble),
      Seq.fill(500)(1.0) ++ Seq.fill(30)(1e9),
      (1 to 2000).map(_ => math.pow(10, rng.nextInt(9)).toDouble),
      Seq.fill(3)(0.0) ++ Seq(1e12)
    )
    cases.zipWithIndex.foreach { case (xs, i) =>
      val row = spark.sparkContext.parallelize(xs, 5).toDF("v")
        .agg(
          PercentileDisc.p95Band(col("v")).as("band"),
          percentile_approx(col("v"), lit(0.95), lit(10000)).as("approx"))
        .select(col("band._1"), col("band._2"), col("approx").cast("double")).head
      val (lo, hi, ap) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
      assert(lo <= ap && ap <= hi, s"case $i: approx $ap outside band [$lo, $hi]")
    }
  }
}
