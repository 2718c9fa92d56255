package graft

import graft.ops.HistQuantiles
import org.apache.spark.sql.functions._

class HistQuantilesSpec extends SparkSpec {

  test("q89: quantiles match percentile_disc semantics on a hand-built distribution") {
    import spark.implicits._
    // service A: 1.0ms x 5, 2.0ms x 4, 100.0ms x 1  (n=10)
    //   p50 -> cum>=5 at cell 10 -> 1.0; p90 -> cum>=9 at cell 20 -> 2.0;
    //   p99 -> cum>=9.9 -> cell 1000 -> 100.0
    val logs = ((1 to 5).map(_ => ("A", 1.0)) ++ (1 to 4).map(_ => ("A", 2.0)) ++
      Seq(("A", 100.0)) ++ Seq(("B", 7.5))).toSeq
      .toDF("service", "latency_ms")
    val out = HistQuantiles.latencyQuantilesOf(logs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out("A") == (10L, 1.0, 2.0, 100.0), s"service A: ${out("A")}")
    assert(out("B") == (1L, 7.5, 7.5, 7.5), s"singleton: ${out("B")}")
  }

  test("q89: agrees with Spark's own percentile_disc over the quantized values (random data)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val logs = (1 to 500).map(_ => ("svc", math.floor(rnd.nextDouble() * 500) / 10))
      .toDF("service", "latency_ms")
    val mine = HistQuantiles.latencyQuantilesOf(logs).collect()(0)
    val ref = logs.selectExpr(
      "CAST(round(latency_ms * 10) AS BIGINT) / CAST(10 AS DOUBLE) AS q")
      .agg(expr("percentile(q, array(0.5, 0.9, 0.99), 1)").as("p")).collect()(0)
      .getSeq[Double](0)
    // percentile() interpolates; percentile_disc picks the smallest value
    // at-or-above the rank — compare against explicit disc computation
    val vals = logs.collect().map(r => math.round(r.getDouble(1) * 10) / 10.0).sorted
    def disc(q: Double) = vals(math.ceil(q * vals.length).toInt - 1)
    assert(mine.getDouble(2) == disc(0.5) && mine.getDouble(3) == disc(0.9) &&
      mine.getDouble(4) == disc(0.99),
      s"${(mine.getDouble(2), mine.getDouble(3), mine.getDouble(4))} != ${(disc(0.5), disc(0.9), disc(0.99))} (interp ref: $ref)")
  }

  test("q89 plan: one corpus exchange into the histogram; windows run over the bounded grain") {
    val df = HistQuantiles.q89(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(service"), s"histogram exchange missing:\n$p")
    assert(p.sliding("Scan parquet".length).count(_ == "Scan parquet") == 1,
      s"one corpus scan:\n$p")
    // no buffering aggregator over raw values: the only objects exchanged
    // at corpus grain are (service, cell) partial counts
    assert(!p.contains("percentile"), s"a buffering percentile crept in:\n$p")
  }
}
