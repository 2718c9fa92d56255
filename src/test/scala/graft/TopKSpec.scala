package graft

import graft.agg.{ScoredId, TopK}
import org.scalacheck.{Gen, rng}

class TopKSpec extends SparkSpec {

  private def brute(xs: Seq[ScoredId], k: Int): Seq[ScoredId] =
    xs.sortBy(s => (-s.score, s.id)).take(k)

  private val gen = Gen.listOf(for {
    s <- Gen.chooseNum(-10.0, 10.0)
    // coarse scores force ties so the id tie-break is exercised
    id <- Gen.chooseNum(0L, 50L)
  } yield ScoredId(math.rint(s * 4) / 4, id))

  test("TopK aggregator == brute-force sort-take under arbitrary partial/merge splits") {
    val agg = new TopK(5)
    val params = Gen.Parameters.default
    (1 to 40).foreach { i =>
      val xs = gen(params.withSize(i * 5), rng.Seed(i.toLong)).get
      val nSplits = 1 + i % 7
      val parts = if (xs.isEmpty) Seq(Seq.empty[ScoredId])
        else xs.grouped(math.max(1, xs.length / nSplits)).toSeq
      val merged = parts
        .map(p => p.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged).toSeq == brute(xs, 5), s"seed $i n=${xs.length}")
    }
  }

  test("TopK column function matches window formulation on the fixture") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val logs = graft.oracle.Tables.logs(spark, sf0001)
      .select(col("service"), col("latency_ms").cast("double").as("score"), col("event_id").cast("long").as("id"))
    val viaAgg = logs.groupBy(col("service"))
      .agg(TopK(4)(col("score"), col("id")).as("top"))
      .select(col("service"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("service"), (col("pos") + 1).as("rank"), col("t.score"), col("t.id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
    val viaWindow = logs
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("service")).orderBy(col("score").desc, col("id"))))
      .filter(col("rank") <= 4)
      .collect().map(r => (r.getString(0), r.getInt(3), r.getDouble(1), r.getLong(2))).toSet
    assert(viaAgg == viaWindow)
  }
}
