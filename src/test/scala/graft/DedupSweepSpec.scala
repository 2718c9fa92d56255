package graft

import graft.ext.DedupSweep
import org.apache.spark.sql.functions._

class DedupSweepSpec extends SparkSpec {

  test("q80: exposure curve is exact on planted near-dups and monotone in the threshold") {
    import spark.implicits._
    val base = (1 to 12).map(i => s"w$i").mkString(" ")         // 12 words -> 10 shingles
    val near = ((1 to 11).map(i => s"w$i") :+ "zz").mkString(" ") // ~0.8 jaccard with base
    val far = (1 to 12).map(i => s"v$i").mkString(" ")           // shares nothing
    val farNear = ((1 to 11).map(i => s"v$i") :+ "yy").mkString(" ")
    val docs = Seq((1L, base), (2L, near), (3L, far), (4L, farNear),
      (5L, "totally unrelated words that stand alone here")).toDF("doc_id", "text")
    val out = DedupSweep.dedupSweepOf(docs, thresholds = Seq(0.2, 0.5, 0.9)).collect()
      .map(r => r.getDouble(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // two planted pairs at j≈0.8: both survive 0.2 and 0.5, none at 0.9
    assert(out(0.2) == out(0.5) && out(0.2)._1 == 2 && out(0.2)._2 == 4,
      s"pairs/docs at low thresholds: $out")
    assert(out(0.9)._1 == 0 && out(0.9)._2 == 0, s"nothing survives 0.9: $out")
    // shares: 4 of 5 docs affected -> 8000bp
    assert(out(0.2)._3 == 8000, s"docs share bp: $out")
    // monotone: higher threshold never increases exposure
    val sorted = out.toSeq.sortBy(_._1).map(_._2)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a._1 >= b._1 && a._2 >= b._2 })
  }

  test("q80: total when no pairs exist at all") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 12).map(i => s"a$i").mkString(" ")),
      (2L, (1 to 12).map(i => s"b$i").mkString(" "))).toDF("doc_id", "text")
    val out = DedupSweep.dedupSweepOf(docs, thresholds = Seq(0.5)).collect()
    assert(out.length == 1 && out(0).getLong(1) == 0 && out(0).getLong(2) == 0 &&
      out(0).getLong(3) == 0, s"no-pair corpus must zero out: ${out.toSeq}")
  }

  test("q80 plan: pair table persisted once, both grid consumers read the cache") {
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    val df = DedupSweep.q80(spark, sf0001)
    val withCache = df.queryExecution.withCachedData
    val ims = withCache.collect { case r: InMemoryRelation => r }
    assert(ims.length == 2 && ims.map(_.cacheBuilder).distinct.length == 1,
      s"pair counts + doc-max rollup must share ONE pair materialization:\n$withCache")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"grid or totals met a corpus-sized side row-wise:\n$p")
  }
}
