package graft

import graft.ops.KmvSketch
import org.scalacheck.{Gen, rng}

/** KMV cross-source overlap sketches (q94). The load-bearing claim is that
  * the bounded [[KmvSketch.MinKDistinct]] buffer equals a global
  * distinct-sort-take-k — de-dup inside the cap must not lose or double-
  * count hashes under any arrival order or partial-merge split. */
class KmvSketchSpec extends SparkSpec {

  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def brute(xs: Seq[Long], k: Int): Seq[Long] =
    xs.distinct.sorted.take(k)

  // dense domain → many duplicates, including duplicates of evicted values
  private val gen = Gen.listOf(Gen.chooseNum(0L, 40L))

  test("MinKDistinct == distinct-sort-take-k under arbitrary partial/merge splits") {
    val agg = new KmvSketch.MinKDistinct(8)
    val params = Gen.Parameters.default
    (1 to 60).foreach { i =>
      val xs = gen(params.withSize(i * 4), rng.Seed(i.toLong)).get
      val nSplits = 1 + i % 7
      val parts = if (xs.isEmpty) Seq(Seq.empty[Long])
        else xs.grouped(math.max(1, xs.length / nSplits)).toSeq
      val merged = parts
        .map(p => p.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged).toSeq == brute(xs, 8), s"seed $i n=${xs.length}")
    }
  }

  test("MinKDistinct: duplicate of an evicted max does not re-enter") {
    val agg = new KmvSketch.MinKDistinct(2)
    // 5 fills, 7 fills, 1 evicts 7, then duplicate 7 arrives again
    val buf = Seq(5L, 7L, 1L, 7L).foldLeft(agg.zero)(agg.reduce)
    assert(buf.toSeq == Seq(1L, 5L))
  }

  test("q94 pair census: bounds and symmetric-free pairing on sf0.001") {
    val out = KmvSketch.q94(spark, sf0001).collect()
    val nSources = graft.oracle.Tables.table(spark, sf0001, "documents")
      .select("source").distinct().count()
    assert(out.length == (nSources * (nSources - 1)) / 2)
    out.foreach { r =>
      val kUsed = r.getAs[Long]("k_used")
      val inter = r.getAs[Long]("inter_k")
      val bp = r.getAs[Long]("jaccard_est_bp")
      assert(r.getAs[String]("src_a") < r.getAs[String]("src_b"))
      assert(kUsed >= 1 && kUsed <= KmvSketch.K)
      assert(inter >= 0 && inter <= kUsed)
      assert(bp >= 0 && bp <= 10000)
      assert(r.getAs[Long]("union_est") >= 0)
    }
  }

  test("KMV novelty gate: stream == batch; corpus members score exactly 10000 bp") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val mk = (ws: Seq[String]) => ws.mkString(" ")
    val corpus = Seq(
      (1L, mk((1 to 30).map(i => s"w$i"))),
      (2L, mk((20 to 60).map(i => s"w$i")))).toDF("doc_id", "text")
    def gate(docs: org.apache.spark.sql.DataFrame) =
      graft.ops.KmvSketch.kmvGateStreamStatic(docs, corpus)
    val incoming = Seq(
      (10L, mk((5 to 25).map(i => s"w$i"))),   // subset of corpus → 10000 bp
      (11L, mk((1 to 30).map(i => s"x$i"))),   // disjoint vocabulary → novel
      (12L, "a b"))                            // < 3 words → no evidence
    val stream = MemoryStream[(Long, String)]
    val sq = gate(stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("kmv_gate")
      .outputMode("append").start()
    try {
      stream.addData(incoming)
      sq.processAllAvailable()
    } finally sq.stop()
    val streamed = spark.table("kmv_gate").collect().map(_.toSeq).toSet
    val batch = gate(incoming.toDF("doc_id", "text")).collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.nonEmpty, s"stream $streamed != batch $batch")
    val byId = batch.map(s => s.head.asInstanceOf[Long] -> s).toMap
    // doc 10: every shingle is a corpus shingle → hashes ≤ h_k are exactly
    // sketch members → containment is EXACTLY 10000 (if any evidence)
    val d10 = byId(10L)
    if (d10(2).asInstanceOf[Long] > 0) assert(d10(4) == 10000L, s"$d10")
    assert(byId(11L)(5) == true, "disjoint doc must flag novel")
    assert(byId(12L)(4) == null && byId(12L)(5) == null, "no-evidence doc stays NULL")
  }

  test("q94 sketch exchange carries bounded buffers (map-side partial agg)") {
    val plan = KmvSketch.sketches(spark, sf0001).queryExecution.executedPlan.toString
    // partial aggregation before the exchange: the ObjectHashAggregate pair
    // (partial + final) around a single shuffle of ≤k-long buffers
    assert(plan.contains("ObjectHashAggregate"))
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
  }
}
