package graft

import graft.ext.HybridRrf
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-static hybrid-retrieval gate (the q141 ingestion face): frozen
  * query vocabularies + arm top-k lists + fused top-N as literals, arriving
  * docs scored map-side. The load-bearing property is EXACT insertion
  * semantics: any doc of the frozen corpus replayed through the gate must
  * reproduce its batch hybridRrfOf row bit-for-bit — that one assertion
  * reconciles the gate's literal-array arithmetic (insertion ranks, RRF
  * fusion, tie discipline) against the oracle-checked batch pipeline. */
class RrfGateSpec extends SparkSpec {

  import spark.implicits._

  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def staticDocs = graft.oracle.Tables.table(spark, sf0001, "documents")
    .select(col("doc_id"), col("text"))
  private def staticEmbeds = graft.oracle.Tables.table(spark, sf0001, "embeddings")

  /** Replay input: the corpus docs that have an embedding (the gate's
    * ingestion record carries both modalities). */
  private def replayDocs = staticDocs
    .join(staticEmbeds.select(col("vec_id").as("doc_id"), col("embedding")), Seq("doc_id"))

  private def key(r: Row): (Long, Long, Option[Long], Option[Long], Long, Long) =
    (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2)),
      if (r.isNullAt(3)) None else Some(r.getLong(3)),
      r.getLong(4), r.getLong(5))

  test("replaying the frozen corpus reproduces batch q141 rows exactly") {
    val embedded = staticEmbeds.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val batch = HybridRrf.hybridRrfOf(spark, sf0001).collect().map(key)
      .filter(r => embedded.contains(r._2)).toSet
    val gate = HybridRrf.rrfGateStreamStatic(replayDocs, staticDocs, staticEmbeds)
      .collect().map(key).toSet
    assert(batch.nonEmpty, "batch fused rows for embedded candidates must exist")
    assert(gate == batch,
      s"gate != batch: onlyGate=${(gate -- batch).take(5)} onlyBatch=${(batch -- gate).take(5)}")
  }

  test("a novel doc cloning a query enters that query's fused top list") {
    val q0 = staticEmbeds.filter(col("vec_id") === 0L).collect().head
    val q0doc = staticDocs.filter(col("doc_id") === 0L).collect().head
    val novelId = 9000000L
    val novel = Seq((novelId, q0doc.getString(1),
      q0.getAs[scala.collection.Seq[Float]]("embedding").toArray))
      .toDF("doc_id", "text", "embedding")
    // precondition (deterministic fixture): no static candidate matches
    // query 0's vector perfectly, so the clone's sim 1.0 must insert at 1
    val topSim = graft.ext.Similarity.cosineRanks(spark, sf0001, 1)
      .filter(col("query_id") === 0L).collect().head.getAs[Double]("sim")
    assert(topSim < 1.0, s"fixture drifted: query 0 already has a sim-1.0 twin ($topSim)")
    val out = HybridRrf.rrfGateStreamStatic(novel, staticDocs, staticEmbeds)
      .filter(col("query_id") === 0L && col("cand_id") === novelId).collect()
    assert(out.length == 1, s"clone must alert exactly once for query 0, got ${out.length}")
    assert(out.head.getLong(3) == 1L, s"clone cos_rank must be 1: ${out.head}")
    assert(out.head.getLong(4) >= 1000000L / 61L, s"rrf_ppm must carry the rank-1 arm: ${out.head}")
  }

  test("streaming append: stateless, stream == batch") {
    val rows = replayDocs.as[(Long, String, Array[Float])].collect().toSeq
    val stream = MemoryStream[(Long, String, Array[Float])]
    val sq = HybridRrf.rrfGateStreamStatic(
        stream.toDF().toDF("doc_id", "text", "embedding"), staticDocs, staticEmbeds)
      .writeStream.format("memory").queryName("rrf_gate")
      .outputMode("append").start()
    try {
      // two micro-batches: frozen literals must not drift between batches
      val (a, b) = rows.splitAt(rows.size / 2)
      stream.addData(a); sq.processAllAvailable()
      stream.addData(b); sq.processAllAvailable()
      assert(sq.lastProgress.stateOperators.isEmpty,
        s"rrf gate must be stateless: ${sq.lastProgress.stateOperators.mkString}")
    } finally sq.stop()
    val streamed = spark.table("rrf_gate").collect().map(key).toSet
    val batch = HybridRrf.rrfGateStreamStatic(replayDocs, staticDocs, staticEmbeds)
      .collect().map(key).toSet
    assert(streamed == batch, "stream != batch")
    assert(streamed.nonEmpty)
  }
}
