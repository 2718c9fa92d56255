package graft

import graft.ext.{KMeans, Pq}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming PQ ingestion gate: frozen codebooks + coarse quantizer,
  * map-side codes, stateless append, stream == batch == the batch PQ
  * kernels. */
class PqGateSpec extends SparkSpec {

  import spark.implicits._

  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def staticEmbeds = graft.oracle.Tables.table(spark, sf0001, "embeddings")

  test("gate codes == batch pqCodesOf; gate cell == batch assignments") {
    val gate = Pq.pqGateStreamStatic(staticEmbeds, staticEmbeds).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Int](2).toSeq, r.getLong(3))).toMap
    val batchCodes = Pq.pqCodesOf(staticEmbeds).collect()
      .map(r => r.getLong(0) -> (r.getSeq[Int](1).toSeq, r.getLong(2))).toMap
    val batchCells = KMeans.assignments(staticEmbeds, k = 8, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getInt(2).toLong).toMap
    assert(gate.keySet == batchCodes.keySet && gate.keySet == batchCells.keySet)
    gate.foreach { case (id, (cell, codes, distortion)) =>
      assert(codes == batchCodes(id)._1, s"vec $id: gate codes $codes vs batch ${batchCodes(id)._1}")
      assert(distortion == batchCodes(id)._2, s"vec $id: distortion")
      assert(cell == batchCells(id), s"vec $id: gate cell $cell vs batch ${batchCells(id)}")
    }
  }

  test("streaming append: stateless, stream == batch") {
    val rows = staticEmbeds.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val stream = MemoryStream[(Long, Array[Float])]
    val sq = Pq.pqGateStreamStatic(
        stream.toDF().toDF("vec_id", "embedding"), staticEmbeds)
      .writeStream.format("memory").queryName("pq_gate")
      .outputMode("append").start()
    try {
      // two micro-batches: frozen models must not drift between batches
      val (a, b) = rows.splitAt(rows.size / 2)
      stream.addData(a); sq.processAllAvailable()
      stream.addData(b); sq.processAllAvailable()
      assert(sq.lastProgress.stateOperators.isEmpty,
        s"pq gate must be stateless: ${sq.lastProgress.stateOperators.mkString}")
    } finally sq.stop()
    val streamed = spark.table("pq_gate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2).toSeq, r.getLong(3))).toSet
    val batch = Pq.pqGateStreamStatic(staticEmbeds, staticEmbeds).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2).toSeq, r.getLong(3))).toSet
    assert(streamed == batch, "stream != batch")
    assert(streamed.nonEmpty)
  }
}
