package graft

import graft.ext.WeightedSample
import org.apache.spark.sql.functions._

class WeightedSampleSpec extends SparkSpec {

  /** Scala mirror of the operator's key: md5 → first-8-hex int → uniform
    * → ES key, quantized to nano. */
  private def keyNano(docId: Long, quality: Double): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"wsamp|$docId".getBytes("UTF-8"))
    val hex = md.map("%02x".format(_)).mkString.take(8)
    val h = java.lang.Long.parseLong(hex, 16)
    val u = (h.toDouble + 0.5) / 4294967296.0
    math.floor(math.log(u) / quality * 1e9).toLong
  }

  test("q83: per-source sample is exactly the top-k ES keys (brute-force mirror)") {
    import spark.implicits._
    // two sources, 8 docs each, varying quality via varying length/diversity
    val docs = (1L to 16L).map { i =>
      val src = if (i <= 8) "sa" else "sb"
      (i, (1 to (3 + (i % 5)).toInt).map(j => s"w${i}_$j").mkString(" "), src)
    }.toDF("doc_id", "text", "source")
    val out = WeightedSample.weightedSampleOf(docs, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // recompute the quality scores the operator used, then brute-force rank
    val scored = graft.ext.TextOps.scoredDocs(docs)
      .select(col("doc_id"), col("source"), col("quality_score")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val expected = scored.groupBy(_._2).toSeq.flatMap { case (src, rows) =>
      rows.toSeq.map { case (id, _, q) => (id, keyNano(id, q)) }
        .sortBy { case (id, kn) => (-kn, id) }.take(3).zipWithIndex
        .map { case ((id, kn), i) => (src, (i + 1).toLong, id, kn) }
    }.toSet
    assert(out.toSet == expected, s"${out.toSet} != $expected")
    assert(out.count(_._1 == "sa") == 3 && out.count(_._1 == "sb") == 3,
      "exactly k per source")
  }

  test("q83: deterministic across runs, winner matches the mirror key computation") {
    import spark.implicits._
    // one diverse long doc (high quality) vs repetitive two-word docs —
    // NOTE the winner is whoever draws the best weighted key, not
    // necessarily the high-quality doc (a single draw is probabilistic by
    // design); the contract is that the draw is the EXACT argmax of the
    // deterministic keys
    val docs = (Seq((1L, (1 to 40).map(i => s"uniq$i").mkString(" "), "s")) ++
      (2L to 9L).map(i => (i, "the the", "s"))).toDF("doc_id", "text", "source")
    val a = WeightedSample.weightedSampleOf(docs, k = 1).collect().map(_.toSeq)
    val b = WeightedSample.weightedSampleOf(docs, k = 1).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq, "same input must redraw identically")
    val scored = graft.ext.TextOps.scoredDocs(docs)
      .select(col("doc_id"), col("quality_score")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val winner = scored.map { case (id, q) => (id, keyNano(id, q)) }
      .maxBy { case (id, kn) => (kn, -id) }._1
    assert(a.head(2) == winner, s"draw must be the key argmax: ${a.toSeq} vs $winner")
  }

  test("q83 plan: bounded TopK, no corpus window") {
    val df = WeightedSample.q83(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"row_number window crept in:\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"TopK aggregator missing:\n$p")
    assert(p.sliding("Scan parquet".length).count(_ == "Scan parquet") == 1,
      s"one corpus scan:\n$p")
  }
}
