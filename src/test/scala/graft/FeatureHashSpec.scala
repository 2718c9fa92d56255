package graft

import graft.ext.FeatureHash
import org.apache.spark.sql.functions._

class FeatureHashSpec extends SparkSpec {

  /** Scala mirror of the operator's bucket/sign derivation. */
  private def bucketSign(w: String, dim: Int): (Long, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"fh|$w".getBytes("UTF-8"))
    val hv = java.lang.Long.parseLong(md.map("%02x".format(_)).mkString.take(8), 16)
    (hv % dim, if ((hv / dim) % 2 == 0) 1L else -1L)
  }

  test("q84: hashed vector matches the scala mirror, invariants consistent") {
    import spark.implicits._
    val text = "alpha beta gamma alpha delta beta alpha"
    val out = FeatureHash.featureHashOf(Seq((1L, text)).toDF("doc_id", "text"), dim = 16)
      .collect()(0)
    val expected = text.split(" ").toSeq
      .map(w => bucketSign(w, 16)).groupBy(_._1)
      .view.mapValues(_.map(_._2).sum).toMap.filter(_._2 != 0)
    val features = out.getSeq[org.apache.spark.sql.Row](1)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(features == expected, s"$features != $expected")
    assert(out.getLong(2) == expected.size, "nnz")
    assert(out.getLong(3) == expected.values.map(math.abs).sum, "l1")
    assert(out.getLong(4) == expected.values.map(v => v * v).sum, "l2sq")
    assert(out.getLong(5) == expected.map { case (b, v) => (b + 1) * v }.sum, "checksum")
    // features sorted by bucket
    val buckets = out.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0))
    assert(buckets == buckets.sorted, "sparse vector must be bucket-sorted")
  }

  test("q84: sign balance keeps collisions unbiased (opposite-sign words cancel)") {
    import spark.implicits._
    // find two words that collide in bucket with opposite signs (dim=4
    // makes collisions plentiful), verify they cancel
    val words = (1 to 50).map(i => s"tok$i")
    val byBucket = words.map(w => (w, bucketSign(w, 4))).groupBy(_._2._1)
    val cancelling = byBucket.values.flatMap { ws =>
      for (p <- ws.find(_._2._2 == 1L); n <- ws.find(_._2._2 == -1L)) yield (p._1, n._1)
    }.headOption
    assume(cancelling.isDefined, "need a cancelling pair among 50 tokens")
    val (wp, wn) = cancelling.get
    val out = FeatureHash.featureHashOf(Seq((1L, s"$wp $wn")).toDF("doc_id", "text"), dim = 4)
      .collect()
    // the pair cancels: either the bucket vanishes entirely (empty output
    // row is absent) or it is absent from the sparse features
    assert(out.isEmpty || !out(0).getSeq[org.apache.spark.sql.Row](1)
      .exists(r => r.getLong(0) == bucketSign(wp, 4)._1),
      s"cancelled bucket must not appear: ${out.toSeq}")
  }

  test("q84 plan: one scan, one explode, no join — the hash IS the vocabulary") {
    val df = FeatureHash.q84(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    def count(sub: String) = p.sliding(sub.length).count(_ == sub)
    assert(count("Scan parquet") == 1 && count("Generate ") == 1,
      s"single scan + single explode:\n$p")
    assert(!p.contains("Join"), s"no vocabulary join may exist:\n$p")
  }
}
