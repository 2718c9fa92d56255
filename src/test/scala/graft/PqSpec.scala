package graft

import graft.ext.Pq
import org.apache.spark.sql.functions._

/** Product quantization codebooks (q98). */
class PqSpec extends SparkSpec {

  test("q98 census: per-subspace occupancy covers the corpus, codes in seed space") {
    val out = Pq.q98(spark, sf0001).collect()
    val nVecs = graft.oracle.Tables.table(spark, sf0001, "embeddings").count()
    val bySub = out.groupBy(_.getAs[Long]("subspace"))
    assert(bySub.keySet == (0 until Pq.M).map(_.toLong).toSet)
    bySub.foreach { case (s, rows) =>
      assert(rows.map(_.getAs[Long]("n_points")).sum == nVecs, s"subspace $s")
      rows.foreach { r =>
        assert(r.getAs[Long]("cid") >= 0 && r.getAs[Long]("cid") < Pq.Codes)
        assert(r.getAs[Long]("inertia") >= 0)
      }
    }
  }

  test("pqCodesOf: M codes per vector; total distortion == codebook inertia") {
    val embeds = graft.oracle.Tables.table(spark, sf0001, "embeddings")
    val codes = Pq.pqCodesOf(embeds)
    val n = embeds.count()
    assert(codes.count() == n)
    assert(codes.filter(size(col("codes")) =!= Pq.M).count() == 0)
    // the compressed corpus' total distortion must equal the codebook
    // census' inertia mass — same model, two views
    val viaCodes = codes.agg(sum(col("distortion"))).collect()(0).getLong(0)
    val viaCensus = Pq.q98(spark, sf0001)
      .agg(sum(col("inertia"))).collect()(0).getLong(0)
    assert(viaCodes == viaCensus, s"codes $viaCodes vs census $viaCensus")
  }
}
