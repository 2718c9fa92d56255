package graft

import graft.ext.Pq
import org.apache.spark.sql.functions._

/** Product quantization codebooks (q98). */
class PqSpec extends SparkSpec {

  test("fused subspace kernel == M sequential per-slice fits, row for row") {
    // the fused q98 must be BIT-identical to fitting each 16-dim slice
    // independently through the public sequential kernel
    val p = graft.ext.KMeans.quantize(
      graft.oracle.Tables.table(spark, sf0001, "embeddings"))
    val sequential = (0 until Pq.M).flatMap { s =>
      val slice = p.select(col("vec_id"),
        expr(s"slice(q, ${s * Pq.SubDim + 1}, ${Pq.SubDim})").as("q"))
      graft.ext.KMeans.kmeansOfQuantized(slice, Pq.Codes, Pq.Iters)
        .collect().map(r => (s.toLong, r.getLong(0)) ->
          (r.getLong(1), r.getLong(2), r.getLong(3)))
    }.toMap
    val fused = Pq.q98(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(fused == sequential)
  }

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

  test("q99 IVF-PQ search: cell-pruned, self-free, rank-ordered integer ADC") {
    val out = graft.ext.Pq.q99(spark, sf0001).collect()
    val labels = graft.oracle.Tables.table(spark, sf0001, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(out.nonEmpty && out.map(_.getAs[Long]("query_id")).distinct.length <= 20)
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to rows.length))
      // ADC non-decreasing with rank; ties broken upstream by id
      assert(sorted.map(_.getAs[Long]("adc_dist")).toSeq ==
        sorted.map(_.getAs[Long]("adc_dist")).sorted.toSeq)
      rows.foreach { r =>
        val n = r.getAs[Long]("neighbor_id")
        assert(n != q, "self must be excluded")
        assert(labels(n) == r.getAs[Long]("cell") && labels(q) == r.getAs[Long]("cell"),
          "candidates must come from the query's coarse cell")
        assert(r.getAs[Long]("adc_dist") >= 0)
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
