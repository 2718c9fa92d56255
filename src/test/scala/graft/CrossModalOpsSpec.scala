package graft

import graft.ext.{ContextFit, SemanticDecontam, SourceAffinity}
import graft.ops.ModalityCoverage
import org.apache.spark.sql.functions._

/** q125–q128: cross-modal coverage, semantic decontamination,
  * context-length fit, source embedding affinity. */
class CrossModalOpsSpec extends SparkSpec {

  import spark.implicits._

  test("q125: coverage classifies both/doc-only/vec-only exactly") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"), (5L, "b"))
      .toDF("doc_id", "source")
    val vecs = Seq(1L, 3L, 4L, 99L).toDF("vec_id") // 99 is an orphan
    val got = ModalityCoverage.modalityCoverageOf(docs, vecs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(got("a") == ((2L, 1L, 0L, 5000L)))
    assert(got("b") == ((3L, 2L, 0L, 6666L)))
    assert(got("(unmatched)") == ((0L, 0L, 1L, -1L)))
    assert(got.size == 3)
  }

  test("q126: within-cell neighbors counted, cross-cell ignored (nprobe=1 trade)") {
    def v(x: Double) = Array.fill(4)(x.toFloat)
    // cluster A near 0, cluster B near 10; ids 0/1 are eval (k=2 seeds)
    val embeds = Seq(
      (0L, v(0.0)), (1L, v(10.0)),    // eval: one per cluster
      (100L, v(0.01)),                // train, A: dist to 0 = 4*(10)^2 = 400
      (101L, v(0.5)),                 // train, A: dist to 0 = 4*500^2 = 1,000,000
      (102L, v(9.99)))                // train, B: dist to 1 = 400
      .toDF("vec_id", "embedding")
    val got = SemanticDecontam.semanticDecontamOf(
        embeds, evalMaxId = 50L, tau = 500L, k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // query 0 (cell A): both A-train vectors in cell, only vec 100 within tau
    assert(got(0L)._1 == 2L && got(0L)._2 == 1L && got(0L)._3 == 400L)
    // query 1 (cell B): vec 102 close; A's vectors are NOT candidates
    assert(got(1L)._1 == 1L && got(1L)._2 == 1L && got(1L)._3 == 400L)
  }

  test("q127: fit counts and truncation loss are exact") {
    // 'aaaa bb' -> (4+3)/4 + (2+3)/4 = 1 + 1 = 2 tokens; 12-a word -> 3 tokens
    val docs = Seq(("s1", "aaaa bb"), ("s1", "aaaaaaaaaaaa"))
      .toDF("source", "text")
    val got = ContextFit.contextFitOf(docs, windows = Seq(2, 4)).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    // window 2: doc1 (2 toks) fits, doc2 (3 toks) truncates to 2; total 5, kept 4
    assert(got(("s1", 2L)) == ((2L, 1L, 5000L, 5L, 4L, 2000L)))
    // window 4: both fit
    assert(got(("s1", 4L)) == ((2L, 2L, 10000L, 5L, 5L, 0L)))
  }

  test("q128: centroids use floored-mean rule; pairwise distance exact") {
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val docs = Seq((1L, "sa"), (2L, "sa"), (3L, "sb")).toDF("doc_id", "source")
    val embeds = Seq(
      (1L, v(1.0, 0.0)), (2L, v(2.0, 0.001)), // sa: q-sums (3000, 1) -> floored means (1500, 0)
      (3L, v(0.0, 4.0)))                      // sb: (0, 4000)
      .toDF("vec_id", "embedding")
    val rows = SourceAffinity.sourceAffinityOf(embeds, docs).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "sa" && r.getString(1) == "sb")
    assert(r.getLong(2) == 2L && r.getLong(3) == 1L)
    // dist = (1500-0)^2 + (0-4000)^2 = 2,250,000 + 16,000,000
    assert(r.getLong(4) == 18250000L)
  }

  test("fixture sanity: sf0.001 has full coverage and a contamination signal") {
    val cov = graft.ops.ModalityCoverage.q125(spark, sf0001).collect()
    assert(cov.forall(_.getAs[Long]("n_vec_only") == 0L), "sf0.001 ids are aligned")
    val dec = SemanticDecontam.q126(spark, sf0001)
    assert(dec.count() > 0)
    assert(dec.agg(sum(col("n_train_in_cell"))).head.getLong(0) > 0)
  }
}
