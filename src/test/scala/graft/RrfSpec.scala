package graft

import graft.ext.{HybridRrf, Similarity}
import org.apache.spark.sql.{DataFrame, SaveMode}

/** q141 hybrid retrieval + RRF fusion — the spec Similarity.scala's
  * cosineRanks scaladoc promises. Pins four contracts:
  *  1. k-prefix: cosineRanks(k=10)'s first five rows per query ARE the
  *     k=5 list (cosineTopK / q19), so q19 and q141's semantic arm stay
  *     reconciled — a TopK ordering bug would break the prefix before it
  *     broke either oracle.
  *  2. arm-absence: a candidate retrieved by only ONE arm still fuses
  *     (NULL rank on the missing arm contributes 0, not NULL).
  *  3. tie discipline: equal rrf_ppm breaks by cand_id ascending.
  *  4. exact hand-RRF on a planted corpus: every rrf_ppm and fused_rank
  *     matches integer arithmetic done by hand (1_000_000 div (60+rank)).
  */
class RrfSpec extends SparkSpec {

  import spark.implicits._

  test("k-prefix: cosineRanks(k=10) first-5 equals cosineTopK (k=5)") {
    val k10 = Similarity.cosineRanks(spark, sf0001, 10)
      .filter("rank <= 5")
    val k5 = Similarity.cosineTopK(spark, sf0001)
    assert(k10.exceptAll(k5).isEmpty && k5.exceptAll(k10).isEmpty,
      "the k=10 ranking's 5-prefix must be exactly the k=5 ranking")
  }

  /** Planted corpus: queries are doc/vec ids < 20 (here 0 and 1); all
    * other docs — including the other query — are candidates for each.
    * Lexical overlap and embedding geometry are chosen so every arm rank
    * is forced, including zero-cosine ties that break by vec_id. */
  private lazy val plantedDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_rrf").toString
    Seq(
      (0L, "alpha beta gamma"),
      (1L, "one two three"),
      (25L, "alpha beta delta"), // lex-only neighbor of q0 (cos ties at 0 for q1)
      (26L, "zeta eta theta"),   // cos-only neighbor of q0 (no shared words)
      (27L, "alpha beta gamma"), // both arms for q0
      (30L, "one two four"),       // q1: lex rank 2 (jac 5000), cos rank 1
      (31L, "one two three five")) // q1: lex rank 1 (jac 7500), cos rank 2
      .toDF("doc_id", "text")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0L),
      (1L, Array(0f, 0f, 1f, 0f), 0L),
      (25L, Array(1f, 1f, 0f, 0f), 0L), // cos(q0)≈0.707 → q0 rank 3
      (26L, Array(1f, 0f, 0f, 0f), 0L), // cos(q0)=1.0   → q0 rank 1
      (27L, Array(3f, 1f, 0f, 0f), 0L), // cos(q0)≈0.949 → q0 rank 2
      (30L, Array(0f, 0f, 1f, 1f), 0L), // cos(q1)≈0.707 → q1 rank 1
      (31L, Array(0f, 0f, 1f, 2f), 0L)) // cos(q1)≈0.447 → q1 rank 2
      .toDF("vec_id", "embedding", "label")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def fusedRows(df: DataFrame): Map[(Long, Long), (Option[Long], Option[Long], Long, Long)] =
    df.collect().map { r =>
      (r.getLong(0), r.getLong(1)) ->
        ((if (r.isNullAt(2)) None else Some(r.getLong(2))),
          (if (r.isNullAt(3)) None else Some(r.getLong(3))),
          r.getLong(4), r.getLong(5))
    }.toMap

  test("planted corpus: exact hand-RRF, arm absence, tie discipline, top-5 cut") {
    val out = fusedRows(HybridRrf.hybridRrfOf(spark, plantedDir))

    // query 0 — lex: 27→1 25→2 (26/1/30/31 share no words);
    // cos: 26→1 27→2 25→3, then cos=0 ties 1/30/31 break by id → 4/5/6.
    // rrf_ppm: 1e6 div 61=16393, 62=16129, 63=15873, 64=15625, 65=15384.
    assert(out((0L, 27L)) == ((Some(1L), Some(2L), 32522L, 1L)))
    assert(out((0L, 25L)) == ((Some(2L), Some(3L), 32002L, 2L)))
    // arm-absence: 26 has NO lexical row yet fuses on cosine alone
    assert(out((0L, 26L)) == ((None, Some(1L), 16393L, 3L)))
    assert(out((0L, 1L)) == ((None, Some(4L), 15625L, 4L)))
    assert(out((0L, 30L)) == ((None, Some(5L), 15384L, 5L)))
    assert(!out.contains((0L, 31L)), "fused rank 6 falls outside the top-5 cut")

    // query 1 — lex: 31→1 (jac 7500) 30→2 (5000); cos: 30→1 (0.707)
    // 31→2 (0.447). The arm ranks CROSS, so both fuse to the same
    // 16393+16129 = 32522: EQUAL rrf_ppm, and fused order falls to
    // cand_id ascending — 30 before 31.
    assert(out((1L, 30L)) == ((Some(2L), Some(1L), 32522L, 1L)))
    assert(out((1L, 31L)) == ((Some(1L), Some(2L), 32522L, 2L)))
    // zero-cosine candidates still rank (cos arm keeps them, k=10 ≥ 6)
    assert(out((1L, 0L)) == ((None, Some(3L), 15873L, 3L)))
    assert(out((1L, 25L)) == ((None, Some(4L), 15625L, 4L)))
    assert(out((1L, 26L)) == ((None, Some(5L), 15384L, 5L)))
    assert(!out.contains((1L, 27L)), "cos rank 6, lex-absent → below the cut")

    assert(out.size == 10, s"exactly 5 fused rows per query, got ${out.size}")
  }
}
