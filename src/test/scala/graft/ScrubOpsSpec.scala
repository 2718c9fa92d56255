package graft

import graft.ext.ScrubOps
import org.apache.spark.sql.functions._

class ScrubOpsSpec extends SparkSpec {

  test("q49: planted PII is counted and fully redacted; clean docs untouched") {
    import spark.implicits._
    val docs = Seq(
      (0L, "reach me at alice@example.com or bob.smith+x@mail.co thanks"),
      (1L, "server 192.168.1.42 and 10.0.0.1 but not 1.2.3 alone"),
      (2L, "badge AB123456 cleared, XY999999 denied, A1234567 is not an id"),
      (3L, "nothing sensitive here at all")).toDF("doc_id", "text")
    val out = ScrubOps.piiScrubOf(docs).orderBy("doc_id")
      .select(col("doc_id"), col("n_email"), col("n_ipv4"), col("n_idnum"), col("chars_delta"))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out(0) == ((0L, 2L, 0L, 0L, "<EMAIL>".length * 2L - "alice@example.com".length - "bob.smith+x@mail.co".length)))
    assert(out(1)._3 == 2L, s"expected 2 IPs: ${out(1)}")
    assert(out(2)._4 == 2L, s"expected 2 badge ids: ${out(2)}")
    assert(out(3) == ((3L, 0L, 0L, 0L, 0L)), "clean doc must be byte-identical")

    // redaction is complete: re-scrubbing the clean text finds nothing
    val clean = Seq((9L, "x alice@example.com 10.0.0.1 AB123456 y")).toDF("doc_id", "text")
    val once = ScrubOps.piiScrubOf(clean).select(col("clean_hash")).as[String].head()
    val redacted = clean.select(col("doc_id"),
      lit("x <EMAIL> <IP> <ID> y").as("text"))
    val expect = ScrubOps.piiScrubOf(redacted)
      .select(col("clean_hash"), col("n_email") + col("n_ipv4") + col("n_idnum"))
      .as[(String, Long)].head()
    assert(expect._2 == 0L, "replacement tokens must not re-match any pattern")
    assert(once == expect._1, "scrub must be idempotent")
  }

  test("q49: fixture binding plants PII on the documented residue classes") {
    import spark.implicits._
    val rows = graft.oracle.Registry.byName("q49_pii_scrub").run(spark, sf0001)
      .select(col("doc_id"), col("n_email"), col("n_ipv4"), col("n_idnum"))
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length == 500)
    rows.foreach { case (id, e, ip, idn) =>
      assert(e == (if (id % 3 != 0) 1L else 0L), s"email count at $id")
      assert(ip == (if (id % 4 == 1) 1L else 0L), s"ip count at $id")
      assert(idn == (if (id % 5 == 2) 1L else 0L), s"idnum count at $id")
    }
  }

  test("q50: a line crossing the df threshold is removed from every doc, order preserved") {
    import spark.implicits._
    val docs = Seq(
      (0L, Seq("alpha", "FOOTER", "beta")),
      (1L, Seq("FOOTER", "gamma")),
      (2L, Seq("delta", "epsilon", "FOOTER")),
      (3L, Seq("zeta", "FOOTER", "eta"))).toDF("doc_id", "lines")
    val out = ScrubOps.boilerplateRemoveOf(docs, minDf = 3L)
      .orderBy("doc_id").select(col("doc_id"), col("n_kept")).as[(Long, Long)].collect()
    assert(out.toSeq == Seq((0L, 2L), (1L, 1L), (2L, 2L), (3L, 2L)))

    // order preservation: doc 0's kept hash equals md5("alpha\nbeta")
    val hash = ScrubOps.boilerplateRemoveOf(docs, minDf = 3L)
      .filter(col("doc_id") === 0).select(col("clean_hash")).as[String].head()
    val expect = docs.sparkSession.range(1)
      .select(md5(lit("alpha\nbeta"))).as[String].head()
    assert(hash == expect)
  }

  test("q50: all-boilerplate docs drop out; share threshold scales with corpus size") {
    import spark.implicits._
    val docs = Seq(
      (0L, Seq("FOOTER")), (1L, Seq("FOOTER", "x")), (2L, Seq("FOOTER", "y")),
      (3L, Seq("FOOTER", "z"))).toDF("doc_id", "lines")
    val kept = ScrubOps.boilerplateRemoveOf(docs, minDf = 4L)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L), "the all-FOOTER doc must vanish (CCNet behavior)")

    // by-share: FOOTER is in 4/4 docs (share 1.0) — removed at den=20,
    // kept at num=2/den=1 (df >= 8 impossible)
    val strict = ScrubOps.boilerplateRemoveByShare(docs, num = 2L, den = 1L)
      .agg(sum(col("n_kept"))).as[Long].head()
    assert(strict == 7L, "an unreachable share must keep every line")
  }

  test("q50: fixture binding removes exactly the planted footers") {
    import spark.implicits._
    val docs = graft.oracle.Tables.table(spark, sf0001, "documents")
    val lines = ScrubOps.plantedLines(docs)
      .select(col("doc_id"), size(col("lines")).cast("long").as("n_lines"))
    val out = graft.oracle.Registry.byName("q50_boilerplate_remove").run(spark, sf0001)
      .join(lines, "doc_id")
      .select(col("doc_id"), col("n_lines") - col("n_kept")).as[(Long, Long)].collect()
    assert(out.length == 500)
    out.foreach { case (id, removed) =>
      val planted = (if (id % 4 != 3) 1L else 0L) + (if (id % 7 == 0) 1L else 0L)
      assert(removed == planted, s"doc $id: removed $removed, planted $planted")
    }
  }
}
