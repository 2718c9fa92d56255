package graft

import graft.oracle.Registry

/** q168 — the signature-store delta dedup, pinned verdict-for-verdict
  * to q64's in-query recompute, plus the store staleness protocol. */
class DeltaStoreSpec extends SparkSpec {

  private def rows(name: String): Seq[List[Option[Any]]] =
    Registry.byName(name).run(spark, sf0001).collect()
      .map(r => (0 until r.length).map(i => Option(r.get(i))).toList)
      .sortBy(_.toString).toSeq

  test("q168 store-read verdicts == q64 in-query verdicts, bit-exact") {
    val store = rows("q168_dedup_store")
    val inq = rows("q64_delta_dedup")
    assert(store.nonEmpty)
    // teeth: the fixture split carries near dups (16 at sf0.001; it has
    // no content-identical docs, so the exact path gets its teeth from
    // the hand fixture below)
    assert(inq.exists(_.apply(2).contains(1)), "no near dups in the fixture split")
    assert(store == inq,
      s"store path diverged: first diff=${store.zip(inq).find { case (a, b) => a != b }}")
  }

  test("hand fixture: exact-dup, cross-side near-dup and keep verdicts through the store") {
    import spark.implicits._
    val existing = Seq(
      (0L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely unrelated settled content about parquet row groups")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"), // exact dup of 0
      (3L, "the quick brown fox jumps over the lazy dog today"),   // near dup of 0
      (5L, "entirely novel incoming text that matches nothing here at all")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_store").toString
    val got = graft.ext.DeltaDedup
      .storeDedupOf(spark, existing, incoming, dir, "hand-fp")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), Option(r.get(4))))).toMap
    val want = graft.ext.DeltaDedup.deltaDedupOf(existing, incoming)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), Option(r.get(4))))).toMap
    assert(got == want, s"store vs in-query on the hand fixture: $got vs $want")
    assert(got(1L)._1 == 1, s"doc 1 must be an exact dup: ${got(1L)}")
    assert(got(3L)._2 == 1, s"doc 3 must be a near dup: ${got(3L)}")
    assert(got(5L)._3 == 1, s"doc 5 must be kept: ${got(5L)}")
  }

  test("corrupted store sentinel forces a refit that restamps the fingerprint") {
    graft.ext.DeltaDedup.q168(spark, sf0001).count() // prime
    val s = java.nio.file.Paths.get(
      graft.ops.ArtifactStore.root(sf0001,
        s"dedup-par0-v${graft.ext.DeltaDedup.StoreVersion}"), "_FIT_OK")
    val fp = java.nio.file.Files.readString(s)
    java.nio.file.Files.writeString(s, "stale")
    assert(graft.ext.DeltaDedup.q168(spark, sf0001).collect().nonEmpty)
    assert(java.nio.file.Files.readString(s) == fp,
      "refit must restamp the true fingerprint")
  }
}
