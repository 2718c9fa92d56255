package graft

import graft.oracle.Registry
import graft.ops.RefreshArtifacts

/** q167 — the artifact-read daily refresh, pinned bit-exact to q166's
  * in-query recompute, plus the staleness and delta-only-scan contracts
  * that make the artifact path safe and cheap at 100 TB. */
class RefreshArtifactsSpec extends SparkSpec {

  private def rows(name: String): Seq[List[Option[Any]]] =
    Registry.byName(name).run(spark, sf0001).collect()
      .map(r => (0 until r.length).map(i => Option(r.get(i))).toList)
      .sortBy(_.toString).toSeq

  test("q167 artifact-read output == q166 in-query recompute, bit-exact") {
    val art = rows("q167_artifact_refresh")
    val inq = rows("q166_daily_refresh")
    assert(art.nonEmpty)
    assert(art == inq,
      s"artifact path diverged: first diff=${art.zip(inq).find { case (a, b) => a != b }}")
  }

  test("stale/absent sentinel forces a refit; fresh sentinel is reused") {
    // prime the artifacts, note the sentinel's fingerprint
    RefreshArtifacts.q167(spark, sf0001).count()
    val s = java.nio.file.Paths.get(
      RefreshArtifacts.root(sf0001, graft.ops.SpectralDelta.DeltaCutUs), "_FIT_OK")
    val fp = java.nio.file.Files.readString(s)
    val mtime0 = java.nio.file.Files.getLastModifiedTime(s)
    // fresh sentinel → no refit (sentinel untouched)
    RefreshArtifacts.q167(spark, sf0001).count()
    assert(java.nio.file.Files.getLastModifiedTime(s) == mtime0,
      "a fresh sentinel must be trusted, not refit")
    // corrupt the fingerprint → the next refresh must refit and restamp
    java.nio.file.Files.writeString(s, "stale-fingerprint")
    val out = RefreshArtifacts.q167(spark, sf0001).collect()
    assert(out.nonEmpty)
    assert(java.nio.file.Files.readString(s) == fp,
      "refit must restamp the true fingerprint")
  }

  test("race contract: a reader holding the old version dir survives a refit under a new fingerprint") {
    import spark.implicits._
    val existingA = Seq(
      (0L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely unrelated settled content about parquet row groups")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (5L, "entirely novel incoming text that matches nothing here at all")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_race").toString
    // reader resolves fp-A; plan built, NOT yet executed (the lazy-scan
    // window the race lives in)
    val readerA = graft.ext.DeltaDedup
      .storeDedupOf(spark, existingA, incoming, dir, "fp-A")
    val wantA = readerA.collect().map(_.toString).sorted // also primes v-A
    // the fixture "regenerates": a refit lands under fp-B's version dir
    val existingB = Seq((0L, "totally different settled corpus now")).toDF("doc_id", "text")
    graft.ext.DeltaDedup.storeDedupOf(spark, existingB, incoming, dir, "fp-B").count()
    assert(!graft.ops.ArtifactStore.isFresh(dir, "fp-A"),
      "fp-A must read stale after the fp-B refit")
    // the race: readerA's lazy scan re-executes AFTER the refit — the
    // old version dir must be intact (old complete verdicts, no
    // missing-part-file failure, never mixed state)
    val gotA = readerA.collect().map(_.toString).sorted
    assert(gotA.sameElements(wantA),
      s"old reader saw mixed/destroyed state after refit: ${gotA.toSeq} vs ${wantA.toSeq}")
  }

  test("commitFit GCs superseded version dirs to one generation (race window kept, growth bounded)") {
    import spark.implicits._
    val incoming = Seq((1L, "incoming text that matches nothing at all")).toDF("doc_id", "text")
    def corpus(s: String) = Seq((0L, s)).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_gc").toString
    def vdirs: Set[String] = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("v-")).toSet
      } finally s.close()
    }
    graft.ext.DeltaDedup.storeDedupOf(spark, corpus("settled corpus generation a"), incoming, dir, "fp-A").count()
    graft.ext.DeltaDedup.storeDedupOf(spark, corpus("settled corpus generation b"), incoming, dir, "fp-B").count()
    // one superseded generation survives: the live-reader race window
    assert(vdirs == Set("v-fp-A", "v-fp-B"), s"after 2nd fit: $vdirs")
    graft.ext.DeltaDedup.storeDedupOf(spark, corpus("settled corpus generation c"), incoming, dir, "fp-C").count()
    // twice-superseded v-fp-A is GC'd; the window dir + current remain
    assert(vdirs == Set("v-fp-B", "v-fp-C"),
      s"commitFit must GC beyond one superseded generation: $vdirs")
  }

  test("isFresh is race-safe: unreadable or vanished sentinels read as stale, never throw") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fresh").toString
    assert(!graft.ops.ArtifactStore.isFresh(s"$dir/never-made", "fp"))
    // a sentinel that exists but can't be read as a file (here: it's a
    // directory — the same IOException surface as a concurrent beginFit
    // deleting it between the exists check and the read) → stale
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir, "_FIT_OK"))
    assert(!graft.ops.ArtifactStore.isFresh(dir, "fp"),
      "an unreadable sentinel must read as stale, not throw")
  }

  test("the recurring path's corpus scan is the pushed-filter delta shard") {
    RefreshArtifacts.q167(spark, sf0001).count() // registers q167_d
    val d = graft.oracle.Tables.persistedFrame("q167_d")
    assert(d.isDefined, "the delta frame must be the registered persist")
    val p = d.get.queryExecution.executedPlan.toString
    // the ts >= cut predicate must reach the events scan as a pushed
    // filter — GreaterThanOrEqual on the raw ts column (any encoding)
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts"),
      s"delta cut not pushed to the parquet scan:\n$p")
  }
}
