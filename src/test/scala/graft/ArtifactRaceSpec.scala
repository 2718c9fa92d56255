package graft

import graft.ops.ArtifactStore

/** Writer-vs-writer artifact races (r15 verdict Next #7):
  * RefreshArtifactsSpec covers reader-vs-refit and GC; this spec pins
  * the adjudication of two CONCURRENT fits — deterministic
  * interleavings first, then a threaded stress — proving the protocol's
  * two invariants:
  *
  *   1. the sentinel ALWAYS names a COMPLETE generation: commitFit is
  *      called only after that writer's payload is fully written, and
  *      no other writer's GC can delete the dir the sentinel currently
  *      names (GC removes only non-current dirs beyond the newest);
  *   2. last-writer-wins is the adjudication — whichever commitFit runs
  *      last owns the sentinel — and the LOSER's generation survives as
  *      the one kept superseded dir (the live-reader race window), so a
  *      reader that validated the loser's fp just before the winner's
  *      commit can still finish its scan.
  *
  * The mid-fit window is also pinned: between a writer's beginFit
  * (sentinel deleted) and its commitFit, isFresh is false for EVERY
  * fp — a fit in flight makes the store unfresh by design, never
  * half-fresh. */
class ArtifactRaceSpec extends SparkSpec {

  private def writePayload(dir: String, n: Long): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    spark.range(n).write.mode("overwrite").parquet(s"$dir/data")
  }

  private def readPayload(dir: String): Long =
    spark.read.parquet(s"$dir/data").count()

  private def vdirs(base: String): Seq[String] = {
    val s = java.nio.file.Files.list(java.nio.file.Paths.get(base))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString).filter(_.startsWith("v-")).toSeq
    } finally s.close()
  }

  test("interleaving A-begin B-begin A-commit B-commit: last writer wins, loser survives one generation") {
    val base = java.nio.file.Files.createTempDirectory("graft_race1").toString
    val (fpA, fpB) = ("writerA", "writerB")
    val (dirA, dirB) = (ArtifactStore.versionDir(base, fpA), ArtifactStore.versionDir(base, fpB))
    ArtifactStore.beginFit(base); writePayload(dirA, 11L)
    ArtifactStore.beginFit(base); writePayload(dirB, 22L)
    // mid-fit: nothing is fresh — both sentinels deleted by the begins
    assert(!ArtifactStore.isFresh(base, fpA) && !ArtifactStore.isFresh(base, fpB))
    ArtifactStore.commitFit(base, fpA)
    assert(ArtifactStore.isFresh(base, fpA), "A committed: A is the current generation")
    assert(readPayload(dirA) == 11L)
    assert(vdirs(base).contains("v-writerB"),
      "A's GC must not delete B's in-flight dir (it is the newest non-current)")
    ArtifactStore.commitFit(base, fpB)
    assert(!ArtifactStore.isFresh(base, fpA) && ArtifactStore.isFresh(base, fpB),
      "B committed last: last-writer-wins")
    assert(readPayload(dirB) == 22L, "the winning sentinel must name a complete generation")
    assert(readPayload(dirA) == 11L,
      "the loser survives as the kept superseded generation (live-reader window)")
  }

  test("inverted order (B full fit inside A's window) and a third stale generation: GC never deletes the winner") {
    val base = java.nio.file.Files.createTempDirectory("graft_race2").toString
    // generation 0: an old committed fit
    ArtifactStore.beginFit(base)
    writePayload(ArtifactStore.versionDir(base, "old"), 5L)
    ArtifactStore.commitFit(base, "old")
    Thread.sleep(20) // distinct mtimes for the GC's newest-first ordering
    val (fpA, fpB) = ("slowA", "fastB")
    val (dirA, dirB) = (ArtifactStore.versionDir(base, fpA), ArtifactStore.versionDir(base, fpB))
    ArtifactStore.beginFit(base) // A starts...
    ArtifactStore.beginFit(base); writePayload(dirB, 22L)
    ArtifactStore.commitFit(base, fpB) // ...B lands a FULL fit inside A's window
    assert(ArtifactStore.isFresh(base, fpB))
    writePayload(dirA, 11L) // A still writing after B committed
    ArtifactStore.commitFit(base, fpA)
    assert(ArtifactStore.isFresh(base, fpA), "A committed last: A owns the sentinel")
    assert(readPayload(dirA) == 11L, "winner complete")
    assert(readPayload(dirB) == 22L, "B survives as the one kept superseded generation")
    assert(!vdirs(base).contains("v-old"), "the third generation is GC'd")
    assert(vdirs(base).size <= 2, s"disk bounded at two generations: ${vdirs(base)}")
  }

  test("threaded stress: whichever writer commits last, the sentinel names a complete readable generation") {
    (1 to 5).foreach { round =>
      val base = java.nio.file.Files.createTempDirectory(s"graft_race3_$round").toString
      val writers = Seq(("thrA", 31L), ("thrB", 62L))
      val threads = writers.map { case (fp, n) =>
        val t = new Thread(() => {
          val dir = ArtifactStore.versionDir(base, fp)
          ArtifactStore.beginFit(base)
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
          // plain-file payload: Spark writes are not thread-safe to race
          // on one session for a UNIT test; the store protocol is what is
          // under test and it is engine-agnostic
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(dir, "payload.txt"), s"n=$n")
          ArtifactStore.commitFit(base, fp)
        })
        t.start(); t
      }
      threads.foreach(_.join())
      val sentinel = java.nio.file.Files.readString(
        java.nio.file.Paths.get(base, "_FIT_OK")).trim
      assert(writers.map(_._1).contains(sentinel), s"round $round: sentinel '$sentinel'")
      assert(ArtifactStore.isFresh(base, sentinel),
        s"round $round: the stamped fp must validate (complete generation)")
      val payload = java.nio.file.Files.readString(java.nio.file.Paths.get(
        ArtifactStore.versionDir(base, sentinel), "payload.txt"))
      val expected = writers.find(_._1 == sentinel).get._2
      assert(payload == s"n=$expected",
        s"round $round: the winner's payload must be its own complete write")
      assert(vdirs(base).size <= 2, s"round $round: ${vdirs(base)}")
    }
  }
}
