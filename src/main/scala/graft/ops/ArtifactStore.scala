package graft.ops

import org.apache.spark.sql.SparkSession

/** Shared plumbing for persisted derived-state artifacts (the q167
  * discipline, reused by every artifact-read operator): a per-(sfDir,
  * tag) local directory, a fixture fingerprint, and the crash-safe
  * `_FIT_OK` sentinel protocol — deleted FIRST by a fit, stamped LAST
  * over the fingerprint, so a crash mid-fit or a regenerated fixture
  * forces a refit and stale artifacts can never be joined against a
  * newer corpus silently (the Verify `_SF`-sentinel lesson applied to
  * derived state). */
object ArtifactStore {

  /** Local artifact root — override with SPARK_GRAFT_ARTIFACTS. Keyed by
    * (sanitized sfDir, tag): different SFs/operators never share. */
  def root(sfDir: String, tag: String): String = {
    val base = sys.env.getOrElse("SPARK_GRAFT_ARTIFACTS",
      s"${sys.props("java.io.tmpdir")}/graft-artifacts")
    s"$base/${sfDir.replaceAll("[^A-Za-z0-9._-]", "_")}-$tag"
  }

  /** SHA-256 over (extra, sfDir, the fixture table's file listing) —
    * name:length:mtime per file, so a regenerated fixture (same path,
    * new bytes) invalidates the artifacts. `extra` carries the
    * operator's version/cut parameters. */
  def fingerprint(spark: SparkSession, sfDir: String, table: String,
                  extra: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$sfDir/$table.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statuses =
      if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).filter(_.isFile)
      else Array(fs.getFileStatus(p))
    val listing = statuses
      .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .sorted.mkString("|")
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"$extra|$sfDir|$listing"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  private def sentinel(dir: String): java.nio.file.Path =
    java.nio.file.Paths.get(dir, "_FIT_OK")

  /** True iff the sentinel exists, carries `fp`, AND the fp's payload
    * dir exists (a stamped sentinel whose version dir was GC'd or never
    * written — e.g. a dir-naming-scheme migration — must read stale, not
    * send readers at a missing path). A concurrent [[beginFit]] deleting
    * the sentinel between the exists check and the read surfaces as
    * NoSuchFileException — that race means NOT fresh (the fit in flight
    * will re-stamp), never an error. */
  def isFresh(dir: String, fp: String): Boolean =
    try {
      val s = sentinel(dir)
      java.nio.file.Files.exists(s) &&
        java.nio.file.Files.readString(s).trim == fp &&
        java.nio.file.Files.isDirectory(java.nio.file.Paths.get(versionDir(dir, fp)))
    } catch { case _: java.io.IOException => false }

  /** The fingerprint-keyed payload subdir — fits WRITE artifacts under
    * `versionDir(dir, fp)` and readers resolve the same path from the fp
    * they just validated, so a refit against a regenerated fixture (a new
    * fp) lands in a NEW subdir and never rewrites parquet files a running
    * reader's lazy scan still holds (the reader-racing-refit hazard: an
    * overwrite-in-place rewrite makes the old reader fail on missing
    * part-files mid-query). Same-fp refits only happen after a crash
    * mid-fit — when no reader can have passed [[isFresh]] — and are
    * serialized per-JVM by the callers' `synchronized` check+fit blocks.
    * The FULL fingerprint keys the dir (a truncated prefix could collide
    * two distinct fingerprints and silently serve one's artifacts to the
    * other's readers); [[commitFit]] GC's superseded dirs down to one
    * generation. */
  def versionDir(dir: String, fp: String): String =
    s"$dir/v-${fp.replaceAll("[^A-Za-z0-9._-]", "_")}"

  /** Start a fit: create the dir, delete any existing sentinel. */
  def beginFit(dir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.deleteIfExists(sentinel(dir))
  }

  /** Finish a fit: stamp the sentinel LAST, then GC superseded version
    * dirs down to ONE generation — the most recently modified non-current
    * dir survives (it is the live-reader race window the version dirs
    * exist for: a reader that passed [[isFresh]] just before this fit may
    * still lazily scan it — the RefreshArtifactsSpec race contract);
    * everything older can have no reader that validated after a NEWER fit
    * committed, and deleting it bounds on-disk growth at ≤2 payload dirs
    * per store across any number of fixture regenerations/refits. */
  def commitFit(dir: String, fp: String): Unit = {
    java.nio.file.Files.writeString(sentinel(dir), fp)
    val current = java.nio.file.Paths.get(versionDir(dir, fp)).getFileName.toString
    val d = java.nio.file.Paths.get(dir)
    val superseded =
      try {
        val s = java.nio.file.Files.list(d)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala
            .filter(p => java.nio.file.Files.isDirectory(p) &&
              p.getFileName.toString.startsWith("v-") &&
              p.getFileName.toString != current)
            .map(p => p -> java.nio.file.Files.getLastModifiedTime(p).toMillis)
            .toSeq
        } finally s.close()
      } catch { case _: java.io.IOException => Seq.empty }
    superseded.sortBy(-_._2).drop(1).foreach { case (p, _) => deleteTree(p) }
  }

  private def deleteTree(p: java.nio.file.Path): Unit =
    try {
      val s = java.nio.file.Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      } finally s.close()
    } catch { case _: java.io.IOException => () } // best-effort GC
}
