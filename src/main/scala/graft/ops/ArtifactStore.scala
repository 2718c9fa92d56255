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

  /** True iff the sentinel exists and carries `fp`. A concurrent
    * [[beginFit]] deleting the sentinel between the exists check and the
    * read surfaces as NoSuchFileException — that race means NOT fresh
    * (the fit in flight will re-stamp), never an error. */
  def isFresh(dir: String, fp: String): Boolean =
    try {
      val s = sentinel(dir)
      java.nio.file.Files.exists(s) &&
        java.nio.file.Files.readString(s).trim == fp
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
    * Superseded version dirs are garbage, not hazards; callers may GC
    * them on fit. */
  def versionDir(dir: String, fp: String): String = s"$dir/v-${fp.take(16)}"

  /** Start a fit: create the dir, delete any existing sentinel. */
  def beginFit(dir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.deleteIfExists(sentinel(dir))
  }

  /** Finish a fit: stamp the sentinel LAST. */
  def commitFit(dir: String, fp: String): Unit =
    java.nio.file.Files.writeString(sentinel(dir), fp)
}
