package graft

import graft.ext.{BpeDrift, BpeEncode}
import graft.oracle.Tables
import org.apache.spark.sql.functions._

/** q185 — the tokenizer ARTIFACT: merges + fit-time fertility baseline
  * persisted under the sentinel protocol; the recurring drift read
  * touches only the arriving shard. */
class BpeStoreSpec extends SparkSpec {

  private def tmpStore() =
    java.nio.file.Files.createTempDirectory("graft_bpe_store").toString

  test("store round-trips the merge table losslessly and the drift read == q183's final cycle") {
    val docs = Tables.table(spark, sf0001, "documents")
    val dir = tmpStore()
    val got = BpeDrift.storeDriftOf(spark, docs, dir, "fp1").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5)))).toMap
    // the stored merges ARE fitBatched's merges, byte-for-byte
    val d = BpeDrift.docsWithDay(docs)
    val (merges, _) = BpeEncode.fitBatched(d.filter(col("day") === 0).select(col("text")))
    val stored = spark.read.parquet(s"${graft.ops.ArtifactStore.versionDir(dir, "fp1")}/merges")
      .orderBy(col("sweep"), col("rnk")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(stored.toSeq == merges.map(m => (m.sweep, m.rnk, m.a, m.b, m.pair_count)),
      "parquet round-trip of the merge table must be lossless")
    // the store path == the in-memory chain's final cycle
    val chain = BpeDrift.fertilityChainOf(docs).filter(col("cycle") === BpeDrift.Cycles)
      .collect()
      .map(r => (r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5),
          if (r.isNullAt(6)) None else Some(r.getLong(6)))).toMap
    assert(got == chain, s"store drift != chain final cycle (${got.size} vs ${chain.size})")
    graft.oracle.Tables.releasePersisted()
  }

  test("staleness: a corrupted sentinel forces a refit; a second read reuses the artifact (no refit)") {
    val docs = Tables.table(spark, sf0001, "documents")
    val dir = tmpStore()
    BpeDrift.storeDriftOf(spark, docs, dir, "fpA").count()
    val vdir = java.nio.file.Paths.get(graft.ops.ArtifactStore.versionDir(dir, "fpA"), "merges")
    val mtime0 = java.nio.file.Files.getLastModifiedTime(vdir).toMillis
    // fresh read: must NOT refit (artifact mtime unchanged)
    BpeDrift.storeDriftOf(spark, docs, dir, "fpA").count()
    assert(java.nio.file.Files.getLastModifiedTime(vdir).toMillis == mtime0,
      "a fresh artifact must be read, not refit")
    // corrupt the sentinel → stale → refit under the new fp
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "_FIT_OK"), "garbage")
    BpeDrift.storeDriftOf(spark, docs, dir, "fpB").count()
    assert(graft.ops.ArtifactStore.isFresh(dir, "fpB"), "refit must restamp")
    graft.oracle.Tables.releasePersisted()
  }
}
