package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Storage-layout operators: pre-bucketing for co-located joins.
  *
  * At 100 TB the dominant cost of a fact⋈fact join is shuffling both sides
  * on the key. Bucketed tables move that shuffle to WRITE time, once: both
  * sides stored with `bucketBy(n, key)` hash-partition their files by the
  * same function Catalyst uses for exchanges, so every later join or
  * aggregation on the key plans with ZERO Exchange on either side (and with
  * `sortBy`, zero Sort for sort-merge). Any pipeline that joins the same
  * big tables repeatedly — training-data joins of documents⋈embeddings on
  * doc_id every epoch — amortizes one write-side shuffle across every
  * downstream read. LayoutSpec pins the exchange-free plan.
  *
  * Constraints Spark imposes (and this helper encodes): bucketed data must
  * go through the catalog (`saveAsTable`; plain `.parquet(path)` silently
  * drops bucket metadata), and both join sides need the same bucket count
  * (or an integer multiple, with `spark.sql.bucketing.coalesceBucketsInJoin
  * .enabled`).
  */
object Layout {

  /** Persist `df` bucketed and sorted by `key` as catalog table `table`.
    * Bucket count is a real tuning knob at scale: files-per-table =
    * buckets × writing-tasks, and each bucket must fit an executor's read
    * side — at 100 TB / 1000 buckets that is 100 GB per bucket, so size
    * `buckets` to the target scan parallelism, not a small constant. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, key: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
