package graft.ops

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — grouping documents into fixed token-budget bins, the
  * step that turns a deduped corpus into training batches.
  *
  * Exact first-fit packing is inherently sequential; the distributed
  * version that actually ships is cumulative-fill: within a shard, order
  * documents deterministically, running-sum their token counts, and assign
  * bin = pre_cumsum / budget. Every bin lands within one document of the
  * budget (the straddling doc overflows its bin rather than opening a
  * gap), assignment is a single window pass, and the result is stable
  * under re-runs — the properties that matter for reproducible training
  * batches.
  *
  * Scale comes from the shard key, not the window: packing partitions by
  * (source, shard) where shard is md5-derived from doc_id (deterministic,
  * engine-portable — same arithmetic as q26's sampler). One sequential
  * fill per shard, `shards` × sources parallel lanes, bins within budget+1
  * doc per lane. A per-source-only window (4-10 lanes) would serialize the
  * corpus scan at 100 TB.
  */
object SequencePack {

  private def shardExpr(shards: Int) =
    // first 6 md5 nibbles as an int, mod shards (cross-engine exact)
    expr(s"cast(conv(substr(md5(concat('pack|', doc_id)), 1, 6), 16, 10) AS BIGINT) % $shards")

  /** Per (source, shard, bin): document count, token total, id range. */
  def pack(docs: DataFrame, budget: Long, shards: Int): DataFrame = {
    val w = Window.partitionBy(col("source"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("tokens"))
      .withColumn("shard", shardExpr(shards))
      .withColumn("cum", sum(col("tokens")).over(w))
      .withColumn("bin", ((col("cum") - col("tokens")) / budget).cast("long"))
      .groupBy(col("source"), col("shard"), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  // ---------------------------------------------------------------- q33
  val Budget = 2048L
  val Shards = 16

  def q33(spark: SparkSession, sfDir: String): DataFrame =
    pack(Tables.table(spark, sfDir, "documents"), Budget, Shards)

  private val q33Sql =
    s"""WITH t AS (SELECT doc_id, source, len(string_split(text, ' ')) AS tokens,
       |                  ('0x' || substr(md5('pack|' || doc_id), 1, 6))::BIGINT % $Shards AS shard
       |           FROM documents),
       |c AS (SELECT *, sum(tokens) OVER (PARTITION BY source, shard ORDER BY doc_id
       |                                  ROWS UNBOUNDED PRECEDING) AS cum
       |      FROM t)
       |SELECT source, shard, CAST(floor((cum - tokens) / $Budget) AS BIGINT) AS bin,
       |       count(*) AS n_docs, CAST(sum(tokens) AS BIGINT) AS bin_tokens,
       |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM c GROUP BY source, shard, bin""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q33_sequence_pack", q33, Some(q33Sql))
  )
}
