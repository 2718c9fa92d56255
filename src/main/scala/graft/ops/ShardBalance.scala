package graft.ops

import graft.ext.TextOps
import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shard load-balance audit (q113) — per-shard document and TOKEN mass of
  * the q54 epoch-shuffle layout, each shard's load as basis points of the
  * ideal (10⁴ = perfectly balanced): the straggler predictor for a
  * training run. Readers consume shards in parallel, so epoch wall-clock
  * is the SLOWEST shard — a shard at 11,500 bp costs 15% of the whole
  * fleet's time. md5 sharding balances document COUNTS by construction;
  * this audit checks the thing that actually matters (token mass, which
  * md5 knows nothing about) before the first epoch is scheduled.
  *
  * Scale shape: shard id and token count are in-row expressions over ONE
  * corpus scan (the q54 md5 rule, no window/pos needed for mass); the
  * only exchange is the ≤ numShards-row aggregation with map-side
  * partials; the ideal-load census is a 1-row broadcast back. Integer
  * basis points throughout.
  */
object ShardBalance {

  /** (shard, n_docs, n_tokens, load_bp) over any (doc_id, text) frame;
    * load_bp = shard tokens ÷ (total/numShards) in basis points. */
  def shardBalanceOf(docs: DataFrame, numShards: Int = 8, epoch: Int = 1): DataFrame = {
    val perShard = docs
      .withColumn("h", md5(concat(lit(s"epoch$epoch|"), col("doc_id"))))
      .withColumn("shard",
        expr(s"CAST(${TextOps.hexVal("h", 1, duck = false)} % $numShards AS INT)"))
      .withColumn("toks", size(split(col("text"), " ")).cast("long"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
    // total via a census window, NOT a second aggregation of the corpus
    // subtree — a crossJoin(agg(perShard)) re-derives the whole per-shard
    // pass (PlanSpec pins the single exchange)
    perShard
      .withColumn("tot", sum(col("n_tokens")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        expr(s"n_tokens * $numShards * 10000 div tot").as("load_bp"))
  }

  // ---------------------------------------------------------------- q113
  def q113(spark: SparkSession, sfDir: String): DataFrame =
    shardBalanceOf(Tables.table(spark, sfDir, "documents"))

  private def q113Sql(numShards: Int = 8, epoch: Int = 1): String =
    s"""WITH s AS (
       |  SELECT CAST(${TextOps.hexVal("h", 1, duck = true)} % $numShards AS INT) AS shard,
       |         len(string_split(text, ' '))::BIGINT AS toks
       |  FROM (SELECT md5('epoch$epoch|' || doc_id) AS h, text FROM documents)),
       |p AS (SELECT shard, count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS n_tokens
       |      FROM s GROUP BY shard),
       |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM p)
       |SELECT shard, n_docs, n_tokens,
       |       CAST(n_tokens * $numShards * 10000 // tot AS BIGINT) AS load_bp
       |FROM p CROSS JOIN t""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q113_shard_balance", q113, Some(q113Sql()))
  )
}
