package graft.ops

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic training-epoch shuffle + shard assignment (q54): give
  * every document a shard (of N) and a position within its shard for one
  * epoch, as pure hash arithmetic — the "global shuffle" a training data
  * loader needs WITHOUT a global sort.
  *
  * Why not `ORDER BY rand()`: a global sort is a range exchange over the
  * whole corpus per epoch, its output order is partitioning-dependent, and
  * a preempted job cannot reproduce the permutation. Here shard and order
  * key are both md5 of (epoch, doc_id): re-running any slice of any epoch
  * yields the same permutation (resumable, engine-exact — the q26/q42/q48
  * md5-threshold family), epochs decorrelate by re-keying, and the only
  * movement is ONE hash exchange into N shards followed by a shard-local
  * sort of corpus/N rows. At 100 TB, N is sized to the loader's reader
  * count (thousands), keeping each shard's sort executor-resident; shard
  * files then stream to the trainer in `pos` order with no further
  * shuffling. PlanSpec pins the single-exchange shape.
  */
object EpochShuffle {

  /** (doc_id, shard, pos) for every row of `docs`: shard = md5 bucket of
    * the id, pos = 1-based rank of the id's hash within its shard — a
    * deterministic permutation of the corpus for `epoch`. */
  def epochShuffleOf(docs: DataFrame, numShards: Int = 8, epoch: Int = 1): DataFrame =
    docs.select(col("doc_id"),
        md5(concat(lit(s"epoch$epoch|"), col("doc_id"))).as("h"))
      .withColumn("shard",
        expr(s"${graft.ext.TextOps.hexVal("h", 1, duck = false)} % $numShards").cast("int"))
      .withColumn("pos",
        row_number().over(Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))))
      .select(col("doc_id"), col("shard"), col("pos"))

  // ---------------------------------------------------------------- q54
  def q54(spark: SparkSession, sfDir: String): DataFrame =
    epochShuffleOf(Tables.table(spark, sfDir, "documents").select(col("doc_id")))

  private def q54Sql(numShards: Int = 8, epoch: Int = 1): String =
    s"""WITH h AS (
       |  SELECT doc_id, md5('epoch$epoch|' || doc_id) AS h FROM documents),
       |s AS (
       |  SELECT doc_id, h,
       |         CAST(${graft.ext.TextOps.hexVal("h", 1, duck = true)} % $numShards AS INT) AS shard
       |  FROM h)
       |SELECT doc_id, shard,
       |       CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS INT) AS pos
       |FROM s""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q54_epoch_shuffle", q54, Some(q54Sql()))
  )
}
