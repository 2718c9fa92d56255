package graft.ops

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curriculum shard layout (q79) — the difficulty-ordered face of the
  * epoch shuffle: every document gets a shard (of N readers) and a
  * position within its shard such that each reader consumes its slice
  * EASY → HARD (curriculum learning's data-order contract), with
  * difficulty = the corpus-relative unigram surprisal q43 already
  * computes (integer millibits — engine-exact). Shard assignment stays
  * the md5 hash of (epoch, doc_id), so every shard sees the full
  * difficulty spectrum and re-keying the epoch re-deals the shards while
  * each stays internally easy→hard.
  *
  * Scale shape: q43's single-explode surprisal pipeline feeds ONE hash
  * exchange into N shards followed by a shard-local sort of corpus/N
  * rows by (difficulty, id) — identical cost to q54's epoch shuffle, the
  * sort key is just semantic instead of random. No global sort: the
  * curriculum contract is per-reader order, which shard-local sorting
  * delivers exactly.
  */
object Curriculum {

  /** (doc_id, shard, pos, diff_millibits): `pos` = 1-based easy→hard rank
    * within the shard; `diff_millibits` = avg surprisal millibits/word
    * (integer floor division — deterministic tie-break by doc_id). */
  def curriculumShardsOf(docs: DataFrame, numShards: Int = 8, epoch: Int = 1): DataFrame = {
    val scored = graft.ext.CurationOps.surprisalScoreOf(docs)
      .select(col("doc_id"),
        expr("sum_millibits div n_words").as("diff_millibits"))
    scored
      .withColumn("h", md5(concat(lit(s"cur$epoch|"), col("doc_id"))))
      .withColumn("shard",
        expr(s"${graft.ext.TextOps.hexVal("h", 1, duck = false)} % $numShards").cast("int"))
      .withColumn("pos", row_number().over(Window.partitionBy(col("shard"))
        .orderBy(col("diff_millibits"), col("doc_id"))))
      .select(col("doc_id"), col("shard"), col("pos"), col("diff_millibits"))
  }

  // ---------------------------------------------------------------- q79
  def q79(spark: SparkSession, sfDir: String): DataFrame =
    curriculumShardsOf(Tables.table(spark, sfDir, "documents"))

  private def q79Sql(numShards: Int = 8, epoch: Int = 1): String =
    s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |freq AS (SELECT w, count(*) AS c FROM w GROUP BY w),
       |tot AS (SELECT count(*) AS n FROM w),
       |s AS (SELECT doc_id, CAST(round(ln(n / c) / ln(2) * 1000) AS BIGINT) AS mb
       |      FROM w JOIN freq USING (w) CROSS JOIN tot),
       |d AS (SELECT doc_id, count(*) AS n_words, CAST(sum(mb) AS BIGINT) AS sum_millibits
       |      FROM s GROUP BY doc_id),
       |k AS (SELECT doc_id,
       |             CAST(sum_millibits // n_words AS BIGINT) AS diff_millibits,
       |             md5('cur$epoch|' || doc_id) AS h
       |      FROM d),
       |sh AS (SELECT doc_id, diff_millibits,
       |              CAST(${graft.ext.TextOps.hexVal("h", 1, duck = true)} % $numShards AS INT) AS shard
       |       FROM k)
       |SELECT doc_id, shard,
       |       CAST(row_number() OVER (PARTITION BY shard
       |         ORDER BY diff_millibits, doc_id) AS INT) AS pos,
       |       diff_millibits
       |FROM sh""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q79_curriculum_shards", q79, Some(q79Sql()))
  )
}
