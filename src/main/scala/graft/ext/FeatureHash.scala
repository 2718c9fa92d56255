package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Feature hashing (q84) — the hashing-trick featurizer: every word maps
  * to one of `dim` signed buckets (bucket and sign both from the q54
  * md5-hexVal idiom), and a document's feature vector is the per-bucket
  * signed count. This is the input representation of fastText/VW-style
  * linear quality classifiers — the cheap trainable complement to q16's
  * hand-crafted score — and the deterministic text→vector bridge into
  * the embedding-side stack (q19/q51/q81 run unchanged on hashed
  * features).
  *
  * The graded query emits the audit face (the q36 checksum contract):
  * per doc, nnz / L1 / L2² of the hashed vector plus an index-weighted
  * checksum — all INTEGER sums (order-free, engine-exact); a permuted or
  * mis-signed vector fails the checksum. The general form also returns
  * the sparse vector itself (bucket-sorted) for downstream use.
  *
  * Scale shape: ONE explode of the word stream into the (doc, bucket)
  * grain — ≤ min(words, dim) rows per doc after the map-side partial —
  * then a per-doc combine on the same key prefix. No vocabulary table,
  * no join: the hash IS the vocabulary (that is the point of the trick —
  * memory is O(dim), not O(|vocab|), at any corpus size).
  */
object FeatureHash {

  /** (doc_id, features: array<struct<bucket,val>>, nnz, l1, l2sq,
    * checksum) — features sorted by bucket, zero buckets omitted. */
  def featureHashOf(docs: DataFrame, dim: Int = 64): DataFrame = {
    val perBucket = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .withColumn("h", md5(concat(lit("fh|"), col("w"))))
      .withColumn("hv", expr(TextOps.hexVal("h", 1, duck = false)))
      .select(col("doc_id"), expr(s"hv % $dim").as("bucket"),
        expr(s"CASE WHEN (hv div $dim) % 2 = 0 THEN 1L ELSE -1L END").as("sgn"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(sum(col("sgn")).as("v"))
      .filter(col("v") =!= 0)
    perBucket.groupBy(col("doc_id"))
      .agg(
        sort_array(collect_list(struct(col("bucket"), col("v")))).as("features"),
        count(lit(1)).as("nnz"),
        sum(abs(col("v"))).as("l1"),
        sum(expr("v * v")).as("l2sq"),
        sum(expr("(bucket + 1) * v")).as("checksum"))
  }

  // ---------------------------------------------------------------- q84
  /** Audit face only (arrays stay Spark-side; the oracle recomputes the
    * integer invariants). */
  def q84(spark: SparkSession, sfDir: String): DataFrame =
    featureHashOf(Tables.table(spark, sfDir, "documents"))
      .select(col("doc_id"), col("nnz"), col("l1"), col("l2sq"), col("checksum"))

  private def q84Sql(dim: Int = 64): String =
    s"""WITH w AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |hb AS (
       |  SELECT doc_id, ${TextOps.hexVal("md5('fh|' || w)", 1, duck = true)} AS hv
       |  FROM w),
       |pb AS (
       |  SELECT doc_id, hv % $dim AS bucket,
       |         CAST(sum(CASE WHEN (hv // $dim) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS v
       |  FROM hb GROUP BY 1, 2),
       |nz AS (SELECT * FROM pb WHERE v != 0)
       |SELECT doc_id,
       |       count(*) AS nnz,
       |       CAST(sum(abs(v)) AS BIGINT) AS l1,
       |       CAST(sum(v * v) AS BIGINT) AS l2sq,
       |       CAST(sum((bucket + 1) * v) AS BIGINT) AS checksum
       |FROM nz GROUP BY doc_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q84_feature_hash", q84, Some(q84Sql()))
  )
}
