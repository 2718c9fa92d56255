package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cluster topic labeling (q62) — name each embedding cell by its top
  * distinguishing terms. Documents are routed to their vector's k-means
  * cell (doc_id = vec_id over the SAME checkpointed fixed point as
  * q51/q53/q61, so labels describe exactly the clusters the other
  * operators act on), then terms are ranked per cluster by c-TF-IDF:
  * tf(term, cluster) · ln(n_clusters / n_clusters_containing_term). A
  * term every cluster shares scores 0 (ln 1); a high-frequency term
  * unique to one cell dominates — the standard cluster-labeling scheme
  * (BERTopic's class-based TF-IDF shape) over the corpus's own clusters.
  *
  * Determinism: tf and cluster-df are exact integer counts, the score is
  * one IEEE ln + multiply rounded to 6 dp BEFORE ranking (the q29 idiom —
  * both engines agree bit-for-bit on round-half-up at 6 dp of an exact
  * product), ties break (score desc, term asc) in both engines.
  *
  * Scale shape: ONE corpus-sized equi-join (text → cid on doc_id =
  * vec_id, both sides co-keyed by id) feeds a map-side-partial
  * (cid, term) count; everything after lives in cluster×vocab space —
  * `swapPersist`ed ONCE and read three times (score join, cluster-df,
  * cluster count), so the corpus join and tokenize execute exactly once
  * per call (PlanSpec-pinned). n_clusters crosses in as a broadcast
  * 1-row aggregate (no driver collect); final ranking is the bounded
  * [[graft.agg.TopTerms]] aggregator — ≤ topN rows per cluster×partition
  * reach the exchange, never a corpus-wide window sort. */
object TopicLabel {

  /** General form over (doc_id, text) docs and (vec_id, embedding) vectors.
    * Output: (cid, rank, term, score) — topN rows per non-empty cluster. */
  def topicLabelsOf(docs: DataFrame, embeds: DataFrame, k: Int = 8,
                    iters: Int = 2, topN: Int = 5): DataFrame = {
    val assigned = KMeans.assignments(embeds, k, iters)
      .select(col("vec_id"), col("cid"))
    // (cid, term) counts: cluster×vocab-sized — keyed persist, read by
    // the score join, the cluster-df rollup AND the cluster count; bare
    // references would re-run the corpus join+tokenize once each.
    val tf = Tables.swapPersist("topic_tf",
      docs.select(col("doc_id"), col("text"))
        .join(assigned, col("doc_id") === col("vec_id"))
        .select(col("cid"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("cid"), col("w")).agg(count(lit(1)).as("tf")))
    val cdf = tf.groupBy(col("w")).agg(count(lit(1)).as("cdf"))
    val nc = tf.agg(countDistinct(col("cid")).as("nc"))
    tf.join(cdf, "w").crossJoin(broadcast(nc))
      .withColumn("score", round(col("tf") * log(col("nc") / col("cdf")), 6))
      .groupBy(col("cid"))
      .agg(graft.agg.TopTerms(topN)(col("score"), col("w")).as("top"))
      .select(col("cid"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("cid").cast("long").as("cid"),
        (col("pos") + 1).cast("long").as("rank"),
        col("t.term").as("term"), col("t.score").as("score"))
  }

  // ---------------------------------------------------------------- q62
  def q62(spark: SparkSession, sfDir: String): DataFrame =
    topicLabelsOf(Tables.table(spark, sfDir, "documents"),
      Tables.table(spark, sfDir, "embeddings"))

  private def q62Sql(k: Int = 8, iters: Int = 2, dim: Int = 64,
                     topN: Int = 5): String =
    s"""WITH ${KMeans.duckFitCtes(k, iters, dim)},
       |w AS (
       |  SELECT f.cid, unnest(string_split(d.text, ' ')) AS w
       |  FROM documents d JOIN fin f ON f.vec_id = d.doc_id),
       |tf AS (SELECT cid, w, count(*) AS tf FROM w GROUP BY cid, w),
       |cdf AS (SELECT w, count(*) AS cdf FROM tf GROUP BY w),
       |nc AS (SELECT count(DISTINCT cid) AS nc FROM tf),
       |s AS (
       |  SELECT cid, tf.w AS term, round(tf * ln(nc.nc / cdf), 6) AS score
       |  FROM tf JOIN cdf ON tf.w = cdf.w CROSS JOIN nc),
       |r AS (
       |  SELECT cid, term, score,
       |         row_number() OVER (PARTITION BY cid ORDER BY score DESC, term) AS rank
       |  FROM s)
       |SELECT CAST(cid AS BIGINT) AS cid, rank, term, score
       |FROM r WHERE rank <= $topN""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q62_cluster_topics", q62, Some(q62Sql()))
  )
}
