package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source embedding-affinity matrix (q128) — pairwise L2 distance between
  * per-source MEAN embeddings: the "which corpora say the same things"
  * map that guides mixture design (q42/q100 weight sources by size and
  * quality; this says which of them are semantically redundant — two
  * sources with a small centroid distance contribute overlapping
  * coverage, and a dedup/mixture pass should treat them jointly).
  *
  * Integer discipline throughout (the KMeans scaladoc rules): embeddings
  * quantize to milli-units, per-dimension means use the floored-division
  * rule, distances are int64 folds — hash-exact across engines.
  *
  * Scale shape: ONE embeddings⋈documents key join attributes vectors to
  * sources (ids and vectors cross the wire once); per-(source, dim) sums
  * aggregate with map-side partials to a ≤|sources|·dim census; the
  * pairwise matrix is a ≤|sources|²-row broadcast cross join over the
  * ≤|sources|-row centroid census — the corpus is never paired, only
  * the census is.
  */
object SourceAffinity {

  /** (src_a, src_b, n_a, n_b, dist) for src_a < src_b, over any
    * (vec_id, embedding) + (doc_id, source) frames. */
  def sourceAffinityOf(embeds: DataFrame, docs: DataFrame): DataFrame = {
    val pts = embeds.join(docs.select(col("doc_id"), col("source")),
        col("vec_id") === col("doc_id"))
      .select(col("source"),
        expr("transform(embedding, x -> CAST(floor(x * 1000.0 + 0.5) AS BIGINT))").as("q"))
    val cents = pts
      .select(col("source"), posexplode(col("q")).as(Seq("d", "v")))
      .groupBy(col("source"), col("d"))
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
      .withColumn("cv", expr("(sv - pmod(sv, n)) div n"))
      .groupBy(col("source"))
      .agg(
        expr("transform(array_sort(collect_list(struct(d, cv))), x -> x.cv)").as("cvec"),
        max(col("n")).as("n_vecs"))
    val a = cents.select(col("source").as("src_a"), col("cvec").as("ca"),
      col("n_vecs").as("n_a"))
    val b = cents.select(col("source").as("src_b"), col("cvec").as("cb"),
      col("n_vecs").as("n_b"))
    a.crossJoin(broadcast(b))
      .filter(col("src_a") < col("src_b"))
      .withColumn("dist", expr(
        "aggregate(zip_with(ca, cb, (x, y) -> (x - y) * (x - y)), 0L, (acc, x) -> acc + x)"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("dist"))
  }

  // ---------------------------------------------------------------- q128
  def q128(spark: SparkSession, sfDir: String): DataFrame =
    sourceAffinityOf(
      Tables.table(spark, sfDir, "embeddings"),
      Tables.table(spark, sfDir, "documents"))

  private def q128Sql(dim: Int = 64): String =
    s"""WITH pts AS (
       |  SELECT d.source,
       |         list_transform(e.embedding,
       |           x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT)) AS q
       |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
       |dims AS (SELECT unnest(range(1, ${dim + 1})) AS j),
       |s AS (SELECT source, j,
       |             CAST(sum(q[j]) AS BIGINT) AS sv, count(*) AS n
       |      FROM pts CROSS JOIN dims GROUP BY 1, 2),
       |c AS (SELECT source,
       |             list(CAST((sv - ((sv % n) + n) % n) // n AS BIGINT) ORDER BY j) AS cvec,
       |             CAST(max(n) AS BIGINT) AS n_vecs
       |      FROM s GROUP BY source)
       |SELECT a.source AS src_a, b.source AS src_b,
       |       a.n_vecs AS n_a, b.n_vecs AS n_b,
       |       CAST(list_sum(list_transform(range(1, ${dim + 1}),
       |         j -> (a.cvec[j] - b.cvec[j]) * (a.cvec[j] - b.cvec[j]))) AS BIGINT) AS dist
       |FROM c a JOIN c b ON a.source < b.source""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q128_source_affinity", q128, Some(q128Sql()))
  )
}
