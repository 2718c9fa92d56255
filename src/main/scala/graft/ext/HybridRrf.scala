package graft.ext

import graft.agg.TopK
import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval with reciprocal-rank fusion (q141) — the standard
  * two-tower retrieval stack, end to end: a LEXICAL arm (word-set
  * Jaccard over an inverted index — the sparse/keyword signal) and a
  * SEMANTIC arm (brute-force cosine over the aligned embeddings —
  * q19's machinery at k=10, via Similarity.cosineRanks), fused by RRF:
  * score(d) = Σ_systems 1/(60+rank_s(d)), the fusion rule RAG stacks
  * and search engines use because it needs no score calibration across
  * heterogeneous systems. Fixture alignment: doc_id and vec_id share
  * the 0..N id space (TESTDATA.md), queries are ids < 20 (q19's set).
  *
  * Exact semantics: both arms emit integer ranks (ties by candidate
  * id); RRF contributions are integer micro-units 1_000_000 div
  * (60+rank), absent-from-one-arm contributes 0; fused order is
  * (rrf_ppm DESC, cand_id), top 5 per query. All-integer, so the
  * cross-engine hash is exact.
  *
  * Scale shape: the tokenized corpus persists ONCE and feeds postings,
  * the df census, and doc lengths (three readers). The lexical join is
  * inverted-index-shaped (one word-keyed exchange, never doc×doc) with
  * q14's dfCap discipline: words with df > cap are dropped from BOTH
  * engines before pairing — a stopword like "the" would otherwise fan
  * out O(df²); dropping it is a DECLARED recall trade that improves
  * retrieval (it is stopword removal). The query side of the join is a
  * bounded set (20 query docs' vocabularies) and broadcasts. The
  * semantic arm broadcasts the query vectors against one corpus scan
  * (q19's posture). Fusion joins two ≤k-per-query rank lists — census
  * grain; its per-query window orders ≤2k rows. */
object HybridRrf {

  /** (query_id, cand_id, lex_rank, cos_rank, rrf_ppm, fused_rank ≤ 5);
    * lex/cos ranks NULL where the arm did not retrieve the candidate. */
  def hybridRrfOf(spark: SparkSession, sfDir: String, k: Int = 10,
                  dfCap: Int = TextOps.DefaultDfCap): DataFrame = {
    val docsW = Tables.swapPersist("q141_words",
      Tables.fanned(Tables.table(spark, sfDir, "documents")
          .select(col("doc_id"), col("text")))
        .select(col("doc_id"),
          array_distinct(filter(split(col("text"), " "), w => w =!= "")).as("ws"))
        .withColumn("nw", size(col("ws")).cast("long")))
    val postings = docsW.select(col("doc_id"), explode(col("ws")).as("word"))
    val okWords = postings.groupBy(col("word")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap).select(col("word"))
    val post = postings.join(okWords, Seq("word"))
    val qpost = post.filter(col("doc_id") < 20)
      .select(col("doc_id").as("query_id"), col("word"))
    val inter = broadcast(qpost).join(post, Seq("word"))
      .filter(col("query_id") =!= col("doc_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("inter"))
    val lens = docsW.select(col("doc_id"), col("nw"))
    val scored = inter
      .join(lens.select(col("doc_id").as("query_id"), col("nw").as("n_q")), Seq("query_id"))
      .join(lens.select(col("doc_id"), col("nw").as("n_d")), Seq("doc_id"))
      .withColumn("jac_bp", expr("(inter * 10000) div (n_q + n_d - inter)"))
    val lex = scored.groupBy(col("query_id"))
      .agg(TopK(k)(col("jac_bp").cast("double"), col("doc_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.id").as("cand_id"),
        (col("pos") + 1).cast("long").as("lex_rank"))
    val cos = Similarity.cosineRanks(spark, sfDir, k)
      .select(col("query_id"), col("neighbor_id").as("cand_id"),
        col("rank").as("cos_rank"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_ppm").desc, col("cand_id"))
    lex.join(cos, Seq("query_id", "cand_id"), "full_outer")
      .withColumn("rrf_ppm",
        coalesce(expr("1000000 div (60 + lex_rank)"), lit(0L)) +
          coalesce(expr("1000000 div (60 + cos_rank)"), lit(0L)))
      // census-grain window: ≤ 2k rows per query survive the arm top-k
      .withColumn("fused_rank", row_number().over(w).cast("long"))
      .filter(col("fused_rank") <= 5)
      .select(col("query_id"), col("cand_id"), col("lex_rank"),
        col("cos_rank"), col("rrf_ppm"), col("fused_rank"))
  }

  // ---------------------------------------------------------------- q141
  def q141(spark: SparkSession, sfDir: String): DataFrame =
    hybridRrfOf(spark, sfDir)

  private def q141Sql(k: Int = 10, dfCap: Int = TextOps.DefaultDfCap): String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |         list_distinct(list_filter(string_split(text, ' '), w -> w != '')) AS ws
       |  FROM documents),
       |n AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS nw FROM d),
       |p0 AS (SELECT doc_id, unnest(ws) AS word FROM d),
       |okw AS (SELECT word FROM p0 GROUP BY word HAVING count(*) <= $dfCap),
       |p AS (SELECT p0.doc_id, p0.word FROM p0 JOIN okw USING (word)),
       |qp AS (SELECT doc_id AS query_id, word FROM p WHERE doc_id < 20),
       |i AS (
       |  SELECT query_id, p.doc_id, CAST(count(*) AS BIGINT) AS inter
       |  FROM qp JOIN p USING (word) WHERE query_id != p.doc_id GROUP BY 1, 2),
       |j AS (
       |  SELECT query_id, i.doc_id,
       |         (inter * 10000) // (nq.nw + nd.nw - inter) AS jac_bp
       |  FROM i JOIN n nq ON nq.doc_id = i.query_id JOIN n nd ON nd.doc_id = i.doc_id),
       |lr AS (
       |  SELECT query_id, doc_id AS cand_id,
       |         row_number() OVER (PARTITION BY query_id ORDER BY jac_bp DESC, doc_id)
       |           AS lex_rank
       |  FROM j),
       |lex AS (SELECT * FROM lr WHERE lex_rank <= $k),
       |${Similarity.embCte},
       |q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 20),
       |cs AS (
       |  SELECT query_id, vec_id,
       |         round(list_dot_product(qv, v) /
       |               (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6) AS sim
       |  FROM q JOIN emb ON query_id != vec_id),
       |cr AS (
       |  SELECT query_id, vec_id AS cand_id,
       |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS cos_rank
       |  FROM cs),
       |cos AS (SELECT * FROM cr WHERE cos_rank <= $k),
       |f AS (
       |  SELECT COALESCE(lex.query_id, cos.query_id) AS query_id,
       |         COALESCE(lex.cand_id, cos.cand_id) AS cand_id,
       |         lex.lex_rank, cos.cos_rank
       |  FROM lex FULL JOIN cos
       |    ON lex.query_id = cos.query_id AND lex.cand_id = cos.cand_id),
       |r AS (
       |  SELECT query_id, cand_id, lex_rank, cos_rank,
       |         COALESCE(1000000 // (60 + lex_rank), 0) +
       |         COALESCE(1000000 // (60 + cos_rank), 0) AS rrf_ppm
       |  FROM f)
       |SELECT query_id, cand_id, lex_rank, cos_rank, rrf_ppm,
       |       CAST(row_number() OVER (PARTITION BY query_id
       |                               ORDER BY rrf_ppm DESC, cand_id) AS BIGINT)
       |         AS fused_rank
       |FROM r
       |QUALIFY fused_rank <= 5""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q141_hybrid_rrf", q141, Some(q141Sql())))
}
