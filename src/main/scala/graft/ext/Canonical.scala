package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical-representative selection (q67) — the keeper policy AFTER
  * near-dup clustering: q38 labels every clustered doc with its
  * component root, but a pipeline then keeps ONE doc per cluster, and
  * the usual "lowest id" default discards information — a cluster's
  * members differ in quality (truncation, boilerplate, OCR noise), and
  * the corpus should retain the BEST copy, not the first-crawled one.
  * keep = the cluster's argmax quality_score (q16's scorer), ties to
  * the lower doc_id; singletons keep themselves.
  *
  * Scale shape: the closure runs over the PAIR graph only (docs
  * appearing in near-dup pairs — corpus-fraction ≈ dup rate, the q48
  * argument), so the cluster table BROADCASTS onto the corpus for the
  * root attach; quality is scored only for clustered docs, never the
  * whole corpus; the per-cluster winner is max over a (quality, -id)
  * struct with map-side partials (the q60 argmax idiom) — no window
  * over anything corpus-sized. The verdict is two broadcast joins plus
  * a map-side comparison: the corpus itself never shuffles.
  */
object Canonical {

  /** General form: every doc in `docs` with its near-dup cluster root
    * (singletons root themselves) and keep ∈ {0,1} — 1 iff the doc is
    * its cluster's best-quality member (ties → lower doc_id) or
    * unclustered. Inherits [[graft.ops.Components.connectedComponents]]'
    * convergence contract: throws rather than electing keepers from a
    * partial closure. */
  def canonicalKeepers(docs: DataFrame, pairs: DataFrame,
                       maxIter: Int = 15): DataFrame = {
    val cc = graft.ops.Components.connectedComponents(pairs, "doc_a", "doc_b", maxIter)
    // Score ONLY the clustered docs: inner join against the (small)
    // label table, then argmax per cluster as a struct-max aggregate.
    val winners = TextOps.scoredDocs(
        docs.join(broadcast(cc), col("doc_id") === col("v"))
          .select(col("doc_id"), col("cluster_id"), col("text")))
      .groupBy(col("cluster_id"))
      .agg(max(struct(col("quality_score").as("q"), (-col("doc_id")).as("ni"))).as("w"))
      .select(col("cluster_id").as("wc"), (-col("w.ni")).as("keeper"))
    docs.select(col("doc_id"))
      .join(broadcast(cc), col("doc_id") === col("v"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("root"))
      .join(broadcast(winners), col("root") === col("wc"), "left")
      .select(col("doc_id"), col("root"),
        (col("keeper").isNull || col("doc_id") === col("keeper")).cast("int").as("keep"))
  }

  // ---------------------------------------------------------------- q67
  /** Keeper election over q14's n-gram-Jaccard near-dup pairs. */
  def q67(spark: SparkSession, sfDir: String): DataFrame =
    canonicalKeepers(
      Tables.table(spark, sfDir, "documents").select(col("doc_id"), col("text")),
      TextOps.ngramJaccard(spark, sfDir).select(col("doc_a"), col("doc_b")))

  private val q67Sql =
    s"""WITH RECURSIVE
       |pairs AS (SELECT doc_a, doc_b FROM (${TextOps.q14SqlText}) q14),
       |bi AS (SELECT doc_a AS x, doc_b AS y FROM pairs
       |       UNION SELECT doc_b, doc_a FROM pairs),
       |reach(src, dst) AS (
       |  SELECT x, x FROM bi
       |  UNION
       |  SELECT r.src, bi.y FROM reach r JOIN bi ON r.dst = bi.x),
       |lbl AS (SELECT src AS v, min(dst) AS cluster_id FROM reach GROUP BY src),
       |cd AS (SELECT d.doc_id, l.cluster_id, string_split(d.text, ' ') AS ws
       |       FROM documents d JOIN lbl l ON d.doc_id = l.v),
       |s AS (SELECT doc_id, cluster_id, len(ws)::BIGINT AS n_words,
       |        round(len(list_distinct(ws)) / len(ws), 4) AS ttr,
       |        round(len(list_filter(ws, w -> w in ('the', 'a', 'of', 'and', 'to', 'in'))) / len(ws), 4) AS stop_ratio
       |      FROM cd),
       |sc AS (SELECT doc_id, cluster_id,
       |         floor((0.4 * ttr + 0.3 * least(n_words / 100.0, 1.0) +
       |                0.3 * (1.0 - stop_ratio)) * 10000) / 10000 AS q
       |       FROM s),
       |w AS (SELECT cluster_id, doc_id AS keeper
       |      FROM (SELECT cluster_id, doc_id,
       |              row_number() OVER (PARTITION BY cluster_id
       |                                 ORDER BY q DESC, doc_id) AS rn
       |            FROM sc) WHERE rn = 1),
       |r AS (SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS root
       |      FROM documents d LEFT JOIN lbl l ON d.doc_id = l.v)
       |SELECT r.doc_id, r.root,
       |       CASE WHEN w.keeper IS NULL OR r.doc_id = w.keeper THEN 1 ELSE 0 END AS keep
       |FROM r LEFT JOIN w ON r.root = w.cluster_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q67_canonical_keeper", q67, Some(q67Sql))
  )
}
