package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Clustering↔label agreement (q129/q130) — does the unsupervised
  * structure recover the known partition? q129 is the contingency table
  * (fitted cell × reference label) with per-cell purity; q130 compresses
  * it to the exact pair-counting Rand index in integer ppm. The
  * cluster-validation audit run before trusting k-means-derived curation
  * (q53 SemDeDup, q55 sampling, q60 hard negatives all consume these
  * cells): low purity on the cells a curation step keys on means the
  * step is mixing strata it believes it separates.
  *
  * Rand index, exactly and in integers: with contingency counts n_ij,
  * cluster sizes a_i, label sizes b_j, n vectors and P = C(n,2) —
  * agreements = P + 2·Σ C(n_ij,2) − Σ C(a_i,2) − Σ C(b_j,2), and
  * rand_ppm = agreements·10⁶ div P. Pair counts stay in int64 up to
  * n ≈ 4×10⁹ vectors (C(n,2)·10⁶ needs the decimal staging documented
  * at the expression).
  *
  * Scale shape: ONE persisted quantized corpus; assignment is the
  * broadcast-centroid map-side pass; labels attach by ONE co-keyed id
  * join; everything after lives on the ≤k·|labels| contingency census
  * (windows and 1-row rollups over census rows only).
  */
object ClusterAgreement {

  /** The (cid, label, n_vecs) contingency census. */
  private def contingency(embeds: DataFrame, k: Int, iters: Int,
                          persistKey: String): DataFrame = {
    val p = Tables.swapPersist(persistKey, KMeans.quantize(embeds))
    val asg = KMeans.assign(p, KMeans.fit(p, k, iters))
      .select(col("vec_id"), col("cid"))
    asg.join(embeds.select(col("vec_id").as("lv"), col("label")),
        col("vec_id") === col("lv"))
      .groupBy(col("cid"), col("label"))
      .agg(count(lit(1)).as("n_vecs"))
  }

  /** (cid, label, n_vecs, cid_total, share_bp) — purity per fitted cell. */
  def clusterAgreementOf(embeds: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    val wCid = Window.partitionBy(col("cid"))
    contingency(embeds, k, iters, "q129_pts")
      .withColumn("cid_total", sum(col("n_vecs")).over(wCid))
      .select(col("cid").cast("long").as("cid"), col("label").cast("long").as("label"),
        col("n_vecs"), col("cid_total"),
        expr("n_vecs * 10000 div cid_total").as("share_bp"))
  }

  /** One row: (n_vecs, n_pairs, agreements, rand_ppm) — exact pair-counting
    * Rand index between the fitted clustering and the reference labels. */
  def randIndexOf(embeds: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    // three consumers (total + two marginal folds) read the census —
    // localCheckpoint the ≤k·|labels| rows once or each consumer re-runs
    // the whole corpus assignment (the doubled-pass anti-pattern; the
    // pre-fix plan carried the contingency subtree three times)
    val ct = contingency(embeds, k, iters, "q130_pts").localCheckpoint()
    // all three C(·,2) sums fold over the bounded census in one pass;
    // the ppm product stages through DECIMAL(38,0) (P·10⁶ passes int64
    // at n ≈ 4e9 vectors — same bound family as q118/q120, documented)
    ct.agg(
        sum(col("n_vecs")).as("n_vecs"),
        sum(expr("n_vecs * (n_vecs - 1) div 2")).as("within_cells"))
      .crossJoin(broadcast(
        ct.groupBy(col("cid")).agg(sum(col("n_vecs")).as("a"))
          .agg(sum(expr("a * (a - 1) div 2")).as("within_clusters"))))
      .crossJoin(broadcast(
        ct.groupBy(col("label")).agg(sum(col("n_vecs")).as("b"))
          .agg(sum(expr("b * (b - 1) div 2")).as("within_labels"))))
      .select(col("n_vecs"),
        expr("n_vecs * (n_vecs - 1) div 2").as("n_pairs"),
        expr("n_vecs * (n_vecs - 1) div 2 + 2 * within_cells - within_clusters - within_labels")
          .as("agreements"))
      .select(col("n_vecs"), col("n_pairs"), col("agreements"),
        // n=1 vector ⇒ C(n,2)=0: Spark's div would NULL where DuckDB's //
        // hard-errors — guard the zero explicitly on BOTH engines (the
        // q128/q138 zero-token-division discipline)
        expr("CASE WHEN n_pairs = 0 THEN NULL " +
          "ELSE CAST(agreements AS DECIMAL(38,0)) * 1000000 div n_pairs END")
          .as("rand_ppm"))
  }

  // --------------------------------------------------------- q129 / q130
  def q129(spark: SparkSession, sfDir: String): DataFrame =
    clusterAgreementOf(Tables.table(spark, sfDir, "embeddings"))

  def q130(spark: SparkSession, sfDir: String): DataFrame =
    randIndexOf(Tables.table(spark, sfDir, "embeddings"))

  private def ctCte(k: Int, iters: Int, dim: Int): String =
    s"""${KMeans.duckFitCtes(k, iters, dim)},
       |ct AS (SELECT f.cid, e.label, count(*) AS n_vecs
       |       FROM fin f JOIN embeddings e USING (vec_id)
       |       GROUP BY 1, 2)""".stripMargin

  private def q129Sql(k: Int = 8, iters: Int = 2, dim: Int = 64): String =
    s"""WITH ${ctCte(k, iters, dim)}
       |SELECT CAST(cid AS BIGINT) AS cid, CAST(label AS BIGINT) AS label,
       |       n_vecs,
       |       CAST(sum(n_vecs) OVER (PARTITION BY cid) AS BIGINT) AS cid_total,
       |       CAST(n_vecs * 10000 // sum(n_vecs) OVER (PARTITION BY cid) AS BIGINT) AS share_bp
       |FROM ct""".stripMargin

  private def q130Sql(k: Int = 8, iters: Int = 2, dim: Int = 64): String =
    s"""WITH ${ctCte(k, iters, dim)},
       |tot AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS n_vecs,
       |               CAST(sum(n_vecs * (n_vecs - 1) // 2) AS BIGINT) AS within_cells
       |        FROM ct),
       |wc AS (SELECT CAST(sum(a * (a - 1) // 2) AS BIGINT) AS within_clusters
       |       FROM (SELECT CAST(sum(n_vecs) AS BIGINT) AS a FROM ct GROUP BY cid)),
       |wl AS (SELECT CAST(sum(b * (b - 1) // 2) AS BIGINT) AS within_labels
       |       FROM (SELECT CAST(sum(n_vecs) AS BIGINT) AS b FROM ct GROUP BY label))
       |SELECT n_vecs,
       |       CAST(n_vecs * (n_vecs - 1) // 2 AS BIGINT) AS n_pairs,
       |       CAST(n_vecs * (n_vecs - 1) // 2 + 2 * within_cells
       |            - within_clusters - within_labels AS BIGINT) AS agreements,
       |       CASE WHEN n_vecs * (n_vecs - 1) // 2 = 0 THEN NULL
       |            ELSE CAST((n_vecs * (n_vecs - 1) // 2 + 2 * within_cells
       |                 - within_clusters - within_labels)::HUGEINT * 1000000
       |                 // (n_vecs * (n_vecs - 1) // 2) AS BIGINT) END AS rand_ppm
       |FROM tot, wc, wl""".stripMargin

  /** Mislabel candidates (q133): vectors whose reference label disagrees
    * with their cell's MAJORITY label — the label-noise mining list a
    * curation pass hands to re-annotation, ranked implicitly by how
    * decisive the cell is (maj_share_bp). Majority ties break to the
    * LOWEST label in both engines. Scale shape: the ≤k-row majority
    * table derives from the contingency census and BROADCASTS back onto
    * the assignment; the output is dup-rate-sized (only disagreements). */
  def labelOutliersOf(embeds: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    val p = Tables.swapPersist("q133_pts", KMeans.quantize(embeds))
    val asg = KMeans.assign(p, KMeans.fit(p, k, iters))
      .select(col("vec_id"), col("cid"))
      .join(embeds.select(col("vec_id").as("lv"), col("label")),
        col("vec_id") === col("lv"))
      .select(col("vec_id"), col("cid"), col("label"))
    val asgP = Tables.swapPersist("q133_asg", asg)
    val ct = asgP.groupBy(col("cid"), col("label")).agg(count(lit(1)).as("n_vecs"))
    val wCid = Window.partitionBy(col("cid"))
      .orderBy(col("n_vecs").desc, col("label"))
    val maj = ct
      .withColumn("rn", row_number().over(wCid))
      .withColumn("cid_total", sum(col("n_vecs")).over(Window.partitionBy(col("cid"))))
      .filter(col("rn") === 1)
      .select(col("cid").as("mcid"), col("label").as("maj_label"),
        expr("n_vecs * 10000 div cid_total").as("maj_share_bp"))
    asgP.join(broadcast(maj), col("cid") === col("mcid"))
      .filter(col("label") =!= col("maj_label"))
      .select(col("vec_id"), col("cid").cast("long").as("cid"),
        col("label").cast("long").as("label"),
        col("maj_label").cast("long").as("maj_label"), col("maj_share_bp"))
  }

  def q133(spark: SparkSession, sfDir: String): DataFrame =
    labelOutliersOf(Tables.table(spark, sfDir, "embeddings"))

  private def q133Sql(k: Int = 8, iters: Int = 2, dim: Int = 64): String =
    s"""WITH ${ctCte(k, iters, dim)},
       |maj AS (
       |  SELECT cid, label AS maj_label,
       |         CAST(n_vecs * 10000 // sum(n_vecs) OVER (PARTITION BY cid) AS BIGINT) AS maj_share_bp
       |  FROM ct
       |  QUALIFY row_number() OVER (PARTITION BY cid ORDER BY n_vecs DESC, label) = 1),
       |a AS (SELECT f.vec_id, f.cid, e.label
       |      FROM fin f JOIN embeddings e USING (vec_id))
       |SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cid,
       |       CAST(a.label AS BIGINT) AS label,
       |       CAST(m.maj_label AS BIGINT) AS maj_label, m.maj_share_bp
       |FROM a JOIN maj m ON a.cid = m.cid
       |WHERE a.label != m.maj_label""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q129_cluster_agreement", q129, Some(q129Sql())),
    QueryDef("q130_rand_index", q130, Some(q130Sql())),
    QueryDef("q133_label_outliers", q133, Some(q133Sql()))
  )
}
