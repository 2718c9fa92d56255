package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cluster separation audit (q82) — the BETWEEN-cluster complement of
  * q81's within-cluster dispersion: per label, the centroid scatter
  * (√ mean ‖x − centroid‖²), the distance to the nearest other centroid,
  * and the Davies-Bouldin term max_j (sᵢ + sⱼ) / dᵢⱼ — the standard
  * "are these clusters actually separated?" diagnostic for a labeling /
  * k-means fit (q51) before it drives dedup (q53) or sampling (q55):
  * a label with db_index ≫ 1 overlaps a neighbor and its per-cluster
  * decisions are noise.
  *
  * Scale shape: everything reduces from q81's (label, dim) integer
  * census (persisted once — three consumers), so the corpus is scanned
  * and exploded ONCE; centroid pair distances live on |labels|²·dims
  * rows (audit-sized, not corpus-sized) and their dim-folds are
  * ORDER-PINNED (sorted-array fold, the q75 idiom) because they run in
  * doubles — the only double summation anywhere; per-dim numerators stay
  * int64 ((sdᵢ·nⱼ − sdⱼ·nᵢ) ≤ ~1e11 at 1e-6 grid). sqrt/division are
  * IEEE-correctly-rounded on identical inputs, so both engines produce
  * the same bits; outputs floor-truncate to 6 dp.
  */
object Separation {

  /** One row per label: (label, n_vecs, scatter, min_sep, db_index);
    * min_sep/db_index NULL when there is no other cluster. */
  def separationOf(embeds: DataFrame): DataFrame = {
    val census = Tables.swapPersist("q82_census", Dispersion.censusOf(embeds))
    val per = census.groupBy(col("label"))
      .agg(max(col("c")).as("n"), sum(col("ss")).as("s"),
        sum(expr("sd * sd")).as("p"))
      .selectExpr("label", "n",
        "sqrt(CAST(s AS DOUBLE) / n - CAST(p AS DOUBLE) / n / n) / 1e6 AS scatter")
    val a = census.select(col("label").as("la"), col("pos"),
      col("sd").as("sda"), col("c").as("na"))
    val b = census.select(col("label").as("lb"), col("pos"),
      col("sd").as("sdb"), col("c").as("nb"))
    val dists = a.join(b, Seq("pos")).filter(col("la") < col("lb"))
      .select(col("la"), col("lb"), col("pos"),
        expr("CAST(sda * nb - sdb * na AS DOUBLE) / (CAST(na AS DOUBLE) * nb)").as("t"))
      .groupBy(col("la"), col("lb"))
      .agg(collect_list(struct(col("pos"), col("t"))).as("ts"))
      .select(col("la"), col("lb"), expr(
        "sqrt(aggregate(array_sort(ts), CAST(0 AS DOUBLE), (acc, e) -> acc + e.t * e.t)) / 1e6")
        .as("dist"))
    val sym = dists.select(col("la").as("i"), col("lb").as("j"), col("dist"))
      .unionByName(dists.select(col("lb").as("i"), col("la").as("j"), col("dist")))
    val db = sym
      .join(per.select(col("label").as("i"), col("scatter").as("si")), "i")
      .join(per.select(col("label").as("j"), col("scatter").as("sj")), "j")
      .groupBy(col("i"))
      .agg(min(col("dist")).as("min_sep"),
        max(expr("CASE WHEN dist = 0 THEN NULL ELSE (si + sj) / dist END")).as("dbi"))
    per.join(db, per("label") === db("i"), "left")
      .selectExpr("label", "n AS n_vecs",
        "floor(scatter * 1e6) / 1e6 AS scatter",
        "floor(min_sep * 1e6) / 1e6 AS min_sep",
        "floor(dbi * 1e6) / 1e6 AS db_index")
  }

  // ---------------------------------------------------------------- q82
  def q82(spark: SparkSession, sfDir: String): DataFrame =
    separationOf(Tables.table(spark, sfDir, "embeddings"))

  private val q82Sql =
    s"""WITH ${Dispersion.censusSqlCte},
       |l AS (SELECT label, CAST(max(c) AS BIGINT) AS n,
       |             CAST(sum(ss) AS BIGINT) AS s,
       |             CAST(sum(sd * sd) AS BIGINT) AS p
       |      FROM cen GROUP BY label),
       |per AS (SELECT label, n,
       |               sqrt(CAST(s AS DOUBLE) / n - CAST(p AS DOUBLE) / n / n) / 1e6 AS scatter
       |        FROM l),
       |pr AS (SELECT a.label AS la, b.label AS lb, a.pos,
       |              CAST(a.sd * b.c - b.sd * a.c AS DOUBLE) / (CAST(a.c AS DOUBLE) * b.c) AS t
       |       FROM cen a JOIN cen b ON a.pos = b.pos AND a.label < b.label),
       |pd AS (SELECT la, lb,
       |              sqrt(list_reduce(list_transform(list(t ORDER BY pos), x -> x * x),
       |                               (acc, x) -> acc + x)) / 1e6 AS dist
       |       FROM pr GROUP BY la, lb),
       |sym AS (SELECT la AS i, lb AS j, dist FROM pd
       |        UNION ALL SELECT lb, la, dist FROM pd),
       |db AS (SELECT s.i, min(s.dist) AS min_sep,
       |              max(CASE WHEN s.dist = 0 THEN NULL
       |                       ELSE (pi.scatter + pj.scatter) / s.dist END) AS dbi
       |       FROM sym s
       |       JOIN per pi ON pi.label = s.i
       |       JOIN per pj ON pj.label = s.j
       |       GROUP BY s.i)
       |SELECT per.label, per.n AS n_vecs,
       |       floor(per.scatter * 1e6) / 1e6 AS scatter,
       |       floor(db.min_sep * 1e6) / 1e6 AS min_sep,
       |       floor(db.dbi * 1e6) / 1e6 AS db_index
       |FROM per LEFT JOIN db ON db.i = per.label""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q82_cluster_separation", q82, Some(q82Sql))
  )
}
