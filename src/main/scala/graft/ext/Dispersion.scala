package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Within-cluster dispersion census (q81) — exact mean pairwise squared
  * distance per label WITHOUT enumerating pairs, via the moment identity
  *   Σ_{i<j} ‖xᵢ−xⱼ‖² = n·Σᵢ‖xᵢ‖² − ‖Σᵢxᵢ‖².
  * The curation signal it feeds: per-domain/cluster semantic diversity —
  * a collapsed cluster (near-zero dispersion) is redundant data SemDeDup/
  * downsampling should hit hardest, a diffuse one carries signal worth
  * keeping; data-mixing recipes weight domains by exactly this kind of
  * spread statistic. Also the Welford-style input to silhouette-ish
  * cluster-quality audits (q51's fit diagnostics).
  *
  * Engine-exactness: components quantize to integer 1e-6 grid
  * (floor(x·1e6 + 0.5) — the q36 idiom; round() half-handling differs
  * between engines), then EVERYTHING up to the final division is int64
  * sums of products — order-free, so distributed aggregation order
  * cannot flip a bit. Overflow bound: |Σx| ≤ n·xmax·1e6 per dim keeps
  * sd² inside int64 for n ≲ 10⁶ per cluster at unit-scale embeddings
  * (coarsen the grid for more); the n·S product runs in DOUBLE
  * (deterministic, and ANSI would error loudly rather than wrap).
  *
  * Shape: ONE corpus scan, ONE explode into the (label, dim) census —
  * ≤ |labels|·dims groups, the q75 census family — then a |labels|-row
  * combine. No pairs, no window, no join anywhere.
  */
object Dispersion {

  /** One row per label over any (embedding: Array[Float], label) frame
    * with uniform dimensionality: n_vecs, mean ‖x‖², ‖mean x‖², and the
    * mean pairwise squared distance (0 for singleton clusters), all
    * floor-truncated to 6 dp. */
  /** The (label, dim) integer census both q81 and q82 reduce:
    * c = cluster size, sd = Σ component, ss = Σ component² — all int64
    * on the 1e-6 quantization grid. */
  private[ext] def censusOf(embeds: DataFrame): DataFrame =
    embeds
      .select(col("label"), posexplode(expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))"))
        .as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(count(lit(1)).as("c"), sum(col("x")).as("sd"),
        sum(expr("x * x")).as("ss"))

  def dispersionOf(embeds: DataFrame): DataFrame = {
    val census = censusOf(embeds)
    census.groupBy(col("label"))
      .agg(max(col("c")).as("n"), sum(col("ss")).as("s"),
        sum(expr("sd * sd")).as("p"))
      .selectExpr("label", "n AS n_vecs",
        "floor(s / (n * 1e6)) / 1e6 AS mean_sq_norm",
        "floor(p / (n * n * 1e6)) / 1e6 AS centroid_sq_norm",
        """CASE WHEN n < 2 THEN CAST(0 AS DOUBLE)
          |     ELSE floor((n * CAST(s AS DOUBLE) - p) / (n * (n - 1) / 2e0) / 1e6) / 1e6
          |END AS dispersion""".stripMargin)
  }

  // ---------------------------------------------------------------- q81
  def q81(spark: SparkSession, sfDir: String): DataFrame =
    dispersionOf(Tables.table(spark, sfDir, "embeddings"))

  /** DuckDB mirror of [[censusOf]], shared by q81/q82 (CTE `cen`:
    * label, pos, c, sd, ss). */
  private[ext] val censusSqlCte: String =
    """v AS (
      |  SELECT label,
      |         list_transform(embedding::DOUBLE[],
      |                        x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS vq
      |  FROM embeddings),
      |e AS (SELECT label,
      |             unnest(list_transform(vq, (x, i) -> struct_pack(p := i, x := x))) AS u
      |      FROM v),
      |cen AS (SELECT label, u.p AS pos, count(*) AS c,
      |               CAST(sum(u.x) AS BIGINT) AS sd,
      |               CAST(sum(u.x * u.x) AS BIGINT) AS ss
      |        FROM e GROUP BY 1, 2)""".stripMargin

  private val q81Sql =
    s"""WITH $censusSqlCte,
      |l AS (SELECT label, CAST(max(c) AS BIGINT) AS n,
      |             CAST(sum(ss) AS BIGINT) AS s,
      |             CAST(sum(sd * sd) AS BIGINT) AS p
      |      FROM cen GROUP BY label)
      |SELECT label, n AS n_vecs,
      |       floor(s / (n * 1e6)) / 1e6 AS mean_sq_norm,
      |       floor(p / (n * n * 1e6)) / 1e6 AS centroid_sq_norm,
      |       CASE WHEN n < 2 THEN CAST(0 AS DOUBLE)
      |            ELSE floor((n * CAST(s AS DOUBLE) - p) / (n * (n - 1) / 2e0) / 1e6) / 1e6
      |       END AS dispersion
      |FROM l""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q81_cluster_dispersion", q81, Some(q81Sql))
  )
}
