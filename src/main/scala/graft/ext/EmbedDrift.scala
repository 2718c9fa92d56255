package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding snapshot drift (q112) — per-label centroid displacement
  * between two halves of the corpus, against each half's own spread: the
  * re-index regression audit run when an embedding model is swapped or
  * re-trained ("did class 7 move, or did everything just jiggle within
  * noise?"). A label whose squared centroid drift rivals its per-point
  * spread has genuinely moved; one whose drift is orders below spread is
  * stable. Complements q106 (occupancy) and q109 (confidence) on the
  * embedding-health dashboard.
  *
  * Fixture binding: the "snapshots" are the deterministic md5 halves of
  * vec_id (the q104 snapshot idiom pointed at vectors) — a real
  * deployment passes its two index versions to [[embedDriftOf]].
  *
  * Exactness: everything is int64 — dims are milli-quantized
  * ([[KMeans.quantize]]), centroids use the floored-mean idiom
  * ((s − pmod(s, n)) div n, the KMeans update rule), spreads come from
  * the moment identity Σ‖x−c‖² = Σ‖x‖² − 2·c·Σx + n·‖c‖² (no pairwise
  * pass, no doubles), and drift is a plain squared difference of
  * centroid vectors. Order-free sums → engine-exact.
  *
  * Scale shape: ONE corpus explode to the (label, half, dim) integer
  * census (≤ labels·2·dims groups — the q81 family), centroid + moment
  * arithmetic on census rows, and a labels-row join of the two halves.
  * Labels present in only one half drop out (inner join, documented).
  */
object EmbedDrift {

  /** Census: (label, half, n, spread, cvec) for one tagged frame. */
  private def halfStats(pts: DataFrame): DataFrame =
    pts.select(col("label"), col("half"), posexplode(col("q")).as(Seq("d", "v")))
      .groupBy(col("label"), col("half"), col("d"))
      .agg(sum(col("v")).as("s"), sum(col("v") * col("v")).as("ss"),
        count(lit(1)).as("n"))
      .withColumn("cv", expr("(s - pmod(s, n)) div n"))
      .groupBy(col("label"), col("half"))
      .agg(max(col("n")).as("n"),
        sum(expr("ss - 2 * cv * s + n * cv * cv")).as("spread"),
        expr("transform(array_sort(collect_list(struct(d, cv))), x -> x.cv)").as("cvec"))

  /** (label, n_a, n_b, drift_sq, spread_a, spread_b) between two
    * (vec_id, embedding, label) snapshots. */
  def embedDriftOf(snapA: DataFrame, snapB: DataFrame): DataFrame = {
    def tagged(df: DataFrame, h: Int) =
      KMeans.quantize(df)
        .join(df.select(col("vec_id").as("lv"), col("label")), col("vec_id") === col("lv"))
        .select(col("label"), lit(h).as("half"), col("q"))
    // the census result is ≤ |labels|·2 rows but its SUBTREE is the full
    // corpus explode — persist so the a/b consumers read rows, not the
    // explode twice (the q113 lesson, pinned below by PlanSpec)
    val stats = Tables.swapPersist("q112_stats",
      halfStats(tagged(snapA, 0).unionByName(tagged(snapB, 1))))
    val a = stats.filter(col("half") === 0)
      .select(col("label"), col("n").as("n_a"), col("spread").as("spread_a"),
        col("cvec").as("ca"))
    val b = stats.filter(col("half") === 1)
      .select(col("label").as("lb"), col("n").as("n_b"),
        col("spread").as("spread_b"), col("cvec").as("cb"))
    a.join(b, col("label") === col("lb"))
      .select(col("label").cast("long").as("label"), col("n_a"), col("n_b"),
        expr("aggregate(zip_with(ca, cb, (x, y) -> (x - y) * (x - y)), 0L, (s, v) -> s + v)")
          .as("drift_sq"),
        col("spread_a"), col("spread_b"))
  }

  // ---------------------------------------------------------------- q112
  def q112(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.table(spark, sfDir, "embeddings")
      .withColumn("hh", md5(concat(lit("half|"), col("vec_id"))))
      .withColumn("half", expr(s"CAST(${TextOps.hexVal("hh", 1, duck = false)} % 2 AS INT)"))
    embedDriftOf(emb.filter(col("half") === 0), emb.filter(col("half") === 1))
  }

  private def q112Sql(dim: Int = 64): String = {
    val hv = TextOps.hexVal("hh", 1, duck = true)
    s"""WITH e AS (
       |  SELECT vec_id, label,
       |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT)) AS q,
       |         CAST($hv % 2 AS INT) AS half
       |  FROM (SELECT *, md5('half|' || vec_id) AS hh FROM embeddings)),
       |c AS (
       |  SELECT label, half, d.d AS d,
       |         CAST(sum(q[d.d]) AS BIGINT) AS s,
       |         CAST(sum(q[d.d] * q[d.d]) AS BIGINT) AS ss,
       |         count(*) AS n
       |  FROM e CROSS JOIN (SELECT unnest(range(1, ${dim + 1})) AS d) d
       |  GROUP BY label, half, d.d),
       |cv AS (SELECT *, (s - ((s % n) + n) % n) // n AS cv FROM c),
       |st AS (
       |  SELECT label, half, max(n) AS n,
       |         CAST(sum(ss - 2 * cv * s + n * cv * cv) AS BIGINT) AS spread,
       |         list(cv ORDER BY d) AS cvec
       |  FROM cv GROUP BY label, half)
       |SELECT CAST(a.label AS BIGINT) AS label,
       |       CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
       |       CAST(list_sum(list_transform(range(1, ${dim + 1}),
       |         j -> (a.cvec[j] - b.cvec[j]) * (a.cvec[j] - b.cvec[j]))) AS BIGINT) AS drift_sq,
       |       a.spread AS spread_a, b.spread AS spread_b
       |FROM (SELECT * FROM st WHERE half = 0) a
       |JOIN (SELECT * FROM st WHERE half = 1) b USING (label)""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q112_embed_drift", q112, Some(q112Sql()))
  )
}
