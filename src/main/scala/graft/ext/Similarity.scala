package graft.ext

import graft.agg.TopK
import graft.functions.CosineSim
import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` fixture (64-dim float vectors).
  *
  * Cosine is computed in DOUBLE on both engines with the identical formula
  * `dot / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` and identical left-to-right
  * summation (Spark `aggregate` HOF fold vs DuckDB `list_dot_product`), then
  * rounded to 6 dp before ranking so tie-breaks are deterministic.
  *
  * Scale posture: brute-force top-k broadcasts the (small) query set against
  * the candidate corpus — one scan, no shuffle of the big side; the IVF
  * variant prunes candidates to the query's cell (here the pre-assigned
  * `label` plays the offline-clustered cell id), turning the cross product
  * into an equi-join — the standard billion-vector layout. The sign-LSH
  * variant buckets by a 12-bit hyperplane-sign key for pairwise near-dup.
  */
object Similarity {

  /** embeddings with vectors widened to double (float math differs between
    * engines; double is exact on both for these magnitudes). */
  private def emb(spark: SparkSession, sfDir: String): DataFrame = {
    CosineSim.register(spark)
    Tables.fanned(Tables.table(spark, sfDir, "embeddings"))
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"), col("label"))
  }

  private[ext] val embCte =
    "emb AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings)"

  /** Interpreted HOF formulation of cosine — kept as the equivalence oracle
    * for [[graft.functions.CosineSim]] (CosineSimSpec). */
  val hofCosine: String =
    "aggregate(zip_with(qv, v, (x, y) -> x * y), cast(0 AS double), (acc, x) -> acc + x)" +
      " / (sqrt(aggregate(transform(qv, x -> x * x), cast(0 AS double), (acc, x) -> acc + x))" +
      " * sqrt(aggregate(transform(v, x -> x * x), cast(0 AS double), (acc, x) -> acc + x)))"

  // ---------------------------------------------------------------- q19
  /** Brute-force cosine top-`k` ranking for query vectors (vec_id < 20) —
    * shared by q19 (k=5) and q141's semantic arm (k=10; ext/HybridRrf).
    * RrfSpec pins the k-prefix property (the k=10 list's first 5 rows ARE
    * the k=5 list), so the two consumers stay reconciled by test. */
  def cosineRanks(spark: SparkSession, sfDir: String, k: Int): DataFrame = {
    val e = emb(spark, sfDir)
    val q = e.filter(col("vec_id") < 20).select(col("vec_id").as("query_id"), col("v").as("qv"))
    val sims = e.join(broadcast(q), col("query_id") =!= col("vec_id"))
      .withColumn("sim", round(expr("cosine_sim(qv, v)"), 6))
    // Bounded top-k aggregator, not a window: reduce runs map-side, so the
    // exchange carries ≤ k rows per (query × partition) instead of every
    // scored candidate (graft.agg.TopK scaladoc).
    sims
      .groupBy(col("query_id"))
      .agg(TopK(k)(col("sim"), col("vec_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"), col("t.score").as("sim"))
  }

  /** Brute-force cosine top-5 neighbors for query vectors (vec_id < 20). */
  def cosineTopK(spark: SparkSession, sfDir: String): DataFrame =
    cosineRanks(spark, sfDir, 5)

  private val q19Sql =
    s"""WITH $embCte,
       |q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 20),
       |p AS (SELECT query_id, vec_id,
       |             round(list_dot_product(qv, v) /
       |                   (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6) AS sim
       |      FROM q JOIN emb ON query_id != vec_id),
       |r AS (SELECT query_id, vec_id AS neighbor_id, sim,
       |             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
       |      FROM p)
       |SELECT query_id, neighbor_id, rank, sim FROM r WHERE rank <= 5""".stripMargin

  // ---------------------------------------------------------------- q20
  /** IVF-style ANN: candidates pruned to the query's cell (= `label`,
    * standing in for an offline-assigned coarse centroid id), then exact
    * cosine top-3 within the cell. */
  def annIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val e = emb(spark, sfDir)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("label").as("qlabel"))
    val sims = e.join(broadcast(q),
        col("qlabel") === col("label") && col("query_id") =!= col("vec_id"))
      .withColumn("sim", round(expr("cosine_sim(qv, v)"), 6))
    sims
      .groupBy(col("query_id"), col("label"))
      .agg(TopK(3)(col("sim"), col("vec_id")).as("top"))
      .select(col("query_id"), col("label"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("label").as("cell"), col("t.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"), col("t.score").as("sim"))
  }

  private val q20Sql =
    s"""WITH $embCte,
       |q AS (SELECT vec_id AS query_id, v AS qv, label AS qlabel FROM emb WHERE vec_id < 20),
       |p AS (SELECT query_id, label, vec_id,
       |             round(list_dot_product(qv, v) /
       |                   (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6) AS sim
       |      FROM q JOIN emb ON qlabel = label AND query_id != vec_id),
       |r AS (SELECT query_id, label AS cell, vec_id AS neighbor_id, sim,
       |             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
       |      FROM p)
       |SELECT query_id, cell, neighbor_id, rank, sim FROM r WHERE rank <= 3""".stripMargin

  // ---------------------------------------------------------------- q21
  /** Embedding near-dup via random-hyperplane sign LSH: band i's bucket key
    * = sign bits of dims [i·bits, i·bits+bits); pairs colliding in ANY band
    * are cosine-verified against `minSim`.
    *
    * Collision math (why these are the scale knobs): for a pair at angle θ,
    * P(one band collides) = (1 − θ/π)^bits, so recall over `bands`
    * independent bands is 1 − (1 − (1−θ/π)^bits)^bands. Candidate volume per
    * band is Σ_buckets n_b², ~n²/2^bits for balanced signs — `bits` bounds
    * the per-bucket pair fan-out (the n²/4096 weakness of a fixed 12-bit
    * key at 10⁹ vectors: raise bits with n), `bands` buys recall back at
    * linear cost. Fixture default (bits=12, bands=1) matches the oracle;
    * multi-band dedups candidates before the verify so a pair is scored
    * once. Requires bits·bands ≤ vector dim (64 here). */
  def embedNearDup(spark: SparkSession, sfDir: String,
                   bits: Int = 12, bands: Int = 1, minSim: Double = 0.25): DataFrame = {
    val signs = (band: Int) =>
      s"concat_ws('', transform(slice(v, ${band * bits} + 1, $bits), " +
        "x -> CASE WHEN x >= cast(0 AS double) THEN '1' ELSE '0' END))"
    val b0 = emb(spark, sfDir)
    val b =
      if (bands == 1) b0.withColumn("bucket", expr(signs(0)))
      else b0
        .withColumn("band", explode(array((0 until bands).map(lit): _*)))
        .withColumn("bucket", concat_ws(":", col("band"), expr(
          s"concat_ws('', transform(slice(v, band * $bits + 1, $bits), " +
            "x -> CASE WHEN x >= cast(0 AS double) THEN '1' ELSE '0' END))")))
    val cands = b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.v").as("qv"), col("b.v").as("v"))
    // multi-band: the same pair can collide in several bands — score once
    val deduped = if (bands == 1) cands else cands.dropDuplicates("vec_a", "vec_b")
    deduped
      .withColumn("sim", round(expr("cosine_sim(qv, v)"), 6))
      .filter(col("sim") >= minSim)
      .select(col("vec_a"), col("vec_b"), col("sim"))
  }

  private val q21Sql =
    s"""WITH $embCte,
       |b AS (SELECT vec_id, v,
       |             array_to_string(list_transform(v[1:12],
       |               x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket
       |      FROM emb),
       |p AS (SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
       |             round(list_dot_product(x.v, y.v) /
       |                   (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 6) AS sim
       |      FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
       |SELECT vec_a, vec_b, sim FROM p WHERE sim >= 0.25""".stripMargin

  // ---------------------------------------------------------------- q36
  /** Symmetric int8 quantization of the embedding store — the 4× memory /
    * bandwidth lever for a billion-vector corpus (float32 → int8 with a
    * per-vector scale; ANN recall loss is bounded by the quantization step
    * scale/127). Pure map-side expression work. Rounding is floor(x + 0.5)
    * — written explicitly on BOTH engines because round() half-handling
    * differs between them. The oracle contract carries an index-weighted
    * checksum of the quantized codes (order-sensitive: a permuted code
    * vector fails) plus `within_bound` = max dequantization error within
    * the theoretical step bound — the oracle recomputes checksum exactly
    * and asserts TRUE. */
  def q36(spark: SparkSession, sfDir: String): DataFrame =
    emb(spark, sfDir)
      .withColumn("scale", expr("array_max(transform(v, x -> abs(x)))"))
      .withColumn("q", expr("transform(v, x -> cast(floor(x * 127 / scale + 0.5) AS BIGINT))"))
      .withColumn("max_err", expr(
        "aggregate(zip_with(q, v, (qi, x) -> abs(cast(qi AS DOUBLE) * scale / 127 - x)), " +
          "cast(0 AS double), (m, e) -> greatest(m, e))"))
      .select(
        col("vec_id"),
        round(col("scale"), 6).as("scale_r"),
        expr("aggregate(zip_with(q, sequence(1, size(q)), (a, i) -> a * cast(i AS BIGINT)), " +
          "0L, (acc, x) -> acc + x)").as("checksum"),
        // rounding error is <= scale/254 by construction; 250 leaves fp slack
        (col("max_err") * 250.0 <= col("scale")).as("within_bound"))

  private val q36Sql =
    s"""WITH $embCte,
       |sc AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS scale FROM emb),
       |z AS (SELECT vec_id, scale,
       |             list_transform(v, (x, i) -> CAST(floor(x * 127 / scale + 0.5) AS BIGINT) * i) AS prods
       |      FROM sc)
       |SELECT vec_id, round(scale, 6) AS scale_r,
       |       CAST(list_sum(prods) AS BIGINT) AS checksum,
       |       TRUE AS within_bound
       |FROM z""".stripMargin

  // ---------------------------------------------------------------- q45
  /** Matryoshka truncation energy — for each vector, the fraction of its L2
    * norm captured by the first 16 / 32 dimensions, and a `trunc32` flag
    * (rounded frac ≥ 0.72) marking vectors safe to serve from a 32-dim
    * prefix. This is the dimension-selection audit for Matryoshka-style
    * embeddings, where serving at a prefix dim cuts ANN memory/bandwidth
    * 2–4× — the decision input is exactly this energy profile. Pure
    * map-side expression work (one scan, zero shuffles). The flag compares
    * the ROUNDED fraction so both engines branch on an identical value. */
  def matryoshkaEnergy(spark: SparkSession, sfDir: String): DataFrame = {
    def sq(e: String) =
      s"aggregate(transform($e, x -> x * x), cast(0 AS double), (acc, x) -> acc + x)"
    emb(spark, sfDir)
      .withColumn("d64", expr(sq("v")))
      .withColumn("d16", expr(sq("slice(v, 1, 16)")))
      .withColumn("d32", expr(sq("slice(v, 1, 32)")))
      .select(
        col("vec_id"),
        round(sqrt(col("d64")), 6).as("norm_r"),
        round(sqrt(col("d16")) / sqrt(col("d64")), 6).as("frac16"),
        round(sqrt(col("d32")) / sqrt(col("d64")), 6).as("frac32"),
        (round(sqrt(col("d32")) / sqrt(col("d64")), 6) >= 0.72).cast("int").as("trunc32"))
  }

  private val q45Sql =
    s"""WITH $embCte,
       |d AS (SELECT vec_id, list_dot_product(v, v) AS d64,
       |             list_dot_product(v[1:16], v[1:16]) AS d16,
       |             list_dot_product(v[1:32], v[1:32]) AS d32
       |      FROM emb)
       |SELECT vec_id, round(sqrt(d64), 6) AS norm_r,
       |       round(sqrt(d16) / sqrt(d64), 6) AS frac16,
       |       round(sqrt(d32) / sqrt(d64), 6) AS frac32,
       |       CASE WHEN round(sqrt(d32) / sqrt(d64), 6) >= 0.72 THEN 1 ELSE 0 END AS trunc32
       |FROM d""".stripMargin

  // ---------------------------------------------------------------- q73
  /** ANN recall audit — measure, don't guess: recall@k of the IVF path
    * (q20's cell-pruned search) against the exact brute-force top-k (q19's
    * formulation at the same k), per query. The number that decides
    * whether an ANN index's speed is worth its misses — run it on a QUERY
    * SAMPLE whenever the cell assignment or k changes.
    *
    * Scale shape: both scoring passes broadcast the sampled query set
    * (queries ≪ corpus — the audit precondition) and reduce through the
    * bounded TopK aggregator, so each pass ships ≤ k·queries·partitions
    * tuples; the recall join then runs over two queries×k row sets —
    * trivially small. The exact pass costs one full corpus scan per audit
    * BY DEFINITION (it is the ground truth); that is the price of the
    * measurement, not a plan defect. */
  def annRecall(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame = {
    val e = emb(spark, sfDir)
    def topNeighbors(cellPruned: Boolean): DataFrame = {
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("label").as("qlabel"))
      val cond =
        if (cellPruned) col("qlabel") === col("label") && col("query_id") =!= col("vec_id")
        else col("query_id") =!= col("vec_id")
      e.join(broadcast(q), cond)
        .withColumn("sim", round(expr("cosine_sim(qv, v)"), 6))
        .groupBy(col("query_id"))
        .agg(TopK(k)(col("sim"), col("vec_id")).as("top"))
        .select(col("query_id"), explode(col("top")).as("t"))
        .select(col("query_id"), col("t.id").as("neighbor_id"))
    }
    // the recall join compares two queries×k row sets — broadcast the
    // pruned side so the tiny compare never sort-merges (stats on an
    // aggregate output are unknown, so Spark would otherwise SMJ it)
    topNeighbors(cellPruned = false)
      .join(broadcast(topNeighbors(cellPruned = true).withColumn("hit", lit(1L))),
        Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hits"))
      .select(col("query_id"), col("n_exact"), col("n_hits"),
        expr("(n_hits * 10000) div n_exact").as("recall_bp"))
  }

  private def q73Sql(k: Int = 5): String =
    s"""WITH $embCte,
       |q AS (SELECT vec_id AS query_id, v AS qv, label AS qlabel FROM emb WHERE vec_id < 20),
       |pe AS (SELECT query_id, vec_id,
       |              round(list_dot_product(qv, v) /
       |                    (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6) AS sim
       |       FROM q JOIN emb ON query_id != vec_id),
       |ex AS (SELECT query_id, vec_id AS neighbor_id FROM (
       |         SELECT query_id, vec_id,
       |                row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
       |         FROM pe) WHERE rank <= $k),
       |pi AS (SELECT query_id, vec_id,
       |              round(list_dot_product(qv, v) /
       |                    (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6) AS sim
       |       FROM q JOIN emb ON qlabel = label AND query_id != vec_id),
       |iv AS (SELECT query_id, vec_id AS neighbor_id FROM (
       |         SELECT query_id, vec_id,
       |                row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
       |         FROM pi) WHERE rank <= $k)
       |SELECT ex.query_id, count(*) AS n_exact,
       |       count(iv.neighbor_id) AS n_hits,
       |       (count(iv.neighbor_id) * 10000) // count(*) AS recall_bp
       |FROM ex LEFT JOIN iv USING (query_id, neighbor_id)
       |GROUP BY ex.query_id""".stripMargin

  /** Stream-static ANN alert gate — q20's ingestion-time face (the gate
    * family): the static corpus' cell structure is summarized ONCE as
    * exact integer label-centroids (the q81 census — a ≤ |labels|·dims
    * collect at any corpus size), every ARRIVING vector is assigned to
    * its nearest centroid cell map-side against the broadcast literal,
    * and a stateless stream-static equi-join on the cell prunes the
    * corpus to in-cell candidates before the exact cosine verify — the
    * IVF recipe, live. Emits (query_id, cell, neighbor_id, sim) for
    * matches ≥ `minSim`: "this arrival near-duplicates corpus item X" at
    * ingest, before the arrival lands. Zero streaming aggregation state,
    * append-composable. At scale the static side should be bucketed by
    * cell on storage so each micro-batch's join prunes to matching
    * buckets; frozen-centroid semantics as with every gate (re-fit at
    * corpus checkpoints). */
  def annGateStreamStatic(streamEmbeds: DataFrame, staticEmbeds: DataFrame,
                          minSim: Double = 0.8): DataFrame = {
    val spark = staticEmbeds.sparkSession
    CosineSim.register(spark)
    val census = Dispersion.censusOf(staticEmbeds).collect()
    val cents: Seq[(Int, Seq[Double])] = census.groupBy(_.getInt(0)).toSeq
      .map { case (l, rows) =>
        l -> rows.sortBy(_.getInt(1))
          .map(r => r.getLong(3).toDouble / r.getLong(2) / 1e6).toSeq }
      .sortBy(_._1)
    val corpus = staticEmbeds.select(col("vec_id").as("neighbor_id"),
      expr("transform(embedding, x -> cast(x AS double))").as("v"), col("label"))
    val sqDist =
      "aggregate(zip_with(qv, c._2, (x, y) -> (x - y) * (x - y)), cast(0 AS double), (s, e) -> s + e)"
    streamEmbeds
      .select(col("vec_id").as("query_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("qv"))
      .withColumn("_cents", typedLit(cents))
      // distance computed ONCE per centroid (transform), then a cheap
      // argmin fold — inlining the fold into both the CASE condition and
      // its THEN branch would evaluate the full per-centroid distance
      // twice per arriving vector on the streaming hot path. Strict <
      // keeps the FIRST minimum; _cents is label-sorted, so ties break
      // toward the lowest label — deterministic
      .withColumn("cell", expr(
        s"""aggregate(
           |  transform(_cents, c -> named_struct('l', c._1, 'd', $sqDist)),
           |  named_struct('l', -1, 'd', cast('Infinity' AS double)),
           |  (acc, c) -> CASE WHEN c.d < acc.d THEN c ELSE acc END).l""".stripMargin))
      .drop("_cents")
      .join(corpus, col("cell") === col("label"))
      .withColumn("sim", round(expr("cosine_sim(qv, v)"), 6))
      .filter(col("sim") >= minSim)
      .select(col("query_id"), col("cell"), col("neighbor_id"), col("sim"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q19_cosine_topk", cosineTopK, Some(q19Sql)),
    QueryDef("q20_ann_ivf", annIvf, Some(q20Sql)),
    QueryDef("q21_embed_neardup_lsh", embedNearDup(_, _), Some(q21Sql)),
    QueryDef("q36_embed_quantize", q36, Some(q36Sql)),
    QueryDef("q45_matryoshka_energy", matryoshkaEnergy, Some(q45Sql)),
    QueryDef("q73_ann_recall", annRecall(_, _), Some(q73Sql()))
  )
}
