package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization codebooks (q98) — the memory side of large-scale
  * ANN (IVF-PQ): split each embedding into M contiguous subvectors, run an
  * independent k-means per subspace (k=16 codes → 4 bits/subspace), and
  * report per-(subspace, code) census: occupancy, quantization distortion
  * (integer inertia) and the centroid checksum. A 64-dim float vector
  * compresses to M=4 codes = 2 bytes — at 100 TB the difference between an
  * index that fits in executor memory and one that doesn't; q20's IVF
  * prunes WHICH cells to visit, PQ shrinks WHAT is stored per cell.
  *
  * Reuses the integer-exact Lloyd kernel (KMeans scaladoc: milli-unit
  * quantization, int64 distances, floor-division centroids, lowest-cid
  * tie-break) per subspace, so even this iterative codebook build is
  * hash-exact against the DuckDB oracle — each subspace's Lloyd loop runs
  * in its own WITH-scope, UNION'd.
  *
  * Shape: embeddings quantized ONCE behind a keyed persist; each
  * subspace's fit slices the cached frame (slice-of-quantize ≡
  * quantize-of-slice, elementwise), assignments stay map-side against
  * k-row broadcast centroids, updates exchange (cid × subdim) partials.
  * Corpus passes: 1 scan + M·(iters+1) cache reads, never M re-scans.
  */
object Pq {

  val M = 4          // subspaces
  val SubDim = 16    // 64-dim fixture / M
  val Codes = 16     // codes per subspace (4 bits)
  val Iters = 2

  /** The shared quantized corpus, persisted once per invocation. */
  private def pts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.swapPersist("q98_pts",
      KMeans.quantize(Tables.table(spark, sfDir, "embeddings")))

  private def subPts(p: DataFrame, s: Int): DataFrame =
    p.select(col("vec_id"), expr(s"slice(q, ${s * SubDim + 1}, $SubDim)").as("q"))

  // ---------------------------------------------------------------- q98
  /** (subspace, cid, n_points, inertia, centroid_checksum) — M·k rows. */
  def q98(spark: SparkSession, sfDir: String): DataFrame = {
    val p = pts(spark, sfDir)
    (0 until M).map { s =>
      KMeans.kmeansOfQuantized(subPts(p, s), Codes, Iters)
        .withColumn("subspace", lit(s.toLong))
        .select(col("subspace"), col("cid"), col("n_points"),
          col("inertia"), col("centroid_checksum"))
    }.reduce(_ unionByName _)
  }

  /** Per-vector PQ code word — (vec_id, codes: array<int> of length M,
    * distortion = Σ subspace inertia contribution). The compressed
    * representation an IVF-PQ index stores per posting. */
  def pqCodesOf(embeds: DataFrame, m: Int = M, subDim: Int = SubDim,
                codes: Int = Codes, iters: Int = Iters): DataFrame = {
    val p = Tables.swapPersist("pq_pts", KMeans.quantize(embeds))
    (0 until m).map { s =>
      val sub = p.select(col("vec_id"), expr(s"slice(q, ${s * subDim + 1}, $subDim)").as("q"))
      KMeans.assignmentsQuantized(sub, codes, iters)
        .select(col("vec_id"), lit(s).as("subspace"), col("cid"), col("dist"))
    }.reduce(_ unionByName _)
      .groupBy(col("vec_id"))
      .agg(expr("transform(array_sort(collect_list(struct(subspace, cid))), x -> x.cid)").as("codes"),
        sum(col("dist")).as("distortion"))
  }

  // ---------------------------------------------------------------- q99
  /** IVF-PQ ANN search with asymmetric distance (ADC): candidates are
    * pruned to the query's coarse cell (`label`, q20's convention — the
    * offline coarse quantizer stand-in), but scored against the PQ
    * COMPRESSED corpus: each candidate contributes only its M code ids,
    * and the distance is Σ_s ‖q_s − codebook_s[code_s(v)]‖² — the
    * query-side centroid distances play the role of the ADC lookup
    * tables (table lookup ≡ direct centroid distance, and the latter is
    * what the oracle can express). Top-3 per query by (adc, vec_id).
    *
    * This is the read path q98 builds the memory layout for: at 100 TB
    * the scoring join carries (vec_id, label, 4 small ints) per
    * candidate — never the 64-dim float vector — and the codebooks ride
    * along as a 4×16×16-int literal (~4 KB). All-integer distances →
    * hash-exact oracle despite five k-means models in the plan.
    *
    * Scale shape: one persisted quantized corpus; M fits (k-row
    * checkpointed centroids); corpus codes form via M map-side
    * assignments UNION'd into ONE (vec_id, subspace, cid) exchange;
    * the 20-query frame broadcasts onto the label-pruned candidates;
    * the ADC fold is in-row; the bounded TopK aggregator ships ≤ k rows
    * per (query × partition). Centroid collects are ≤ Codes-row
    * censuses. */
  def q99(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.agg.TopK
    val emb = Tables.table(spark, sfDir, "embeddings")
    // empty corpus: nothing to fit — return the empty result shape rather
    // than letting the dense-cid assertion fire (EmptyInputSpec contract;
    // a NON-empty corpus too small for Codes centroids still fails loudly)
    if (emb.isEmpty) {
      import spark.implicits._
      return Seq.empty[(Long, Long, Long, Long, Long)]
        .toDF("query_id", "cell", "neighbor_id", "rank", "adc_dist")
    }
    val p = Tables.swapPersist("q99_pts", KMeans.quantize(emb))
    val labels = emb.select(col("vec_id").as("lv"), col("label"))

    // per-subspace codebooks: DataFrame for the assignment pass + a dense
    // cid-indexed literal for the in-row ADC fold (cids are the k smallest
    // vec_ids — dense 0..Codes-1 on the fixtures; assert, don't assume)
    val fitted = (0 until M).map { s =>
      val cents = KMeans.fit(subPts(p, s), Codes, Iters)
      val rows = cents.collect()
      val byCid = rows.map(r => r.getInt(0) -> r.getAs[scala.collection.Seq[Long]]("cvec").toSeq).toMap
      require(byCid.keySet == (0 until Codes).toSet,
        s"subspace $s centroid ids not dense 0..${Codes - 1}: ${byCid.keySet}")
      (cents, (0 until Codes).map(byCid))
    }
    val centsLit = typedLit(fitted.map(_._2.map(_.toSeq)))

    // corpus PQ codes: M map-side assignments → ONE exchange on vec_id
    val codes = (0 until M).map { s =>
      KMeans.assign(subPts(p, s), fitted(s)._1)
        .select(col("vec_id"), lit(s).as("s"), col("cid"))
    }.reduce(_ unionByName _)
      .groupBy(col("vec_id"))
      .agg(expr("transform(array_sort(collect_list(struct(s, cid))), x -> x.cid)").as("codes"))

    val queries = p.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"),
        expr(s"transform(sequence(0, ${M - 1}), s -> slice(q, s * $SubDim + 1, $SubDim))").as("qarr"))
      .join(labels, col("query_id") === col("lv"))
      .select(col("query_id"), col("qarr"), col("label").as("qlabel"))

    val adcExpr =
      s"""aggregate(sequence(0, ${M - 1}), 0L, (acc, s) -> acc +
         |  aggregate(zip_with(
         |      element_at(qarr, CAST(s + 1 AS INT)),
         |      element_at(element_at(_cents, CAST(s + 1 AS INT)),
         |                 CAST(element_at(codes, CAST(s + 1 AS INT)) + 1 AS INT)),
         |      (x, y) -> (x - y) * (x - y)),
         |    0L, (acc2, x) -> acc2 + x))""".stripMargin

    codes.join(labels, col("vec_id") === col("lv"))
      .join(broadcast(queries),
        col("qlabel") === col("label") && col("query_id") =!= col("vec_id"))
      .withColumn("_cents", centsLit)
      .withColumn("adc", expr(adcExpr))
      .groupBy(col("query_id"), col("label"))
      .agg(TopK(3)(-col("adc").cast("double"), col("vec_id")).as("top"))
      .select(col("query_id"), col("label"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("label").cast("long").as("cell"),
        col("t.id").as("neighbor_id"), (col("pos") + 1).cast("long").as("rank"),
        (-col("t.score")).cast("long").as("adc_dist"))
  }

  private def q99Sql: String = {
    val blocks = (0 until M).map { s =>
      val a = s * SubDim + 1
      val b = (s + 1) * SubDim
      s"""(WITH ${KMeans.duckFitCtes(Codes, Iters, SubDim, s"embedding[$a:$b]")},
         |qq AS (SELECT vec_id AS query_id, q AS qv FROM pts WHERE vec_id < 20)
         |SELECT qq.query_id, f.vec_id,
         |       CAST(list_sum(list_transform(range(1, ${SubDim + 1}),
         |         j -> (qq.qv[j] - c.cvec[j]) * (qq.qv[j] - c.cvec[j]))) AS BIGINT) AS d2
         |FROM fin f JOIN c$Iters c ON f.cid = c.cid CROSS JOIN qq)""".stripMargin
    }
    s"""WITH lab AS (SELECT vec_id, label FROM embeddings),
       |u AS (${blocks.mkString("\nUNION ALL\n")}),
       |a AS (SELECT query_id, vec_id, CAST(sum(d2) AS BIGINT) AS adc
       |      FROM u GROUP BY query_id, vec_id),
       |cand AS (SELECT a.query_id, CAST(ev.label AS BIGINT) AS cell, a.vec_id, a.adc
       |         FROM a JOIN lab ev ON a.vec_id = ev.vec_id
       |                JOIN lab eq ON a.query_id = eq.vec_id AND ev.label = eq.label
       |         WHERE a.query_id != a.vec_id),
       |r AS (SELECT query_id, cell, vec_id AS neighbor_id, adc,
       |             row_number() OVER (PARTITION BY query_id ORDER BY adc, vec_id) AS rank
       |      FROM cand)
       |SELECT query_id, cell, neighbor_id, CAST(rank AS BIGINT) AS rank,
       |       adc AS adc_dist
       |FROM r WHERE rank <= 3""".stripMargin
  }

  private def q98Sql: String = {
    val blocks = (0 until M).map { s =>
      val a = s * SubDim + 1
      val b = (s + 1) * SubDim
      s"""(WITH ${KMeans.duckFitCtes(Codes, Iters, SubDim, s"embedding[$a:$b]")},
         |cs AS (
         |  SELECT cid, CAST(list_sum(list_transform(cvec, (x, i) -> x * i)) AS BIGINT)
         |           AS centroid_checksum
         |  FROM c$Iters)
         |SELECT CAST($s AS BIGINT) AS subspace, CAST(fin.cid AS BIGINT) AS cid,
         |       count(*) AS n_points, CAST(sum(dist) AS BIGINT) AS inertia,
         |       cs.centroid_checksum
         |FROM fin JOIN cs ON cs.cid = fin.cid
         |GROUP BY fin.cid, cs.centroid_checksum)""".stripMargin
    }
    blocks.mkString("\nUNION ALL\n")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q98_pq_codebook", q98, Some(q98Sql)),
    QueryDef("q99_ivfpq_search", q99, Some(q99Sql))
  )
}
