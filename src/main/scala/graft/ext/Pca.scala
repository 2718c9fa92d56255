package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dominant-principal-component projection (q75) — the spectral corpus
  * audit: score every embedding by its coordinate along the corpus's
  * top variance direction. The number behind "is this corpus collapsing
  * onto one axis?" checks (anisotropy / outlier-direction audits) and
  * 1-D curriculum ordering over embedding space. MLlib's PCA is
  * float-summation-order-dependent and oracle-invisible; this runs the
  * heavy pass in EXACT int64 and confines floating point to a tiny,
  * order-pinned driver computation both engines replicate bit-for-bit.
  *
  * Three stages:
  *   1. census (ONE corpus scan): embeddings quantized to int64
  *      milli-units (the [[KMeans.quantize]] idiom), then one explode of
  *      dim(dim+1)/2 + dim + 1 (idx, value) structs per row — the UPPER
  *      TRIANGLE of the Gram matrix Σ qqᵀ (symmetry halves the census;
  *      the driver mirrors the lower half), the coordinate sums Σ q,
  *      and the row count — into ONE hash aggregation: integer sums are
  *      exact and associative, so ANY partitioning/ordering yields
  *      identical results, map-side partials bound the exchange at
  *      ~2 145·partitions rows, and the collect is ≤ 2 145 rows at any
  *      corpus size.
  *   2. driver power iteration on M = n·G − s·sᵀ (= n²·Cov, so mean
  *      centering never leaves integers; entries built as BigInt — the
  *      int128 path, since n·G overflows int64 near 10⁹ rows — then
  *      rounded once to double): `iters` fixed rounds from the exact
  *      start vector 1/√dim = 0.125, each round folding M·v and the
  *      norm in ascending index order — the SAME operation sequence as
  *      the oracle's unrolled CTEs (DuckDB `list_sum`/`list_transform`
  *      fold left-to-right; HUGEINT mirrors BigInt), so the final
  *      eigenvector is bit-identical cross-engine. Fixed iteration
  *      count, no convergence test: determinism over adaptivity.
  *   3. projection (ONE corpus scan): pc1 = q·v − (s·v)/n folded in-row
  *      against the broadcast literal eigenvector, floor-truncated to
  *      6 dp (the scoredDocs idiom). Pure map-side — the returned plan
  *      has zero exchanges.
  */
object Pca {

  /** General form over any (vec_id, embedding array<float>) frame.
    * Output: (vec_id, pc1) — the mean-centered coordinate of each
    * vector along the corpus's dominant principal direction. */
  def pc1ProjectionOf(embeds: DataFrame, dim: Int = 64, iters: Int = 24): DataFrame = {
    val pts = KMeans.quantize(embeds)

    // -- stage 1: exact integer census, one scan, one bounded exchange --
    // G is symmetric: emit only the upper triangle (j >= i, via a slice
    // starting at the diagonal) — dim(dim+1)/2 + dim + 1 structs per row
    // instead of dim² + dim + 1; the driver mirrors the lower half
    val census = pts.select(explode(concat(
        flatten(transform(col("q"), (x, i) =>
          transform(slice(col("q"), i + lit(1), lit(dim) - i), (y, jj) =>
            struct((i * dim + i + jj).as("idx"), (x * y).as("v"))))),
        transform(col("q"), (x, i) => struct((lit(dim * dim) + i).as("idx"), x.as("v"))),
        array(struct(lit(dim * dim + dim).as("idx"), lit(1L).as("v"))))).as("c"))
      .groupBy(col("c.idx").as("idx")).agg(sum(col("c.v")).as("t"))
      .collect()
    val g = new Array[Long](dim * dim)
    val s = new Array[Long](dim)
    var n = 0L
    census.foreach { r =>
      val idx = r.getInt(0); val t = r.getLong(1)
      if (idx < dim * dim) { g(idx) = t; g((idx % dim) * dim + idx / dim) = t }
      else if (idx < dim * dim + dim) s(idx - dim * dim) = t
      else n = t
    }

    // -- stage 2: order-pinned power iteration on the driver -----------
    val m = Array.tabulate(dim, dim) { (i, j) =>
      (BigInt(n) * g(i * dim + j) - BigInt(s(i)) * BigInt(s(j))).toDouble
    }
    var v = Array.fill(dim)(0.125) // 1/sqrt(64), exact in binary
    for (_ <- 0 until iters) {
      val w = Array.tabulate(dim) { i =>
        var acc = 0.0; var j = 0
        while (j < dim) { acc += m(i)(j) * v(j); j += 1 }; acc
      }
      var n2 = 0.0; var i = 0
      while (i < dim) { n2 += w(i) * w(i); i += 1 }
      val nrm = math.sqrt(n2)
      if (nrm > 0) v = w.map(_ / nrm) // zero matrix (empty corpus): keep v
    }
    var sv = 0.0
    var d = 0
    while (d < dim) { sv += s(d).toDouble * v(d); d += 1 }
    val center = if (n == 0) 0.0 else sv / n

    // -- stage 3: map-side projection against the literal eigenvector --
    val vlit = array(v.map(lit): _*)
    pts.select(col("vec_id"),
      (floor((aggregate(zip_with(col("q"), vlit, (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x) - lit(center)) * 1e6) / 1e6).as("pc1"))
  }

  // ---------------------------------------------------------------- q75
  def q75(spark: SparkSession, sfDir: String): DataFrame =
    pc1ProjectionOf(Tables.table(spark, sfDir, "embeddings"))

  /** One power-iteration round: M·v in ascending j, then normalize by
    * the ascending-i norm — the driver loop's exact operation order. */
  private def duckRound(k: Int, dim: Int): String =
    s"""v$k AS (
       |  SELECT list_transform(w, x -> x / sqrt(list_sum(list_transform(w, y -> y * y)))) AS v
       |  FROM (SELECT list_transform(mm, row ->
       |          list_sum(list_transform(range(1, ${dim + 1}), j -> row[j] * v[j]))) AS w
       |        FROM mat, v${k - 1}))""".stripMargin

  private def q75Sql(dim: Int = 64, iters: Int = 24): String = {
    val rounds = (1 to iters).map(duckRound(_, dim)).mkString(",\n")
    s"""WITH pts AS (
       |  SELECT vec_id,
       |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT)) AS q
       |  FROM embeddings),
       |nn AS (SELECT count(*) AS n FROM pts),
       |sl AS (
       |  SELECT list(s ORDER BY d) AS s FROM (
       |    SELECT d.d, CAST(sum(q[d.d]) AS BIGINT) AS s
       |    FROM pts CROSS JOIN (SELECT unnest(range(1, ${dim + 1})) AS d) d
       |    GROUP BY d.d)),
       |gm AS (
       |  SELECT i.i, j.j, CAST(sum(q[i.i] * q[j.j]) AS BIGINT) AS g
       |  FROM pts
       |  CROSS JOIN (SELECT unnest(range(1, ${dim + 1})) AS i) i
       |  CROSS JOIN (SELECT unnest(range(1, ${dim + 1})) AS j) j
       |  GROUP BY i.i, j.j),
       |mat AS (
       |  SELECT list(mr ORDER BY i) AS mm FROM (
       |    SELECT gm.i, list(CAST(CAST(nn.n AS HUGEINT) * gm.g
       |                           - CAST(sl.s[gm.i] AS HUGEINT) * sl.s[gm.j] AS DOUBLE)
       |                      ORDER BY gm.j) AS mr
       |    FROM gm, nn, sl GROUP BY gm.i)),
       |v0 AS (SELECT list_transform(range(1, ${dim + 1}), x -> 0.125) AS v),
       |$rounds,
       |ctr AS (
       |  SELECT list_sum(list_transform(range(1, ${dim + 1}),
       |           d -> CAST(sl.s[d] AS DOUBLE) * v[d])) / nn.n AS c
       |  FROM sl, v$iters, nn)
       |SELECT p.vec_id,
       |       floor((list_sum(list_transform(range(1, ${dim + 1}),
       |                d -> p.q[d] * vf.v[d])) - ctr.c) * 1000000.0) / 1000000.0 AS pc1
       |FROM pts p, v$iters vf, ctr""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q75_pca_projection", q75, Some(q75Sql()))
  )
}
