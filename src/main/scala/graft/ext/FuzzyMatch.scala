package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Blocked fuzzy string matching (q140) — approximate string join by
  * edit distance, the catalog-hygiene counterpart of the text-corpus
  * near-dup family (q12–q14): find product names that are ALMOST the
  * same ("cold widget" / "bold widget") without the O(n²) all-pairs
  * distance matrix that sinks naive fuzzy joins at scale.
  *
  * Scale shape — two load-bearing moves:
  *  1. **Distance runs on the distinct-name VOCABULARY, not the rows.**
  *     Names repeat heavily (every catalog does); grouping first turns
  *     a corpus-sized self-join into a vocab-sized one, and the row
  *     multiplicities come back as `pair_mass = n_a·n_b` for free.
  *  2. **Blocking on the last token.** Candidates must share their
  *     trailing word (the head noun in adjective-noun names); within a
  *     block the quadratic is bounded by `blockCap` (the q12
  *     banded-bucket discipline). DECLARED RECALL TRADE:
  *     a pair whose edit distance is ≤ maxDist but whose last tokens
  *     differ ("blue rod" / "blue rim") is NOT a candidate — standard
  *     blocking semantics, mirrored exactly in the oracle. A block
  *     larger than `blockCap` stopped discriminating (the q12
  *     DefaultMaxBucket rationale: an over-full block is one giant
  *     near-identical family, and expanding it buys no information
  *     worth m² work) — it is dropped BEFORE pair expansion, with the
  *     identical HAVING in the oracle so the guard is live in the
  *     graded plan.
  *
  * Levenshtein itself is the classic unit-cost Wagner–Fischer distance
  * in both engines (Spark `levenshtein`, DuckDB `levenshtein`) —
  * integer, so the comparison is exact.
  */
object FuzzyMatch {

  /** Per-block vocabulary cap: a block of m names expands to m(m−1)/2
    * distance computations, so 4096 keeps the worst block ≤ ~8.4M cheap
    * integer DPs spread across the shuffle — and any real catalog whose
    * single head-noun family exceeds 4096 DISTINCT spellings is a
    * boilerplate-generation artifact exact dedup should see first. */
  val DefaultBlockCap = 4096L

  /** (name_a, name_b, dist, n_a, n_b, pair_mass) for distinct-name pairs
    * sharing a last token with 1 ≤ levenshtein ≤ maxDist; name_a < name_b. */
  def fuzzyPairsOf(named: DataFrame, nameCol: String, maxDist: Int = 4,
                   blockCap: Long = DefaultBlockCap): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val vocab = Tables.swapPersist("q140_vocab",
      named.groupBy(col(nameCol).as("name")).agg(count(lit(1)).as("n"))
        .withColumn("blk", element_at(split(col("name"), " "), -1)))
    // blk census is vocabulary-grain (≤ |vocab| rows) — the cap filter
    // runs there, BEFORE the quadratic pair expansion it bounds
    val okBlk = vocab.groupBy(col("blk")).agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= blockCap).select(col("blk"))
    val capped = vocab.join(okBlk, Seq("blk"))
    val a = capped.select(col("blk"), col("name").as("name_a"), col("n").as("n_a"))
    val b = capped.select(col("blk"), col("name").as("name_b"), col("n").as("n_b"))
    a.join(b, Seq("blk"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist"),
        col("n_a"), col("n_b"), (col("n_a") * col("n_b")).as("pair_mass"))
  }

  // ---------------------------------------------------------------- q140
  def q140(spark: SparkSession, sfDir: String): DataFrame =
    fuzzyPairsOf(Tables.table(spark, sfDir, "part"), "p_name")

  private def q140Sql(maxDist: Int = 4, blockCap: Long = DefaultBlockCap): String =
    s"""WITH vocab AS (
       |  SELECT p_name AS name, CAST(count(*) AS BIGINT) AS n,
       |         list_extract(string_split(p_name, ' '), -1) AS blk
       |  FROM part GROUP BY 1),
       |ok AS (SELECT blk FROM vocab GROUP BY blk HAVING count(*) <= $blockCap),
       |capped AS (SELECT vocab.* FROM vocab JOIN ok USING (blk)),
       |p AS (
       |  SELECT a.name AS name_a, b.name AS name_b,
       |         CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
       |         a.n AS n_a, b.n AS n_b
       |  FROM capped a JOIN capped b ON a.blk = b.blk AND a.name < b.name)
       |SELECT name_a, name_b, dist, n_a, n_b, n_a * n_b AS pair_mass
       |FROM p WHERE dist <= $maxDist""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q140_fuzzy_match", q140, Some(q140Sql())))
}
