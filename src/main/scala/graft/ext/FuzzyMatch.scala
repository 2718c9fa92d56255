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
  /** (name, n, blk): the distinct-name vocabulary with row multiplicities
    * and the last-token blocking key — the one scan both q140 and q143
    * derive everything from. */
  private def vocabOf(named: DataFrame, nameCol: String): DataFrame =
    named.groupBy(col(nameCol).as("name")).agg(count(lit(1)).as("n"))
      .withColumn("blk", element_at(split(col("name"), " "), -1))

  /** The pair machinery over an (already persisted) vocabulary frame. */
  private def fuzzyPairsFromVocab(vocab: DataFrame, maxDist: Int,
                                  blockCap: Long): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
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

  def fuzzyPairsOf(named: DataFrame, nameCol: String, maxDist: Int = 4,
                   blockCap: Long = DefaultBlockCap): DataFrame =
    fuzzyPairsFromVocab(
      Tables.swapPersist("q140_vocab", vocabOf(named, nameCol)), maxDist, blockCap)

  /** Entity resolution end-to-end (q143): the q140 match graph closed into
    * ENTITIES by connected components, reported as a full canonicalization
    * census — the standard dedup-the-catalog operator (merge "cold widget"
    * / "bold widget" rows under one id before joining facts against the
    * dimension).
    *
    * Semantics: vertices = distinct names that survive q140's blocking +
    * distance test in at least one pair; entity id = the component's
    * lexicographically smallest name (min-label CC — the q38 rule applied
    * to strings); every UNPAIRED name is its own entity (full census, the
    * q117 posture: the answer includes "how much of the catalog is already
    * canonical"). Per entity: n_names (cluster size) and row_mass (Σ row
    * multiplicities over member names) — row_mass is what the fact-side
    * join fans into, so it prices the merge.
    *
    * Scale shape: ONE vocabulary scan persists and feeds the blocking
    * census, both pair-expansion sides AND the final census attach; CC
    * runs on the pair list (match-graph-sized, not row-sized) with
    * O(diameter) rounds — edit-distance components are shallow by
    * construction (diameter ≤ maxDist·chain length within a block). The
    * census aggregation is vocabulary-grain. Transitivity is scoped BY
    * blocking: chains cannot cross blocks — the q140 recall trade
    * inherited verbatim, spec-pinned. */
  def entityResolutionOf(named: DataFrame, nameCol: String, maxDist: Int = 4,
                         blockCap: Long = DefaultBlockCap): DataFrame = {
    val vocab = Tables.swapPersist("q143_vocab", vocabOf(named, nameCol))
    // localCheckpoint, not cache: the CC loop re-references its edge list
    // in every round's lineage, and above the loop's last internal
    // checkpoint that lineage doubles per round (labels has two consumers
    // each round) — with the full blocking+levenshtein derivation still
    // attached, the q143 plan string blew up ~22× past the q38 family
    // (first build: 1779 exchanges in PLAN_MANIFEST vs q38's 201).
    // Truncating here costs one eager job over the match-graph-sized pair
    // list and makes every round reference a leaf.
    val pairs = fuzzyPairsFromVocab(vocab, maxDist, blockCap)
      .select(col("name_a"), col("name_b"))
      .localCheckpoint()
    val cc = graft.ops.Components.connectedComponents(pairs, "name_a", "name_b")
    vocab
      .join(cc.select(col("v").as("name"), col("cluster_id").as("ent")), Seq("name"), "left")
      .withColumn("entity", coalesce(col("ent"), col("name")))
      .groupBy(col("entity"))
      .agg(count(lit(1)).as("n_names"), sum(col("n")).as("row_mass"))
      .select(col("entity"), col("n_names"), col("row_mass"))
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

  // ---------------------------------------------------------------- q143
  def q143(spark: SparkSession, sfDir: String): DataFrame =
    entityResolutionOf(Tables.table(spark, sfDir, "part"), "p_name")

  /** Mirror of [[entityResolutionOf]]: q140's pair CTEs + the q38-style
    * recursive reachability closure over string vertices + the full
    * census (unpaired names resolve to themselves via LEFT JOIN). */
  private def q143Sql(maxDist: Int = 4, blockCap: Long = DefaultBlockCap): String =
    s"""WITH RECURSIVE vocab AS (
       |  SELECT p_name AS name, CAST(count(*) AS BIGINT) AS n,
       |         list_extract(string_split(p_name, ' '), -1) AS blk
       |  FROM part GROUP BY 1),
       |ok AS (SELECT blk FROM vocab GROUP BY blk HAVING count(*) <= $blockCap),
       |capped AS (SELECT vocab.* FROM vocab JOIN ok USING (blk)),
       |p AS (
       |  SELECT a.name AS name_a, b.name AS name_b
       |  FROM capped a JOIN capped b ON a.blk = b.blk AND a.name < b.name
       |  WHERE levenshtein(a.name, b.name) <= $maxDist),
       |bi AS (SELECT name_a AS x, name_b AS y FROM p
       |       UNION SELECT name_b, name_a FROM p),
       |reach(src, dst) AS (
       |  SELECT x, x FROM bi
       |  UNION
       |  SELECT r.src, bi.y FROM reach r JOIN bi ON r.dst = bi.x),
       |lbl AS (SELECT src AS name, min(dst) AS ent FROM reach GROUP BY src)
       |SELECT COALESCE(lbl.ent, vocab.name) AS entity,
       |       CAST(count(*) AS BIGINT) AS n_names,
       |       CAST(SUM(vocab.n) AS BIGINT) AS row_mass
       |FROM vocab LEFT JOIN lbl ON vocab.name = lbl.name
       |GROUP BY 1""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q140_fuzzy_match", q140, Some(q140Sql())),
    QueryDef("q143_entity_resolution", q143, Some(q143Sql())))
}
