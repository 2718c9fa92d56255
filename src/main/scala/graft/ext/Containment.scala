package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shingle containment (q90) — the ASYMMETRIC near-dup measure
  * C(A→B) = |A∩B| / |A|: a short document wholly quoted inside a long
  * one scores containment ≈ 1 while its Jaccard (q14) stays near
  * |A|/|B| — the quote/subset-duplication class symmetric similarity
  * structurally misses (the reason dedup pipelines run containment
  * alongside Jaccard: boilerplate wrappers, quoted replies, excerpt
  * pages). Emits both directions for every candidate pair whose MAX
  * containment clears the threshold.
  *
  * Shape: identical to q14's join-free inverted index (posting lists →
  * in-row ordered pairs → pair-count exchange; dfCap bounds the O(df²)
  * fan-out) — only the final predicate differs, so cost and scale
  * posture are exactly q14's. Containments are integer-ratio compares
  * (inter·den ≥ num·|A|) before any rounding.
  */
object Containment {

  /** (doc_a, doc_b, inter, cont_a, cont_b): pairs with
    * max(containment) ≥ minNum/minDen; cont_x = inter/|x| floor-truncated
    * to 4 dp. */
  def containmentOf(docs: DataFrame, minNum: Int = 1, minDen: Int = 2,
                    dfCap: Int = TextOps.DefaultDfCap): DataFrame =
    TextOps.shingleArr(docs, distinct = true)
      .select(col("doc_id"), size(col("sarr")).as("n"), explode(col("sarr")).as("s"))
      .groupBy(col("s"))
      .agg(array_sort(collect_list(struct(col("doc_id"), col("n")))).as("ids"))
      .filter(size(col("ids")).between(2, dfCap))
      .select(explode(expr("ordered_pairs(ids)")).as("p"))
      .groupBy(col("p.a_doc_id").as("doc_a"), col("p.b_doc_id").as("doc_b"),
        col("p.a_n").as("na"), col("p.b_n").as("nb"))
      .agg(count(lit(1)).as("inter"))
      // integer predicate: max containment = inter / min(na, nb)
      .filter(col("inter") * minDen >= least(col("na"), col("nb")) * minNum)
      // floor-truncation, not round: inter/n can land exactly on a 4-dp
      // half boundary (inter·10⁴ ≡ n/2 (mod n), reachable whenever n is
      // even), where Spark's shortest-decimal HALF_UP and DuckDB's
      // binary-double rounding may disagree; floor(x·1e4)/1e4 on the
      // identical double is bit-deterministic (the quality_score idiom)
      .select(col("doc_a"), col("doc_b"), col("inter"),
        (floor(col("inter") / col("na") * 1e4) / 1e4).as("cont_a"),
        (floor(col("inter") / col("nb") * 1e4) / 1e4).as("cont_b"))

  // ---------------------------------------------------------------- q90
  def q90(spark: SparkSession, sfDir: String): DataFrame =
    containmentOf(Tables.table(spark, sfDir, "documents"))

  private def q90Sql(minNum: Int = 1, minDen: Int = 2): String =
    s"""WITH ${TextOps.shingleCte},
       |ok AS (SELECT s FROM shing GROUP BY s HAVING count(*) <= ${TextOps.DefaultDfCap}),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |          FROM shing a JOIN shing b ON a.s = b.s AND a.doc_id < b.doc_id
       |          JOIN ok ON ok.s = a.s
       |          GROUP BY doc_a, doc_b)
       |SELECT doc_a, doc_b, inter,
       |       floor(inter / ca.n * 10000) / 10000 AS cont_a,
       |       floor(inter / cb.n * 10000) / 10000 AS cont_b
       |FROM inter
       |JOIN shcnt ca ON ca.doc_id = doc_a
       |JOIN shcnt cb ON cb.doc_id = doc_b
       |WHERE inter * $minDen >= least(ca.n, cb.n) * $minNum""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q90_containment", q90, Some(q90Sql()))
  )
}
