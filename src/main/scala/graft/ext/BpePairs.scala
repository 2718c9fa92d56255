package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BPE pair counting (q70) — the inner statistic of tokenizer induction:
  * byte-pair encoding's training loop repeatedly merges the most
  * frequent ADJACENT symbol pair, weighted by word frequency. This
  * operator computes one such census at character level — the first
  * merge's ranking — over the corpus, the distributed step a
  * train-a-tokenizer-on-your-corpus pipeline runs before the (driver-
  * side, vocab-sized) merge loop takes over.
  *
  * Scale shape: the corpus compresses to its word VOCABULARY first
  * (one exchange on word — the q27 move; vocab ≪ corpus by Zipf), and
  * the character-pair explode runs over vocab rows × word length, never
  * corpus tokens; pair counts are a second exchange on the pair key
  * whose cardinality is bounded by alphabet² (tiny). The final ranking
  * is a window over THAT aggregated pair table — hundreds of rows at
  * any corpus size, so the single-partition sort the window implies is
  * a non-issue (the corpus-sized analogue would be wrong; see q66's
  * bounded-TopK for that case). */
object BpePairs {

  /** General form over any (text) frame: the `topN` most frequent
    * adjacent character pairs, weighted by word occurrence count —
    * (rank, pair, pair_count), rank 1..topN by (count desc, pair asc). */
  def bpePairsOf(docs: DataFrame, topN: Int = 50): DataFrame = {
    require(topN >= 1, "bpePairsOf: topN must be positive")
    val vocab = docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
    val pairCounts = vocab
      .withColumn("cs", split(col("word"), ""))
      .select(col("wc"), explode(expr(
        "transform(sequence(1, size(cs) - 1), i -> concat(element_at(cs, i), element_at(cs, i + 1)))"))
        .as("pair"))
      .groupBy(col("pair")).agg(sum(col("wc")).as("pair_count"))
    pairCounts
      .withColumn("rank",
        row_number().over(Window.orderBy(col("pair_count").desc, col("pair"))).cast("long"))
      .filter(col("rank") <= topN)
      .select(col("rank"), col("pair"), col("pair_count"))
  }

  // ---------------------------------------------------------------- q70
  def q70(spark: SparkSession, sfDir: String): DataFrame =
    bpePairsOf(Tables.table(spark, sfDir, "documents").select(col("text")))

  private def q70Sql(topN: Int = 50): String =
    s"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
       |v AS (SELECT word, count(*) AS wc FROM w WHERE length(word) >= 2 GROUP BY word),
       |p AS (SELECT unnest(list_transform(range(1, len(cs)), i -> cs[i] || cs[i + 1])) AS pair, wc
       |      FROM (SELECT string_split(word, '') AS cs, wc FROM v)),
       |pc AS (SELECT pair, sum(wc)::BIGINT AS pair_count FROM p GROUP BY pair),
       |r AS (SELECT pair, pair_count,
       |        row_number() OVER (ORDER BY pair_count DESC, pair) AS rank FROM pc)
       |SELECT rank, pair, pair_count FROM r WHERE rank <= $topN""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q70_bpe_pairs", q70, Some(q70Sql()))
  )
}
