package graft.ops

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Co-engagement matrix (q121) — exact distinct-user overlap between
  * every pair of event types: how many users touch BOTH feeds, with the
  * Jaccard in basis points. The product-analytics staple ("do buyers
  * also click?") computed the scale-safe way: the naive formulation
  * self-joins the events table per type pair; here the corpus compresses
  * to DISTINCT (user, type) first, each user's ≤ |types| type-set pairs
  * IN-ROW (the q12 bucket-pair trick pointed at feeds), and the matrix
  * aggregation is |types|²-bounded. No self-join, no row ever carries
  * more than a type-set.
  *
  * Scale shape: one (user, type) distinct exchange + one user-grain
  * collect (set bounded by |types|, not activity) → in-row ordered
  * pairs → ≤ |types|²-row count; per-type totals reuse the distinct
  * frame and broadcast back. All integer; pairs normalize (a < b) so
  * the matrix is upper-triangular in both engines.
  */
object CoEngagement {

  /** (type_a, type_b, n_both, n_a, n_b, jaccard_bp) over any
    * (user_id, event_type) frame, type_a < type_b. */
  def coEngagementOf(events: DataFrame): DataFrame = {
    val ut = Tables.swapPersist("q121_ut",
      events.select(col("user_id"), col("event_type")).distinct())
    val pairs = ut
      .groupBy(col("user_id"))
      .agg(sort_array(collect_set(col("event_type"))).as("ts"))
      .select(explode(expr(
        "flatten(transform(ts, (a, i) -> transform(slice(ts, i + 2, size(ts)), b -> struct(a, b))))"))
        .as("p"))
      .groupBy(col("p.a").as("type_a"), col("p.b").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    val totals = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    pairs
      .join(broadcast(totals.select(col("event_type").as("type_a"), col("n").as("n_a"))), "type_a")
      .join(broadcast(totals.select(col("event_type").as("type_b"), col("n").as("n_b"))), "type_b")
      .select(col("type_a"), col("type_b"), col("n_both"), col("n_a"), col("n_b"),
        expr("n_both * 10000 div (n_a + n_b - n_both)").as("jaccard_bp"))
  }

  // ---------------------------------------------------------------- q121
  def q121(spark: SparkSession, sfDir: String): DataFrame =
    coEngagementOf(Tables.table(spark, sfDir, "events"))

  private val q121Sql =
    """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
      |pu AS (SELECT user_id, list_sort(list(event_type)) AS ts FROM ut GROUP BY user_id),
      |pr AS (SELECT unnest(flatten(list_transform(range(1, len(ts) + 1),
      |         i -> list_transform(ts[i+1:], b -> struct_pack(a := ts[i], b := b))))) AS p
      |       FROM pu),
      |pc AS (SELECT struct_extract(p, 'a') AS type_a, struct_extract(p, 'b') AS type_b,
      |              count(*) AS n_both
      |       FROM pr GROUP BY 1, 2),
      |t AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1)
      |SELECT type_a, type_b, CAST(n_both AS BIGINT) AS n_both,
      |       CAST(ta.n AS BIGINT) AS n_a, CAST(tb.n AS BIGINT) AS n_b,
      |       CAST(n_both * 10000 // (ta.n + tb.n - n_both) AS BIGINT) AS jaccard_bp
      |FROM pc
      |JOIN t ta ON ta.event_type = pc.type_a
      |JOIN t tb ON tb.event_type = pc.type_b""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q121_co_engagement", q121, Some(q121Sql))
  )
}
