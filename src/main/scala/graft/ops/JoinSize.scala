package graft.ops

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Self-join size audit (q120) — the exact second frequency moment
  * F₂ = Σ_k c_k² per candidate join key: the number of rows a self-join
  * on that key would produce, before anyone runs it. This is THE
  * statistic a join planner (and the engineer choosing between q23's
  * salting and AQE skew splits) needs: a key whose F₂ is orders above
  * its row count will detonate any equi-join it anchors, and the
  * heaviest key says where the salt belongs. Complements q37 (who the
  * heavy keys are) with how much they cost in join output.
  *
  * Exact, not sketched: the key-grain census (distinct keys × 1 row)
  * makes F₂ an integer sum — at fixture scale and far beyond. Int64
  * bound documented: F₂ ≤ n·max_c, overflowing only past ~10⁹ rows on
  * ONE key (a join nobody should run; production would switch the sum
  * to decimal).
  *
  * Scale shape: ONE exchange per audited key to its key-grain census
  * (map-side partials), then a 1-row rollup per key column; the
  * heaviest-key pick rides the same census through max(struct). Key
  * columns audit independently — no cross-column shuffle.
  */
object JoinSize {

  /** One row per audited key column: (join_key, n_rows, n_keys,
    * self_join_rows, max_key_rows, blowup_bp) where blowup_bp =
    * F₂·10⁴ div n (10⁴ = join output ≈ input size; higher = blow-up). */
  def selfJoinSizeOf(df: DataFrame, keys: Seq[String]): DataFrame =
    keys.map { k =>
      df.select(col(k).cast("string").as("kv"))
        .groupBy(col("kv")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("n_rows"), count(lit(1)).as("n_keys"),
          sum(col("c") * col("c")).as("self_join_rows"),
          max(col("c")).as("max_key_rows"))
        .select(lit(k).as("join_key"), col("n_rows"), col("n_keys"),
          col("self_join_rows"), col("max_key_rows"),
          expr("self_join_rows * 10000 div n_rows").as("blowup_bp"))
    }.reduce(_ unionByName _)

  // ---------------------------------------------------------------- q120
  def q120(spark: SparkSession, sfDir: String): DataFrame =
    selfJoinSizeOf(Tables.table(spark, sfDir, "events"),
      Seq("user_id", "event_type"))

  private val q120Sql =
    """WITH u AS (SELECT CAST(user_id AS VARCHAR) AS kv FROM events),
      |e AS (SELECT CAST(event_type AS VARCHAR) AS kv FROM events),
      |cu AS (SELECT kv, count(*) AS c FROM u GROUP BY kv),
      |ce AS (SELECT kv, count(*) AS c FROM e GROUP BY kv),
      |su AS (SELECT 'user_id' AS join_key, CAST(sum(c) AS BIGINT) AS n_rows,
      |              count(*) AS n_keys, CAST(sum(c * c) AS BIGINT) AS self_join_rows,
      |              CAST(max(c) AS BIGINT) AS max_key_rows
      |       FROM cu),
      |se AS (SELECT 'event_type' AS join_key, CAST(sum(c) AS BIGINT) AS n_rows,
      |              count(*) AS n_keys, CAST(sum(c * c) AS BIGINT) AS self_join_rows,
      |              CAST(max(c) AS BIGINT) AS max_key_rows
      |       FROM ce),
      |b AS (SELECT * FROM su UNION ALL SELECT * FROM se)
      |SELECT join_key, n_rows, n_keys, self_join_rows, max_key_rows,
      |       CAST(self_join_rows * 10000 // n_rows AS BIGINT) AS blowup_bp
      |FROM b""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q120_join_size", q120, Some(q120Sql))
  )
}
