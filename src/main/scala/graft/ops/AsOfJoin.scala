package graft.ops

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — the temporal join Spark has no built-in
  * for (DuckDB: `ASOF JOIN`; the standard need in log analytics is "attach
  * the latest deploy/config/purchase at or before each event").
  *
  * Spark-first formulation, NOT a custom plan node: tag both sides, union,
  * and run `last(value, ignoreNulls=true)` over a (key, time)-ordered
  * running window, then keep only left rows. That is ONE hash exchange on
  * the key + a per-key sort — the same cost as a plain co-partitioned join
  * — versus the naive range-join (`l.t >= r.t` theta-join → per-key cross
  * product, then a max-per-left dedup). No custom Catalyst surface needed:
  * the union-scan window is already whole-stage-codegen'd and AQE-planned.
  *
  * Scale: partitions by the join key (high-cardinality user/entity id →
  * even spread); the running window is a single ordered pass per key with
  * O(carried columns) state, no buffering of the right side. Ties
  * (r.t == l.t) match, like DuckDB's `>=` convention; right rows carrying
  * NULL in a value column leave the carried state unchanged only for that
  * column (use a single struct value column when all-or-nothing semantics
  * are needed — q31 does).
  */
object AsOfJoin {

  /** For each row of `left`, attach `right`'s latest row with
    * `right.timeCol <= left.timeCol` on the same `key` (null-padded when no
    * prior right row exists). `carry` names the right columns to attach,
    * emitted as `asof_<name>`. */
  def asOfJoin(left: DataFrame, right: DataFrame,
               key: String, timeCol: String, carry: Seq[String]): DataFrame = {
    // single struct carries all right columns atomically (one last() state)
    val l = left.withColumn("_asof", lit(null).cast(
      org.apache.spark.sql.types.StructType(
        carry.map(c => org.apache.spark.sql.types.StructField(c,
          right.schema(c).dataType)))))
      .withColumn("_side", lit(1))
    val r = right
      .select((col(key) +: col(timeCol) +: carry.map(c => col(c))).distinct: _*)
      // a null-time right row would sort nulls-first and be carried into
      // every left row as a bogus "prior" — an unknown time matches nothing
      .filter(col(timeCol).isNotNull)
      .withColumn("_asof", struct(carry.map(col): _*))
      .withColumn("_side", lit(0))
    val lCols = l.columns
    val w = Window.partitionBy(col(key))
      // right rows sort before a left row at the same time → `<=` semantics
      .orderBy(col(timeCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r.select(lCols.map(c =>
        if (r.columns.contains(c)) col(c) else lit(null).as(c)).toSeq: _*))
      .withColumn("_carried", last(col("_asof"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_asof", "_side")
      .withColumns(carry.map(c => s"asof_$c" -> col(s"_carried.$c")).toMap)
      .drop("_carried")
  }

  // ---------------------------------------------------------------- q31
  /** Each click joined to the user's most recent prior-or-simultaneous
    * purchase. */
  def q31(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.table(spark, sfDir, "events")
    // epoch-micros up front — the fixture's ts encoding varies (see
    // Tables.tsMicros); µs is the grain DuckDB's epoch_us compares at
    val tUs = Tables.tsMicros(ev)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), tUs.as("t"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), tUs.as("t"), col("value"))
    asOfJoin(clicks, purchases, key = "user_id", timeCol = "t", carry = Seq("t", "value"))
      .select(
        col("event_id"), col("user_id"), col("t").as("ts_us"),
        col("asof_t").as("purchase_ts_us"), col("asof_value").as("purchase_value"))
  }

  private val q31Sql =
    """WITH a AS (SELECT event_id, user_id, epoch_us(ts) AS t
      |           FROM events WHERE event_type = 'click'),
      |     b AS (SELECT user_id, epoch_us(ts) AS t, value
      |           FROM events WHERE event_type = 'purchase')
      |SELECT a.event_id, a.user_id, a.t AS ts_us,
      |       b.t AS purchase_ts_us, b.value AS purchase_value
      |FROM a ASOF LEFT JOIN b ON a.user_id = b.user_id AND a.t >= b.t""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q31_asof_join", q31, Some(q31Sql))
  )
}
