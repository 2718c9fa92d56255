package graft.ops

import graft.ext.TextOps
import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus snapshot diff (q104) — dataset-versioning audit between two
  * crawls/ingests of the same collection: per (source, status) counts and
  * character-mass deltas for added / removed / changed / unchanged
  * documents. The primitive behind "what did this recrawl actually do to
  * my training mix?" — the Delta/Iceberg table-diff question asked at the
  * content level, where doc_id identity survives but text may have been
  * re-extracted. The reference never persists anything (Kafka in, Kafka
  * out), so it has no versioning surface; this is a rebuild-side scale
  * citizen like q95's layout audit.
  *
  * Change detection is content-hash equality (md5 of the text), computed
  * in-row on each side — the diff never compares full texts across the
  * join, so a changed 100 KB doc ships 32 bytes of hash, not its body.
  *
  * Scale shape: each snapshot is scanned once, projected to
  * (doc_id, source, length, hash), and the two thin frames meet in ONE
  * co-keyed full-outer join on doc_id (both sides exchange on the same
  * key — at 100 TB this is the unavoidable shuffle, and it carries ~50
  * bytes/doc). The status verdict and char arithmetic are in-row; the
  * summary is a |sources|×4-bounded aggregation with map-side partials.
  * On bucketed snapshot layouts ([[Layout]]) the join is exchange-free.
  *
  * Fixture binding: two deterministic pseudo-snapshots derived from
  * `documents` by the repo's md5-threshold idiom — snapshot A keeps
  * doc_ids with md5('snapA|'||id) bucket < 9 of 10 (~90%), snapshot B
  * keeps md5('snapB|'||id) bucket < 9 (~90%, independent → ~9% adds,
  * ~9% removes), and B's text is "re-extracted" (suffixed ' rev2') when
  * md5('rev|'||id) bucket of 20 is 0 (~5% changed). Deterministic,
  * engine-portable, replay-stable — never `rand()`.
  */
object SnapshotDiff {

  /** Doc-level diff over two (doc_id, source, text) snapshots:
    * (doc_id, source, status, chars_prev, chars_cur). */
  def snapshotDiffOf(prev: DataFrame, cur: DataFrame): DataFrame = {
    def keyed(df: DataFrame, p: String) = df.select(
      col("doc_id").as(s"${p}_id"), col("source").as(s"${p}_src"),
      length(col("text")).cast("long").as(s"${p}_len"),
      md5(col("text")).as(s"${p}_h"))
    keyed(prev, "p").join(keyed(cur, "c"),
        col("p_id") === col("c_id"), "full_outer")
      .select(
        coalesce(col("p_id"), col("c_id")).as("doc_id"),
        coalesce(col("p_src"), col("c_src")).as("source"),
        when(col("p_id").isNull, lit("added"))
          .when(col("c_id").isNull, lit("removed"))
          .when(col("p_h") =!= col("c_h"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"),
        coalesce(col("p_len"), lit(0L)).as("chars_prev"),
        coalesce(col("c_len"), lit(0L)).as("chars_cur"))
  }

  /** (source, status, n_docs, chars_prev, chars_cur, chars_delta) —
    * the bounded accounting view of [[snapshotDiffOf]]. */
  def diffSummaryOf(prev: DataFrame, cur: DataFrame): DataFrame =
    snapshotDiffOf(prev, cur)
      .groupBy(col("source"), col("status"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("chars_prev")).as("chars_prev"),
        sum(col("chars_cur")).as("chars_cur"),
        sum(col("chars_cur") - col("chars_prev")).as("chars_delta"))

  /** The two deterministic pseudo-snapshots of the fixture corpus. */
  private[graft] def fixtureSnapshots(docs: DataFrame): (DataFrame, DataFrame) = {
    def bucket(salt: String, m: Int) = {
      // md5-threshold membership, computed in-row on a named column
      expr(s"CAST(${TextOps.hexVal(s"_h_$salt", 1, duck = false)} % $m AS INT)")
    }
    val prev = docs
      .withColumn("_h_a", md5(concat(lit("snapA|"), col("doc_id"))))
      .filter(bucket("a", 10) < 9)
      .select(col("doc_id"), col("source"), col("text"))
    val cur = docs
      .withColumn("_h_b", md5(concat(lit("snapB|"), col("doc_id"))))
      .filter(bucket("b", 10) < 9)
      .withColumn("_h_r", md5(concat(lit("rev|"), col("doc_id"))))
      .withColumn("text",
        when(bucket("r", 20) === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")))
      .select(col("doc_id"), col("source"), col("text"))
    (prev, cur)
  }

  // ---------------------------------------------------------------- q104
  def q104(spark: SparkSession, sfDir: String): DataFrame = {
    val (prev, cur) = fixtureSnapshots(Tables.table(spark, sfDir, "documents"))
    diffSummaryOf(prev, cur)
  }

  private val q104Sql = {
    def hv(m: String) = TextOps.hexVal(m, 1, duck = true)
    s"""WITH pa AS (
       |  SELECT doc_id, source, length(text)::BIGINT AS len, md5(text) AS h
       |  FROM (SELECT *, md5('snapA|' || doc_id) AS ha FROM documents)
       |  WHERE ${hv("ha")} % 10 < 9),
       |cb0 AS (
       |  SELECT doc_id, source,
       |         CASE WHEN ${hv("hr")} % 20 = 0 THEN text || ' rev2' ELSE text END AS text
       |  FROM (SELECT *, md5('snapB|' || doc_id) AS hb,
       |               md5('rev|' || doc_id) AS hr FROM documents)
       |  WHERE ${hv("hb")} % 10 < 9),
       |cb AS (SELECT doc_id, source, length(text)::BIGINT AS len, md5(text) AS h FROM cb0),
       |d AS (
       |  SELECT coalesce(pa.source, cb.source) AS source,
       |         CASE WHEN pa.doc_id IS NULL THEN 'added'
       |              WHEN cb.doc_id IS NULL THEN 'removed'
       |              WHEN pa.h <> cb.h THEN 'changed'
       |              ELSE 'unchanged' END AS status,
       |         coalesce(pa.len, 0) AS lp, coalesce(cb.len, 0) AS lc
       |  FROM pa FULL OUTER JOIN cb ON pa.doc_id = cb.doc_id)
       |SELECT source, status, count(*) AS n_docs,
       |       CAST(sum(lp) AS BIGINT) AS chars_prev,
       |       CAST(sum(lc) AS BIGINT) AS chars_cur,
       |       CAST(sum(lc - lp) AS BIGINT) AS chars_delta
       |FROM d GROUP BY source, status""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q104_snapshot_diff", q104, Some(q104Sql))
  )
}
