package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Quality–length confound audit (q108) — per-source Pearson correlation
  * between document length and quality score, as r² in basis points with
  * the correlation's sign. The ablation-design primitive behind "is my
  * quality filter secretly a length filter?": q16's composite score has a
  * length term by construction, and a source whose r² approaches 10⁴
  * gets no new signal from quality-thresholding beyond a length cutoff —
  * this table says so per source before a training run bakes the
  * confound in.
  *
  * Determinism: the five sufficient statistics (Σx, Σy, Σxy, Σx², Σy²)
  * are exact int64 sums (order-free — distributed aggregation order
  * cannot flip a bit); covariance/variances then form in DOUBLE from
  * those identical integers with the same expression shape in both
  * engines (IEEE multiply/divide are correctly rounded, so identical
  * inputs + identical order = identical bits — the q82 discipline), and
  * r² floor-truncates to 4 dp before comparison. The double hop exists
  * because n·Σxy − Σx·Σy overflows int64 at ~10⁵ docs/source — the
  * cross-multiplied-integer trick (q101/q107) does not survive the
  * SQUARE the r² numerator needs.
  *
  * Scale shape: ONE corpus aggregation to the |sources|-row census with
  * map-side partials (the only exchange); every derived measure is
  * census-row arithmetic. Nothing collects, nothing windows.
  */
object CorrAudit {

  /** (source, n_docs, mean_words_micro, mean_q10k_micro, r_sign, r2_bp)
    * over any (doc_id, text, source) frame. r2_bp is NULL when either
    * variance is zero (constant column ⇒ correlation undefined). */
  def corrAuditOf(docs: DataFrame): DataFrame =
    TextOps.scoredDocs(docs)
      .select(col("source"), col("n_words").as("x"),
        expr("CAST(round(quality_score * 10000) AS BIGINT)").as("y"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("cov", expr("CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy"))
      .withColumn("vx", expr("CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx"))
      .withColumn("vy", expr("CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy"))
      .select(col("source"), col("n").as("n_docs"),
        expr("sx * 1000000 div n").as("mean_words_micro"),
        expr("sy * 1000000 div n").as("mean_q10k_micro"),
        expr("CASE WHEN cov > 0 THEN 1 WHEN cov < 0 THEN -1 ELSE 0 END")
          .cast("long").as("r_sign"),
        expr("""CASE WHEN vx * vy = 0 THEN NULL
                ELSE CAST(floor(cov * cov / (vx * vy) * 10000) AS BIGINT) END""")
          .as("r2_bp"))

  // ---------------------------------------------------------------- q108
  def q108(spark: SparkSession, sfDir: String): DataFrame =
    corrAuditOf(Tables.table(spark, sfDir, "documents"))

  private val q108Sql =
    """WITH dd AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
      |ss AS (SELECT doc_id, source,
      |         len(ws)::BIGINT AS n_words,
      |         round(len(list_distinct(ws)) / len(ws), 4) AS ttr,
      |         round(len(list_filter(ws, w -> w in ('the', 'a', 'of', 'and', 'to', 'in'))) / len(ws), 4) AS stop_ratio
      |       FROM dd),
      |sc AS (SELECT source, n_words AS x,
      |         CAST(round(floor((0.4 * ttr + 0.3 * least(n_words / 100.0, 1.0) + 0.3 * (1.0 - stop_ratio)) * 10000) / 10000 * 10000) AS BIGINT) AS y
      |       FROM ss),
      |st AS (SELECT source, count(*) AS n,
      |              CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |              CAST(sum(x * y) AS BIGINT) AS sxy,
      |              CAST(sum(x * x) AS BIGINT) AS sxx,
      |              CAST(sum(y * y) AS BIGINT) AS syy
      |       FROM sc GROUP BY source),
      |d AS (SELECT *,
      |             CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy AS cov,
      |             CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx AS vx,
      |             CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy AS vy
      |      FROM st)
      |SELECT source, n AS n_docs,
      |       CAST(sx * 1000000 // n AS BIGINT) AS mean_words_micro,
      |       CAST(sy * 1000000 // n AS BIGINT) AS mean_q10k_micro,
      |       CAST(CASE WHEN cov > 0 THEN 1 WHEN cov < 0 THEN -1 ELSE 0 END AS BIGINT) AS r_sign,
      |       CASE WHEN vx * vy = 0 THEN NULL
      |            ELSE CAST(floor(cov * cov / (vx * vy) * 10000) AS BIGINT) END AS r2_bp
      |FROM d""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q108_corr_audit", q108, Some(q108Sql))
  )
}
