package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q174 — escalating decode: the two header-parse paths COMPOSED the way
  * a 100 TB media pipeline actually runs them. The column-expression walk
  * (q124 — codegen'd, 32 header bytes per payload, zero JVM calls)
  * handles the bulk; ONLY the residue it cannot reach — jpegs whose SOF
  * sits beyond the slice behind an oversized APPn — escalates to the
  * stateful JVM scan ([[Multimodal.HeaderCodec]], q135's mapPartitions
  * path). At scale that order is the whole economics: the cheap parse
  * filters ~everything map-side inside whole-stage codegen, and the
  * per-row JVM codec (iterator state, no codegen) runs on the few
  * percent that genuinely need it — never on the corpus.
  *
  * Fixture: q124's synthesis with the jpeg APP0 filler widened to
  * `hash % 48` bytes (q124 keeps ≤ 15 so its column path stays total) —
  * SOF lands at byte 7+fill, the walk needs SOF+8 ≤ 32, so fillers > 17
  * are column-unreachable BY CONSTRUCTION and the escalation split is
  * deterministic from the synthesis hash. The oracle recomputes that
  * split arithmetically: n_col = fill ≤ 17 jpegs (+ all png/wav), n_jvm
  * = the rest, n_match = every containerized payload — a wrong walk
  * bound, a codec bug, or an escalation that re-decodes column-parsed
  * rows all surface as hash mismatches.
  *
  * Scale shape: one corpus pass; the column parse is map-side codegen;
  * the escalation filter (`format = 'jpeg' AND sofp IS NULL`) bounds the
  * mapPartitions input to the residue rows only (spec-pinned: the JVM
  * codec sees exactly n_jvm rows); ≤4-row format rollup. */
object DecodeEscalation {

  /** q124's fixture with the wide jpeg filler — see object doc. */
  private[graft] def fixtureWideMedia(docs: DataFrame): DataFrame = {
    def hv(off: Int) = TextOps.hexVal("h1", off, duck = false)
    HeaderDims.fixtureDimMediaWith(docs, s"CAST(${hv(25)} % 48 AS INT)")
  }

  /** (format, n_payloads, n_col, n_jvm, n_match): n_col = parsed by the
    * column walk, n_jvm = parsed by the escalated JVM scan, n_match =
    * parses equal to the planted dimensions (either path). */
  def escalatingDecodeOf(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val parsed = Tables.swapPersist("q174_parsed",
      HeaderDims.parsedDims(media))
    // the residue: claimed-jpeg rows the slice couldn't resolve. Binary
    // payload rides the row into the iterator codec; everything else
    // never leaves the codegen'd column path.
    val escalated = parsed
      .filter(col("format") === "jpeg" && col("parsed_d1").isNull)
      .select(col("media"), col("planted_d1"), col("planted_d2"))
      .as[(Array[Byte], Option[Long], Option[Long])]
      .mapPartitions { it =>
        it.map { case (bytes, d1, d2) =>
          Multimodal.HeaderCodec.decode(bytes) match {
            case Some((p1, p2, _)) =>
              (1L, if (d1.contains(p1.toLong) && d2.contains(p2.toLong)) 1L else 0L)
            case None => (0L, 0L)
          }
        }
      }.toDF("jvm_parsed", "jvm_match")
      .agg(coalesce(sum(col("jvm_parsed")), lit(0L)).as("n_jvm_parsed"),
        coalesce(sum(col("jvm_match")), lit(0L)).as("n_jvm_match"))
    val colSide = parsed.groupBy(col("format"))
      .agg(count(lit(1)).as("n_payloads"),
        count(col("parsed_d1")).as("n_col"),
        count(expr("CASE WHEN parsed_d1 = planted_d1 AND parsed_d2 = planted_d2 THEN 1 END")).as("n_col_match"))
    colSide.crossJoin(broadcast(escalated))
      .select(col("format"), col("n_payloads"), col("n_col"),
        when(col("format") === "jpeg", col("n_jvm_parsed")).otherwise(0L).as("n_jvm"),
        (col("n_col_match") +
          when(col("format") === "jpeg", col("n_jvm_match")).otherwise(0L)).as("n_match"))
  }

  // ---------------------------------------------------------------- q174
  def q174(spark: SparkSession, sfDir: String): DataFrame =
    escalatingDecodeOf(fixtureWideMedia(Tables.table(spark, sfDir, "documents")))

  /** The oracle derives both the split and the match totals from the
    * synthesis arithmetic alone: the column walk reaches SOF iff
    * 7 + fill + 8 ≤ 32 (fill ≤ 17); a correct escalation parses and
    * matches everything containerized. */
  private val q174Sql = {
    def hv(off: Int) = TextOps.hexVal("h1", off, duck = true)
    s"""WITH hsh AS (SELECT md5('dim|' || doc_id) AS h1 FROM documents),
       |b AS (SELECT CAST(${hv(1)} % 4 AS INT) AS bucket,
       |             CAST(${hv(25)} % 48 AS INT) AS fill
       |      FROM hsh),
       |g AS (SELECT CASE bucket WHEN 0 THEN 'png' WHEN 1 THEN 'wav'
       |               WHEN 2 THEN 'jpeg' ELSE 'raw' END AS format,
       |             CASE WHEN bucket = 2 AND fill > 17 THEN 1 ELSE 0 END AS esc
       |      FROM b)
       |SELECT format, CAST(count(*) AS BIGINT) AS n_payloads,
       |       CAST(CASE WHEN format = 'raw' THEN 0
       |                 ELSE count(*) - sum(esc) END AS BIGINT) AS n_col,
       |       CAST(sum(esc) AS BIGINT) AS n_jvm,
       |       CAST(CASE WHEN format = 'raw' THEN 0 ELSE count(*) END AS BIGINT) AS n_match
       |FROM g GROUP BY format""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q174_escalating_decode", q174, Some(q174Sql)))
}
