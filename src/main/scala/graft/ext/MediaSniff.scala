package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Media container sniffing (q111) — magic-byte triage for binary media
  * columns: read each payload's leading bytes, classify the actual
  * container (PNG/JPEG/RIFF signatures), and cross-tabulate against the
  * format the metadata CLAIMS. The mislabeled-media detector every
  * multimodal ingest needs before decode workers start throwing on
  * "jpeg" files that are actually PNGs — and, unlike [[Multimodal]]'s
  * declared decode stub, this path is REAL end-to-end: binary slicing,
  * hex comparison and the confusion matrix all execute on actual bytes
  * in both engines.
  *
  * Fixture binding: payloads are synthesized from `documents` text with a
  * real container signature prepended (md5-bucket of doc_id picks
  * png/jpeg/riff/raw), and the CLAIMED format matches the actual one
  * except for a deterministic ~5% mislabeling slice (md5 'lie' bucket
  * rotates the claim) — so the matrix has a known off-diagonal.
  *
  * Scale shape: pure map-side — the sniff hexes only the first 8 BYTES
  * of each payload (a 100 MB video ships 8 bytes into the comparison,
  * never its body), claims derive in-row, and the only exchange is the
  * ≤ 4×4-row confusion-matrix aggregation with map-side partials.
  */
object MediaSniff {

  private val PngHex = "89504E470D0A1A0A"
  private val JpegHex = "FFD8FF"
  private val RiffHex = "52494646"

  /** (claimed, sniffed, n_docs) confusion matrix over any frame carrying
    * (media: binary, claimed: string). */
  def sniffMatrixOf(media: DataFrame): DataFrame =
    media
      .withColumn("sig", hex(expr("substring(media, 1, 8)")))
      .withColumn("sniffed",
        when(col("sig").startsWith(PngHex), "png")
          .when(col("sig").startsWith(JpegHex), "jpeg")
          .when(col("sig").startsWith(RiffHex), "riff")
          .otherwise("raw"))
      .groupBy(col("claimed"), col("sniffed"))
      .agg(count(lit(1)).as("n_docs"))

  /** Fixture payload synthesis: text bytes behind a real signature. */
  private[graft] def fixtureMedia(docs: DataFrame): DataFrame = {
    val png = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val jpeg = Array(0xFF, 0xD8, 0xFF).map(_.toByte)
    val riff = "RIFF".getBytes("UTF-8")
    def fmtName(b: Column): Column =
      when(b === 0, "png").when(b === 1, "jpeg").when(b === 2, "riff")
        .otherwise("raw")
    docs
      .withColumn("hf", md5(concat(lit("fmt|"), col("doc_id"))))
      .withColumn("hl", md5(concat(lit("lie|"), col("doc_id"))))
      .withColumn("actual_b",
        expr(s"CAST(${TextOps.hexVal("hf", 1, duck = false)} % 4 AS INT)"))
      .withColumn("lie",
        expr(s"${TextOps.hexVal("hl", 1, duck = false)} % 20 = 0"))
      .withColumn("claimed_b",
        when(col("lie"), (col("actual_b") + 1) % 4).otherwise(col("actual_b")))
      .withColumn("prefix",
        when(col("actual_b") === 0, lit(png))
          .when(col("actual_b") === 1, lit(jpeg))
          .when(col("actual_b") === 2, lit(riff))
          .otherwise(lit(Array.empty[Byte])))
      .select(col("doc_id"),
        concat(col("prefix"), encode(col("text"), "UTF-8")).as("media"),
        fmtName(col("claimed_b")).as("claimed"))
  }

  // ---------------------------------------------------------------- q111
  def q111(spark: SparkSession, sfDir: String): DataFrame =
    sniffMatrixOf(fixtureMedia(Tables.table(spark, sfDir, "documents")))

  private val q111Sql = {
    def hv(m: String) = TextOps.hexVal(m, 1, duck = true)
    s"""WITH b AS (
       |  SELECT doc_id, text,
       |         CAST(${hv("hf")} % 4 AS INT) AS actual_b,
       |         ${hv("hl")} % 20 = 0 AS lie
       |  FROM (SELECT *, md5('fmt|' || doc_id) AS hf,
       |               md5('lie|' || doc_id) AS hl FROM documents)),
       |m AS (
       |  SELECT doc_id,
       |         (CASE actual_b
       |            WHEN 0 THEN '\\x89PNG\\x0D\\x0A\\x1A\\x0A'::BLOB
       |            WHEN 1 THEN '\\xFF\\xD8\\xFF'::BLOB
       |            WHEN 2 THEN 'RIFF'::BLOB
       |            ELSE ''::BLOB END) || encode(text) AS media,
       |         (CASE (CASE WHEN lie THEN (actual_b + 1) % 4 ELSE actual_b END)
       |            WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'riff'
       |            ELSE 'raw' END) AS claimed
       |  FROM b),
       |s AS (
       |  SELECT claimed, left(hex(media), 16) AS sig FROM m)
       |SELECT claimed,
       |       CASE WHEN sig LIKE '$PngHex%' THEN 'png'
       |            WHEN sig LIKE '$JpegHex%' THEN 'jpeg'
       |            WHEN sig LIKE '$RiffHex%' THEN 'riff'
       |            ELSE 'raw' END AS sniffed,
       |       count(*) AS n_docs
       |FROM s GROUP BY 1, 2""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q111_media_sniff", q111, Some(q111Sql))
  )
}
