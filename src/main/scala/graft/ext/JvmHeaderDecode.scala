package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JVM header-decode census (q135) — puts [[Multimodal.HeaderCodec]]'s
  * partition-batched byte parser itself under the DuckDB oracle: the
  * fixture synthesizes payloads with planted dimensions (q124's real
  * PNG/WAVE/JPEG containers), the Spark side decodes them with the
  * ACTUAL JVM codec in `mapPartitions` (including the stateful JPEG SOF
  * scan behind hash-varied APP0 segments — the part no column
  * expression can mirror), and the oracle computes what a CORRECT
  * parser must recover from the synthesis alone: every containerized
  * payload parses, every parse matches its planted value. A codec bug
  * (wrong endianness, off-by-one segment walk) shows up as n_match <
  * n_payloads — a hash mismatch, not a silent pass. Complements q124:
  * there the COLUMN path is oracled and jpeg is honestly NULL; here the
  * JVM path is oracled and jpeg must parse.
  *
  * Scale shape: synthesis is in-row hex arithmetic; the decode is one
  * partition-batched iterator pass touching only header bytes; the only
  * exchange is the ≤4-row format census. No joins — planted values ride
  * the row into the decoder.
  */
object JvmHeaderDecode {

  /** (format, n_payloads, n_parsed, n_match) where format is the
    * PLANTED container and match = JVM parse == planted dims. */
  def jvmDecodeCensusOf(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media"), col("planted_d1"), col("planted_d2"))
      .as[(Array[Byte], Option[Long], Option[Long])]
      .mapPartitions { it =>
        // one iterator pass per partition — the decodeAll batch shape
        it.map { case (bytes, d1, d2) =>
          Multimodal.HeaderCodec.decode(bytes) match {
            case Some((p1, p2, fmt)) =>
              (fmt, 1L, if (d1.contains(p1.toLong) && d2.contains(p2.toLong)) 1L else 0L)
            case None => ("raw", 0L, 0L)
          }
        }
      }
      .toDF("format", "parsed", "matched")
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n_payloads"), sum(col("parsed")).as("n_parsed"),
        sum(col("matched")).as("n_match"))
  }

  // ---------------------------------------------------------------- q135
  def q135(spark: SparkSession, sfDir: String): DataFrame =
    jvmDecodeCensusOf(HeaderDims.fixtureDimMedia(
      Tables.table(spark, sfDir, "documents")))

  /** The oracle derives the REQUIRED census from the synthesis buckets:
    * a correct parser parses and matches every png/wav/jpeg payload and
    * rejects every raw one. (Bucket arithmetic mirrors
    * [[HeaderDims.fixtureDimMedia]]: md5 'dim|' bucket % 4.) */
  private val q135Sql = {
    def hv(off: Int) = TextOps.hexVal("h1", off, duck = true)
    s"""WITH hsh AS (SELECT md5('dim|' || doc_id) AS h1 FROM documents),
       |b AS (SELECT CAST(${hv(1)} % 4 AS INT) AS bucket FROM hsh),
       |g AS (SELECT CASE bucket WHEN 0 THEN 'png' WHEN 1 THEN 'wav'
       |               WHEN 2 THEN 'jpeg' ELSE 'raw' END AS format,
       |             count(*) AS n_payloads
       |      FROM b GROUP BY 1)
       |SELECT format, n_payloads,
       |       CAST(CASE WHEN format = 'raw' THEN 0 ELSE n_payloads END AS BIGINT) AS n_parsed,
       |       CAST(CASE WHEN format = 'raw' THEN 0 ELSE n_payloads END AS BIGINT) AS n_match
       |FROM g""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q135_jvm_header_decode", q135, Some(q135Sql))
  )
}
