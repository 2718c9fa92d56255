package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q180 — zlib inflate census: REAL decompression on the residue lane.
  * q179 proved body-byte folds; this rung proves the other economics a
  * multimodal pipeline needs — payloads whose content is NOT
  * column-decodable at all (DEFLATE bit streams) — while keeping the
  * map-side gate in front of the expensive lane:
  *
  *   - the COLUMN lane audits the zlib ENVELOPE map-side: the CMF/FLG
  *     header pair (0x78, FCHECK-valid, FDICT clear) from the first two
  *     bytes and the big-endian Adler-32 trailer from the LAST four —
  *     fixed-offset reads, no decompression, rejects non-zlib payloads
  *     before they cost anything;
  *   - ONLY envelope-valid payloads reach the JVM lane
  *     (`java.util.zip.Inflater` via mapPartitions — the input is
  *     filter-bounded, spec-pinned), which genuinely INFLATES the
  *     stream, recomputes Adler-32 over the decoded bytes, and folds
  *     the content census.
  *
  * Fixture: planted content bytes b_i = (v·13 + i·97) mod 251 (n = 20 +
  * hash%200 per doc), compressed JVM-side with `java.util.zip.Deflater`
  * in the fixture builder; a deterministic ~10% cohort gets its CMF
  * byte corrupted AFTER compression (the column gate must reject it; the
  * Inflater never sees it). The ORACLE never touches a compressed byte:
  * it recomputes the planted content and its Adler-32 arithmetically
  * (s1/s2 mod 65521 as list folds), so the hash match proves the whole
  * loop — Deflater wrote a correct stream, the column lane extracted
  * the real trailer, the Inflater round-tripped the real bit stream,
  * and the decoded census is exactly the plant.
  *
  * Scale shape: one corpus pass; envelope audit map-side (6 bytes per
  * payload: 2 header + 4 trailer); the JVM lane rides a filtered
  * mapPartitions with streaming inflation (64 KiB chunks — content
  * size never materializes per-row beyond the chunk); ONE ≤2-row final
  * rollup. */
object ZlibDecode {

  /** Deterministic corrupt-cohort selector (v1 % CorruptMod == 0). */
  val CorruptMod = 10L

  /** JVM lane: inflate + content census + Adler-32 recompute.
    * Returns (n_bytes, sum_bytes, max_byte, adler) or None when the
    * stream does not inflate cleanly. */
  object InflateCodec {
    def decode(b: Array[Byte]): Option[(Long, Long, Long, Long)] =
      try {
        val inf = new java.util.zip.Inflater()
        inf.setInput(b)
        val adler = new java.util.zip.Adler32()
        val buf = new Array[Byte](64 * 1024)
        var n = 0L
        var sum = 0L
        var mx = 0L
        while (!inf.finished()) {
          val k = inf.inflate(buf)
          if (k == 0 && !inf.finished()) { inf.end(); return None } // truncated/needs-dict
          adler.update(buf, 0, k)
          var i = 0
          while (i < k) {
            val v = buf(i) & 0xffL
            sum += v
            if (v > mx) mx = v
            i += 1
          }
          n += k
        }
        inf.end()
        Some((n, sum, mx, adler.getValue))
      } catch { case _: java.util.zip.DataFormatException => None }
  }

  // ------------------------------------------------------------- fixture

  /** (doc_id, media): zlib streams of planted arithmetic content, the
    * corrupt cohort's CMF byte flipped post-compression. */
  private[graft] def fixtureZlibMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    def hv(off: Int) = TextOps.hexVal("h", off, duck = false)
    docs
      .withColumn("h", md5(concat(lit("zlib|"), col("doc_id"))))
      .withColumn("v1", expr(hv(1))).withColumn("v2", expr(hv(9)))
      .select(col("doc_id"), col("v1"), col("v2"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        it.map { case (id, v1, v2) =>
          val n = (20 + v1 % 200).toInt
          val content = Array.tabulate(n)(i => ((v2 * 13 + i * 97L) % 251).toByte)
          val d = new java.util.zip.Deflater()
          d.setInput(content); d.finish()
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](64 * 1024)
          while (!d.finished()) out.write(buf, 0, d.deflate(buf))
          d.end()
          val media = out.toByteArray
          if (v1 % CorruptMod == 0) media(0) = 0x00 // kill the CMF byte
          (id, media)
        }
      }.toDF("doc_id", "media")
  }

  // ------------------------------------------------------------ the parse

  /** Column-lane envelope audit: zlib CMF/FLG validity map-side + the
    * claimed Adler-32 from the trailer. CMF 0x78 = deflate/32K window
    * (what Deflater writes); FLG: FDICT clear and (CMF·256+FLG) ≡ 0
    * mod 31 (the FCHECK contract). */
  private[graft] def enveloped(media: DataFrame): DataFrame = {
    def hxb(o: Int) = HeaderDims.beVal("hh", o, 1, duck = false)
    media
      .withColumn("hh", lower(hex(expr("substring(media, 1, 2)"))))
      .withColumn("env_ok", expr(
        s"length(media) >= 7 AND ${hxb(1)} = 120 AND (${hxb(2)} div 32) % 2 = 0 " +
          s"AND (${hxb(1)} * 256 + ${hxb(2)}) % 31 = 0"))
      .withColumn("adler_claimed", expr(
        "CASE WHEN env_ok THEN " +
          s"${HeaderDims.beVal("lower(hex(substring(media, length(media) - 3, 4)))", "1", 4, duck = false)} END"))
  }

  /** The composed census — ONE row: (n_payloads, n_env_ok, n_inflated,
    * n_adler_ok, total_bytes, sum_bytes, max_byte, adler_sum). */
  def zlibCensusOf(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val env = Tables.swapPersist("q180_env", enveloped(media))
    // the JVM lane input is the envelope-valid residue ONLY — the gate
    // pays 6 byte-reads to keep garbage away from the Inflater
    val inflated = env.filter(col("env_ok"))
      .select(col("media"), col("adler_claimed")).as[(Array[Byte], Long)]
      .mapPartitions { it =>
        it.map { case (bytes, claimed) =>
          InflateCodec.decode(bytes) match {
            case Some((n, s, m, adler)) =>
              (1L, if (adler == claimed) 1L else 0L, n, s, m)
            case None => (0L, 0L, 0L, 0L, 0L)
          }
        }
      }.toDF("ok", "adler_ok", "n", "s", "m")
      .agg(coalesce(sum(col("ok")), lit(0L)).as("n_inflated"),
        coalesce(sum(col("adler_ok")), lit(0L)).as("n_adler_ok"),
        coalesce(sum(col("n")), lit(0L)).as("total_bytes"),
        coalesce(sum(col("s")), lit(0L)).as("sum_bytes"),
        coalesce(max(col("m")), lit(0L)).as("max_byte"))
    val colSide = env.agg(
      count(lit(1)).as("n_payloads"),
      coalesce(sum(col("env_ok").cast("long")), lit(0L)).as("n_env_ok"),
      coalesce(sum(col("adler_claimed")), lit(0L)).as("adler_sum"))
    colSide.crossJoin(broadcast(inflated))
      .select(col("n_payloads"), col("n_env_ok"), col("n_inflated"),
        col("n_adler_ok"), col("total_bytes"), col("sum_bytes"),
        col("max_byte"), col("adler_sum"))
  }

  // ---------------------------------------------------------------- q180
  def q180(spark: SparkSession, sfDir: String): DataFrame =
    zlibCensusOf(fixtureZlibMedia(Tables.table(spark, sfDir, "documents")))

  /** Arithmetic oracle — the planted content and its Adler-32 recomputed
    * from the hash alone (s1/s2 mod 65521 as list folds; sums are small
    * enough for one trailing mod: n ≤ 220, b < 251 → Σ(n−i)·b < 1.3e7). */
  private val q180Sql = {
    def hv(off: Int) = TextOps.hexVal("h", off, duck = true)
    s"""WITH hsh AS (SELECT md5('zlib|' || doc_id) AS h FROM documents),
       |g AS (SELECT 20 + ${hv(1)} % 200 AS n, ${hv(9)} AS v2,
       |             (${hv(1)} % $CorruptMod = 0) AS corrupt
       |      FROM hsh),
       |v AS (SELECT n, corrupt,
       |        list_transform(range(0, CAST(n AS INT)), i -> (v2 * 13 + i * 97) % 251) AS b
       |      FROM g),
       |a AS (SELECT n, corrupt,
       |        list_sum(b) AS sumb,
       |        list_max(b) AS maxb,
       |        (1 + list_sum(b)) % 65521 AS s1,
       |        (n + list_sum(list_transform(range(0, CAST(n AS INT)),
       |           i -> (n - i) * b[i + 1]))) % 65521 AS s2
       |      FROM v)
       |SELECT (SELECT CAST(count(*) AS BIGINT) FROM g) AS n_payloads,
       |       (SELECT CAST(count(*) AS BIGINT) FROM g WHERE NOT corrupt) AS n_env_ok,
       |       (SELECT CAST(count(*) AS BIGINT) FROM g WHERE NOT corrupt) AS n_inflated,
       |       (SELECT CAST(count(*) AS BIGINT) FROM g WHERE NOT corrupt) AS n_adler_ok,
       |       (SELECT CAST(COALESCE(sum(n), 0) AS BIGINT) FROM a WHERE NOT corrupt) AS total_bytes,
       |       (SELECT CAST(COALESCE(sum(sumb), 0) AS BIGINT) FROM a WHERE NOT corrupt) AS sum_bytes,
       |       (SELECT CAST(COALESCE(max(maxb), 0) AS BIGINT) FROM a WHERE NOT corrupt) AS max_byte,
       |       (SELECT CAST(COALESCE(sum(s2 * 65536 + s1), 0) AS BIGINT) FROM a WHERE NOT corrupt) AS adler_sum""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q180_zlib_census", q180, Some(q180Sql)))
}
