package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q184 — PNG IDAT pixel census: the next decode rung (r15 verdict
  * Next #5). q180 proved real inflation; PNG composes it with scanline
  * DEFILTERING (None/Sub/Up/Average/Paeth reconstruction) — the first
  * decode where the JVM lane's inflate OUTPUT feeds a second arithmetic
  * stage before anything is censused:
  *
  *   - the COLUMN lane audits signature + IHDR at FIXED offsets from
  *     the first 33 bytes (8-byte signature, IHDR length/type, width/
  *     height big-endian, bit-depth 8 / color-type 0 / no interlace) —
  *     map-side, no byte shipped beyond the slice; width/height sums
  *     come from this lane alone;
  *   - every header-valid payload escalates to the JVM codec
  *     ([[PngCodec.decode]], filter-bounded mapPartitions): a real
  *     chunk walk (each chunk's CRC-32 verified over type+data), IDAT
  *     concatenation, `Inflater` on the joined stream, then per-
  *     scanline filter reconstruction — prediction from RECONSTRUCTED
  *     neighbors, the stage a naive "inflate and sum" would get wrong —
  *     into the pixel census.
  *
  * Fixture: every doc becomes a REAL grayscale-8 PNG (w = 4 + v1%13,
  * h = 3 + v2%11) of planted pixels p(x,y) = (v3·7 + x·31 + y·131)
  * mod 256, each scanline filtered with type (v1 + y) % 5 — all five
  * PNG filters exercised deterministically — deflated, chunked with
  * real CRCs. Two corrupt cohorts: v1%10==0 flips a SIGNATURE byte
  * (the column gate must reject it; the codec never runs), v1%10==3
  * flips an IDAT CRC byte post-build (the header audit passes, the JVM
  * lane's chunk-CRC check must reject it before inflating). The ORACLE
  * recomputes the planted pixels arithmetically and never touches a
  * byte — the hash match proves the chunk walk, the CRC verify, the
  * inflate, and the five filter reconstructions recover the plant
  * exactly.
  *
  * Scale shape: one corpus pass; 33-byte map-side header audit; the
  * JVM lane rides a filtered mapPartitions bounded to header-valid
  * rows; ONE ≤2-row final rollup. */
object PngDecode {

  /** Cohort selector: v1 % 10 == 0 → signature corrupt (column lane
    * rejects); v1 % 10 == 3 → IDAT CRC corrupt (JVM lane rejects). */
  val CorruptMod = 10L

  private[graft] def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** JVM lane: chunk walk (CRC-verified) → inflate → defilter →
    * (n_pixels, sum_px, max_px); None on any structural, CRC, inflate
    * or filter violation. Grayscale-8 non-interlaced only (the fixture
    * contract; anything else is honest None). */
  object PngCodec {
    private val Sig =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    def decode(b: Array[Byte]): Option[(Long, Long, Long)] = {
      if (b.length < 8 || !b.take(8).sameElements(Sig)) return None
      def be(off: Int, n: Int): Long =
        (0 until n).map(k => (b(off + k) & 0xffL) << (8 * (n - 1 - k))).sum
      var pos = 8
      var w = -1; var h = -1
      var ihdrOk = false; var ended = false
      val idat = new java.io.ByteArrayOutputStream()
      while (!ended) {
        if (pos + 12 > b.length) return None
        val len = be(pos, 4).toInt
        if (len < 0 || pos + 12 + len > b.length) return None
        val typ = new String(b, pos + 4, 4, "US-ASCII")
        val crc = new java.util.zip.CRC32()
        crc.update(b, pos + 4, 4 + len)
        if (crc.getValue != be(pos + 8 + len, 4)) return None
        typ match {
          case "IHDR" =>
            if (len != 13) return None
            w = be(pos + 8, 4).toInt; h = be(pos + 12, 4).toInt
            if (w < 1 || h < 1) return None
            // bit depth 8, color 0 (gray), compression/filter/interlace 0
            if ((0 until 5).map(i => b(pos + 16 + i)) != Seq[Byte](8, 0, 0, 0, 0)) return None
            ihdrOk = true
          case "IDAT" => if (!ihdrOk) return None; idat.write(b, pos + 8, len)
          case "IEND" => ended = true
          case _ => () // ancillary chunk: CRC-verified above, skipped
        }
        pos += 12 + len
      }
      if (!ihdrOk) return None
      val expect = h * (w + 1)
      val out = new Array[Byte](expect)
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      try {
        var got = 0
        while (!inf.finished() && got < expect) {
          val k = inf.inflate(out, got, expect - got)
          if (k == 0 && !inf.finished()) { inf.end(); return None }
          got += k
        }
        if (!inf.finished()) { // stream longer than the geometry claims
          val probe = new Array[Byte](1)
          if (inf.inflate(probe) > 0) { inf.end(); return None }
        }
        inf.end()
        if (got != expect) return None
      } catch { case _: java.util.zip.DataFormatException => return None }
      // defilter: prediction reads RECONSTRUCTED neighbors (bpp = 1)
      val recon = Array.ofDim[Int](h, w)
      var sum = 0L; var mx = 0L
      var y = 0
      while (y < h) {
        val f = out(y * (w + 1)) & 0xff
        if (f > 4) return None
        var x = 0
        while (x < w) {
          val e = out(y * (w + 1) + 1 + x) & 0xff
          val left = if (x > 0) recon(y)(x - 1) else 0
          val up = if (y > 0) recon(y - 1)(x) else 0
          val ul = if (x > 0 && y > 0) recon(y - 1)(x - 1) else 0
          val pred = f match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case 4 => paeth(left, up, ul)
          }
          val v = (e + pred) % 256
          recon(y)(x) = v
          sum += v
          if (v > mx) mx = v
          x += 1
        }
        y += 1
      }
      Some((w.toLong * h, sum, mx))
    }
  }

  // ------------------------------------------------------------- fixture

  /** (doc_id, media): real grayscale-8 PNGs of planted pixels, the two
    * corrupt cohorts flipped post-build. */
  private[graft] def fixturePngMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    def hv(off: Int) = TextOps.hexVal("h", off, duck = false)
    docs
      .withColumn("h", md5(concat(lit("png|"), col("doc_id"))))
      .withColumn("v1", expr(hv(1))).withColumn("v2", expr(hv(9)))
      .withColumn("v3", expr(hv(17)))
      .select(col("doc_id"), col("v1"), col("v2"), col("v3"))
      .as[(Long, Long, Long, Long)]
      .mapPartitions { it =>
        it.map { case (id, v1, v2, v3) =>
          val w = (4 + v1 % 13).toInt
          val h = (3 + v2 % 11).toInt
          def px(x: Int, y: Int): Int = ((v3 * 7 + x * 31 + y * 131) % 256).toInt
          val filtered = new Array[Byte](h * (w + 1))
          for (y <- 0 until h) {
            val f = ((v1 + y) % 5).toInt
            filtered(y * (w + 1)) = f.toByte
            for (x <- 0 until w) {
              val left = if (x > 0) px(x - 1, y) else 0
              val up = if (y > 0) px(x, y - 1) else 0
              val ul = if (x > 0 && y > 0) px(x - 1, y - 1) else 0
              val pred = f match {
                case 0 => 0
                case 1 => left
                case 2 => up
                case 3 => (left + up) / 2
                case 4 => paeth(left, up, ul)
              }
              filtered(y * (w + 1) + 1 + x) = ((px(x, y) - pred + 256) % 256).toByte
            }
          }
          val d = new java.util.zip.Deflater()
          d.setInput(filtered); d.finish()
          val zout = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](64 * 1024)
          while (!d.finished()) zout.write(buf, 0, d.deflate(buf))
          d.end()
          val z = zout.toByteArray
          def be(v: Long, n: Int): Array[Byte] =
            (0 until n).map(k => ((v >> (8 * (n - 1 - k))) & 0xff).toByte).toArray
          def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
            val td = typ.getBytes("US-ASCII") ++ data
            val crc = new java.util.zip.CRC32(); crc.update(td)
            be(data.length.toLong, 4) ++ td ++ be(crc.getValue, 4)
          }
          val media =
            Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
              chunk("IHDR", be(w.toLong, 4) ++ be(h.toLong, 4) ++ Array[Byte](8, 0, 0, 0, 0)) ++
              chunk("IDAT", z) ++ chunk("IEND", Array.emptyByteArray)
          if (v1 % CorruptMod == 0) media(0) = 0x00 // kill the signature
          else if (v1 % CorruptMod == 3)
            media(8 + 25 + 8 + z.length) = (media(8 + 25 + 8 + z.length) ^ 0xff).toByte // first IDAT CRC byte
          (id, media)
        }
      }.toDF("doc_id", "media")
  }

  // ------------------------------------------------------------ the parse

  /** Column lane: signature + full IHDR audit from the first 33 bytes;
    * (hdr_ok, w, h) with w/h NULL unless the header passes. */
  private[graft] def headerAudit(media: DataFrame): DataFrame = {
    def be(off: Int, n: Int) = HeaderDims.beVal("hx", off, n, duck = false)
    media
      .withColumn("hx", lower(hex(expr("substring(media, 1, 33)"))))
      .withColumn("hdr_ok", expr(
        "length(media) >= 45 AND substr(hx, 1, 16) = '89504e470d0a1a0a' " +
          s"AND ${be(9, 4)} = 13 AND substr(hx, 25, 8) = '49484452' " +
          "AND substr(hx, 49, 10) = '0800000000' " +
          s"AND ${be(17, 4)} >= 1 AND ${be(21, 4)} >= 1"))
      .withColumn("w", expr(s"CASE WHEN hdr_ok THEN ${be(17, 4)} END"))
      .withColumn("hgt", expr(s"CASE WHEN hdr_ok THEN ${be(21, 4)} END"))
  }

  /** The composed census — ONE row: (n_payloads, n_hdr_ok, n_decoded,
    * w_sum, h_sum, n_pixels, sum_px, max_px). */
  def pngCensusOf(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val env = Tables.swapPersist("q184_env", headerAudit(media))
    // the JVM lane input is the header-valid residue ONLY
    val decoded = env.filter(col("hdr_ok"))
      .select(col("media")).as[Array[Byte]]
      .mapPartitions { it =>
        it.map { bytes =>
          PngCodec.decode(bytes) match {
            case Some((n, s, m)) => (1L, n, s, m)
            case None => (0L, 0L, 0L, 0L)
          }
        }
      }.toDF("ok", "n", "s", "m")
      .agg(coalesce(sum(col("ok")), lit(0L)).as("n_decoded"),
        coalesce(sum(when(col("ok") === 1, col("n"))), lit(0L)).as("n_pixels"),
        coalesce(sum(when(col("ok") === 1, col("s"))), lit(0L)).as("sum_px"),
        coalesce(max(when(col("ok") === 1, col("m"))), lit(0L)).as("max_px"))
    val colSide = env.agg(
      count(lit(1)).as("n_payloads"),
      coalesce(sum(col("hdr_ok").cast("long")), lit(0L)).as("n_hdr_ok"),
      coalesce(sum(col("w")), lit(0L)).as("w_sum"),
      coalesce(sum(col("hgt")), lit(0L)).as("h_sum"))
    colSide.crossJoin(broadcast(decoded))
      .select(col("n_payloads"), col("n_hdr_ok"), col("n_decoded"),
        col("w_sum"), col("h_sum"), col("n_pixels"), col("sum_px"), col("max_px"))
  }

  // ------------------------------------------- streaming ingestion gate

  /** Headroom multiplier over the static corpus's worst observed
    * claimed-raw/wire-bytes ratio. */
  val BombHeadroom = 4L

  /** Streaming DECOMPRESSION-BOMB gate — the ingestion guard the decode
    * ladder needs in front of it: a payload whose header CLAIMS a raw
    * size absurdly larger than its actual wire bytes is exactly the
    * attack (or corruption) that kills a decode farm — the Inflater
    * would faithfully expand it. The header audit alone cannot see it
    * (a lying IHDR passes; the CRC is a JVM-lane check by design), so
    * the gate compares header-claimed raw bytes (h·(w+1) for
    * grayscale-8) against the payload's on-wire LENGTH, map-side, and
    * rejects when the ratio exceeds the STATIC corpus's worst observed
    * ratio × [[BombHeadroom]] — the `*GateStreamStatic` freeze shape:
    * the cap is a ≤1-row census collected once at build and shipped as
    * a literal; a micro-batch pays zero joins, zero shuffles, zero
    * state (spec pins stateOperators empty). Integer centi-ratios only.
    *
    * Output: (doc_id, w, hgt, claimed_raw, keep, reason) — reason ∈
    * {ok, unparsed, bomb}. */
  def pngGateStreamStatic(streamMedia: DataFrame, staticMedia: DataFrame): DataFrame = {
    // frozen cap: worst claimed_raw*100 div len over the parsed static
    // corpus (centi-ratio — INTEGER div: Column./ is double division)
    val capRow = Tables.swapPersist("png_gate_env", headerAudit(staticMedia))
      .filter(col("hdr_ok"))
      .select(expr("hgt * (w + 1) * 100 div length(media)").as("cr"))
      .agg(coalesce(max(col("cr")), lit(0L)))
      .head().getLong(0)
    val cap = capRow * BombHeadroom
    headerAudit(streamMedia)
      .withColumn("claimed_raw",
        expr("CASE WHEN hdr_ok THEN hgt * (w + 1) END"))
      .withColumn("reason",
        when(!col("hdr_ok"), "unparsed")
          .when(col("claimed_raw") * 100 > length(col("media")) * cap, "bomb")
          .otherwise("ok"))
      .withColumn("keep", (col("reason") === "ok").cast("int"))
      .select(col("doc_id"), col("w"), col("hgt"), col("claimed_raw"),
        col("keep"), col("reason"))
  }

  // ---------------------------------------------------------------- q184
  def q184(spark: SparkSession, sfDir: String): DataFrame =
    pngCensusOf(fixturePngMedia(Tables.table(spark, sfDir, "documents")))

  /** Arithmetic oracle — the planted pixels recomputed from the hash
    * alone, never a byte: the decoded cohort excludes both corrupt
    * cohorts; widths/heights additionally cover the CRC-corrupt cohort
    * (its header is intact). */
  private val q184Sql = {
    def hv(off: Int) = TextOps.hexVal("h", off, duck = true)
    s"""WITH hsh AS (SELECT md5('png|' || doc_id) AS h FROM documents),
       |g AS (SELECT 4 + ${hv(1)} % 13 AS w, 3 + ${hv(9)} % 11 AS hh, ${hv(17)} AS v3,
       |             (${hv(1)} % $CorruptMod = 0) AS sig_bad,
       |             (${hv(1)} % $CorruptMod = 3) AS crc_bad
       |      FROM hsh),
       |p AS (SELECT w, hh,
       |        list_transform(range(0, CAST(w * hh AS INT)),
       |          i -> (v3 * 7 + (i % w) * 31 + (i // w) * 131) % 256) AS px
       |      FROM g WHERE NOT sig_bad AND NOT crc_bad)
       |SELECT (SELECT CAST(count(*) AS BIGINT) FROM g) AS n_payloads,
       |       (SELECT CAST(count(*) AS BIGINT) FROM g WHERE NOT sig_bad) AS n_hdr_ok,
       |       (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_decoded,
       |       (SELECT CAST(COALESCE(sum(w), 0) AS BIGINT) FROM g WHERE NOT sig_bad) AS w_sum,
       |       (SELECT CAST(COALESCE(sum(hh), 0) AS BIGINT) FROM g WHERE NOT sig_bad) AS h_sum,
       |       (SELECT CAST(COALESCE(sum(w * hh), 0) AS BIGINT) FROM p) AS n_pixels,
       |       (SELECT CAST(COALESCE(sum(list_sum(px)), 0) AS BIGINT) FROM p) AS sum_px,
       |       (SELECT CAST(COALESCE(max(list_max(px)), 0) AS BIGINT) FROM p) AS max_px""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q184_png_census", q184, Some(q184Sql)))
}
