package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` + typed metadata,
  * with decode / feature-extraction running partition-batched (the Scala
  * analog of `mapInPandas` — one buffer reuse per partition, not per row).
  *
  * Dimension decode is REAL for containerized payloads:
  * [[HeaderCodec.decode]] parses PNG IHDR (big-endian fixed offsets),
  * RIFF/WAVE fmt chunks (little-endian fixed offsets) and JPEG SOF
  * markers (a genuine stateful segment scan — SOF sits behind
  * variable-length APPn segments, so no fixed offset exists) from the
  * actual bytes; [[HeaderDims]] (q124) runs the PNG/WAV parse as pure
  * column expressions with a DuckDB mirror. [[StubCodec.decode]] remains
  * ONLY for uncontainerized payloads (no header to parse, and no
  * image/audio pixel libraries exist in this environment to decode body
  * content) — it derives deterministic fake dimensions so the
  * partition-batched plumbing stays end-to-end testable on raw fixtures.
  */
object Multimodal {

  /** REAL header parser — no stub: reads dimensions out of actual
    * container bytes. Returns (d1, d2, format) where (d1, d2) =
    * (width, height) for images and (sample_rate, channels) for audio —
    * the typed-metadata convention [[DecodedMedia]] carries. None when
    * the payload matches no known container (caller falls back to
    * [[StubCodec]]). Malformed headers (truncated, lying segment
    * lengths) return None rather than throwing — ingest triage must
    * never die on a corrupt payload. */
  object HeaderCodec {
    private def be(b: Array[Byte], off: Int, n: Int): Long =
      (0 until n).foldLeft(0L)((acc, k) => (acc << 8) | (b(off + k) & 0xffL))
    private def le(b: Array[Byte], off: Int, n: Int): Long =
      (n - 1 to 0 by -1).foldLeft(0L)((acc, k) => (acc << 8) | (b(off + k) & 0xffL))
    private def ascii(b: Array[Byte], off: Int, s: String): Boolean =
      b.length >= off + s.length && s.indices.forall(i => b(off + i) == s.charAt(i).toByte)

    private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    def decode(bytes: Array[Byte]): Option[(Int, Int, String)] = {
      if (bytes.length >= 24 && bytes.take(8).sameElements(PngSig) && ascii(bytes, 12, "IHDR"))
        Some((be(bytes, 16, 4).toInt, be(bytes, 20, 4).toInt, "png"))
      else if (bytes.length >= 28 && ascii(bytes, 0, "RIFF") && ascii(bytes, 8, "WAVE") &&
               ascii(bytes, 12, "fmt "))
        Some((le(bytes, 24, 4).toInt, le(bytes, 22, 2).toInt, "wav"))
      else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
        decodeJpeg(bytes)
      else None
    }

    /** JPEG SOF scan: walk the marker-segment chain (each segment's
      * 2-byte big-endian length covers itself) until a SOF0/1/2 frame
      * header; dimensions sit at fixed offsets WITHIN that segment but
      * the segment itself floats behind variable-length APPn/COM
      * segments. This is the stateful parse a fixed-offset expression
      * cannot express — the reason q124's column path reports NULL for
      * jpeg and this JVM path exists. */
    private def decodeJpeg(b: Array[Byte]): Option[(Int, Int, String)] = {
      var i = 2
      while (i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) return None // lost sync: corrupt stream
        val marker = b(i + 1) & 0xff
        if (marker == 0xff) { i += 1 } // fill bytes before a marker are legal
        else if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
          if (i + 8 >= b.length) return None
          return Some((be(b, i + 7, 2).toInt, be(b, i + 5, 2).toInt, "jpeg"))
        } else if (marker == 0xd9) {
          // EOI: end of image — bytes past it are not frame data, so a
          // stray FF C0 in trailing garbage must not yield dimensions
          return None
        } else if (marker == 0xd8 || marker == 0x01 ||
                   (marker >= 0xd0 && marker <= 0xd7)) {
          i += 2 // standalone markers (SOI, TEM, RSTn) carry no length word
        }
        else {
          val segLen = be(b, i + 2, 2).toInt
          if (segLen < 2) return None
          i += 2 + segLen
        }
      }
      None
    }
  }

  /** A media record as a training pipeline would carry it: raw bytes +
    * sidecar metadata. */
  final case class MediaRecord(doc_id: Long, media: Array[Byte], source: String)
  final case class DecodedMedia(
      doc_id: Long, source: String, byte_len: Long, content_hash: String,
      width: Int, height: Int, format: String)

  /** STUB codec — deterministic fake decode for payloads with NO
    * container header (raw text/bytes fixtures): header parsing is real
    * ([[HeaderCodec]]); only pixel/sample-level decode of headerless
    * content would need the image/audio libraries this environment lacks.
    * Derives stable pseudo-dimensions so tests/oracles stay exact. */
  object StubCodec {
    def decode(bytes: Array[Byte]): (Int, Int, String) = {
      // Long arithmetic: n * 104729 overflows Int beyond ~20 KB payloads,
      // and the oracle-checked mediaMeta path computes in Long
      val n = bytes.length
      val width = (n.toLong * 7919 % 1024).toInt
      val height = (n.toLong * 104729 % 768).toInt
      val format = (n % 3) match {
        case 0 => "jpeg"; case 1 => "png"; case 2 => "webp"
      }
      (width, height, format)
    }
  }

  /** documents → media records (text bytes stand in for image payloads). */
  def mediaRecords(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"), col("source"))
      .as[MediaRecord]
  }

  /** Partition-batched decode: one iterator pass per partition (buffer reuse
    * / model-load amortization happens here in a real codec), no per-row
    * driver round-trips, no shuffle. */
  def decodeAll(records: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition setup would open the codec once here
      it.map { r =>
        // real header parse first; the stub only covers headerless payloads
        val (w, h, fmt) = HeaderCodec.decode(r.media).getOrElse(StubCodec.decode(r.media))
        val hash = java.security.MessageDigest.getInstance("SHA-256")
          .digest(r.media).map("%02x".format(_)).mkString
        DecodedMedia(r.doc_id, r.source, r.media.length.toLong, hash, w, h, fmt)
      }
    }
  }

  // ---------------------------------------------------------------- q22
  /** Oracle-checkable metadata path: the same fake-decode arithmetic as pure
    * column expressions (codegen'd; the mapPartitions path above is the
    * custom-codec variant, covered by MultimodalSpec equivalence tests). */
  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame =
    Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), encode(col("text"), "UTF-8").as("media"),
        sha2(col("text"), 256).as("content_hash"))
      .withColumn("byte_len", length(col("media")).cast("long"))
      .withColumn("width", (col("byte_len") * 7919) % 1024)
      .withColumn("height", (col("byte_len") * 104729) % 768)
      .withColumn("format",
        when(col("byte_len") % 3 === 0, "jpeg")
          .when(col("byte_len") % 3 === 1, "png")
          .otherwise("webp"))
      .groupBy(col("source"), col("format"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("byte_len")).as("total_bytes"),
        round(avg(col("width")), 4).as("avg_width"),
        round(avg(col("height")), 4).as("avg_height"),
        min(col("content_hash")).as("min_hash"))

  private val q22Sql =
    """WITH m AS (SELECT doc_id, source, sha256(text) AS content_hash,
      |                  octet_length(encode(text)) AS byte_len
      |           FROM documents),
      |d AS (SELECT *, (byte_len * 7919) % 1024 AS width,
      |              (byte_len * 104729) % 768 AS height,
      |              CASE WHEN byte_len % 3 = 0 THEN 'jpeg'
      |                   WHEN byte_len % 3 = 1 THEN 'png'
      |                   ELSE 'webp' END AS format
      |      FROM m)
      |SELECT source, format, count(*) AS n_media, CAST(sum(byte_len) AS BIGINT) AS total_bytes,
      |       round(avg(width), 4) AS avg_width, round(avg(height), 4) AS avg_height,
      |       min(content_hash) AS min_hash
      |FROM d GROUP BY source, format""".stripMargin

  // ---------------------------------------------------------------- q30
  final case class FrameSample(doc_id: Long, frame_idx: Long, frame_len: Long, frame_hash: String)

  /** Frame sampling — the video-style access pattern: take `nFrames` evenly
    * strided slices of each media payload and fingerprint them. Runs
    * partition-batched like [[decodeAll]] (a real video codec seeks within
    * one open handle per partition; per-row open/close is the anti-shape).
    * Frame i covers bytes [i·stride, i·stride + stride) with
    * stride = max(1, len/nFrames); a short tail frame is clipped, frames
    * starting past the payload are not emitted. The stub "decode" is the
    * slice + MD5 itself — deterministic, so the whole batch shape is
    * oracle-checkable (q30), unlike the opaque-codec q22 path. */
  def frameSample(records: Dataset[MediaRecord], nFrames: Int = 4): Dataset[FrameSample] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition setup: one digest instance (a real codec opens here)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { r =>
        val len = r.media.length
        val stride = math.max(1, len / nFrames)
        (0 until nFrames).iterator
          .takeWhile(i => i.toLong * stride < len)
          .map { i =>
            val start = i * stride
            val fl = math.min(stride, len - start)
            md.reset()
            val hash = md.digest(java.util.Arrays.copyOfRange(r.media, start, start + fl))
              .map("%02x".format(_)).mkString
            FrameSample(r.doc_id, i.toLong, fl.toLong, hash)
          }
      }
    }
  }

  def q30(spark: SparkSession, sfDir: String): DataFrame =
    frameSample(mediaRecords(spark, sfDir)).toDF()

  // fixture text is pure ASCII at every SF (verified octet_length(encode(x))
  // == length(x)), so character substr is byte slicing and DuckDB's
  // md5(varchar) hashes the same bytes the Scala side digests
  private val q30Sql =
    """WITH f AS (SELECT doc_id, text, length(text) AS len,
      |                  greatest(1, length(text) // 4) AS stride
      |           FROM documents),
      |i AS (SELECT doc_id, text, len, stride, gs.i AS frame_idx
      |      FROM f CROSS JOIN (SELECT unnest(range(0, 4)) AS i) gs
      |      WHERE gs.i * stride < len)
      |SELECT doc_id, frame_idx,
      |       least(stride, len - frame_idx * stride) AS frame_len,
      |       md5(substr(text, CAST(frame_idx * stride + 1 AS BIGINT), stride)) AS frame_hash
      |FROM i""".stripMargin

  // ---------------------------------------------------------------- resize
  /** Aspect-preserving bound into a `maxW`×`maxH` box, integer arithmetic
    * only (millipixel scale factor) so every engine/replica computes the
    * identical target — never upscales. The real-codec version runs inside
    * the [[decodeAll]] partition loop; the geometry is the testable part. */
  def resizeDims(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) = {
    require(maxW > 0 && maxH > 0, "target box must be positive")
    if (w <= 0 || h <= 0) (0, 0)
    else {
      val scale = math.min(1000L, math.min(maxW * 1000L / w, maxH * 1000L / h))
      (math.max(1, w * scale / 1000).toInt, math.max(1, h * scale / 1000).toInt)
    }
  }

  final case class ResizedMedia(
      doc_id: Long, width: Int, height: Int, out_w: Int, out_h: Int)

  /** Partition-batched resize over decoded media (the batch shape a real
    * image library runs in; geometry via [[resizeDims]]). */
  def resizeAll(decoded: Dataset[DecodedMedia], maxW: Int, maxH: Int): Dataset[ResizedMedia] = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions { it =>
      it.map { d =>
        val (ow, oh) = resizeDims(d.width, d.height, maxW, maxH)
        ResizedMedia(d.doc_id, d.width, d.height, ow, oh)
      }
    }
  }

  // ---------------------------------------------------------------- q34
  /** Cheap per-media feature extraction (the text-bytes stand-in for pixel
    * statistics): char-class counts via global regexp deletion — pure
    * codegen'd expressions, which IS the right Spark shape for cheap
    * features (the mapPartitions shape is for codec-bound work: decodeAll,
    * frameSample, resizeAll). Aggregated per source for the oracle. */
  def q34(spark: SparkSession, sfDir: String): DataFrame = {
    val len = length(col("text")).cast("long")
    def without(re: String) = length(regexp_replace(col("text"), re, "")).cast("long")
    Tables.table(spark, sfDir, "documents")
      .select(
        col("doc_id"), col("source"), len.as("n_chars"),
        (len - without("[aeiou]")).as("vowels"),
        (len - without("[0-9]")).as("digits"),
        (len - without(" ")).as("spaces"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("chars"),
        sum(col("vowels")).as("vowels"),
        sum(col("digits")).as("digits"),
        round(avg(col("vowels") / col("n_chars")), 6).as("vowel_ratio"),
        round(avg(col("spaces") / col("n_chars")), 6).as("space_ratio"))
  }

  private val q34Sql =
    """WITH f AS (SELECT doc_id, source, length(text) AS n_chars,
      |                  length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS vowels,
      |                  length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS digits,
      |                  length(text) - length(regexp_replace(text, ' ', '', 'g')) AS spaces
      |           FROM documents)
      |SELECT source, count(*) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS chars,
      |       CAST(sum(vowels) AS BIGINT) AS vowels,
      |       CAST(sum(digits) AS BIGINT) AS digits,
      |       round(avg(vowels / CAST(n_chars AS DOUBLE)), 6) AS vowel_ratio,
      |       round(avg(spaces / CAST(n_chars AS DOUBLE)), 6) AS space_ratio
      |FROM f GROUP BY source""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q22_multimodal_meta", mediaMeta, Some(q22Sql)),
    QueryDef("q30_frame_sample", q30, Some(q30Sql)),
    QueryDef("q34_media_features", q34, Some(q34Sql))
  )
}
