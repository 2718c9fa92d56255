package graft

import graft.ext.{HeaderDims, Multimodal}
import org.apache.spark.sql.functions._

/** Real header-parse dimensions (q124) + the JVM HeaderCodec. */
class HeaderDimsSpec extends SparkSpec {

  import spark.implicits._

  /** A real minimal JPEG prefix: SOI, APP0 of the given filler length,
    * then SOF0 carrying (w, h) — what the fixture synthesizes. */
  private def jpegBytes(w: Int, h: Int, filler: Int): Array[Byte] = {
    val app0 = Array[Byte](0xff.toByte, 0xe0.toByte,
      ((filler + 2) >> 8).toByte, ((filler + 2) & 0xff).toByte) ++
      Array.fill(filler)('j'.toByte)
    val sof = Array[Byte](0xff.toByte, 0xc0.toByte, 0x00, 0x11, 0x08,
      (h >> 8).toByte, (h & 0xff).toByte, (w >> 8).toByte, (w & 0xff).toByte,
      0x03, 0x01, 0x11, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)
    Array[Byte](0xff.toByte, 0xd8.toByte) ++ app0 ++ sof ++ "body".getBytes
  }

  test("HeaderCodec parses PNG IHDR, WAVE fmt and JPEG SOF from real bytes") {
    // PNG: sig + IHDR with w=640 h=480 big-endian
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x02, 0x80.toByte, 0, 0, 0x01, 0xe0.toByte, 8, 2, 0, 0, 0)
    assert(Multimodal.HeaderCodec.decode(png).contains((640, 480, "png")))
    // WAVE: RIFF header, 2 channels, 44100 Hz little-endian
    val wav = "RIFF".getBytes ++ Array[Byte](36, 0, 0, 0) ++ "WAVEfmt ".getBytes ++
      Array[Byte](16, 0, 0, 0, 1, 0, 2, 0,
        0x44, 0xac.toByte, 0, 0, 0x10, 0xb1.toByte, 2, 0, 4, 0, 16, 0) ++
      "data".getBytes ++ Array[Byte](0, 0, 0, 0)
    assert(Multimodal.HeaderCodec.decode(wav).contains((44100, 2, "wav")))
    // JPEG: SOF behind APP0 segments of DIFFERENT lengths — fixed offsets
    // cannot work; the scan must walk the chain
    assert(Multimodal.HeaderCodec.decode(jpegBytes(1024, 768, 0)).contains((1024, 768, "jpeg")))
    assert(Multimodal.HeaderCodec.decode(jpegBytes(320, 200, 13)).contains((320, 200, "jpeg")))
    // corrupt payloads: None, never a throw
    assert(Multimodal.HeaderCodec.decode("just text".getBytes).isEmpty)
    assert(Multimodal.HeaderCodec.decode(Array[Byte](0xff.toByte, 0xd8.toByte, 0x00)).isEmpty)
    assert(Multimodal.HeaderCodec.decode(png.take(20)).isEmpty) // truncated IHDR
    val lyingLen = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte, 0x00, 0x01)
    assert(Multimodal.HeaderCodec.decode(lyingLen).isEmpty) // segLen < 2
  }

  test("q124 fixture round-trip: JVM codec recovers every planted dimension") {
    val docs = graft.oracle.Tables.table(spark, sf0001, "documents")
    val rows = HeaderDims.fixtureDimMedia(docs)
      .select(col("media"), col("planted_d1"), col("planted_d2"))
      .as[(Array[Byte], Option[Long], Option[Long])].collect()
    assert(rows.nonEmpty)
    var containerized = 0
    rows.foreach { case (media, d1, d2) =>
      Multimodal.HeaderCodec.decode(media) match {
        case Some((p1, p2, fmt)) =>
          containerized += 1
          assert(d1.contains(p1.toLong) && d2.contains(p2.toLong),
            s"$fmt parsed ($p1,$p2) vs planted ($d1,$d2)")
        case None =>
          assert(d1.isEmpty, "containerized payload failed to parse")
      }
    }
    // buckets are ~uniform quarters: the three containers must all appear
    assert(containerized > rows.length / 2)
  }

  test("q124 aggregate: png+wav+jpeg fully parsed and matched, raw honestly NULL") {
    val m = HeaderDims.q124(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m.keySet == Set("png", "wav", "jpeg", "raw"))
    // jpeg included since the SOF walk (r14): the fixture's hash-varied
    // APP0 keeps SOF inside the slice, so the column path must parse it
    Seq("png", "wav", "jpeg").foreach { f =>
      val r = m(f)
      assert(r.getLong(1) == r.getLong(2), s"$f: every payload parses")
      assert(r.getLong(2) == r.getLong(3), s"$f: every parse matches its planted value")
    }
    assert(m("raw").getLong(2) == 0, "raw: headerless payloads must report NULL")
    // parsed ranges live inside the planted domains
    val png = m("png")
    assert(png.getLong(4) >= 16 && png.getLong(5) <= 16 + 2031)
    val wav = m("wav")
    assert(wav.getLong(7) >= 1 && wav.getLong(8) <= 2) // channels
  }

  test("column SOF walk == JVM codec on in-slice jpegs; out-of-slice honestly NULL") {
    // two-segment chain: SOI, APP0(filler), COM(5), SOF — the walk must
    // chase TWO length fields (a fixed offset or 1-probe walk fails)
    def jpeg2seg(w: Int, h: Int, filler: Int): Array[Byte] = {
      val soi = Array[Byte](0xff.toByte, 0xd8.toByte)
      val app0 = Array[Byte](0xff.toByte, 0xe0.toByte,
        ((filler + 2) >> 8).toByte, ((filler + 2) & 0xff).toByte) ++
        Array.fill(filler)('j'.toByte)
      val com = Array[Byte](0xff.toByte, 0xfe.toByte, 0, 7) ++ "hello".getBytes
      val sof = Array[Byte](0xff.toByte, 0xc0.toByte, 0x00, 0x11, 0x08,
        (h >> 8).toByte, (h & 0xff).toByte, (w >> 8).toByte, (w & 0xff).toByte, 0x03)
      soi ++ app0 ++ com ++ sof
    }
    val cases = Seq(
      (1L, jpegBytes(1024, 768, 0)),   // SOF right after a 0-filler APP0
      (2L, jpegBytes(320, 200, 13)),   // max-ish fixture filler
      (3L, jpeg2seg(640, 480, 4)),     // two skips before SOF
      (4L, jpegBytes(800, 600, 100)))  // APP0 pushes SOF past the slice
    val jvm = cases.map { case (id, b) =>
      id -> Multimodal.HeaderCodec.decode(b).map { case (a, b2, _) => (a.toLong, b2.toLong) } }.toMap
    // JVM scan is unbounded: it parses ALL four
    assert(jvm(3L).contains((640L, 480L)) && jvm(4L).contains((800L, 600L)))
    val colPath = HeaderDims.headerDimsOf(
        cases.toDF("doc_id", "media")
          .withColumn("planted_d1", lit(null).cast("long"))
          .withColumn("planted_d2", lit(null).cast("long"))).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(colPath.keySet == Set("jpeg"))
    // 3 of 4 inside the slice parse and agree with the JVM codec; the
    // out-of-slice one is NULL (n_parsed == 3), never garbage
    val r = colPath("jpeg")
    assert(r.getLong(1) == 4 && r.getLong(2) == 3, s"n_media/n_parsed: $r")
    assert(r.getLong(4) == 320 && r.getLong(5) == 1024, s"min/max d1: $r") // widths 1024,320,640
    assert(r.getLong(7) == 200 && r.getLong(8) == 768, s"min/max d2: $r")  // heights 768,200,480
  }

  test("column walk terminates on standalone markers (TEM/RSTn/stray SOI) — honest NULL, never garbage dims") {
    // standalone markers carry NO length word; a walk that "skips" one by
    // chasing a length from its payload bytes can land a probe on bytes
    // that look like ffc0 and emit fake dimensions. Craft exactly that
    // trap: after the standalone marker, the would-be "length" bytes are
    // ffc0's own marker — a buggy skip reads length 0xffc0 or dives into
    // the SOF body at a wrong offset. The column walk must return NULL;
    // the JVM codec (which steps +2 over standalone markers) parses.
    def withMarker(m: Int): Array[Byte] = {
      val sof = Array[Byte](0xff.toByte, 0xc0.toByte, 0x00, 0x11, 0x08,
        0x01, 0xe0.toByte, 0x02, 0x80.toByte, 0x03, 0x01, 0x11, 0x00)
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, m.toByte) ++ sof
    }
    val cases = Seq(1L -> withMarker(0x01), 2L -> withMarker(0xd0),
      3L -> withMarker(0xd7), 4L -> withMarker(0xd8))
    cases.foreach { case (_, b) =>
      assert(Multimodal.HeaderCodec.decode(b).contains((640, 480, "jpeg")),
        "JVM codec must step over the standalone marker and parse SOF") }
    val r = HeaderDims.headerDimsOf(
        cases.toDF("doc_id", "media")
          .withColumn("planted_d1", lit(null).cast("long"))
          .withColumn("planted_d2", lit(null).cast("long"))).collect()
      .map(r => r.getString(0) -> r).toMap.apply("jpeg")
    assert(r.getLong(1) == 4 && r.getLong(2) == 0,
      s"column walk must NULL on standalone markers (JVM codec's job), got $r")
  }

  test("media gate: envelope verdicts map-side, stateless, stream == batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // static corpus: the q124 fixture (its pngs/wavs set the envelope)
    val static = HeaderDims.fixtureDimMedia(
      graft.oracle.Tables.table(spark, sf0001, "documents"))
    def png(w: Int, h: Int): Array[Byte] =
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
        0, 0, 0, 13, 'I', 'H', 'D', 'R',
        (w >> 24).toByte, (w >> 16).toByte, (w >> 8).toByte, w.toByte,
        (h >> 24).toByte, (h >> 16).toByte, (h >> 8).toByte, h.toByte,
        8, 2, 0, 0, 0)
    val arrivals = Seq(
      (1L, png(500, 500)),       // inside the [16, 2047]x[16, 1535] fixture envelope
      (2L, png(40000, 2)),       // the decoder-killer: out of envelope
      (3L, "just text".getBytes)) // unparseable
    val batch = HeaderDims.mediaGateStreamStatic(
        arrivals.toDF("doc_id", "media"), static)
      .collect().map(r => r.getLong(0) -> (r.getInt(4), r.getString(5))).toMap
    assert(batch(1L) == ((1, "ok")))
    assert(batch(2L) == ((0, "out_of_envelope")))
    assert(batch(3L) == ((0, "unparsed")))
    // streaming: same verdicts, zero state
    val stream = MemoryStream[(Long, Array[Byte])]
    val sq = HeaderDims.mediaGateStreamStatic(
        stream.toDF().toDF("doc_id", "media"), static)
      .writeStream.format("memory").queryName("media_gate")
      .outputMode("append").start()
    try {
      stream.addData(arrivals)
      sq.processAllAvailable()
      assert(sq.lastProgress.stateOperators.isEmpty, "media gate must be stateless")
    } finally sq.stop()
    val streamed = spark.table("media_gate").collect()
      .map(r => r.getLong(0) -> (r.getInt(4), r.getString(5))).toMap
    assert(streamed == batch, "stream != batch")
  }

  test("q174 escalation: column path parses the reachable bulk, JVM codec exactly the residue") {
    val m = graft.ext.DecodeEscalation.q174(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    val jpeg = m("jpeg")
    // the wide-filler fixture MUST produce both lanes, else the pattern
    // is vacuous (q124's own fixture keeps fill <= 15 — all-column)
    assert(jpeg.getLong(2) > 0, "no column-parsed jpegs")
    assert(jpeg.getLong(3) > 0, "no escalated jpegs — fixture vacuous")
    assert(jpeg.getLong(2) + jpeg.getLong(3) == jpeg.getLong(1),
      s"lanes must partition the jpegs: $jpeg")
    assert(jpeg.getLong(4) == jpeg.getLong(1), s"every jpeg must match via one path: $jpeg")
    Seq("png", "wav").foreach { f =>
      assert(m(f).getLong(2) == m(f).getLong(1) && m(f).getLong(3) == 0,
        s"$f must be fully column-parsed, never escalated: ${m(f)}")
    }
    assert(m("raw").getLong(2) == 0 && m("raw").getLong(3) == 0)
  }

  test("decodeAll prefers the real header parse over the stub") {
    val recs = Seq(
      Multimodal.MediaRecord(1L, jpegBytes(800, 600, 7), "s"),
      Multimodal.MediaRecord(2L, "headerless payload".getBytes, "s")).toDS()
    val got = Multimodal.decodeAll(recs).collect().map(d => d.doc_id -> d).toMap
    assert(got(1L).width == 800 && got(1L).height == 600 && got(1L).format == "jpeg")
    // headerless falls back to the declared stub arithmetic
    val (sw, sh, sfmt) = Multimodal.StubCodec.decode("headerless payload".getBytes)
    assert(got(2L).width == sw && got(2L).height == sh && got(2L).format == sfmt)
  }
}
