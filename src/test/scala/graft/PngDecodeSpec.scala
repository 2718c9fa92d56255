package graft

import graft.ext.PngDecode
import graft.ext.PngDecode.PngCodec
import graft.ext.TextOps
import org.apache.spark.sql.functions._

/** q184 — PNG IDAT pixel census: the built containers verified against
  * the JDK's OWN PNG decoder (ImageIO — an independent reference
  * implementation), codec honesty on both corrupt cohorts, and the
  * lanes-partition contract. */
class PngDecodeSpec extends SparkSpec {

  import spark.implicits._

  private def fixtureFor(ids: Seq[Long]) =
    PngDecode.fixturePngMedia(ids.toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap

  private def plant(id: Long): (Int, Int, Long, (Int, Int) => Int) = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"png|$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    def hv(off: Int) = java.lang.Long.parseLong(h.substring(off - 1, off + 7), 16)
    val (v1, v2, v3) = (hv(1), hv(9), hv(17))
    ((4 + v1 % 13).toInt, (3 + v2 % 11).toInt, v1,
      (x: Int, y: Int) => ((v3 * 7 + x * 31 + y * 131) % 256).toInt)
  }

  test("built PNGs decode identically under ImageIO (independent reference) and PngCodec; pixels == the plant") {
    // pick clean ids covering several (v1 % 5) filter phases
    val ids = (0L until 40L).filter { id =>
      val v1 = plant(id)._3; v1 % PngDecode.CorruptMod != 0 && v1 % PngDecode.CorruptMod != 3
    }.take(8)
    assert(ids.size >= 5, "need several clean fixtures")
    val media = fixtureFor(ids)
    ids.foreach { id =>
      val (w, h, _, px) = plant(id)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(media(id)))
      assert(img != null, s"doc $id: ImageIO rejected our container")
      assert(img.getWidth == w && img.getHeight == h, s"doc $id: dims")
      var sum = 0L; var mx = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val v = img.getRaster.getSample(x, y, 0)
        assert(v == px(x, y), s"doc $id: pixel ($x,$y) ImageIO $v != plant ${px(x, y)}")
        sum += v; mx = math.max(mx, v)
      }
      assert(PngCodec.decode(media(id)).contains((w.toLong * h, sum, mx)),
        s"doc $id: PngCodec disagrees with ImageIO")
    }
  }

  test("all five filter types occur across the fixture scanlines") {
    // filter of row y is (v1 + y) % 5 and every h >= 5... not guaranteed
    // per image (h >= 3) but certainly across a handful of them
    val seen = (0L until 10L).flatMap { id =>
      val (_, h, v1, _) = plant(id)
      (0 until h).map(y => (v1 + y) % 5)
    }.toSet
    assert(seen == Set(0L, 1L, 2L, 3L, 4L), s"filters exercised: $seen")
  }

  test("corrupt cohorts: signature flip fails the COLUMN gate, CRC flip passes it and fails the JVM lane") {
    val sigBad = (0L until 200L).find(plant(_)._3 % PngDecode.CorruptMod == 0).get
    val crcBad = (0L until 200L).find(plant(_)._3 % PngDecode.CorruptMod == 3).get
    val media = fixtureFor(Seq(sigBad, crcBad))
    val audit = PngDecode.headerAudit(
        media.toSeq.map { case (id, m) => (id, m) }.toDF("doc_id", "media"))
      .select(col("doc_id"), col("hdr_ok")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(!audit(sigBad), "corrupted signature must fail the header audit")
    assert(audit(crcBad), "CRC corruption is invisible to the header audit")
    assert(PngCodec.decode(media(sigBad)).isEmpty)
    assert(PngCodec.decode(media(crcBad)).isEmpty, "chunk CRC verify must reject")
    // and a truncated container
    val clean = (0L until 200L).find { id =>
      val v1 = plant(id)._3; v1 % 10 != 0 && v1 % 10 != 3 }.get
    val cm = fixtureFor(Seq(clean))(clean)
    assert(PngCodec.decode(cm.take(cm.length - 5)).isEmpty, "truncated must not census")
  }

  test("bomb gate: a lying IHDR is rejected map-side before any Inflater pays; stateless; stream == batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val static = PngDecode.fixturePngMedia(
      graft.oracle.Tables.table(spark, sf0001, "documents"))
    val clean = (0L until 200L).find { id =>
      val v1 = plant(id)._3; v1 % 10 != 0 && v1 % 10 != 3 }.get
    val cm = fixtureFor(Seq(clean))(clean)
    // the bomb: patch the IHDR dims to claim ~1e10 raw bytes on a
    // ~100-byte wire payload — the header audit cannot see the lie (the
    // CRC is the JVM lane's check by design); the ratio cap must
    def be(v: Long, off: Int, arr: Array[Byte]): Unit =
      (0 until 4).foreach(k => arr(off + k) = ((v >> (8 * (3 - k))) & 0xff).toByte)
    val bomb = cm.clone(); be(100000L, 16, bomb); be(100000L, 20, bomb)
    val arrivals = Seq((1L, cm), (2L, bomb), (3L, "not a png".getBytes))
    val batch = PngDecode.pngGateStreamStatic(arrivals.toDF("doc_id", "media"), static)
      .collect().map(r => r.getLong(0) -> (r.getInt(4), r.getString(5))).toMap
    assert(batch(1L) == ((1, "ok")), s"clean payload must pass: $batch")
    assert(batch(2L) == ((0, "bomb")), s"the lying header must be rejected: $batch")
    assert(batch(3L) == ((0, "unparsed")))
    val stream = MemoryStream[(Long, Array[Byte])]
    val sq = PngDecode.pngGateStreamStatic(stream.toDF().toDF("doc_id", "media"), static)
      .writeStream.format("memory").queryName("png_gate")
      .outputMode("append").start()
    try {
      stream.addData(arrivals)
      sq.processAllAvailable()
      assert(sq.lastProgress.stateOperators.isEmpty, "bomb gate must be stateless")
    } finally sq.stop()
    val streamed = spark.table("png_gate").collect()
      .map(r => r.getLong(0) -> (r.getInt(4), r.getString(5))).toMap
    assert(streamed == batch, "stream != batch")
    graft.oracle.Tables.releasePersisted()
  }

  test("lanes partition at sf0.001: counts equal the arithmetic cohorts; the codec sees only the header-valid residue") {
    val docs = graft.oracle.Tables.table(spark, sf0001, "documents")
    val r = PngDecode.pngCensusOf(PngDecode.fixturePngMedia(docs)).head()
    val cohorts = docs
      .withColumn("h", md5(concat(lit("png|"), col("doc_id"))))
      .withColumn("v1", expr(TextOps.hexVal("h", 1, duck = false)))
      .agg(count(lit(1)).as("n"),
        sum(when(col("v1") % PngDecode.CorruptMod =!= 0, 1L).otherwise(0L)).as("hdr"),
        sum(when(col("v1") % PngDecode.CorruptMod =!= 0 &&
          col("v1") % PngDecode.CorruptMod =!= 3, 1L).otherwise(0L)).as("dec"))
      .head()
    assert(r.getLong(0) == cohorts.getLong(0))
    assert(r.getLong(1) == cohorts.getLong(1), "header lane must reject exactly the sig cohort")
    assert(r.getLong(2) == cohorts.getLong(2), "JVM lane must reject exactly the CRC cohort")
    assert(r.getLong(1) > r.getLong(2) && r.getLong(2) > 0,
      s"both corrupt cohorts must be non-empty at sf0.001: $r")
    graft.oracle.Tables.releasePersisted()
  }
}
