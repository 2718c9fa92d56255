package graft

import graft.ext.ZlibDecode
import graft.ext.ZlibDecode.InflateCodec
import org.apache.spark.sql.functions._

/** q180 — zlib inflate census: real Deflater/Inflater round-trips, the
  * envelope gate's bounding contract, and codec honesty. */
class ZlibDecodeSpec extends SparkSpec {

  import spark.implicits._

  private def deflate(content: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(content); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }

  test("InflateCodec: exact content census + Adler-32 on a real round-trip; honest None on damage") {
    val content = Array.tabulate(1000)(i => ((i * 131 + 7) % 251).toByte)
    val z = deflate(content)
    val adler = { val a = new java.util.zip.Adler32(); a.update(content); a.getValue }
    val want = (content.length.toLong,
      content.map(_ & 0xffL).sum, content.map(_ & 0xffL).max, adler)
    assert(InflateCodec.decode(z).contains(want))
    // truncated stream: no fold, no partial garbage
    assert(InflateCodec.decode(z.dropRight(6)).isEmpty)
    // tampered TRAILER (envelope still valid): zlib's own data check
    // fires and the codec answers None, never a wrong census
    val bad = z.clone(); bad(bad.length - 1) = (bad(bad.length - 1) ^ 0x5a).toByte
    assert(InflateCodec.decode(bad).isEmpty)
    // garbage that is not a deflate stream at all
    assert(InflateCodec.decode("not zlib at all".getBytes).isEmpty)
  }

  test("envelope gate: the corrupt cohort is rejected map-side and the Inflater sees exactly the residue") {
    val docs = graft.oracle.Tables.table(spark, sf0001, "documents")
    val media = ZlibDecode.fixtureZlibMedia(docs)
    val env = ZlibDecode.enveloped(media)
      .select(col("doc_id"), col("env_ok")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // arithmetic expectation: v1 % CorruptMod == 0 is the corrupt cohort
    val expect = docs
      .withColumn("h", md5(concat(lit("zlib|"), col("doc_id"))))
      .withColumn("bad", expr(
        s"${graft.ext.TextOps.hexVal("h", 1, duck = false)} % ${ZlibDecode.CorruptMod} = 0"))
      .select(col("doc_id"), col("bad")).collect()
      .map(r => r.getLong(0) -> !r.getBoolean(1)).toMap
    assert(env == expect, "envelope verdicts must equal the arithmetic corrupt cohort")
    assert(env.values.exists(!_) && env.values.exists(identity),
      "both cohorts must be populated at sf0.001")
    // composed census: the JVM lane's row count equals the gate's pass
    // count (nothing corrupt reaches the Inflater, nothing valid skips it)
    val r = ZlibDecode.zlibCensusOf(media).head()
    assert(r.getLong(1) == env.values.count(identity), s"n_env_ok: $r")
    assert(r.getLong(2) == r.getLong(1), s"every envelope-valid stream inflates: $r")
    assert(r.getLong(3) == r.getLong(1), s"every inflated stream adler-matches its trailer: $r")
    graft.oracle.Tables.releasePersisted()
  }
}
