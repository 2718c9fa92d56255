package graft

import graft.ext.PcmDecode
import graft.ext.PcmDecode.PcmCodec
import org.apache.spark.sql.functions._

/** q179 — PCM amplitude census: hand-crafted byte exactness on both
  * lanes, the lanes-partition contract, and codec honesty. */
class PcmDecodeSpec extends SparkSpec {

  import spark.implicits._

  /** A real little-endian 16-bit PCM WAV from signed samples. */
  private def wav(samples: Seq[Int]): Array[Byte] = {
    def le(v: Long, n: Int): Array[Byte] =
      (0 until n).map(k => ((v >> (8 * k)) & 0xff).toByte).toArray
    val dlen = 2L * samples.size
    "RIFF".getBytes ++ le(36 + dlen, 4) ++ "WAVEfmt ".getBytes ++
      le(16, 4) ++ le(1, 2) ++ le(1, 2) ++ le(44100, 4) ++ le(88200, 4) ++
      le(2, 2) ++ le(16, 2) ++ "data".getBytes ++ le(dlen, 4) ++
      samples.flatMap(s => le(s & 0xffff, 2)).toArray
  }

  test("JVM codec: exact amplitude fold incl. sign edges; corrupt containers -> None") {
    // -32768 is its own abs edge (65536 - 32768); 0 and ±1 the small ones
    val s = Seq(0, 1, -1, 32767, -32768, -100, 12345)
    val want = (s.size.toLong, s.map(v => math.abs(v.toLong)).sum, 32768L)
    assert(PcmCodec.decode(wav(s)).contains(want))
    assert(PcmCodec.decode("RIFFxxxxWAVEnope".getBytes).isEmpty)
    assert(PcmCodec.decode(wav(s).take(50)).isEmpty, "truncated body must not fold")
    val lying = wav(s); lying(40) = 99 // dlen > actual body
    assert(PcmCodec.decode(lying).isEmpty)
  }

  test("column lane == JVM codec on in-slice bodies; beyond-slice honest NULL") {
    val small = Seq(5, -5, 32767, -32768) // 4 samples, well inside the slice
    val big = (1 to PcmDecode.SliceSamples + 3).map(i => i * 7 - 50) // escalates
    val df = Seq((1L, wav(small)), (2L, wav(big))).toDF("doc_id", "media")
    val rows = PcmDecode.parsedPcm(df).select(col("doc_id"),
        col("n_samples"), col("col_sum_abs"), col("col_max_abs"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getLong(1) == small.size &&
      rows(1L).getLong(2) == small.map(v => math.abs(v.toLong)).sum &&
      rows(1L).getLong(3) == 32768L, s"in-slice fold wrong: ${rows(1L)}")
    assert(rows(2L).getLong(1) == big.size && rows(2L).isNullAt(2),
      s"beyond-slice body must be honest NULL, got ${rows(2L)}")
    // the composed census folds both lanes into the same totals
    val census = PcmDecode.pcmCensusOf(df).head()
    val all = small ++ big
    assert(census.getLong(0) == 2 && census.getLong(1) == 1 && census.getLong(2) == 1)
    assert(census.getLong(3) == all.size)
    assert(census.getLong(4) == all.map(v => math.abs(v.toLong)).sum)
    assert(census.getLong(5) == all.map(v => math.abs(v.toLong)).max)
    graft.oracle.Tables.releasePersisted()
  }

  test("malformed containers: odd dlen rejected by BOTH lanes; truncated in-slice claim cannot pollute max_abs") {
    // odd dlen: the codec rejects it (a 16-bit PCM body is an even byte
    // count); the column lane must agree — before the parity gate the
    // column lane folded floor(dlen/2) samples the JVM lane calls invalid
    val odd = wav(Seq(5, -5)); odd(40) = 3 // header claims dlen = 3
    assert(PcmCodec.decode(odd).isEmpty, "codec must reject odd dlen")
    val rowOdd = PcmDecode.parsedPcm(Seq((1L, odd)).toDF("doc_id", "media"))
      .select(col("n_samples")).head()
    assert(rowOdd.isNullAt(0), "column lane must NULL odd dlen like the codec's None")
    // truncated container whose header claims an IN-SLICE dlen: the sum
    // fold nulls out at the first missing byte (conv('') is NULL) but a
    // greatest() fold skips that NULL, leaving a non-NULL PARTIAL max
    // over the loud present samples — the census max must gate it out
    // (the payload is counted in neither lane: escalation → honest None)
    val trunc = wav(Seq(30000, -30000, 29999, 1, 2, 3, 4, 5)).take(44 + 6)
    val quiet = wav(Seq(7, -9))
    val census = PcmDecode.pcmCensusOf(
      Seq((1L, trunc), (2L, quiet)).toDF("doc_id", "media")).head()
    assert(census.getLong(0) == 2 && census.getLong(1) == 1 && census.getLong(2) == 0,
      s"truncated payload must land in neither lane: $census")
    assert(census.getLong(3) == 2 && census.getLong(5) == 9L,
      s"partial loud samples polluted the census: $census")
    graft.oracle.Tables.releasePersisted()
  }

  test("lanes partition the corpus: n_col + n_jvm == n_payloads, both lanes populated, codec sees exactly the residue") {
    val media = PcmDecode.fixturePcmMedia(
      graft.oracle.Tables.table(spark, sf0001, "documents"))
    val r = PcmDecode.pcmCensusOf(media).head()
    assert(r.getLong(1) + r.getLong(2) == r.getLong(0),
      s"lanes must partition: $r")
    assert(r.getLong(1) > 0 && r.getLong(2) > 0,
      s"both lanes must be populated at sf0.001: $r")
    // the codec input is EXACTLY the residue: every escalated row is a
    // valid container (ok sums to the row count), pinned by n_jvm ==
    // the arithmetic residue count from the synthesis hash
    val expectJvm = graft.oracle.Tables.table(spark, sf0001, "documents")
      .withColumn("h", md5(concat(lit("pcm|"), col("doc_id"))))
      .withColumn("n", expr(
        s"4 + ${graft.ext.TextOps.hexVal("h", 1, duck = false)} % 28"))
      .filter(col("n") > PcmDecode.SliceSamples).count()
    assert(r.getLong(2) == expectJvm,
      s"JVM lane size ${r.getLong(2)} != arithmetic residue $expectJvm")
    graft.oracle.Tables.releasePersisted()
  }
}
