package graft

import graft.ext.MediaSniff
import org.apache.spark.sql.functions._

/** Magic-byte media sniffing (q111). */
class MediaSniffSpec extends SparkSpec {

  import spark.implicits._

  test("real signatures classify; raw bytes fall through; claims cross-tab") {
    val png = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val jpeg = Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte)
    val rows = Seq(
      (png ++ "payload".getBytes, "png"),    // honest png
      (jpeg ++ "x".getBytes, "png"),         // claims png, is jpeg
      ("RIFFwavedata".getBytes, "riff"),     // honest riff
      ("plain text bytes".getBytes, "jpeg")) // claims jpeg, is raw
      .toDF("media", "claimed")
    val got = MediaSniff.sniffMatrixOf(rows).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("png", "png") -> 1L, ("png", "jpeg") -> 1L,
      ("riff", "riff") -> 1L, ("jpeg", "raw") -> 1L))
  }

  test("q111 fixture: sniff always recovers the synthesized container; ~5% claims lie") {
    val docs = graft.oracle.Tables.table(spark, sf0001, "documents")
    val total = docs.count()
    val m = MediaSniff.q111(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(m.map(_._3).sum == total)
    val offDiag = m.filter(r => r._1 != r._2).map(_._3).sum
    assert(offDiag > 0, "the mislabeling slice must exist")
    assert(offDiag * 100 / total <= 15, s"lie rate ~5%, got $offDiag/$total")
    // every mislabeled cell is a (claimed, actual) neighbor under the +1
    // rotation — no (x, x) cell can be a lie, and sniff never misreads
    val diag = m.filter(r => r._1 == r._2).map(_._3).sum
    assert(diag + offDiag == total)
  }
}
