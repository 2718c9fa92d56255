package graft

import graft.ext.Multimodal.HeaderCodec
import org.scalacheck.{Gen, rng}

/** Property layer for the JVM header parser: randomized dimensions,
  * segment layouts and corruption, JVM-built byte arrays (independent of
  * the fixture's hex synthesis — a different construction path than
  * q124/q135 exercise). */
class HeaderCodecPropSpec extends SparkSpec {

  private def be(n: Long, bytes: Int): Array[Byte] =
    (bytes - 1 to 0 by -1).map(k => ((n >> (8 * k)) & 0xff).toByte).toArray
  private def le(n: Long, bytes: Int): Array[Byte] =
    (0 until bytes).map(k => ((n >> (8 * k)) & 0xff).toByte).toArray

  private def png(w: Int, h: Int): Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      be(13, 4) ++ "IHDR".getBytes ++ be(w, 4) ++ be(h, 4) ++
      Array[Byte](8, 2, 0, 0, 0)

  private def wav(sr: Int, ch: Int, extra: Array[Byte]): Array[Byte] =
    "RIFF".getBytes ++ le(36 + extra.length, 4) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le(16, 4) ++ le(1, 2) ++ le(ch, 2) ++ le(sr, 4) ++
      le(sr.toLong * ch * 2, 4) ++ le(ch * 2, 2) ++ le(16, 2) ++
      "data".getBytes ++ le(extra.length, 4) ++ extra

  /** JPEG with a randomized chain of APPn/COM segments before SOF. */
  private def jpeg(w: Int, h: Int, segLens: Seq[Int], sofMarker: Int): Array[Byte] = {
    val segs = segLens.zipWithIndex.flatMap { case (len, i) =>
      Array(0xff.toByte, (0xe1 + (i % 14)).toByte) ++ be(len + 2, 2) ++
        Array.fill(len)(('a' + i % 26).toByte)
    }
    Array(0xff.toByte, 0xd8.toByte) ++ segs ++
      Array(0xff.toByte, sofMarker.toByte) ++ be(17, 2) ++ Array(8.toByte) ++
      be(h, 2) ++ be(w, 2) ++ Array[Byte](3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1) ++
      "entropy-coded-bits".getBytes
  }

  test("property: PNG/WAVE/JPEG round-trip for random dims and segment layouts") {
    val params = Gen.Parameters.default
    val genCase = for {
      w <- Gen.chooseNum(1, 65535)
      h <- Gen.chooseNum(1, 65535)
      sr <- Gen.oneOf(8000, 11025, 16000, 22050, 44100, 48000, 96000)
      ch <- Gen.chooseNum(1, 8)
      nSegs <- Gen.chooseNum(0, 5)
      segLens <- Gen.listOfN(nSegs, Gen.chooseNum(0, 40))
      sof <- Gen.oneOf(0xc0, 0xc1, 0xc2)
    } yield (w, h, sr, ch, segLens, sof)
    (1 to 200).foreach { i =>
      val (w, h, sr, ch, segLens, sof) =
        genCase(params, rng.Seed(i.toLong)).get
      assert(HeaderCodec.decode(png(w, h)).contains((w, h, "png")), s"png seed $i")
      assert(HeaderCodec.decode(wav(sr, ch, Array.fill(i % 7)(0x55.toByte)))
        .contains((sr, ch, "wav")), s"wav seed $i")
      assert(HeaderCodec.decode(jpeg(w, h, segLens, sof)).contains((w, h, "jpeg")),
        s"jpeg seed $i segs=$segLens sof=$sof")
    }
  }

  test("property: truncation at every header prefix never throws") {
    val samples = Seq(png(640, 480), wav(44100, 2, Array.empty),
      jpeg(1024, 768, Seq(5, 0, 17), 0xc0))
    samples.foreach { full =>
      (0 until full.length).foreach { n =>
        // must return cleanly (Some on a complete header, None otherwise)
        HeaderCodec.decode(full.take(n))
      }
    }
    // random garbage: never throws, never misidentifies as containerized
    val params = Gen.Parameters.default
    (1 to 100).foreach { i =>
      val bytes = Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))(
        params.withSize(i), rng.Seed(1000L + i)).get.toArray
      HeaderCodec.decode(bytes) // no throw is the assertion
    }
  }
}
