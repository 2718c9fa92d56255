package graft

import graft.functions.TextExprs
import org.apache.spark.sql.functions._

/** Pins the native text expressions to the HOF formulations they replaced —
  * outputs must be bit-identical so DuckDB oracle hashes are unaffected. */
class TextExprsSpec extends SparkSpec {

  private val hofNgrams =
    "transform(sequence(1, size(ws) - 2), i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2)))"

  private def hexVal(m: String, off: Int): String =
    (0 until 8).map { k =>
      val mult = 1L << (4 * (7 - k))
      s"CAST(instr('0123456789abcdef', substr($m, ${off + k}, 1)) - 1 AS BIGINT) * $mult"
    }.mkString("(", " + ", ")")

  test("word_ngrams(ws, 3) == transform(sequence(...)) chain on fixture docs") {
    TextExprs.register(spark)
    val docs = graft.oracle.Tables.table(spark, sf0001, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
    val bad = docs
      .select(expr("word_ngrams(ws, 3)").as("a"), expr(hofNgrams).as("b"))
      .filter(not(col("a") === col("b")))
      .count()
    assert(bad == 0)
  }

  test("word_ngrams handles short arrays (empty result), n=1 identity") {
    import spark.implicits._
    TextExprs.register(spark)
    val df = Seq(Seq("a"), Seq("a", "b"), Seq("a", "b", "c")).toDF("ws")
    val sizes = df.select(size(expr("word_ngrams(ws, 3)"))).collect().map(_.getInt(0)).toSeq
    assert(sizes == Seq(0, 0, 1))
    val ident = df.select(expr("word_ngrams(ws, 1)").as("g"), col("ws"))
      .filter(not(col("g") === col("ws"))).count()
    assert(ident == 0)
  }

  test("minhash_signatures == md5-hex Carter-Wegman HOF chain on fixture shingles") {
    TextExprs.register(spark)
    val sarr = graft.ext.TextOps.docShingleArr(spark, sf0001, distinct = false)
    val hof = sarr
      .withColumn("ms", expr("transform(sarr, s -> md5(s))"))
      .withColumn("hs", expr(
        s"transform(ms, m -> struct(${hexVal("m", 1)} AS h1, ${hexVal("m", 9)} AS h2))"))
    val sigHof = (0 until 12).map(i =>
      expr(s"array_min(transform(hs, h -> (h.h1 + $i * h.h2) % 2147483647))").as(s"a$i"))
    val bad = hof
      .select(col("doc_id") +: expr("minhash_signatures(sarr, 12)").as("sig") +: sigHof: _*)
      .filter((0 until 12).map(i => col("sig")(i) =!= col(s"a$i")).reduce(_ || _))
      .count()
    assert(bad == 0)
  }
}
