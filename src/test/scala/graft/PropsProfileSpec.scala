package graft

import graft.ops.PropsProfile

/** Semi-structured props key census (q110). */
class PropsProfileSpec extends SparkSpec {

  import spark.implicits._

  test("mixed payloads: presence, numeric share and range per (feed, key)") {
    val events = Seq(
      ("click", """{"page": "home", "ms": 12}"""),
      ("click", """{"page": "cart", "ms": 40, "ab": "B"}"""),
      ("click", """{"page": "home"}"""),
      ("buy",   """{"amount": 9.5}"""),
      ("buy",   """{"amount": "12"}"""),   // numeric-looking string counts (lexical)
      ("buy",   """not json at all"""))     // malformed drops out
      .toDF("event_type", "props")
    val out = PropsProfile.propsProfileOf(events).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)),
          if (r.isNullAt(6)) None else Some(r.getDouble(6)))).toMap
    assert(out(("click", "page")) == ((3L, 10000L, 0L, None, None)))
    assert(out(("click", "ms")) == ((2L, 6666L, 2L, Some(12.0), Some(40.0))))
    assert(out(("click", "ab")) == ((1L, 3333L, 0L, None, None)))
    // malformed row still counts in the denominator (3 buy rows)
    assert(out(("buy", "amount")) == ((2L, 6666L, 2L, Some(9.5), Some(12.0))))
  }

  test("q110 fixture: the single 'k' key is fully present and fully numeric") {
    val rows = PropsProfile.q110(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(1) == "k")
      assert(r.getLong(3) == 10000L, s"k present on every row: $r")
      assert(r.getLong(2) == r.getLong(4), s"k is always numeric: $r")
      assert(r.getDouble(5) >= 0.0 && r.getDouble(6) <= 99.0)
    }
  }
}
