package graft

import graft.ext.{BpeDrift, BpeEncode}
import graft.oracle.Tables
import org.apache.spark.sql.functions._

/** q183 — tokenizer drift in the rolling chain: the cycle-k rolled
  * fertility must equal a monolithic recompute at that cut (the
  * verdict's pin), the day cuts must partition the corpus, and the
  * drift column must be the exact fit-time difference (honest-NULL for
  * strata with no baseline). */
class BpeDriftSpec extends SparkSpec {

  test("day cuts partition the corpus deterministically: settled ~70%, three ~10% shards") {
    val docs = Tables.table(spark, sf0001, "documents")
    val n = docs.count()
    val byDay = BpeDrift.docsWithDay(docs).groupBy(col("day")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byDay.keySet == Set(0, 1, 2, 3), s"days must be 0..3: $byDay")
    assert(byDay.values.sum == n, "cuts must partition")
    assert(byDay(0) > n / 2, s"settled shard must dominate: $byDay")
    (1 to 3).foreach(k => assert(byDay(k) > 0, s"cycle $k shard empty: $byDay"))
  }

  test("cycle-k rolled fertility == monolithic fertility at that cut; dfert is the exact fit-time delta") {
    val docs = Tables.table(spark, sf0001, "documents")
    val rolled = BpeDrift.fertilityChainOf(docs).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), if (r.isNullAt(6)) None else Some(r.getLong(6))))
      .toMap
    // monolithic: same fit (settled corpus, batched trainer), then each
    // prefix censused FROM SCRATCH — no rolling state
    val d = BpeDrift.docsWithDay(docs)
    val (merges, _) = BpeEncode.fitBatched(d.filter(col("day") === 0).select(col("text")))
    val ml = merges.map(m => (m.a, m.b))
    val fit0 = BpeDrift.encodedStratumCensus(d.filter(col("day") === 0), ml).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        r.getLong(3) * 1000000L / r.getLong(2)).toMap
    (1 to BpeDrift.Cycles).foreach { k =>
      val mono = BpeDrift.encodedStratumCensus(d.filter(col("day") <= k), ml).collect()
        .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
      val atK = rolled.collect { case ((`k`, s, l), v) => (s, l) -> v }
      assert(atK.keySet == mono.keySet, s"cycle $k strata diverged")
      atK.foreach { case (sl, (nw, et, fert, dfert)) =>
        val (mNw, mEt) = mono(sl)
        assert(nw == mNw && et == mEt,
          s"cycle $k $sl: rolled ($nw, $et) != monolithic ($mNw, $mEt)")
        assert(fert == et * 1000000L / nw)
        assert(dfert == fit0.get(sl).map(f0 => fert - f0),
          s"cycle $k $sl: dfert $dfert vs baseline ${fit0.get(sl)}")
      }
    }
    // the NULL lane is real at this SF or the honest-NULL contract is
    // untested: at least one stratum must lack a fit-time baseline OR
    // every stratum must have one (then assert the negative vacuously)
    val nNew = rolled.collect { case ((1, s, l), (_, _, _, None)) => (s, l) }
    info(s"strata without fit-time baseline at cycle 1: ${nNew.size}")
    graft.oracle.Tables.releasePersisted()
  }
}
