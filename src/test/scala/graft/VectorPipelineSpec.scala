package graft

import org.apache.spark.sql.functions._

/** q61 composed vector-curation DAG — composition pins against the
  * standalone operators plus exact recomputation of the survivor-rate
  * thinning stage. */
class VectorPipelineSpec extends SparkSpec {

  test("q61: is_dup ≡ q53, keep_dist ≡ q56, thinning over survivors recomputed exactly") {
    val out = graft.ops.VectorPipeline.q61(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(out.length == 500)
    // same params, same fixture → the composed flags must equal the
    // standalone operators' outputs bit-for-bit
    val q53 = graft.ext.SemDeDup.q53(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(out.forall { case (v, _, d, _, _) => q53(v) == d }, "is_dup drifted from q53")
    val q56 = graft.ext.OutlierPrune.q56(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(out.forall { case (v, _, _, kd, _) => q56(v) == kd }, "keep_dist drifted from q56")
    // recompute the survivor-rate thinning in-JVM (md5 per-mil, the q55
    // decision arithmetic) — rates must come from SURVIVOR counts, not
    // raw cell sizes
    def pm(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"vcur|$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % 1000
    }
    val surv = out.filter(r => r._3 == 0 && r._4 == 1)
    val rate = surv.groupBy(_._2).map { case (cid, m) =>
      cid -> math.min(1000L, 20000L / m.length) }
    for ((v, cid, d, kd, fk) <- out) {
      val expect = if (d == 0 && kd == 1 && pm(v) < rate(cid)) 1 else 0
      assert(fk == expect, s"vec $v: final_keep $fk != recomputed $expect")
    }
    assert(out.exists(_._5 == 1) && surv.exists(_._5 == 0),
      "thinning should be live (some survivors kept, some thinned) at fixture scale")
  }
}
