package graft

import graft.ext.KeeperQuality
import org.apache.spark.sql.functions._

/** q134: does min-id dedup keep the better near-dup copy? */
class KeeperQualitySpec extends SparkSpec {

  import spark.implicits._

  test("hand pair: keeper-worse counted with exact integer delta") {
    // two near-identical docs (high jaccard); doc 1 (keeper) is the
    // repetitive low-quality twin, doc 2 the diverse one
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base + " spam spam spam spam spam"),
      (2L, base + " lambda mu nu xi omicron"),
      (3L, "totally unrelated text about nothing shared with others at all"))
      .toDF("doc_id", "text")
    val rows = KeeperQuality.keeperQualityOf(docs).collect()
    assert(rows.length == 1, s"one near-dup pair -> one band: ${rows.toSeq}")
    val r = rows.head
    assert(r.getLong(1) == 1L, "exactly the (1,2) pair")
    assert(r.getLong(2) == 1L && r.getLong(3) == 10000L,
      "the repetitive keeper scores below its diverse twin")
    assert(r.getLong(4) < 0L, "net delta negative when the keeper is worse")
  }

  test("fixture: band census bounded and reconciles with q14's pair count") {
    val bands = KeeperQuality.q134(spark, sf0001).collect()
    val pairTotal = graft.ext.TextOps.ngramJaccard(spark, sf0001).count()
    assert(bands.map(_.getLong(1)).sum == pairTotal,
      "every q14 pair lands in exactly one band")
    bands.foreach { r =>
      assert(r.getLong(0) >= 2L && r.getLong(0) <= 10L, "jaccard floor >= 0.2")
      assert(r.getLong(2) <= r.getLong(1))
    }
  }
}
