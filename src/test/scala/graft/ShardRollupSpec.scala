package graft

import graft.ext.RollupCard
import graft.ops.{EpochShuffle, ShardBalance}
import org.apache.spark.sql.functions._

/** Shard load-balance audit (q113) + multi-grain rollup card (q114). */
class ShardRollupSpec extends SparkSpec {

  import spark.implicits._

  test("q113 shards agree with the q54 epoch-shuffle assignment; loads reconcile") {
    val docs = graft.oracle.Tables.table(spark, sf0001, "documents")
    val fromShuffle = EpochShuffle.epochShuffleOf(docs.select(col("doc_id")))
      .groupBy("shard").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val audit = ShardBalance.q113(spark, sf0001).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(audit.view.mapValues(_._1).toMap == fromShuffle,
      "the audit must count the same shards q54 deals")
    val totToks = docs.select(explode(split(col("text"), " "))).count()
    assert(audit.values.map(_._2).sum == totToks)
    // floor-truncated loads sum to within numShards bp of perfect
    val loadSum = audit.values.map(_._3).sum
    assert(loadSum <= 8 * 10000L && loadSum > 8 * 10000L - 8,
      s"loads must reconcile: $loadSum")
  }

  test("single shard is perfectly balanced by definition") {
    val docs = Seq((1L, "a b c"), (2L, "d e")).toDF("doc_id", "text")
    val out = ShardBalance.shardBalanceOf(docs, numShards = 1).collect()
    assert(out.length == 1 && out(0).getLong(3) == 10000L)
  }

  test("q114 rollup grains reconcile: cells -> source subtotals -> grand total") {
    val rows = RollupCard.q114(spark, sf0001).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val cells = rows.filter(_._3 == 0L)
    val subs = rows.filter(_._3 == 1L)
    val grand = rows.filter(_._3 == 3L)
    assert(grand.length == 1)
    assert(cells.map(_._4).sum == grand.head._4)
    assert(cells.map(_._5).sum == grand.head._5)
    subs.foreach { s =>
      val mine = cells.filter(_._1 == s._1)
      assert(mine.map(_._4).sum == s._4 && mine.map(_._5).sum == s._5,
        s"subtotal for ${s._1} must equal its cells")
    }
    // grand-total mean is the exact integer division of the exact sums
    val docs = graft.oracle.Tables.table(spark, sf0001, "documents")
    assert(grand.head._4 == docs.count())
  }
}
