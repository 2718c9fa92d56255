package graft

import graft.ops.Components
import org.apache.spark.sql.functions._

/** Dedup cluster-size histogram (q117). */
class ClusterHistogramSpec extends SparkSpec {

  test("histogram reconciles with q38 clusters and the corpus total") {
    val docs = graft.oracle.Tables.table(spark, sf0001, "documents")
    val clustered = Components.q38(spark, sf0001)
      .select(col("cluster_id"), col("cluster_size")).distinct().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Components.q117(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // every doc accounted for exactly once
    assert(rows.values.map(_._2).sum == docs.count())
    // clustered sizes match the q38 table
    val bruteSizes = clustered.values.groupBy(identity)
      .map { case (s, xs) => s -> xs.size.toLong }
    bruteSizes.foreach { case (s, n) =>
      assert(rows(s)._1 == n, s"size-$s cluster count")
      assert(rows(s)._3 == n * s - n, s"size-$s removable = docs - clusters")
    }
    // singleton row: removable is zero by definition
    assert(rows(1L)._3 == 0L)
    // shares sum to ~10^4 (floor loss < rows)
    val bp = rows.values.map(_._4).sum
    assert(bp <= 10000 && bp > 10000 - rows.size)
  }
}
