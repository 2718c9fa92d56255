package graft

import graft.ops.WalkPairs
import org.apache.spark.sql.functions.col

/** q153: deterministic walk pairs — an exact plain-Scala mirror of the
  * md5-driven walk (same strings, same first-8-hex arithmetic) replays
  * every trajectory and predicts the pair census bit-for-bit, plus
  * hash-independent hand cases and the determinism contract. */
class WalkPairsSpec extends SparkSpec {

  import spark.implicits._

  /** First-8-hex of md5("walk|<walk>|<step>") — the engines' H. */
  private def h(walk: Long, step: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"walk|$walk|$step".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  /** Plain-Scala replay: one walk per node, Steps steps, next = sorted
    * neighbor at rank H mod deg; census of distinct-node co-visit pairs. */
  private def mirror(edges: Seq[(Long, Long)]): Map[(Long, Long), Long] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap
    val pairs = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for (start <- adj.keys) {
      var cur = start
      val traj = scala.collection.mutable.ArrayBuffer(cur)
      for (s <- 1 to WalkPairs.Steps) {
        val ns = adj(cur)
        cur = ns((h(start, s) % ns.size).toInt)
        traj += cur
      }
      for (i <- traj.indices; j <- (i + 1) until traj.size if traj(i) != traj(j)) {
        val k = (math.min(traj(i), traj(j)), math.max(traj(i), traj(j)))
        pairs(k) = pairs.getOrElse(k, 0L) + 1L
      }
    }
    pairs.toMap
  }

  private def run(edges: (Long, Long)*): Map[(Long, Long), Long] =
    WalkPairs.walkPairsOf(edges.toSeq.toDF("a", "b"))
      .collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) -> r.getAs[Long]("cnt"))
      .toMap

  test("single edge: both walks bounce — (1,2) co-visits exactly 12 times, hash-free") {
    // deg 1 everywhere → every step is forced; trajectories alternate.
    // Per walk: nodes at steps {0,2,4} vs {1,3} → 6 distinct-node pairs.
    assert(run((1L, 2L)) == Map((1L, 2L) -> 12L))
  }

  test("triangle: Spark census == plain-Scala md5 replay, and every pair is an edge") {
    val es = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    val got = run(es: _*)
    assert(got == mirror(es))
    assert(got.keySet.subsetOf(es.toSet))
    // consecutive steps always move (no self-loops): ≥4 co-visit pairs per walk
    assert(got.values.sum >= 12L)
  }

  test("star: mirror equality; walks alternate hub/leaf so hub pairs with every visited leaf") {
    val es = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    val got = run(es: _*)
    assert(got == mirror(es))
    // every pair involves the hub or two leaves co-visited THROUGH the hub
    assert(got.keys.forall { case (a, b) => a == 0L || (a > 0L && b > 0L) })
  }

  test("two components: mirror equality and no cross-component pair") {
    val left = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val right = Seq((10L, 11L), (11L, 12L))
    val got = run(left ++ right: _*)
    assert(got == mirror(left ++ right))
    assert(got.keys.forall { case (a, b) => (a < 10L) == (b < 10L) })
  }

  test("mixed-degree graph: mirror equality (the hash arithmetic is the contract)") {
    val es = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
    assert(run(es: _*) == mirror(es))
  }

  test("determinism: identical census across runs — retry-stable, no RNG anywhere") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L))
    assert(run(es: _*) == run(es: _*))
  }

  test("empty backbone → empty corpus") {
    assert(WalkPairs.walkPairsOf(
      Seq.empty[(Long, Long)].toDF("a", "b")).collect().isEmpty)
  }
}
