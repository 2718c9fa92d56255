package graft

import graft.ops.UserSpectral

/** q161: user spectral-profile grid — hand-computed cells including the
  * negative-mean truncation bucket, the coordless-item drop, and a
  * plain-Scala fold over a generic case. */
class UserSpectralSpec extends SparkSpec {

  import spark.implicits._

  private def run(coords: Seq[(Long, Long, Long)],
                  events: Seq[(Long, Long)]): Set[(Long, Long, Long, Long)] =
    UserSpectral.gridOf(coords.toDF("node", "v1fp", "v2fp"),
        events.toDF("user_id", "item"))
      .collect()
      .map(r => (r.getAs[Long]("b1"), r.getAs[Long]("b2"),
        r.getAs[Long]("users"), r.getAs[Long]("share_bp")))
      .toSet

  private def fold(coords: Seq[(Long, Long, Long)],
                   events: Seq[(Long, Long)]): Set[(Long, Long, Long, Long)] = {
    val c = coords.map(x => x._1 -> (BigInt(x._2), BigInt(x._3))).toMap
    val perUser = events.filter(e => c.contains(e._2))
      .groupBy(_._1).toSeq.map { case (_, es) =>
        val n = es.size
        val s1 = es.map(e => c(e._2)._1).sum
        val s2 = es.map(e => c(e._2)._2).sum
        ((s1 / n) / UserSpectral.BucketFp, (s2 / n) / UserSpectral.BucketFp)
      }
    val tot = perUser.size
    perUser.groupBy(identity).map { case ((b1, b2), xs) =>
      (b1.toLong, b2.toLong, xs.size.toLong, xs.size.toLong * 10000L / tot)
    }.toSet
  }

  test("hand cells: means truncate toward zero, bucket 0 is the double-width cell") {
    val coords = Seq((1L, 1000000L, -300000L), (2L, 500000L, 500000L))
    val events = Seq(
      (10L, 1L), (10L, 1L), (10L, 2L), // mean (833333, -33333) → (8, 0)
      (20L, 2L), // (500000, 500000) → (5, 5)
      (30L, 99L)) // only a coordless item → user absent
    assert(run(coords, events) ==
      Set((8L, 0L, 1L, 5000L), (5L, 5L, 1L, 5000L)))
  }

  test("negative means bucket by truncation, not floor") {
    val coords = Seq((1L, -900000L, -150000L))
    val events = Seq((10L, 1L))
    // exact multiples: -900000 div 1e5 = -9; -150000 div 1e5 = -1
    assert(run(coords, events) == Set((-9L, -1L, 1L, 10000L)))
    // interior points: trunc(-1.49999) = -1 and trunc(-2.50001) = -2,
    // where floor division would say -2 and -3 — the case that catches
    // an engine drifting to floor semantics
    val coords2 = Seq((1L, -149999L, -250001L))
    assert(run(coords2, events) == Set((-1L, -2L, 1L, 10000L)))
  }

  test("generic case matches the plain-Scala fold") {
    val coords = (1L to 9L).map(i =>
      (i, (i * 137931L) % 2000001L - 1000000L, (i * 712501L) % 2000001L - 1000000L))
    val events = for (u <- 1L to 20L; j <- 1L to (u % 5 + 1L))
      yield (u, (u * 7 + j * 3) % 11L)
    val got = run(coords, events)
    assert(got == fold(coords, events))
    assert(got.toSeq.map(_._4).sum <= 10000L)
    assert(got.nonEmpty)
  }
}
