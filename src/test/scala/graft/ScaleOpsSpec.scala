package graft

import graft.ops.ScaleOps
import graft.oracle.Tables
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {

  test("salted two-phase agg == plain groupBy (any salt count)") {
    val logs = Tables.logs(spark, sf0001)
    val plain = logs.groupBy(col("service"))
      .agg(count(lit(1)).as("total_logs"), count(when(col("level") === "ERROR", 1)).as("errors"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    Seq(1, 7, 32).foreach { salts =>
      val salted = ScaleOps.saltedStats(logs, salts)
        .select("service", "total_logs", "errors")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(salted == plain, s"salts=$salts")
    }
  }

  test("salted agg spreads a hot key over the salt space") {
    val logs = Tables.logs(spark, sf0001)
    val partials = logs.withColumn("_salt", pmod(hash(col("event_id")), lit(32)))
      .groupBy(col("service"), col("_salt")).count()
    // each of the 5 services spreads over many salt partitions
    val spread = partials.groupBy("service").count().select(min("count")).head.getLong(0)
    assert(spread > 16, s"hot key only spread over $spread salts")
  }

  test("approx p95 sketch tracks the exact aggregator within 5% (groups with mass)") {
    import spark.implicits._
    // per-service groups (~200 rows each at sf0.001): on tiny groups the
    // discrete-floor rank and the sketch's nearest rank legitimately differ
    // by a whole element, which is not a sketch-accuracy question
    val logs = Tables.logs(spark, sf0001)
    val approx = logs.groupBy(col("service"))
      .agg(percentile_approx(col("latency_ms"), lit(0.95), lit(10000)).cast("double").as("a"))
      .as[(String, Double)].collect().toMap
    val exact = logs.groupBy(col("service"))
      .agg(graft.agg.PercentileDisc.p95(col("latency_ms")).as("p"))
      .as[(String, Double)].collect()
    assert(exact.nonEmpty)
    exact.foreach { case (s, p) =>
      assert(math.abs(approx(s) - p) / p < 0.05, s"$s: approx ${approx(s)} vs exact $p")
    }
  }

  test("stratified sample: deterministic across runs, rates within binomial noise") {
    import spark.implicits._
    val a = ScaleOps.q26(spark, sf0001).collect().map(_.toSeq).toSet
    val b = ScaleOps.q26(spark, sf0001).collect().map(_.toSeq).toSet
    assert(a == b, "hash-threshold sampling must be run-deterministic")
    val totals = Tables.table(spark, sf0001, "documents")
      .groupBy(col("source")).count().as[(String, Long)].collect().toMap
    ScaleOps.q26(spark, sf0001).select(col("source"), col("n_sampled"))
      .as[(String, Long)].collect().foreach { case (src, n) =>
        val rate = if (src == "src0") 0.1 else if (src == "src1") 0.5 else 0.25
        val total = totals(src).toDouble
        val sd = math.sqrt(total * rate * (1 - rate))
        assert(math.abs(n - total * rate) <= 4 * sd + 1,
          s"$src: sampled $n of $total at nominal rate $rate")
      }
  }

  test("approx distinct within bound: q25 contract column is true for every group") {
    import spark.implicits._
    val rows = ScaleOps.q25(spark, sf0001)
      .select(col("exact_users"), col("within_bound")).as[(Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (e, ok) => assert(ok, s"HLL out of 5% bound at exact=$e") }
  }

  test("approx p95 within bound: q24 contract column is true for every window") {
    import spark.implicits._
    val rows = ScaleOps.q24(spark, sf0001)
      .select(col("p95_exact"), col("within_bound")).as[(Double, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (p, ok) => assert(ok, s"sketch out of bound at exact=$p") }
  }

  test("connected components: transitivity, cycles, and random graphs vs union-find reference") {
    import spark.implicits._
    // hand case: chain 1-2-3 + cycle 10-11-12-10 + isolated pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (12L, 10L), (20L, 21L))
    val got = graft.ops.Components.connectedComponents(pairs.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
    // seeded random graph vs a union-find reference
    val rng = new scala.util.Random(13)
    val edges = (1 to 120).map(_ => (rng.nextInt(80).toLong, rng.nextInt(80).toLong))
      .filter { case (x, y) => x != y }
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { val p = parent.getOrElseUpdate(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    edges.foreach { case (x, y) => parent(find(x)) = find(y) }
    val verts = edges.flatMap { case (x, y) => Seq(x, y) }.distinct
    val expect = verts.groupBy(find).flatMap { case (_, vs) => vs.map(_ -> vs.min) }.toMap
    val got2 = graft.ops.Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got2 == expect, s"diff=${got2.toSet -- expect.toSet}")
  }

  test("connected components: deep chain (diameter 12) runs the localCheckpoint rounds") {
    import spark.implicits._
    // chain 0-1-…-12: min-label propagation needs ~12 rounds, so the
    // i % 5 == 0 localCheckpoint branch deterministically fires (rounds 5
    // and 10) — the lineage-truncation path no fixture graph reaches
    // (near-dup clusters converge in 2–3 rounds). Labels must still all
    // collapse to 0, and the returned frame must read the loop's
    // already-materialized last round (InMemoryRelation — zero extra
    // jobs; the keyed adopt releases it on the next CC call) whose
    // lineage sits on the round-10 checkpoint leaf (Scan ExistingRDD),
    // never 12 nested join+agg rounds.
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    val chain = (0L until 12L).map(i => (i, i + 1))
    val cc = graft.ops.Components.connectedComponents(
      chain.toDF("a", "b"), "a", "b", maxIter = 25)
    val imrs = cc.queryExecution.withCachedData.collect { case r: InMemoryRelation => r }
    assert(imrs.length == 1,
      s"expected the cached last round:\n${cc.queryExecution.withCachedData}")
    assert(imrs.head.cacheBuilder.cachedPlan.toString.contains("Scan ExistingRDD"),
      s"expected checkpoint-truncated lineage:\n${imrs.head.cacheBuilder.cachedPlan}")
    val got = cc.as[(Long, Long)].collect().toMap
    assert(got == (0L to 12L).map(_ -> 0L).toMap)
  }

  test("connected components: unconverged at maxIter throws, never returns a partial closure") {
    import spark.implicits._
    val chain = (0L until 12L).map(i => (i, i + 1))
    val ex = intercept[IllegalStateException] {
      graft.ops.Components.connectedComponents(chain.toDF("a", "b"), "a", "b", maxIter = 4)
    }
    assert(ex.getMessage.contains("raise maxIter"))
  }

  test("q54 epoch shuffle: bijective shard positions, deterministic re-run, epochs decorrelate") {
    import spark.implicits._
    val docs = (1L to 200L).toDF("doc_id")
    val e1 = graft.ops.EpochShuffle.epochShuffleOf(docs, numShards = 4, epoch = 1).collect()
    assert(e1.length == 200)
    // every shard's positions are exactly 1..n — a true permutation, no
    // gaps or collisions for a loader to trip on
    e1.groupBy(_.getInt(1)).foreach { case (s, rows) =>
      assert(rows.map(_.getInt(2)).sorted.toSeq == (1 to rows.length),
        s"shard $s positions not contiguous")
    }
    // resumable: a re-run reproduces the identical permutation
    val e1b = graft.ops.EpochShuffle.epochShuffleOf(docs, numShards = 4, epoch = 1).collect()
    assert(e1.map(_.toSeq).toSet == e1b.map(_.toSeq).toSet)
    // a new epoch re-keys the hash: same ids, different permutation
    val e2 = graft.ops.EpochShuffle.epochShuffleOf(docs, numShards = 4, epoch = 2).collect()
    assert(e2.map(_.getLong(0)).toSet == (1L to 200L).toSet)
    assert(e1.map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap !=
      e2.map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap)
  }

  test("asOfJoin == brute-force reference on seeded random data (300x300, 20 keys)") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val left = (1 to 300).map(i => (i.toLong, rng.nextInt(20).toLong, rng.nextInt(1000).toLong))
    // unique (k, t) on the right so the expected answer is deterministic
    val right = (1 to 300).map(_ => ((rng.nextInt(20).toLong, rng.nextInt(1000).toLong), rng.nextInt(10000)))
      .toMap.toSeq.map { case ((k, t), v) => (k, t, v) }
    val got = graft.ops.AsOfJoin.asOfJoin(
        left.toDF("id", "k", "t"), right.toDF("k", "t", "v"), "k", "t", Seq("v"))
      .select(col("id"), col("asof_v")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    left.foreach { case (id, k, t) =>
      val expect = right.filter(r => r._1 == k && r._2 <= t)
        .sortBy(_._2).lastOption.map(_._3)
      assert(got(id) == expect, s"left $id (k=$k t=$t): got ${got(id)} want $expect")
    }
  }

  test("rangeJoin == brute-force reference on seeded random intervals (variable widths > granule)") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val points = (1 to 250).map(i => (i.toLong, rng.nextInt(2000).toLong))
    val intervals = (1 to 120).map { i =>
      val lo = rng.nextInt(2000).toLong; (i.toLong, lo, lo + 1 + rng.nextInt(100))
    }
    val got = graft.ops.RangeJoin.rangeJoin(
        points.toDF("pid", "t"), intervals.toDF("iid", "lo", "hi"),
        "t", "lo", "hi", granule = 16L)
      .select(col("pid"), col("iid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = (for {
      (pid, t) <- points
      (iid, lo, hi) <- intervals
      if t >= lo && t < hi
    } yield (pid, iid)).toSet
    assert(got == expect,
      s"missing=${expect -- got take 5} extra=${got -- expect take 5}")
  }

  test("asOfJoin: latest prior right row attached, ties match, no-prior is null-padded") {
    import spark.implicits._
    val left = Seq((1L, 100L, "a"), (1L, 200L, "b"), (2L, 50L, "c"), (3L, 10L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, Some(100L), 10.0), (1L, Some(150L), 20.0), (1L, Some(150L), 20.0),
      (2L, Some(60L), 30.0), (1L, None, 99.0)) // null-time right row must be ignored
      .toDF("k", "t", "v")
    val out = graft.ops.AsOfJoin.asOfJoin(left, right, "k", "t", Seq("t", "v"))
      .select(col("tag"), col("asof_t"), col("asof_v")).collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSet
    assert(out == Set(
      ("a", 100L, 10.0),  // tie: right at t==left.t matches (>= semantics)
      ("b", 150L, 20.0),  // latest prior of several
      ("c", -1L, -1.0),   // right exists only later -> null
      ("d", -1L, -1.0)))  // key has no right rows at all
  }

  test("asOfJoin plans one exchange on the key and no join node") {
    val plan = graft.ops.AsOfJoin.q31(spark, sf0001).queryExecution.executedPlan.toString
    val exchanges = plan.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
    assert(exchanges == 1, s"expected exactly 1 hash exchange, got $exchanges:\n$plan")
    assert(!plan.contains("Join"), s"as-of should not plan a join operator:\n$plan")
  }

  test("corpus pipeline: composition agrees with the standalone operators it composes") {
    import spark.implicits._
    import graft.ops.CorpusPipeline
    val surv = CorpusPipeline.survivors(
      graft.oracle.Tables.table(spark, sf0001, "documents")).cache()
    // dedup component == q11's winners
    val q11Winners = graft.ext.TextOps.dedupExact(spark, sf0001)
      .filter(col("is_dup") === 0).select("doc_id").as[Long].collect().toSet
    val survIds = surv.select("doc_id").as[Long].collect().toSet
    assert(survIds.subsetOf(q11Winners), "pipeline kept a doc q11 calls a duplicate")
    // quality component == q16's scores, gate applied
    val q16Scores = graft.ext.TextOps.quality(spark, sf0001)
      .select(col("doc_id"), col("quality_score")).as[(Long, Double)].collect().toMap
    surv.select(col("doc_id"), col("quality_score")).as[(Long, Double)].collect().foreach {
      case (id, q) =>
        assert(q == q16Scores(id), s"doc $id: pipeline score $q != q16 ${q16Scores(id)}")
        assert(q >= CorpusPipeline.QualityFloor)
    }
    // language gate
    assert(surv.select("lang").distinct().as[String].collect().toSet
      .subsetOf(CorpusPipeline.Langs.toSet))
    surv.unpersist()
  }

  test("sequence packing: tokens conserved, bins contiguous per lane, overflow bounded by one doc") {
    import spark.implicits._
    import graft.ops.SequencePack
    val docs = graft.oracle.Tables.table(spark, sf0001, "documents")
    val bins = SequencePack.pack(docs, SequencePack.Budget, SequencePack.Shards).cache()
    val tokTotal = docs.select(size(split(col("text"), " ")).cast("long")).as[Long].collect().sum
    val maxDoc = docs.select(size(split(col("text"), " ")).cast("long")).as[Long].collect().max
    assert(bins.agg(sum("bin_tokens")).head.getLong(0) == tokTotal, "tokens not conserved")
    // cumulative-fill guarantee: a bin exceeds the budget only by the one
    // straddling document
    val worst = bins.agg(max("bin_tokens")).head.getLong(0)
    assert(worst < SequencePack.Budget + maxDoc, s"bin of $worst tokens exceeds budget+1doc")
    // bins within each (source, shard) lane are contiguous from 0
    val lanes = bins.groupBy("source", "shard")
      .agg(min("bin").as("lo"), max("bin").as("hi"), count(lit(1)).as("n"))
      .filter(col("lo") =!= 0 || col("n") =!= col("hi") + 1)
    assert(lanes.isEmpty, "bin ids have gaps within a lane")
    bins.unpersist()
  }

  test("rangeJoin: boundary semantics exact, bucket-spanning intervals found, no duplicate pairs") {
    import spark.implicits._
    val points = Seq((1L, 100L), (2L, 110L), (3L, 99L), (4L, 1000L), (5L, 105L))
      .toDF("pid", "t")
    val intervals = Seq((10L, 100L, 110L), (11L, 95L, 2000L),
      (12L, 500L, 500L), (13L, 700L, 600L)) // empty/inverted intervals match nothing
      .toDF("iid", "lo", "hi")
    // granule (7) deliberately smaller than both widths: interval 11 spans
    // ~270 buckets and must still pair each point exactly once
    val out = graft.ops.RangeJoin.rangeJoin(points, intervals, "t", "lo", "hi", granule = 7L)
      .select(col("pid"), col("iid")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == out.distinct.length, "replicated interval produced duplicate pairs")
    assert(out.toSet == Set(
      (1L, 10L), (1L, 11L),  // t == lo is IN
      (5L, 10L), (5L, 11L),
      (2L, 11L),             // t == hi is OUT for interval 10
      (3L, 11L), (4L, 11L))) // spanning interval catches everything in range
  }

  test("rangeJoin plans an equi-join on the bucket, not a nested-loop/cartesian") {
    val plan = graft.ops.RangeJoin.q32(spark, sf0001).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to O(P*I):\n$plan")
  }

  test("AQE splits a skewed join partition at runtime (the planner-side peer of q23's manual salting)") {
    import spark.implicits._
    val restore = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force sort-merge
    // shrink the thresholds so fixture-sized skew triggers the rewrite
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    try {
      val pad = "x" * 100
      // one hot key carrying ~50x the bytes of every other key
      val left = ((1 to 50000).map(i => (0L, s"$pad$i")) ++
        (1 to 1000).flatMap(i => (1L to 4L).map(k => (k, s"$pad$i")))).toDF("k", "payload")
      val right = (0L to 4L).flatMap(k => (1 to 50).map(i => (k, i))).toDF("k", "v")
      val joined = left.join(right, "k")
      // execute THIS queryExecution (count() would plan a separate query and
      // leave this one un-run with isFinalPlan=false)
      joined.queryExecution.toRdd.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE did not mark the join skewed:\n$plan")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
