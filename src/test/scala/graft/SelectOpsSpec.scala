package graft

import graft.ext.{BowDedup, BudgetSelect, OutlierPrune}
import org.apache.spark.sql.functions._

/** q56 centroid-outlier pruning, q57 bag-of-words dedup, q58 token-budget
  * selection — semantics vs in-memory recomputation plus the planted
  * hostile/edge cases their scaladocs promise. */
class SelectOpsSpec extends SparkSpec {

  // ---------------------------------------------------------------- q56

  test("q56: per-cell threshold IS the discrete p90 and keep == dist <= thr (brute force)") {
    val rows = OutlierPrune.centroidOutliersOf(
      spark.read.parquet(s"$sf0001/embeddings.parquet"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    assert(rows.length == 500)
    for ((cid, members) <- rows.groupBy(_._2)) {
      val dists = members.map(_._3).sorted
      val expectThr = dists(math.floor(0.9 * (dists.length - 1)).toInt)
      for ((vid, _, dist, thr, keep) <- members) {
        assert(thr == expectThr, s"cell $cid: thr $thr != sorted[floor(.9(n-1))] $expectThr")
        assert(keep == (if (dist <= thr) 1 else 0), s"vec $vid: keep flag wrong")
      }
      assert(members.exists(_._5 == 0) || dists.distinct.length == 1,
        s"cell $cid: p90 gate should drop its far tail unless all dists tie")
    }
  }

  test("q56: pct=1.0 keeps every vector; a planted far outlier is cut at p90") {
    import spark.implicits._
    val embeds = spark.read.parquet(s"$sf0001/embeddings.parquet")
    assert(OutlierPrune.centroidOutliersOf(embeds, pct = 1.0)
      .filter(col("keep") === 0).count() == 0)
    // 20 points on the unit corner + one far straggler, all one cell
    // (k=2 seeds split the two groups; the -1 corner anchors cell 1)
    val near = (0L to 19L).filter(_ != 1L).map(i => (i, Array.fill(4)(1.0f)))
    val far = Seq((999L, Array.fill(4)(5.0f)))
    val anchor = Seq((1L, Array.fill(4)(-1.0f)))
    val df = (near ++ far ++ anchor).toDF("vec_id", "embedding")
    val out = OutlierPrune.centroidOutliersOf(df, k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(4))).toMap
    assert(out(999L) == 0, "the straggler must be pruned")
    assert(near.forall { case (i, _) => out(i) == 1 }, "the tight mass must survive")
  }

  test("q56: the sketch threshold lands inside the exact rank band (the q24 GK contract)") {
    val embeds = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val approx = OutlierPrune.centroidOutliersOf(embeds, exactThreshold = false)
      .select(col("cid"), col("cell_thr")).distinct()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bands = graft.ext.KMeans.assignments(embeds)
      .groupBy(col("cid"))
      .agg(graft.agg.PercentileDisc.bandAt(0.9)(col("dist").cast("double")).as("b"))
      .collect().map(r => (r.getInt(0).toLong,
        (r.getStruct(1).getDouble(0), r.getStruct(1).getDouble(1)))).toMap
    assert(approx.keySet == bands.keySet)
    for ((cid, (lo, hi)) <- bands)
      assert(approx(cid) >= lo.toLong && approx(cid) <= hi.toLong,
        s"cell $cid: sketch thr ${approx(cid)} outside exact band [$lo, $hi]")
  }

  // ---------------------------------------------------------------- q57

  test("q57: case/punctuation/word-order variants collapse to one group; multisets are exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello, World!"),
      (2L, "world hello"),
      (3L, "HELLO   WORLD???"),
      (4L, "hello hello world"), // different multiset: count matters
      (5L, "entirely different text")).toDF("doc_id", "text")
    val out = BowDedup.bowDedupOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getInt(3)))).toMap
    assert(out(1L) == ((3L, 0)), "min doc_id is the keeper")
    assert(out(2L) == ((3L, 1)) && out(3L) == ((3L, 1)))
    assert(out(4L) == ((1L, 0)), "a doubled word is a different bag")
    assert(out(5L) == ((1L, 0)))
  }

  test("q57: fixture corpus is singleton-only at sf0.001 (normalization is live, not lossy)") {
    val out = BowDedup.q57(spark, sf0001)
    assert(out.count() == 500)
    assert(out.filter(col("is_dup") === 1).count() == 0)
  }

  // ---------------------------------------------------------------- q58

  test("q58: kept set is exactly the greedy quality-first prefix under the budget (brute force)") {
    val rows = BudgetSelect.q58(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3), r.getLong(4), r.getInt(5)))
    assert(rows.length == 500)
    for ((src, members) <- rows.groupBy(_._2)) {
      val ordered = members.sortBy(m => (-m._3, m._1))
      var cum = 0L
      for ((vid, _, _, tok, cumGot, keep) <- ordered) {
        cum += tok
        assert(cumGot == cum, s"$src/$vid: cum_tokens $cumGot != running sum $cum")
        assert(keep == (if (cum <= 1000L) 1 else 0), s"$src/$vid: keep flag wrong")
      }
      assert(members.exists(_._6 == 1) && members.exists(_._6 == 0),
        s"$src: the budget should cut mid-source at fixture scale")
    }
  }

  test("q58: a larger budget keeps a superset; kept mass never exceeds the budget") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    def kept(b: Long): Set[Long] = BudgetSelect.budgetSelectOf(docs, b)
      .filter(col("keep") === 1).select("doc_id").collect().map(_.getLong(0)).toSet
    val small = kept(500L); val big = kept(2000L)
    assert(small.subsetOf(big))
    val mass = BudgetSelect.budgetSelectOf(docs, 500L).filter(col("keep") === 1)
      .groupBy(col("source")).agg(sum(col("est_tokens")).as("m"))
      .collect().map(_.getLong(1))
    assert(mass.forall(_ <= 500L))
  }

  // ---------------------------------------------------------------- q66

  test("q66: survivors are exactly the per-source (quality desc, id asc) top-N prefix, rank = position") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    val scored = graft.ext.TextOps.scoredDocs(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(r.fieldIndex("quality_score"))))
    val got = graft.ext.DomainCap.domainCapOf(docs, maxPerSource = 15).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == 20 * 15, "20 sources x 25 docs, cap 15 -> the cut is live")
    for ((src, members) <- scored.groupBy(_._2)) {
      val expect = members.sortBy(m => (-m._3, m._1)).take(15)
      val mine = got.filter(_._1 == src).sortBy(_._2)
      assert(mine.map(_._3).toSeq == expect.map(_._1).toSeq, s"$src: kept ids/order diverge")
      assert(mine.map(_._2).toSeq == (1L to mine.length).toSeq, s"$src: ranks not 1..n")
      assert(mine.map(_._4).toSeq == expect.map(_._3).toSeq, s"$src: scores diverge")
    }
  }

  test("q66: a cap above every source size keeps all docs; ties break to the lower doc_id") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    assert(graft.ext.DomainCap.domainCapOf(docs, maxPerSource = 1000).count() == 500)
    // four identical docs: identical quality -> survivors are the two LOWEST ids
    val tied = Seq(7L, 3L, 9L, 5L).map(i => (i, "s", "same words every time here"))
      .toDF("doc_id", "source", "text")
    val kept = graft.ext.DomainCap.domainCapOf(tied, maxPerSource = 2).collect()
      .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(kept.toSeq == Seq((1L, 3L), (2L, 5L)), s"tie-break must be id asc: ${kept.toSeq}")
  }

  // ---------------------------------------------------------------- q67

  test("q67: keeper is the cluster's argmax quality, singletons keep themselves (brute-force closure)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val pairs = graft.ext.TextOps.ngramJaccard(spark, sf0001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must contain near-dup pairs")
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val roots = pairs.flatMap(p => Seq(p._1, p._2)).distinct.map(v => v -> find(v)).toMap
    val q = graft.ext.TextOps.scoredDocs(docs)
      .select(col("doc_id"), col("quality_score")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val keeperOf = roots.groupBy(_._2).map { case (root, m) =>
      root -> m.keys.toSeq.sortBy(v => (-q(v), v)).head
    }
    val out = graft.ext.Canonical.q67(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.length == 500)
    for ((id, root, keep) <- out) {
      val expRoot = roots.getOrElse(id, id)
      assert(root == expRoot, s"doc $id: root $root != closure root $expRoot")
      val expKeep = if (!roots.contains(id) || keeperOf(expRoot) == id) 1 else 0
      assert(keep == expKeep, s"doc $id: keep $keep != $expKeep")
    }
    assert(out.exists(_._3 == 0), "clusters exist, so some member must be dropped")
  }

  test("q67: a better-quality later doc beats the min-id member; identical copies tie to the lower id") {
    import spark.implicits._
    // cluster {1,2,3}: doc 2 is clearly richest; cluster {5,6}: identical
    // text -> identical score -> keeper must be the LOWER id; 4 is alone
    val docs = Seq(
      (1L, "common words common words common words"),
      (2L, "common words plus varied rich distinctive vocabulary everywhere today"),
      (3L, "common words common words"),
      (4L, "a singleton document"),
      (5L, "identical twin text"),
      (6L, "identical twin text")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val out = graft.ext.Canonical.canonicalKeepers(docs, pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(out(1L) == ((1L, 0)) && out(3L) == ((1L, 0)), "cluster {1,2,3} roots at 1, drops 1 and 3")
    assert(out(2L) == ((1L, 1)), "doc 2 is the quality argmax, not the min id")
    assert(out(4L) == ((4L, 1)), "singleton keeps itself")
    assert(out(5L) == ((5L, 1)) && out(6L) == ((5L, 0)), "score tie breaks to the lower id")
  }

  // ---------------------------------------------------------------- q68

  test("q68: per-source keep counts and basis points match a brute-force sweep; the grid cuts live") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    val scored = graft.ext.TextOps.scoredDocs(docs).collect()
      .map(r => (r.getString(r.fieldIndex("source")), r.getLong(r.fieldIndex("n_words")),
        r.getDouble(r.fieldIndex("quality_score"))))
    val grid = graft.ext.ThresholdSweep.defaultGrid
    val out = graft.ext.ThresholdSweep.thresholdSweepOf(docs).collect()
      .map(r => (r.getString(0), r.getDouble(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out.size == 20 * grid.size, "20 sources x grid")
    for ((src, members) <- scored.groupBy(_._1); t <- grid) {
      val docsTotal = members.length.toLong
      val tokensTotal = members.map(_._2).sum
      val kept = members.filter(_._3 >= t)
      val exp = (kept.length.toLong, kept.length.toLong * 10000 / docsTotal,
        kept.map(_._2).sum, kept.map(_._2).sum * 10000 / tokensTotal)
      assert(out((src, t)) == exp, s"$src@$t: ${out((src, t))} != $exp")
    }
    // the grid must actually separate: some cut keeps everything somewhere,
    // no threshold keeps everything everywhere
    assert(out.values.exists(_._2 < 10000L), "top thresholds must cut at fixture scale")
    assert(grid.forall(t => out.exists { case ((_, tt), v) => tt == t }), "every grid row present")
  }

  test("q68: kept mass is non-increasing along the grid; a floor threshold keeps everything") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    val rows = graft.ext.ThresholdSweep.thresholdSweepOf(docs).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(4)))
    for ((_, bySrc) <- rows.groupBy(_._1)) {
      val ordered = bySrc.sortBy(_._2)
      assert(ordered.sliding(2).forall(p => p(0)._3 >= p(1)._3), "docs_kept must fall")
      assert(ordered.sliding(2).forall(p => p(0)._4 >= p(1)._4), "tokens_kept must fall")
    }
    val all = graft.ext.ThresholdSweep.thresholdSweepOf(docs, Seq(0.0)).collect()
    assert(all.forall(r => r.getLong(3) == 10000L && r.getLong(5) == 10000L))
    intercept[IllegalArgumentException] {
      graft.ext.ThresholdSweep.thresholdSweepOf(docs, Seq(0.6, 0.5))
    }
  }
}
