package graft

import graft.ext.{Multimodal, Similarity, TextOps}
import org.apache.spark.sql.functions._

class ExtOpsSpec extends SparkSpec {

  test("minhash-LSH candidates achieve full recall vs exhaustive jaccard >= 0.5") {
    val lsh = TextOps.dedupMinhashLsh(spark, sf0001)
      .select(col("doc_a"), col("doc_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = TextOps.ngramJaccard(spark, sf0001)
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(lsh), s"missed pairs: ${exact -- lsh}")
  }

  test("q12 LSH: oversized band buckets are dropped by maxBucket (the quadratic-row kill switch)") {
    import spark.implicits._
    // 40 byte-identical docs collapse onto ONE (band, key) bucket in every
    // band — the mass-boilerplate shape that, uncapped, builds an m(m-1)/2
    // struct array in a single row. Two other identical docs form a
    // size-2 bucket that must survive the cap untouched.
    val boiler = (0L until 40L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta theta"))
    val pair = Seq(
      (100L, "one two three four five six seven eight nine ten"),
      (101L, "one two three four five six seven eight nine ten"))
    val docs = (boiler ++ pair).toDF("doc_id", "text")
    val capped = TextOps.dedupMinhashLshOf(docs, maxBucket = 10).collect()
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((100L, 101L)),
      "cap must drop the giant bucket wholesale and keep small buckets intact")
    // default cap admits the bucket: all 780 intra-boilerplate pairs + 1
    val uncapped = TextOps.dedupMinhashLshOf(docs).count()
    assert(uncapped == 40L * 39 / 2 + 1)
  }

  test("q62 topic labels: c-TF-IDF ranks each cluster's distinguishing term first, shared terms score 0") {
    import spark.implicits._
    // two well-separated cells (seeds 0 and 1); each doc carries its
    // cluster's signature term twice plus the shared term once — the
    // signature must outrank it, and the shared term (in every cluster)
    // must score exactly ln(2/2) = 0
    val dim = 4
    val aIds = Seq(0L, 2L, 3L)
    val bIds = Seq(1L, 10L, 11L)
    val embeds = (aIds.map((_, Array.fill(dim)(1.0f))) ++
      bIds.map((_, Array.fill(dim)(-1.0f)))).toDF("vec_id", "embedding")
    val docs = (aIds.map((_, "apple apple banana")) ++
      bIds.map((_, "car car banana"))).toDF("doc_id", "text")
    val rows = graft.ext.TopicLabel.topicLabelsOf(docs, embeds, k = 2, topN = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val expectedTop = math.floor(6 * math.log(2) * 1e6 + 0.5) / 1e6
    assert(rows.sortBy(r => (r._1, r._2)).toSeq == Seq(
      (0L, 1L, "apple", expectedTop), (0L, 2L, "banana", 0.0),
      (1L, 1L, "car", expectedTop), (1L, 2L, "banana", 0.0)), rows.mkString(", "))
  }

  test("q63 substring scrub: cross-doc spans, within-doc repeats and overlap-merge all covered; short docs untouched") {
    import spark.implicits._
    // docs 0/1 share a 7-word span (3 overlapping dup windows at L=5 —
    // coverage must merge them into one 7-word region); doc 2 is shorter
    // than L; doc 3 repeats one word 10 times (within-doc dup windows)
    val docs = Seq(
      (0L, "a b c d e f g x y"),
      (1L, "q r a b c d e f g z"),
      (2L, "short one"),
      (3L, "m m m m m m m m m m")).toDF("doc_id", "text")
    val rows = graft.ext.SubstrScrub.substrScrubOf(docs).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getString(5)))).toMap
    assert(rows(0L) == ((9L, 3L, 7L, 0.7777, "x y")))
    assert(rows(1L) == ((10L, 3L, 7L, 0.7, "q r z")))
    assert(rows(2L) == ((2L, 0L, 0L, 0.0, "short one")), "below-L docs pass through")
    assert(rows(3L) == ((10L, 6L, 10L, 1.0, "")), "a fully-duplicated doc scrubs to empty")
  }

  test("q64 delta dedup: exact/near verdicts vs existing and earlier-incoming; settled corpus never self-pairs") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and then naps in warm golden afternoon sun"
    val nearA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma"
    val existing = Seq(
      (0L, base),
      (2L, nearA),
      (4L, nearA + " tau")).toDF("doc_id", "text") // existing near-dup PAIR (2,4): must NOT emit a verdict
    val incoming = Seq(
      (1L, base),                        // exact copy of existing 0
      (3L, nearA + " upsilon"),          // near-dup of existing 2/4
      (5L, base),                        // exact copy of 0 AND earlier incoming 1 -> min partner 0
      (7L, "completely different words that no other document in this corpus shares at all honestly"),
      (9L, "too short"),                 // below shingle length, no exact match -> kept
      (11L, "one two three four five six seven eight nine ten eleven twelve thirteen fourteen fifteen"),
      (13L, "one two three four five six seven eight nine ten eleven twelve thirteen fourteen sixteen")
    ).toDF("doc_id", "text")             // (11,13): within-batch-only near pair, greedy-by-id
    val rows = graft.ext.DeltaDedup.deltaDedupOf(existing, incoming).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(rows.keySet == Set(1L, 3L, 5L, 7L, 9L, 11L, 13L), "verdicts for incoming docs ONLY")
    assert(rows(1L) == ((1, 1, 0, 0L)), s"exact copy of existing: ${rows(1L)}")
    assert(rows(3L)._2 == 1 && rows(3L)._4 == 2L, s"near-dup of existing, min partner: ${rows(3L)}")
    assert(rows(5L) == ((1, 1, 0, 0L)), s"matched_id is the min over existing AND earlier incoming: ${rows(5L)}")
    assert(rows(7L) == ((0, 0, 1, -1L)), "unique doc kept, matched_id NULL")
    assert(rows(9L) == ((0, 0, 1, -1L)), "below-shingle-length doc kept")
    assert(rows(11L)._3 == 1, "earlier member of a within-batch pair is kept (greedy-by-id)")
    assert(rows(13L) == ((0, 1, 0, 11L)), s"later member dups onto the earlier: ${rows(13L)}")
  }

  test("q65 MAD outliers: robust to the outlier itself (50% breakdown); MAD=0 sources flag any deviation") {
    import spark.implicits._
    def doc(id: Long, src: String, n: Int) = (id, src, Seq.fill(n)("w").mkString(" "))
    // source a: four docs of length 10 + one 100-word page. med=10, MAD=0
    // (over half identical) -> ONLY the page flags, and it flags even
    // though it is 22% of a mean-based stddev... the point of MAD.
    // source b: lengths 5..9 plus 50 and 60 — med=8, MAD=2, so the gate
    // sits at dev > 6: exactly the two planted monsters flag, the honest
    // spread (dev <= 3) survives.
    val docs = (Seq(10, 10, 10, 10, 100).zipWithIndex.map { case (n, i) => doc(i, "a", n) } ++
      Seq(5, 6, 7, 8, 9, 50, 60).zipWithIndex.map { case (n, i) => doc(10 + i, "b", n) })
      .toDF("doc_id", "source", "text")
    val rows = graft.ext.RobustOutlier.madOutliersOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(5), r.getInt(6)))).toMap
    assert(rows(4L) == ((10L, 0L, 1)), s"MAD=0: the deviant flags: ${rows(4L)}")
    assert((0L to 3L).forall(rows(_) == ((10L, 0L, 0))), "identical docs never flag")
    assert(rows(13L) == ((8L, 2L, 0)), s"median/MAD unmoved by the monsters: ${rows(13L)}")
    assert(rows(15L)._3 == 1 && rows(16L)._3 == 1, "both planted monsters flag")
    assert((10L to 14L).forall(rows(_)._3 == 0), "the honest spread survives")
  }

  test("q53 semdedup: over-full cells are dropped by maxCell (the quadratic-row kill switch)") {
    import spark.implicits._
    // 301 identical embeddings collapse into ONE k-means cell — the
    // mass-near-duplicate corpus SemDeDup targets; uncapped, that cell
    // alone emits 301·300/2 pair rows. A distinct 3-member cluster on the
    // opposite side of the space must keep deduping under the cap.
    val dim = 4
    val big = (0L +: (2L to 301L)).map(i => (i, Array.fill(dim)(1.0f)))
    val small = Seq(1L, 1001L, 1002L).map(i => (i, Array.fill(dim)(-1.0f)))
    val embeds = (big ++ small).toDF("vec_id", "embedding")
    // seeds = two smallest vec_ids = 0 (+1s) and 1 (−1s): Lloyd separates
    // the clusters deterministically — cell 0 has 301 members, cell 1 has 3
    val capped = graft.ext.SemDeDup.semDedupOf(embeds, k = 2, maxCell = 100).collect()
    assert(capped.length == 304, "every vector must still appear in the output")
    val dups = capped.filter(_.getInt(2) == 1)
      .map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1).toSeq
    assert(dups == Seq((1001L, 1L), (1002L, 1L)),
      s"cap must drop the giant cell wholesale and keep small cells deduping: $dups")
    // the default cap admits the giant cell: all 300 non-min members dup
    val uncapped = graft.ext.SemDeDup.semDedupOf(embeds, k = 2)
      .filter(col("is_dup") === 1).count()
    assert(uncapped == 302)
  }

  test("q55 cluster-balanced sample: small cells fully kept, big cells thinned toward target") {
    import spark.implicits._
    // the q53 hostile shape again: one 301-member cell, one 3-member cell
    // (k = 2, seeds 0/+1s and 1/-1s separate them deterministically)
    val dim = 4
    val big = (0L +: (2L to 301L)).map(i => (i, Array.fill(dim)(1.0f)))
    val small = Seq(1L, 1001L, 1002L).map(i => (i, Array.fill(dim)(-1.0f)))
    val out = graft.ext.ClusterSample.clusterBalancedSample(
      (big ++ small).toDF("vec_id", "embedding"), k = 2, targetPerCell = 40).collect()
    assert(out.length == 304, "every vector appears with a keep flag")
    val keptByCid = out.filter(_.getInt(2) == 1).groupBy(_.getLong(1))
      .map { case (c, rows) => c -> rows.length }
    assert(keptByCid(1L) == 3, s"cells at/under target keep everything: $keptByCid")
    // 301-member cell at rate 40000/301 = 132 per-mil: ~40 expected; the
    // md5 thinning is deterministic, the band just guards the contract
    val kept0 = keptByCid(0L)
    assert(kept0 > 10 && kept0 < 100, s"over-full cell not thinned toward 40: $kept0")
    // determinism: identical re-run
    val again = graft.ext.ClusterSample.clusterBalancedSample(
      (big ++ small).toDF("vec_id", "embedding"), k = 2, targetPerCell = 40).collect()
    assert(out.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("q21 multi-band LSH: coarser bits widen recall over the single-band default, pairs scored once") {
    import spark.implicits._
    // bucket equality on 12 sign bits implies equality on the 6-bit prefix,
    // so (bits=6, bands=2) candidates are a superset of (bits=12, bands=1)
    // and the verified output must contain every default-config pair
    val narrow = Similarity.embedNearDup(spark, sf0001)
      .select(col("vec_a"), col("vec_b")).as[(Long, Long)].collect().toSet
    val wideRows = Similarity.embedNearDup(spark, sf0001, bits = 6, bands = 2)
      .select(col("vec_a"), col("vec_b")).as[(Long, Long)].collect()
    val wide = wideRows.toSet
    assert(wideRows.length == wide.size, "multi-band emitted a duplicate pair")
    assert(narrow.subsetOf(wide), s"recall lost at coarser bits: ${narrow -- wide}")
    assert(wide.size > narrow.size, "coarser bits should admit extra verified pairs on random vectors")
  }

  test("q14 df cap prunes a planted hot shingle before pair expansion") {
    import spark.implicits._
    // 12 identical docs (every shingle df=12) + one pair of identical docs
    // (shingle df=2): with dfCap=10 the hot posting lists are dropped before
    // ordered_pairs fan-out, leaving only the low-df pair; the default cap
    // keeps everything
    val hot = (0L until 12L).map(i => (i, "alpha beta gamma delta epsilon", "en", "src0", 29L))
    val pair = Seq((100L, "zeta eta theta iota kappa", "en", "src0", 25L),
                   (101L, "zeta eta theta iota kappa", "en", "src0", 25L))
    val dir = java.nio.file.Files.createTempDirectory("graft_dfcap").toString
    (hot ++ pair).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val capped = TextOps.ngramJaccard(spark, dir, dfCap = 10)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
    assert(capped == Set((100L, 101L)), s"expected only the low-df pair, got $capped")

    val full = TextOps.ngramJaccard(spark, dir)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
    assert(full.size == 12 * 11 / 2 + 1, s"uncapped should emit all 67 pairs, got ${full.size}")
  }

  test("simhash: near-dup pairs are close in hamming distance") {
    import spark.implicits._
    val fp = TextOps.dedupSimhash(spark, sf0001)
      .select(col("doc_id"), col("simhash")).as[(Long, Long)].collect().toMap
    val dups = TextOps.ngramJaccard(spark, sf0001).filter(col("jaccard") >= 0.9)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect()
    assert(dups.nonEmpty, "fixture should contain planted near-dups")
    // random 32-bit pairs average hamming 16; jaccard>=0.9 pairs must sit
    // far below that (each bit flips only if its small feature-diff swings
    // a majority vote)
    val hams = dups.map { case (a, b) => java.lang.Long.bitCount(fp(a) ^ fp(b)) }
    hams.foreach(h => assert(h <= 12, s"near-dup pair at hamming $h"))
    assert(hams.sum.toDouble / hams.length < 8.0, s"mean hamming ${hams.sum.toDouble / hams.length}")
  }

  test("exact dedup marks no duplicates on all-distinct fixture") {
    val d = TextOps.dedupExact(spark, sf0001)
    assert(d.filter(col("is_dup") === 1).count() == 0)
    assert(d.filter(col("group_size") =!= 1).count() == 0)
  }

  test("cosine top-k: self excluded, k respected, sim within [-1, 1]") {
    val t = Similarity.cosineTopK(spark, sf0001).cache()
    assert(t.filter(col("query_id") === col("neighbor_id")).count() == 0)
    assert(t.groupBy("query_id").count().filter(col("count") > 5).count() == 0)
    assert(t.filter(col("sim") > 1.0 || col("sim") < -1.0).count() == 0)
    t.unpersist()
  }

  test("IVF ANN returns only candidates from the query's own cell") {
    import spark.implicits._
    val labels = Tables.emb(spark)
    val bad = Similarity.annIvf(spark, sf0001).join(labels, col("neighbor_id") === col("vec_id"))
      .filter(col("cell") =!= col("label")).count()
    assert(bad == 0)
  }
  private object Tables {
    def emb(s: org.apache.spark.sql.SparkSession) =
      graft.oracle.Tables.table(s, sf0001, "embeddings").select(col("vec_id"), col("label"))
  }

  test("q73 ANN recall: per-query recall matches a brute-force exact-vs-cell recomputation") {
    val rows = spark.read.parquet(s"$sf0001/embeddings.parquet").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    def rnd6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      rnd6(d / (math.sqrt(na) * math.sqrt(nb)))
    }
    val queries = rows.filter(_._1 < 20)
    val expected = queries.map { case (qid, qv, qlabel) =>
      def top5(cands: Seq[(Long, Array[Double], Int)]) =
        cands.map { case (id, v, _) => (id, cos(qv, v)) }
          .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSet
      val exact = top5(rows.filter(_._1 != qid).toSeq)
      val cell = top5(rows.filter(r => r._1 != qid && r._3 == qlabel).toSeq)
      val hits = (exact & cell).size.toLong
      (qid, 5L, hits, hits * 10000 / 5)
    }.toSet
    val got = graft.ext.Similarity.annRecall(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected, s"recall diverges:\n got      $got\n expected $expected")
    assert(got.exists(_._4 < 10000L), "cell pruning must miss somewhere at fixture scale")
    assert(got.forall(t => t._4 >= 0L && t._4 <= 10000L))
  }

  test("q74 BM25: rare-term doc ranks first, zero-score docs dropped, non-default k/k1/b honored") {
    import spark.implicits._
    // 'needle' appears in exactly one doc (max idf); 'common' is in every
    // scoring doc (min idf); doc 4 shares no query term and must vanish.
    // doc 2 repeats 'common' but is LONGER — with b=1 full length
    // normalization its advantage shrinks vs doc 3's short doc.
    val docs = Seq(
      (1L, "needle common filler filler"),
      (2L, "common common common filler filler filler filler filler"),
      (3L, "common filler"),
      (4L, "filler filler filler")).toDF("doc_id", "text")
    val out = graft.ext.Bm25.bm25TopKOf(docs, Seq((7L, "needle common")),
        k = 2, k1 = 1.5, b = 1.0)
      .orderBy(col("rank")).collect()
    assert(out.map(_.getLong(0)).toSet == Set(7L), "query_id carried through")
    assert(out.length == 2, s"k=2 must cap the result: ${out.mkString(",")}")
    assert(out.head.getLong(2) == 1L,
      s"the needle doc must outrank any common-only doc: ${out.mkString(",")}")
    assert(!out.map(_.getLong(2)).contains(4L), "zero-score docs must be dropped")
    // BM25 contract vs a direct recompute of doc 1's score
    val n = 4.0; val avgdl = (4 + 8 + 2 + 3) / 4.0
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def w(tf: Double, dl: Double) =
      (tf * 2.5) / (tf + 1.5 * (1.0 - 1.0 + 1.0 * dl / avgdl))
    val exp1 = math.floor((idf(3) * w(1, 4) + idf(1) * w(1, 4)) * 1e6) / 1e6
    assert(out.head.getDouble(3) == exp1,
      s"doc 1 score ${out.head.getDouble(3)} != recomputed $exp1")
  }

  test("q75 PCA: planted dominant axis recovered — projections affine in the axis coordinate, centered") {
    import spark.implicits._
    // variance concentrated on axis 1 (spread 0..0.4), axis 2 carries a
    // tiny alternating wiggle, axes 3-4 are dead: the principal direction
    // is e1 up to sign, so pc1 must be monotone in the axis-1 coordinate
    // (either direction - the eigenvector sign is not canonical)
    val vecs = (0 until 5).map { i =>
      (i.toLong, Array(0.1f * i, if (i % 2 == 0) 0.001f else -0.001f, 0f, 0f).toSeq)
    }
    val out = graft.ext.Pca.pc1ProjectionOf(vecs.toDF("vec_id", "embedding"),
        dim = 4, iters = 50)
      .orderBy(col("vec_id")).collect().map(_.getDouble(1))
    assert(out.length == 5)
    val diffs = out.sliding(2).map(p => p(1) - p(0)).toSeq
    assert(diffs.forall(_ > 50) || diffs.forall(_ < -50),
      s"pc1 must be monotone in the planted axis coordinate: ${out.mkString(",")}")
    // spacing ~ 100 milli-units per step (|v1| ~ 1), and mean-centered
    assert(math.abs(out.sum) < 0.01, s"projections must center at 0: ${out.sum}")
    assert(diffs.forall(d => math.abs(d) > 95 && math.abs(d) < 105),
      s"steps should track the planted 0.1 spacing in milli-units: $diffs")
  }

  test("q45 matryoshka energy: fractions nested and bounded, exact vs Scala recompute") {
    import spark.implicits._
    val got = Similarity.matryoshkaEnergy(spark, sf0001)
      .select(col("vec_id"), col("frac16"), col("frac32"), col("trunc32"))
      .as[(Long, Double, Double, Int)].collect()
    assert(got.length > 0)
    got.foreach { case (id, f16, f32, t) =>
      assert(f16 > 0 && f16 <= f32 && f32 <= 1.0, s"vec $id: frac nesting broken ($f16, $f32)")
      assert(t == (if (f32 >= 0.72) 1 else 0), s"vec $id: flag drift")
    }
    // brute-force recompute from the raw vectors (same fold order)
    val raw = graft.oracle.Tables.table(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])].collect().toMap
    got.foreach { case (id, f16, _, _) =>
      val v = raw(id).map(_.toDouble)
      val ref = math.sqrt(v.take(16).map(x => x * x).sum) / math.sqrt(v.map(x => x * x).sum)
      // 6-dp rounding-mode differences are the oracle's concern; this pins the formula
      assert(math.abs(f16 - ref) < 2e-6, s"vec $id: $f16 vs $ref")
    }
  }

  test("multimodal: mapPartitions decode path == expression metadata path") {
    import spark.implicits._
    val decoded = Multimodal.decodeAll(Multimodal.mediaRecords(spark, sf0001))
    // re-derive the expression-path per-doc fields and compare row-by-row
    val exprPath = graft.oracle.Tables.table(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"), encode(col("text"), "UTF-8").as("media"),
        sha2(col("text"), 256).as("content_hash"))
      .withColumn("byte_len", length(col("media")).cast("long"))
      .withColumn("width", ((col("byte_len") * 7919) % 1024).cast("int"))
      .withColumn("height", ((col("byte_len") * 104729) % 768).cast("int"))
      .withColumn("format",
        when(col("byte_len") % 3 === 0, "jpeg")
          .when(col("byte_len") % 3 === 1, "png").otherwise("webp"))
      .select(col("doc_id"), col("source"), col("byte_len"), col("content_hash"),
        col("width"), col("height"), col("format"))
    val diff = decoded.toDF().except(exprPath).count() + exprPath.except(decoded.toDF()).count()
    assert(diff == 0, "stub codec and expression path disagree")
  }

  test("frame sampling: short payloads emit one frame per byte, never past the end") {
    import spark.implicits._
    val tiny = Seq(
      Multimodal.MediaRecord(1L, Array[Byte](10, 20), "src0"),      // len 2 < nFrames
      Multimodal.MediaRecord(2L, Array[Byte](1, 2, 3, 4, 5), "src0")) // stride 1, 4 frames
      .toDS()
    val frames = Multimodal.frameSample(tiny, nFrames = 4).collect()
      .groupBy(_.doc_id).view.mapValues(_.sortBy(_.frame_idx)).toMap
    assert(frames(1L).map(f => (f.frame_idx, f.frame_len)).toSeq == Seq((0L, 1L), (1L, 1L)))
    assert(frames(2L).map(f => (f.frame_idx, f.frame_len)).toSeq ==
      Seq((0L, 1L), (1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("resize geometry: aspect preserved, never upscales, degenerate dims safe") {
    import graft.ext.Multimodal.resizeDims
    assert(resizeDims(2000, 1000, 512, 512) == (512, 256)) // bound by width
    assert(resizeDims(1000, 2000, 512, 512) == (256, 512)) // bound by height
    assert(resizeDims(100, 50, 512, 512) == (100, 50))     // never upscale
    assert(resizeDims(0, 50, 512, 512) == (0, 0))          // degenerate input
    // extreme aspect: integer millipixel scale floors (5/1000) -> 500 wide, 1px tall
    assert(resizeDims(100000, 1, 512, 512) == (500, 1))
    // partition-batched path agrees with the pure geometry
    import spark.implicits._
    val decoded = Multimodal.decodeAll(Multimodal.mediaRecords(spark, sf0001))
    val bad = Multimodal.resizeAll(decoded, 300, 200).collect().count { r =>
      resizeDims(r.width, r.height, 300, 200) != ((r.out_w, r.out_h)) ||
        r.out_w > 300 || r.out_h > 200
    }
    assert(bad == 0)
  }

  test("quality score stays in [0, 1] and token counts are positive") {
    val q = TextOps.quality(spark, sf0001)
    assert(q.filter(col("quality_score") < 0 || col("quality_score") > 1).count() == 0)
    val t = TextOps.tokenCounts(spark, sf0001)
    assert(t.filter(col("bpe_tokens") <= 0 || col("ws_tokens") <= 0).count() == 0)
  }
}
