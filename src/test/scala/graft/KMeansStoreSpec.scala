package graft

import graft.oracle.Registry

/** q170 — the centroid store, pinned to q165's warm arm and the
  * ArtifactStore staleness protocol. */
class KMeansStoreSpec extends SparkSpec {

  test("q170 store-read warm census == q165's warm columns, bit-exact") {
    val store = Registry.byName("q170_centroid_store").run(spark, sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // q165 rows: (cid, n_warm, n_cold, inertia_warm, inertia_cold, cent_l1)
    val delta = Registry.byName("q165_kmeans_delta").run(spark, sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(store.nonEmpty && store.keySet == delta.keySet)
    store.foreach { case (cid, (n, inertia, _)) =>
      assert((n, inertia) == delta(cid),
        s"cid $cid: store=($n, $inertia) vs q165=${delta(cid)}")
    }
    // teeth: the ~6% ingest must move at least one centroid, else the
    // warm round (and the shift column) is vacuous
    assert(store.values.exists(_._3 > 0), "no centroid moved — vacuous refresh")
  }

  test("corrupted centroid-store sentinel forces a refit that restamps") {
    graft.ext.KMeansStore.q170(spark, sf0001).count()
    val s = java.nio.file.Paths.get(graft.ops.ArtifactStore.root(sf0001,
      s"kmeans-p${graft.ext.KMeansDelta.SettledPct}-v${graft.ext.KMeansStore.StoreVersion}"),
      "_FIT_OK")
    val fp = java.nio.file.Files.readString(s)
    java.nio.file.Files.writeString(s, "stale")
    assert(graft.ext.KMeansStore.q170(spark, sf0001).collect().nonEmpty)
    assert(java.nio.file.Files.readString(s) == fp, "refit must restamp")
  }
}
