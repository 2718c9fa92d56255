package graft.oracle

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Every `*StreamStatic` ingestion gate wired to fixture inputs — the
  * NON-registry query surface. The gates are production entry points
  * (their static-side FITS run corpus-scale passes) but they are not
  * `Registry` queries, so the whole-surface nets that iterate the
  * registry — CodegenCleanSpec above all — never saw them: the r14
  * verdict caught exactly that hole when `mediaGateStreamStatic`'s
  * envelope fit blew the 64 KB whole-stage method limit and ran
  * interpreted while all 175 registered queries were pinned clean.
  *
  * Each entry builds the gate in BATCH mode (the stream side passed as a
  * small batch frame — the gates are stream/batch agnostic by design,
  * their specs pin stream == batch) over the sfDir fixture tables, so a
  * net can force-compile the whole plan: the static fit AND the
  * per-arrival verdict path. Stream sides are tiny deterministic slices;
  * the static side is the full fixture table, exactly what the gate's
  * fit pass sees in its specs. */
object GateBuilders {

  private def docs(s: SparkSession, dir: String) = Tables.table(s, dir, "documents")
  private def embeds(s: SparkSession, dir: String) = Tables.table(s, dir, "embeddings")
  private def events(s: SparkSession, dir: String) = Tables.table(s, dir, "events")

  private def docSlice(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).filter(col("doc_id") % 29 === 0).select(col("doc_id"), col("text"))
  private def embedSlice(s: SparkSession, dir: String): DataFrame =
    embeds(s, dir).filter(col("vec_id") % 29 === 0).select(col("vec_id"), col("embedding"))
  private def eventSlice(s: SparkSession, dir: String): DataFrame =
    events(s, dir).filter(col("event_id") % 997 === 0)
      .select(col("event_id"), col("user_id"), col("props"))
  private def evalDocs(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).filter(col("doc_id") % 17 === 0).select(col("doc_id"), col("text"))

  /** (name, builder) per gate. Builders return the gate's verdict frame
    * over a batch arrival slice; forcing it (`queryExecution.toRdd`)
    * compiles and — under AQE — executes the static fit stages. */
  val all: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "kmv_gate" -> ((s: SparkSession, d: String) =>
      graft.ops.KmvSketch.kmvGateStreamStatic(docSlice(s, d), docs(s, d))),
    "oov_gate" -> ((s: SparkSession, d: String) =>
      graft.ext.VocabGrowth.oovGateStreamStatic(docSlice(s, d), docs(s, d))),
    "delta_gate" -> ((s: SparkSession, d: String) =>
      graft.ext.DeltaDedup.deltaGateStreamStatic(docSlice(s, d), docs(s, d))),
    "decontam_gate" -> ((s: SparkSession, d: String) =>
      graft.ext.CurationOps.decontaminationGateStreamStatic(docSlice(s, d), evalDocs(s, d))),
    "eval_span_gate" -> ((s: SparkSession, d: String) =>
      graft.ext.EvalSpanScrub.evalSpanGateStreamStatic(docSlice(s, d), evalDocs(s, d))),
    "composed_gate" -> ((s: SparkSession, d: String) =>
      graft.ops.IngestGates.composedGateStreamStatic(docSlice(s, d), docs(s, d), evalDocs(s, d))),
    "bm25_gate" -> ((s: SparkSession, d: String) =>
      graft.ext.Bm25.bm25GateStreamStatic(docSlice(s, d), docs(s, d))),
    "calibrate_gate" -> ((s: SparkSession, d: String) =>
      graft.ext.Calibrate.calibrateGateStreamStatic(
        docs(s, d).filter(col("doc_id") % 29 === 0)
          .select(col("doc_id"), col("text"), col("source")),
        docs(s, d))),
    "rrf_gate" -> ((s: SparkSession, d: String) =>
      graft.ext.HybridRrf.rrfGateStreamStatic(
        docs(s, d).join(embeds(s, d), col("doc_id") === col("vec_id"))
          .filter(col("doc_id") % 29 === 0)
          .select(col("doc_id"), col("text"), col("embedding")),
        docs(s, d), embeds(s, d))),
    "ann_gate" -> ((s: SparkSession, d: String) =>
      graft.ext.Similarity.annGateStreamStatic(embedSlice(s, d), embeds(s, d))),
    "outlier_gate" -> ((s: SparkSession, d: String) =>
      graft.ext.OutlierPrune.outlierGateStreamStatic(embedSlice(s, d), embeds(s, d))),
    "assignments_gate" -> ((s: SparkSession, d: String) =>
      graft.ext.KMeans.assignmentsStreamStatic(embedSlice(s, d), embeds(s, d))),
    "pq_gate" -> ((s: SparkSession, d: String) =>
      graft.ext.Pq.pqGateStreamStatic(embedSlice(s, d), embeds(s, d))),
    "media_gate" -> ((s: SparkSession, d: String) =>
      graft.ext.HeaderDims.mediaGateStreamStatic(
        graft.ext.HeaderDims.fixtureDimMedia(
            docs(s, d).filter(col("doc_id") % 29 === 0))
          .select(col("doc_id"), col("media")),
        graft.ext.HeaderDims.fixtureDimMedia(docs(s, d)))),
    "png_gate" -> ((s: SparkSession, d: String) =>
      graft.ext.PngDecode.pngGateStreamStatic(
        graft.ext.PngDecode.fixturePngMedia(
            docs(s, d).filter(col("doc_id") % 29 === 0))
          .select(col("doc_id"), col("media")),
        graft.ext.PngDecode.fixturePngMedia(docs(s, d)))),
    "rate_anomaly_gate" -> ((s: SparkSession, d: String) => {
      val ev = events(s, d)
      graft.ops.RateAnomaly.rateAnomalyStreamStatic(
        ev.filter(col("event_id") % 997 === 0)
          .select(col("event_type"),
            timestamp_micros(Tables.tsMicros(ev).cast("long")).as("event_time")),
        ev, Tables.tsMicros(ev))
    }),
    "triad_gate" -> ((s: SparkSession, d: String) => {
      val ev = events(s, d)
      graft.ops.Triangles.triadGateStreamStatic(eventSlice(s, d), ev, Tables.tsMicros(ev))
    }),
    "link_gate" -> ((s: SparkSession, d: String) => {
      val ev = events(s, d)
      graft.ops.PmiNeighbors.linkGateStreamStatic(eventSlice(s, d), ev, Tables.tsMicros(ev))
    }),
    "drift_gate" -> ((s: SparkSession, d: String) => {
      val ev = events(s, d)
      graft.ops.BackboneDrift.driftGateStreamStatic(eventSlice(s, d), ev, Tables.tsMicros(ev))
    }))
}
