package graft.ops

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-minute rate anomaly detection (q107) — flag the (event_type,
  * minute) cells whose event count sits more than `sigmas` standard
  * deviations above that type's own per-minute baseline. The statistical
  * generalization of the reference's fixed-threshold detectors
  * (error_rate_detector.py:93 hardcodes 2%; latency_slo_monitor.py:22
  * hardcodes 100 ms): the threshold here ADAPTS to each key's history,
  * which is what an ops team actually wants once traffic is heterogeneous.
  *
  * 3σ without sqrt or doubles: z² = (c·n − S)² / (n·Q − S²) for a cell
  * count c against its type's (n minutes, S = Σc, Q = Σc²) — both sides
  * of the z² > σ² predicate are int64 products, so the verdict is
  * integer-exact on both engines (the q101 cross-multiplication
  * discipline applied to variance). Int64-safe while c·n < 3·10⁹
  * (documented; beyond that, split the baseline window). The baseline is
  * over OBSERVED minutes only — a type with zero-event minutes gets a
  * higher mean, not synthetic zero cells (documented semantics; inject a
  * minute spine if gap-aware baselines are needed).
  *
  * Scale shape: ONE corpus aggregation to the (type, minute) grain
  * (map-side partials — the only corpus-sized exchange), persisted;
  * the per-type stats census (|types| rows) derives from it and
  * broadcasts back; the verdict is map-side arithmetic. No windows, no
  * sorts, no self-joins.
  */
object RateAnomaly {

  /** Anomalous (event_type, minute, c, mean_micro, z2) cells over any
    * events frame; `tMicros` is the event-time column in epoch micros. */
  def rateAnomalyOf(events: DataFrame, tMicros: Column, sigmas: Int = 3): DataFrame = {
    val perMin = events
      .select(col("event_type"), (tMicros.cast("long")).as("t"))
      .withColumn("minute", expr("t div 60000000"))
      .groupBy(col("event_type"), col("minute"))
      .agg(count(lit(1)).as("c"))
    val base = Tables.swapPersist("q107_permin", perMin)
    val stats = base.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("q"))
    base.join(broadcast(stats), "event_type")
      .withColumn("dev", expr("c * n - s"))          // n·(c − mean), sign-exact
      .withColumn("varn", expr("n * q - s * s"))     // n²·var, ≥ 0
      .filter(col("n") >= 2 && col("dev") > 0 &&
        col("dev") * col("dev") > lit(sigmas.toLong * sigmas) * col("varn"))
      .select(col("event_type"), col("minute"), col("c"),
        expr("s * 1000000 div n").as("mean_micro"),
        // dev > 0 with varn = 0 is unreachable (zero variance forces
        // dev = 0) but ANSI mode needs the div-by-zero guard anyway
        expr("CASE WHEN varn = 0 THEN NULL ELSE dev * dev div varn END").as("z2"))
  }

  /** Stream-static adaptive anomaly detection — the reference's core use
    * case (windowed counts → alert) with q107's ADAPTIVE threshold in
    * place of its hardcoded one: the per-type baseline (n minutes,
    * S = Σc, Q = Σc²) is fit ONCE on the settled history (the frozen-
    * reference gate discipline), and arriving events aggregate per
    * (event_type, 1-minute tumbling window) under a watermark — the
    * engine's stock W2/W6/ST3 machinery — with the integer z² verdict
    * applied map-side above the windowed count. Emits every windowed
    * cell with its verdict (`is_anomaly`), so update-mode consumers see
    * counts grow and the verdict flip the moment a minute crosses its
    * type's 3σ line.
    *
    * Frozen-baseline semantics, documented: arriving minutes do NOT
    * update (n, S, Q) — re-fit at history checkpoints, exactly like the
    * bloom/decontamination gates' reference side. */
  def rateAnomalyStreamStatic(streamEvents: DataFrame, staticEvents: DataFrame,
                              staticTMicros: Column, sigmas: Int = 3): DataFrame = {
    val stats = staticEvents
      .select(col("event_type"), staticTMicros.cast("long").as("t"))
      .withColumn("minute", expr("t div 60000000"))
      .groupBy(col("event_type"), col("minute"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("q"))
    streamEvents
      .withWatermark("event_time", "2 minutes")
      .groupBy(col("event_type"), window(col("event_time"), "1 minute"))
      .agg(count(lit(1)).as("c"))
      .join(broadcast(stats), "event_type")
      .withColumn("dev", expr("c * n - s"))
      .withColumn("varn", expr("n * q - s * s"))
      .select(col("event_type"), col("window.start").as("minute_start"),
        col("c"),
        expr("s * 1000000 div n").as("mean_micro"),
        (col("n") >= 2 && col("dev") > 0 &&
          col("dev") * col("dev") > lit(sigmas.toLong * sigmas) * col("varn"))
          .as("is_anomaly"))
  }

  // ---------------------------------------------------------------- q107
  def q107(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.table(spark, sfDir, "events")
    rateAnomalyOf(ev, Tables.tsMicros(ev))
  }

  private def q107Sql(sigmas: Int = 3): String =
    s"""WITH pm AS (
       |  SELECT event_type, epoch_us(ts) // 60000000 AS minute, count(*) AS c
       |  FROM events GROUP BY 1, 2),
       |st AS (
       |  SELECT event_type, count(*) AS n, CAST(sum(c) AS BIGINT) AS s,
       |         CAST(sum(c * c) AS BIGINT) AS q
       |  FROM pm GROUP BY 1)
       |SELECT pm.event_type, pm.minute, CAST(pm.c AS BIGINT) AS c,
       |       CAST(st.s * 1000000 // st.n AS BIGINT) AS mean_micro,
       |       CAST(CASE WHEN st.n * st.q - st.s * st.s = 0 THEN NULL
       |            ELSE (pm.c * st.n - st.s) * (pm.c * st.n - st.s)
       |                 // (st.n * st.q - st.s * st.s) END AS BIGINT) AS z2
       |FROM pm JOIN st USING (event_type)
       |WHERE st.n >= 2 AND pm.c * st.n - st.s > 0
       |  AND (pm.c * st.n - st.s) * (pm.c * st.n - st.s)
       |      > ${sigmas.toLong * sigmas} * (st.n * st.q - st.s * st.s)""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q107_rate_anomaly", q107, Some(q107Sql()))
  )
}
