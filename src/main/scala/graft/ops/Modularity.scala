package graft.ops

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Modularity census of the q149 LPA partition over the support backbone
  * (q151) — the number that says whether the communities are REAL:
  * Newman–Girvan modularity Q = Σ_c [e_c/m − (d_c/2m)²], the intra-edge
  * share of each community minus what a degree-preserving random rewiring
  * would put there. Q ≈ 0 means q149's labels describe noise; the census
  * reports per-community contributions so a curator can see WHICH
  * communities carry structure before sharding or sampling by them.
  *
  * Exact integer form (both engines, bit-identical): with M2 = 2m =
  * Σ_c d_c (the handshake identity — M2 derives from the census itself
  * via an empty-window sum, the q145 posture, so no second edge pass and
  * no BNLJ anywhere), contrib_c = 2·M2·e_c − d_c², and
  * Q·M2² = Σ_c contrib_c;  q_ppm = (Σ contrib)·10⁶ div M2². Both engines
  * truncate integer division toward zero (verified incl. negative
  * quotients), and the ppm product stages through DECIMAL(38,0) /
  * HUGEINT. Int64 bound: |contrib_c| ≤ M2², so the int64 ceiling is
  * M2 < 3·10⁹ backbone half-edges — far above any vocab²-bounded census.
  *
  * Scale shape: degrees and intra-edge counts are one aggregation each
  * over the persisted backbone joined to the CHECKPOINTED label table
  * (three label readers — dStats + both edge endpoints — so the sweep
  * result materializes once); everything else lives on the
  * ≤|communities|-row census. The sweep itself is [[Lpa.sweep]] — the
  * SAME loop q149 runs, as the oracle shares [[Lpa.lpaSweepCtes]], so
  * q151's communities can never drift from q149's (spec-pinned). */
object Modularity {

  /** (community, n_nodes, e_intra, d_total, contrib, q_ppm) for a
    * canonical (a < b) edge list `strong` (persisted by the caller) and
    * a node→label table `labels` (v, lbl; checkpointed/persisted by the
    * caller — it is read three times). q_ppm repeats the global scalar
    * on every census row, like q145's share denominator. */
  def modularityCensusOf(strong: DataFrame, labels: DataFrame): DataFrame = {
    val deg = strong.select(col("a").as("v")).unionAll(strong.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val dStats = deg.join(labels, Seq("v"))
      .groupBy(col("lbl")).agg(count(lit(1)).as("n_nodes"), sum(col("d")).as("d_total"))
    val eIntra = strong
      .join(labels.select(col("v").as("a"), col("lbl").as("la")), Seq("a"))
      .join(labels.select(col("v").as("b"), col("lbl").as("lb")), Seq("b"))
      .filter(col("la") === col("lb"))
      .groupBy(col("la")).agg(count(lit(1)).as("e_intra"))
      .withColumnRenamed("la", "lbl")
    val w = Window.partitionBy() // census-grain global folds (q145 posture)
    dStats.join(eIntra, Seq("lbl"), "left")
      .select(col("lbl"), col("n_nodes"),
        coalesce(col("e_intra"), lit(0L)).as("e_intra"), col("d_total"))
      .withColumn("two_m", sum(col("d_total")).over(w))
      .withColumn("contrib",
        lit(2L) * col("two_m") * col("e_intra") - col("d_total") * col("d_total"))
      .select(col("lbl").as("community"), col("n_nodes"), col("e_intra"),
        col("d_total"), col("contrib"),
        expr("""CAST(sum(contrib) OVER () AS DECIMAL(38,0)) * 1000000
                div (CAST(two_m AS DECIMAL(38,0)) * two_m)""").as("q_ppm"))
  }

  // ---------------------------------------------------------------- q151
  def q151(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.table(spark, sfDir, "events")
    // r16: checkpoint, not keyed persist — truncates the corpus lineage
    // out of every census-grain downstream plan (SpectralEmbed.ppmiMatOf)
    val pw = Triangles.weightedItemGraphOf(ev, Tables.tsMicros(ev))
      .localCheckpoint()
    // r16: checkpoints, not keyed persists — lineage truncation (ppmiMatOf)
    val strong = Backbone.backboneOf(pw).localCheckpoint()
    val adj =
      strong.select(col("a").as("c"), col("b").as("n"))
        .unionAll(strong.select(col("b").as("c"), col("a").as("n")))
        .localCheckpoint()
    val lbl = Lpa.sweep(adj, Lpa.DefaultRounds).localCheckpoint() // 3 readers
    modularityCensusOf(strong, lbl)
  }

  /** Mirror of [[modularityCensusOf]] over [[Backbone.backboneCtes]] +
    * [[Lpa.lpaSweepCtes]] (the labels live in l`rounds`). */
  private def q151Sql(rounds: Int = Lpa.DefaultRounds): String =
    s"""${Backbone.backboneCtes()}${Lpa.lpaSweepCtes(rounds)},
       |sd AS (SELECT v, CAST(count(*) AS BIGINT) AS d
       |       FROM (SELECT a AS v FROM strong UNION ALL SELECT b FROM strong) u
       |       GROUP BY v),
       |ds AS (SELECT l.lbl, CAST(count(*) AS BIGINT) AS n_nodes,
       |              CAST(sum(sd.d) AS BIGINT) AS d_total
       |       FROM sd JOIN l$rounds l ON sd.v = l.v GROUP BY l.lbl),
       |ei AS (SELECT la.lbl, CAST(count(*) AS BIGINT) AS e_intra
       |       FROM strong s JOIN l$rounds la ON s.a = la.v
       |                     JOIN l$rounds lb ON s.b = lb.v
       |       WHERE la.lbl = lb.lbl GROUP BY la.lbl),
       |cen AS (SELECT ds.lbl AS community, ds.n_nodes,
       |               CAST(COALESCE(ei.e_intra, 0) AS BIGINT) AS e_intra, ds.d_total,
       |               sum(ds.d_total) OVER () AS two_m
       |        FROM ds LEFT JOIN ei ON ds.lbl = ei.lbl)
       |SELECT community, n_nodes, e_intra, d_total,
       |       CAST(2 * two_m * e_intra - d_total * d_total AS BIGINT) AS contrib,
       |       CAST(sum(2 * two_m * e_intra - d_total * d_total) OVER () * 1000000
       |            // (two_m * two_m) AS BIGINT) AS q_ppm
       |FROM cen""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q151_modularity", q151, Some(q151Sql())))
}
