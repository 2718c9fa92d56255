package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The user-grain frontier join shared by the incremental-maintenance
  * family (q154 census, q163 spectral, q164 PageRank): per user, the
  * LAST settled item and the FIRST delta item — the single row of state
  * that makes the straddle transition computable without ever lagging
  * settled events (exactly what a streaming job checkpoints). Frontier
  * rows are row_number() over (t, event_id) — unique per user on both
  * engines (no max_by/arg_max tie-semantics risk; the q154 contract).
  * Callers shape the straddle census themselves (q154/q163 pool with
  * least/greatest, q164 keeps direction). */
object Frontier {

  /** (user_id, s_item): each user's LAST settled item — THE frontier
    * artifact a production refresh checkpoints ([[RefreshArtifacts]]
    * persists exactly this frame; the streaming gate keeps it as
    * per-user state). Input is a (user_id, event_id, item, t) slice. */
  def lastOf(settled: DataFrame): DataFrame = settled
    .withColumn("rn", row_number().over(Window.partitionBy(col("user_id"))
      .orderBy(col("t").desc, col("event_id").desc)))
    .filter(col("rn") === 1).select(col("user_id"), col("item").as("s_item"))

  /** (user_id, d_item): each user's FIRST delta item. */
  def firstOf(delta: DataFrame): DataFrame = delta
    .withColumn("rn", row_number().over(Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("event_id"))))
    .filter(col("rn") === 1).select(col("user_id"), col("item").as("d_item"))

  /** (user_id, s_item, d_item) for every user present on BOTH sides of
    * the cut; inputs are (user_id, event_id, item, t) slices. */
  def straddleOf(settled: DataFrame, delta: DataFrame): DataFrame =
    lastOf(settled).join(firstOf(delta), Seq("user_id"))

  /** [[straddleOf]] with the settled side read from a CHECKPOINTED
    * frontier — the artifact-read production path: the settled corpus is
    * never scanned, only the (user_id, s_item) state joins the delta's
    * first items. Bit-identical to [[straddleOf]] by construction
    * (shared [[firstOf]]; [[lastOf]] is what wrote the artifact). */
  def straddleFrom(frontier: DataFrame, delta: DataFrame): DataFrame =
    frontier.select(col("user_id"), col("s_item"))
      .join(firstOf(delta), Seq("user_id"))

  /** The frontier COMPACTION identity: tomorrow's frontier from today's
    * frontier and the delta ALONE — full-outer upsert, the delta's last
    * item winning where a user appears on both sides. Exactly
    * `lastOf(settled ∪ delta)` (a user's last item up to the new cut is
    * their delta last item if they have one, else their settled last) —
    * pinned in RollingRefreshSpec — so the daily loop never needs the
    * settled corpus to roll its state forward (q169). */
  def advance(frontier: DataFrame, deltaLast: DataFrame): DataFrame =
    frontier.select(col("user_id"), col("s_item").as("old_item"))
      .join(deltaLast.select(col("user_id"), col("s_item").as("new_item")),
        Seq("user_id"), "full_outer")
      .select(col("user_id"),
        coalesce(col("new_item"), col("old_item")).as("s_item"))
}
