package graft.ops

import org.apache.spark.sql.DataFrame

/** Continuous-ingestion exact dedup — the streaming face of q11.
  *
  * A training-data pipeline that ingests documents continuously cannot
  * groupBy-dedup an unbounded stream: state for every key ever seen grows
  * without limit. `dropDuplicatesWithinWatermark` keeps the dedup guarantee
  * where it actually matters operationally — duplicates arrive close
  * together (retries, replayed partitions, at-least-once sources) — while
  * the watermark EVICTS key state once no duplicate can still arrive,
  * making state size O(keys per delay window), not O(all history).
  *
  * Trade declared, not hidden: a duplicate arriving later than `delay`
  * after its first occurrence is re-admitted (exactly the cross-run
  * boundary where the batch q11 pass takes over). StreamingSpec pins both
  * sides: in-window duplicates dropped across micro-batches, key
  * re-admitted after the watermark passes.
  */
object StreamingDedup {

  /** Dedup `docs` on `keys`, with state bounded by `delay` past the event
    * time in `eventTimeCol`. */
  def dedup(docs: DataFrame, keys: Seq[String],
            eventTimeCol: String = "event_time", delay: String = "10 minutes"): DataFrame =
    docs.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
}
