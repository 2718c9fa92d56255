package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import scala.collection.mutable

/** Misra-Gries heavy-hitters sketch: at most `k` counters, O(k) memory per
  * group regardless of stream length — the scale answer to "which keys are
  * hot" where an exact per-key count would shuffle the full key space.
  *
  * Guarantees (Misra-Gries 1982; merge rule per the mergeable-summaries
  * construction): estimates only undercount, by at most n/(k+1); any item
  * with true frequency > n/(k+1) keeps a positive counter and therefore
  * SURVIVES — and both properties hold for every partition/merge order, so
  * a verification contract on them is deterministic even though the exact
  * counter values are not (q37 exploits exactly this).
  *
  * `reduce` uses the textbook decrement-all-on-overflow (O(k) on a miss —
  * fine for k ≤ a few hundred; a min-heap variant pays off beyond that);
  * `merge` sums counters, then subtracts the (k+1)-th largest value and
  * drops non-positives, which preserves the error bound under arbitrary
  * merge trees.
  */
class FreqItems(k: Int) extends Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]] {
  require(k >= 1)

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(m: mutable.HashMap[String, Long], w: String): mutable.HashMap[String, Long] = {
    if (m.contains(w)) m(w) += 1L
    else if (m.size < k) m(w) = 1L
    else {
      val dead = mutable.ArrayBuffer.empty[String]
      m.keysIterator.foreach { key =>
        val v = m(key) - 1L
        if (v <= 0L) dead += key else m(key) = v
      }
      dead.foreach(m.remove)
    }
    m
  }

  override def merge(m1: mutable.HashMap[String, Long], m2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    m2.foreach { case (w, c) => m1(w) = m1.getOrElse(w, 0L) + c }
    if (m1.size > k) {
      val d = m1.values.toArray.sorted(Ordering[Long].reverse)(k) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      m1.keysIterator.foreach { key =>
        val v = m1(key) - d
        if (v <= 0L) dead += key else m1(key) = v
      }
      dead.foreach(m1.remove)
    }
    m1
  }

  override def finish(m: mutable.HashMap[String, Long]): Map[String, Long] = m.toMap
  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}

object FreqItems {
  /** k=50 heavy-hitter sketch as a Column aggregate over a string column. */
  val top50 = udaf(new FreqItems(50))
}
