package graft.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import scala.reflect.ClassTag

/** Bounded top-k as a partial-aggregation-capable Aggregator — the
  * scale-correct alternative to
  * `row_number().over(Window.partitionBy(g)).filter(rank <= k)`.
  *
  * The window formulation shuffles EVERY scored candidate row to the
  * group's reducer before discarding all but k; this aggregator's `reduce`
  * runs map-side, so the exchange carries at most k rows per (group ×
  * input partition) — at a billion candidates per group that is the
  * difference between shuffling 10⁹ rows and shuffling k·partitions.
  *
  * Buffer: a sorted array capped at k (insertion keeps order; k is small).
  * Output preserves the sort — a deterministic total order (subclasses
  * tie-break on the payload) so oracle hashes are stable.
  */
abstract class BoundedTopK[T >: Null <: AnyRef : ClassTag](k: Int)
    extends Aggregator[T, Array[T], Array[T]] {

  /** Strict total order: a ranks before b. */
  protected def lt(a: T, b: T): Boolean

  final override def zero: Array[T] = Array.empty

  final override def reduce(buf: Array[T], x: T): Array[T] =
    if (buf.length >= k && !lt(x, buf(buf.length - 1))) buf
    else {
      val pos = buf.indexWhere(e => lt(x, e)) match { case -1 => buf.length; case p => p }
      val out = new Array[T](math.min(buf.length + 1, k))
      Array.copy(buf, 0, out, 0, pos)
      out(pos) = x
      Array.copy(buf, pos, out, pos + 1, math.min(buf.length - pos, k - pos - 1))
      out
    }

  final override def merge(b1: Array[T], b2: Array[T]): Array[T] =
    b2.foldLeft(b1)(reduce)

  final override def finish(b: Array[T]): Array[T] = b

  override def bufferEncoder: Encoder[Array[T]] = Encoders.kryo[Array[T]]
}

case class ScoredId(score: Double, id: Long)

/** Top-k by (score desc, id asc) — similarity search. */
class TopK(k: Int) extends BoundedTopK[ScoredId](k) {
  override protected def lt(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)
  override def outputEncoder: Encoder[Array[ScoredId]] = ExpressionEncoder[Array[ScoredId]]()
}

object TopK {
  /** `TopK(5)(col("sim"), col("vec_id"))` → array<struct<score,id>> sorted
    * by (score desc, id asc), length ≤ k. (The case-class input encoder
    * flattens to two call parameters.) */
  def apply(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopK(k), ExpressionEncoder[ScoredId]())
    (score, id) => fn(score, id)
  }
}

case class CountedWord(n: Long, w: String)

/** Top-k by (count desc, word asc) — vocabulary building. */
class TopWords(k: Int) extends BoundedTopK[CountedWord](k) {
  override protected def lt(a: CountedWord, b: CountedWord): Boolean =
    a.n > b.n || (a.n == b.n && a.w < b.w)
  override def outputEncoder: Encoder[Array[CountedWord]] = ExpressionEncoder[Array[CountedWord]]()
}

object TopWords {
  def apply(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopWords(k), ExpressionEncoder[CountedWord]())
    (n, w) => fn(n, w)
  }
}

case class ScoredTerm(score: Double, term: String)

/** Top-k by (score desc, term asc) — TF-IDF / keyword extraction. */
class TopTerms(k: Int) extends BoundedTopK[ScoredTerm](k) {
  override protected def lt(a: ScoredTerm, b: ScoredTerm): Boolean =
    a.score > b.score || (a.score == b.score && a.term < b.term)
  override def outputEncoder: Encoder[Array[ScoredTerm]] = ExpressionEncoder[Array[ScoredTerm]]()
}

object TopTerms {
  def apply(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopTerms(k), ExpressionEncoder[ScoredTerm]())
    (score, term) => fn(score, term)
  }
}
