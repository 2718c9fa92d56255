package graft.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k by (score desc, id asc) as a partial-aggregation-capable
  * Aggregator — the scale-correct alternative to
  * `row_number().over(Window.partitionBy(query)).filter(rank <= k)` for
  * similarity search.
  *
  * The window formulation shuffles EVERY scored candidate row to the
  * query's reducer before discarding all but k; this aggregator's `reduce`
  * runs map-side, so the exchange carries at most k rows per (query ×
  * input partition) — at a billion candidates per query that is the
  * difference between shuffling 10⁹ rows and shuffling k·partitions.
  *
  * Buffer: a sorted array capped at k (insertion keeps order; k is small).
  * Output: candidates sorted by (score desc, id asc) — deterministic
  * tie-break so oracle hashes are stable.
  */
class TopK(k: Int) extends Aggregator[ScoredId, Array[ScoredId], Array[ScoredId]] {

  private def lt(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Array[ScoredId] = Array.empty

  override def reduce(buf: Array[ScoredId], x: ScoredId): Array[ScoredId] =
    if (buf.length >= k && !lt(x, buf(buf.length - 1))) buf
    else {
      val pos = buf.indexWhere(e => lt(x, e)) match { case -1 => buf.length; case p => p }
      val out = new Array[ScoredId](math.min(buf.length + 1, k))
      Array.copy(buf, 0, out, 0, pos)
      out(pos) = x
      Array.copy(buf, pos, out, pos + 1, math.min(buf.length - pos, k - pos - 1))
      out
    }

  override def merge(b1: Array[ScoredId], b2: Array[ScoredId]): Array[ScoredId] =
    b2.foldLeft(b1)(reduce)

  override def finish(b: Array[ScoredId]): Array[ScoredId] = b

  override def bufferEncoder: Encoder[Array[ScoredId]] = Encoders.kryo[Array[ScoredId]]
  override def outputEncoder: Encoder[Array[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[ScoredId]]()
}

case class ScoredId(score: Double, id: Long)

object TopK {
  /** `TopK(5)(col("sim"), col("vec_id"))` → array<struct<score,id>> sorted
    * by (score desc, id asc), length ≤ k. (The case-class input encoder
    * flattens to two call parameters.) */
  def apply(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopK(k), org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[ScoredId]())
    (score, id) => fn(score, id)
  }
}

/** String-payload sibling of [[TopK]]: top-k by (count desc, word asc) —
  * the vocabulary-building shape. Same bounded map-side buffer. */
class TopWords(k: Int) extends Aggregator[CountedWord, Array[CountedWord], Array[CountedWord]] {

  private def lt(a: CountedWord, b: CountedWord): Boolean =
    a.n > b.n || (a.n == b.n && a.w < b.w)

  override def zero: Array[CountedWord] = Array.empty

  override def reduce(buf: Array[CountedWord], x: CountedWord): Array[CountedWord] =
    if (buf.length >= k && !lt(x, buf(buf.length - 1))) buf
    else {
      val pos = buf.indexWhere(e => lt(x, e)) match { case -1 => buf.length; case p => p }
      val out = new Array[CountedWord](math.min(buf.length + 1, k))
      Array.copy(buf, 0, out, 0, pos)
      out(pos) = x
      Array.copy(buf, pos, out, pos + 1, math.min(buf.length - pos, k - pos - 1))
      out
    }

  override def merge(b1: Array[CountedWord], b2: Array[CountedWord]): Array[CountedWord] =
    b2.foldLeft(b1)(reduce)

  override def finish(b: Array[CountedWord]): Array[CountedWord] = b

  override def bufferEncoder: Encoder[Array[CountedWord]] = Encoders.kryo[Array[CountedWord]]
  override def outputEncoder: Encoder[Array[CountedWord]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[CountedWord]]()
}

case class CountedWord(n: Long, w: String)

object TopWords {
  def apply(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopWords(k), org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[CountedWord]())
    (n, w) => fn(n, w)
  }
}
