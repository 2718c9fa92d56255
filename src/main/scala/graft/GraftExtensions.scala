package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Session-extension injector for the engine's native expressions —
  * the idiomatic deployment path on a cluster:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *
  * makes `cosine_sim(a, b)`, `word_ngrams(ws, n)` and
  * `minhash_signatures(arr, k)` available in SQL text and `expr(...)` on
  * every session, including Thrift/Connect sessions where driver-side
  * `register(spark)` calls are not reachable. The operator code paths also
  * self-register at first use, so the extension is optional for embedded
  * library use.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[graft.functions.CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => graft.functions.CosineSim(args.head, args(1))))
    ext.injectFunction((
      FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[graft.functions.WordNGrams].getName, "word_ngrams"),
      (args: Seq[Expression]) => graft.functions.WordNGrams(args.head, intLit(args(1), "n"))))
    ext.injectFunction((
      FunctionIdentifier("minhash_signatures"),
      new ExpressionInfo(classOf[graft.functions.MinhashSignatures].getName, "minhash_signatures"),
      (args: Seq[Expression]) => graft.functions.MinhashSignatures(args.head, intLit(args(1), "k"))))
    ext.injectFunction((
      FunctionIdentifier("ordered_pairs"),
      new ExpressionInfo(classOf[graft.functions.OrderedPairs].getName, "ordered_pairs"),
      (args: Seq[Expression]) => graft.functions.OrderedPairs(args.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash_fingerprint"),
      new ExpressionInfo(classOf[graft.functions.SimhashFingerprint].getName, "simhash_fingerprint"),
      (args: Seq[Expression]) => graft.functions.SimhashFingerprint(args.head)))
  }
}
