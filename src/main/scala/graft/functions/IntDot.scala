package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd int64 dot product over two `array<bigint>` columns
  * — the SemDeDup/vector-curation pair-similarity kernel (r17, guide
  * "eliminate non-codegen expressions in the hot path").
  *
  * The composable formulation — `aggregate(zip_with(a, b, (x, y) ->
  * x * y), 0L, (s, x) -> s + x)` — materializes the zipped product
  * array and walks it through interpreted lambda evaluation, PER
  * CANDIDATE PAIR of the within-cell join (the dominant stage of
  * q53/q60/q61: cells of ≤ maxCell vectors explode to ~cell²/2 pairs).
  * This expression is one fused loop inside whole-stage codegen.
  *
  * Arithmetic is bit-identical to the HOF fold: long multiply then
  * left-to-right long addition, both wrapping on overflow the same way
  * (the quantized milli-unit vectors keep every product far inside
  * int64 anyway — |q|≤~10⁴, dim 64 ⇒ |dot| ≤ 6.4·10⁹). NULL in → NULL
  * out (standard binary-expression semantics); mismatched lengths fold
  * the common prefix (callers guarantee fixed-dim vectors). */
case class IntDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"int_dot requires two array<bigint> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "int_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L
    var i = 0
    while (i < n) {
      dot += x.getLong(i) * y.getLong(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $dot = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntDot {
  /** Register `int_dot(a, b)` in the session's function registry so it
    * is usable from `expr(...)` and SQL text. Idempotent. */
  def register(spark: SparkSession): Unit = {
    if (spark.sessionState.functionRegistry
          .functionExists(FunctionIdentifier("int_dot"))) return
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("int_dot"),
      new ExpressionInfo(classOf[IntDot].getName, "int_dot"),
      (children: Seq[Expression]) => IntDot(children.head, children(1)))
  }
}

/** Native codegen'd int64 squared-L2 distance over two `array<bigint>`
  * columns — the Lloyd assignment kernel (KMeans.assign evaluates it per
  * point per centroid; the HOF formulation paid three interpreted lambda
  * walks and a zipped temp array per evaluation). Same wrap-on-overflow
  * long arithmetic and left-to-right fold as the HOF it replaces. */
case class IntL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"int_l2 requires two array<bigint> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "int_l2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntL2 {
  /** Register `int_l2(a, b)`. Idempotent. */
  def register(spark: SparkSession): Unit = {
    if (spark.sessionState.functionRegistry
          .functionExists(FunctionIdentifier("int_l2"))) return
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("int_l2"),
      new ExpressionInfo(classOf[IntL2].getName, "int_l2"),
      (children: Seq[Expression]) => IntL2(children.head, children(1)))
  }
}
