package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for float-vector math (SURVEY.md §2.11:
  * "promote hot ones to codegen'd Expressions").
  *
  * The higher-order-function forms (`aggregate(zip_with(...))`) are
  * interpreted per element — closure dispatch and boxed doubles on every
  * coordinate. These expressions generate a tight primitive Java loop
  * inside whole-stage codegen: one virtual call per ROW instead of ~4 per
  * COORDINATE. At 64-d × millions of pairs (medoids, ANN, LSH verify) that
  * is the hot path of the engine.
  *
  * Math is (double)float accumulation in index order — bit-identical to
  * the HOF forms and to the DuckDB oracle's CAST(v AS DOUBLE) sums.
  */
abstract class FloatVecBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> args, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  /** Java statements: given array vars `a`,`b` and length var `n`,
    * accumulate into double var `acc` at index `i`.
    */
  protected def combine(a: String, b: String, i: String): String
  protected def combineEval(x: ArrayData, y: ArrayData, i: Int): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += combineEval(x, y, i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += ${combine(a, b, i)};
        }
        ${ev.value} = $acc;
      """
    })
}

/** Σ aᵢ·bᵢ */
case class FloatVecDot(left: Expression, right: Expression) extends FloatVecBinary {
  override def prettyName: String = "vec_dot"
  protected def combine(a: String, b: String, i: String): String =
    s"(double)$a.getFloat($i) * (double)$b.getFloat($i)"
  protected def combineEval(x: ArrayData, y: ArrayData, i: Int): Double =
    x.getFloat(i).toDouble * y.getFloat(i).toDouble
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ−bᵢ)² */
case class FloatVecSqDist(left: Expression, right: Expression) extends FloatVecBinary {
  override def prettyName: String = "vec_sqdist"
  protected def combine(a: String, b: String, i: String): String =
    s"((double)$a.getFloat($i) - (double)$b.getFloat($i)) * ((double)$a.getFloat($i) - (double)$b.getFloat($i))"
  protected def combineEval(x: ArrayData, y: ArrayData, i: Int): Double = {
    val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
    d * d
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecSqDist =
    copy(left = newLeft, right = newRight)
}

object VecExprs {
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(FloatVecDot(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  def sqDist(a: Column, b: Column): Column =
    GraftSqlBridge.column(FloatVecSqDist(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}

/** SQL surface: `spark.sql.extensions=graft.functions.GraftExtensions`
  * registers vec_dot / vec_sqdist for SQL users.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => FloatVecDot(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("vec_sqdist"),
      new ExpressionInfo(classOf[FloatVecSqDist].getName, "vec_sqdist"),
      (args: Seq[Expression]) => FloatVecSqDist(args(0), args(1))))
  }
}
