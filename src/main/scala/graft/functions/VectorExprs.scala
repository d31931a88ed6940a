package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding hot path.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) is interpreted, not
  * codegen'd, and allocates a zipped intermediate array per row — per
  * PAIR in a similarity self-join. These expressions generate a tight
  * primitive loop over the two `ArrayData` (whole-stage codegen, zero
  * allocation), with bit-identical results: the same left-to-right
  * double accumulation order as the fold they replace.
  *
  * Null semantics match the HOF versions: null input → null; mismatched
  * lengths → null (zip_with pads with null, which poisons the sum).
  */
object VectorExprs {

  private[graft] def elemOf(dt: DataType): DataType = dt match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  private[graft] def checkVec(name: String, dts: DataType*): TypeCheckResult = {
    val ok = dts.forall {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    } && dts.map(elemOf).distinct.size == 1
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires two array<float> or two array<double> arguments, got ${dts.mkString(", ")}")
  }

  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def l2norm(a: Column): Column =
    GraftColumnBridge.column(L2Norm(GraftColumnBridge.expression(a)))
}

/** Sequential-order dot product of two equal-typed float/double
  * arrays, accumulated in double. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.checkVec(prettyName, left.dataType, right.dataType)

  private def isFloat = VectorExprs.elemOf(left.dataType) == FloatType

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    if (isFloat) while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    else while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lg = left.genCode(ctx)
    val rg = right.genCode(ctx)
    val get = if (isFloat) "getFloat" else "getDouble"
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val s = ctx.freshName("s")
    ev.copy(code =
      code"""
        ${lg.code}
        ${rg.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${lg.isNull} && !${rg.isNull}) {
          int $n = ${lg.value}.numElements();
          if ($n == ${rg.value}.numElements()) {
            ${ev.isNull} = false;
            double $s = 0.0;
            for (int $i = 0; $i < $n; $i++) {
              $s += (double) ${lg.value}.$get($i) * (double) ${rg.value}.$get($i);
            }
            ${ev.value} = $s;
          }
        }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sequential-order euclidean norm: sqrt of the in-order sum of
  * squares, accumulated in double. */
case class L2Norm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_l2norm"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.checkVec(prettyName, child.dataType, child.dataType)

  private def isFloat = VectorExprs.elemOf(child.dataType) == FloatType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var s = 0.0
    var i = 0
    if (isFloat) while (i < n) { val v = a.getFloat(i).toDouble; s += v * v; i += 1 }
    else while (i < n) { val v = a.getDouble(i); s += v * v; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
        int $n = $c.numElements();
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $v = (double) $c.$get($i);
          $s += $v * $v;
        }
        ${ev.value} = java.lang.Math.sqrt($s);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
