package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the vector hot paths (SURVEY §2.13,
  * §7.3c): pairwise similarity evaluates O(n²) times, and the built-in
  * higher-order-function formulation (`aggregate(zip_with(...))`) is
  * CodegenFallback WITH per-element lambda dispatch and boxing — measured
  * ~30× slower than a primitive loop on the 2M-pair near-dup sweep. These
  * expressions keep the per-row work in one tight JVM loop over the
  * columnar array data (no per-element allocation); per-row overhead is a
  * single virtual call.
  */
object VectorExprs {

  /** Σ aᵢ·bᵢ in double; accepts float or double arrays on either side.
    * Implements doGenCode, so pairwise sweeps stay inside whole-stage
    * codegen (interpreted eval remains as the fallback path). */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      def ok(dt: DataType) = dt match {
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      }
      if (ok(left.dataType) && ok(right.dataType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product needs array<float|double>, got ${left.dataType}, ${right.dataType}")
    }
    @inline private def isFloat(e: Expression): Boolean =
      e.dataType.asInstanceOf[ArrayType].elementType == FloatType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var s = 0.0
      var i = 0
      (isFloat(left), isFloat(right)) match {
        case (true, true) =>
          while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
        case (false, false) =>
          while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
        case (true, false) =>
          while (i < n) { s += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
        case (false, true) =>
          while (i < n) { s += a.getDouble(i) * b.getFloat(i).toDouble; i += 1 }
      }
      s
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (n, i, acc) = (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("acc"))
        def get(arr: String, e: Expression) =
          if (isFloat(e)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += ${get(a, left)} * ${get(b, right)};
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(newLeft, newRight)
  }

  /** Count of positions where two long arrays agree (MinHash signature
    * agreement; estimated Jaccard = agree / k). Codegen'd like DotProduct. */
  case class LongArrayAgree(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var c = 0
      var i = 0
      while (i < n) { if (a.getLong(i) == b.getLong(i)) c += 1; i += 1 }
      c
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (n, i, acc) = (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("acc"))
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |int $acc = 0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.getLong($i) == $b.getLong($i)) $acc++;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(newLeft, newRight)
  }

  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def x(col: Column): Expression = ColumnBridge.expression(col)

  def dotProduct(a: Column, b: Column): Column = c(DotProduct(x(a), x(b)))
  def longArrayAgree(a: Column, b: Column): Column = c(LongArrayAgree(x(a), x(b)))
}
