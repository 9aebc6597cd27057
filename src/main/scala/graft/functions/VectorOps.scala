package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two ArrayType(DoubleType) columns.
  *
  * SURVEY §4.3 reserved this exact escalation: "start with
  * zip_with+aggregate built-ins; only if BENCH demands, add a codegen
  * Expression". BENCH demanded — the higher-order-function form allocates a
  * zipped array per row and evaluates a lambda per element, costing ~100×
  * the arithmetic on the all-pairs similarity queries. This expression
  * compiles to a bare fused multiply-add loop over the two UnsafeArrayData
  * buffers (no allocation, stays inside whole-stage codegen), and its
  * accumulation order (index 0..n-1, left to right) is IDENTICAL to both
  * the previous `aggregate(zip_with(...))` form and DuckDB's
  * list_dot_product — bit-for-bit the same IEEE result, so oracle parity is
  * unchanged.
  *
  * Assumes non-null elements (enforced upstream: embeddings are dense
  * float vectors cast to double). Shorter of the two lengths bounds the
  * loop, matching zip_with(x*y) + aggregate semantics where a longer tail
  * would contribute null*value = null; our vectors are equal-length so the
  * case never arises.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorOps {
  /** Column-level dot product; both sides must be array<double>. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
