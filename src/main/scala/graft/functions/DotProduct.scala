package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dense dot product over two `array<double>` columns.
  *
  * Exactly `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, (acc,x) =>
  * acc+x)` — same sequential fold order (so DuckDB `list_dot_product`
  * parity holds bit-for-bit) and the same null semantics (null array,
  * length mismatch, or null element -> null result) — but as ONE
  * codegen'd loop over the unsafe array data. The expression-tree
  * form allocates an intermediate zipped array and evaluates two
  * lambda closures per element; per-pair in an ANN join that is the
  * hot path (measured: see docs/PLANS.md). The kernel lives in a
  * static method and `doGenCode` emits a single call, so the whole
  * stage stays compiled (the Slugify pattern).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isVec(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (isVec(left.dataType) && isVec(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects two array<double|float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  // Float inputs are accepted directly (widened per element inside the
  // kernel — bit-identical to a cast-then-multiply) so embedding pair
  // joins can ship the raw 4-byte floats instead of a doubled copy:
  // HALF the shuffle bytes of every pairwise vector stage.
  private lazy val leftFloat = left.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }
  private lazy val rightFloat = right.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dotBoxed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftFloat, rightFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Double ${ev.value}_r = graft.functions.DotProduct.dotBoxed($a, $b, $leftFloat, $rightFloat);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
         |""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** Static kernel shared by interpreted eval and generated code.
    * Boxed return: zip_with pads the shorter array with nulls and a
    * null element poisons the whole fold, so mismatched lengths or a
    * null element must yield SQL NULL, not an exception. Float
    * elements widen to double before multiplying — exactly what the
    * cast-transform produced.
    */
  def dotBoxed(a: ArrayData, b: ArrayData,
               aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Column-API entry. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.toColumn(DotProduct(ColumnBridge.toExpr(a), ColumnBridge.toExpr(b)))

  /** SQL registration: `SELECT dot_product(a, b) FROM ...`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs.head, exprs(1)), "scala_udf")
}
