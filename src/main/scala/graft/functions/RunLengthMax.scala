package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Longest run of equal adjacent elements in a SORTED string array —
  * i.e. the count of the most frequent element — as one native pass.
  *
  * Value-identical to the `aggregate(sorted, struct(prev,run,best), …)`
  * fold it replaces (QualityFilters.maxRunLength), including the fold's
  * exact seed semantics: prev starts as "" with run 0, so a leading ""
  * element (the tokenizer's empty-doc sentinel) continues the seed run
  * and counts 1. The expression-tree fold allocates a 3-field struct
  * per element and evaluates a CASE chain per step; this kernel is an
  * adjacent-compare loop over the array — and, being a leaf call, it is
  * also immune to predicate-pushdown tree substitution (the CharStats
  * lesson: a pushed filter re-inlines a HOF's lambda operand per
  * element).
  */
case class RunLengthMax(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"run_length_max expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "run_length_max"

  override protected def nullSafeEval(input: Any): Any =
    RunLengthMax.maxRun(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RunLengthMax.maxRun($c)")

  override protected def withNewChildInternal(newChild: Expression): RunLengthMax =
    copy(child = newChild)
}

object RunLengthMax {

  /** Static kernel: fold seed is prev = "", run = 0 — a leading empty
    * string extends the seed run (run 1), any other first element
    * starts at 1; null elements break the run like the fold's `===`
    * (null-safe CASE falls to the otherwise-branch).
    */
  def maxRun(a: ArrayData): Long = {
    val n = a.numElements()
    var best = 0L
    var run = 0L
    var prev: org.apache.spark.unsafe.types.UTF8String =
      org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) {
        run = 1L // CASE(null === prev) -> otherwise(1); prev becomes null
        prev = null
      } else {
        val cur = a.getUTF8String(i)
        run = if (prev != null && cur.equals(prev)) run + 1L else 1L
        prev = cur
      }
      if (run > best) best = run
      i += 1
    }
    best
  }

  /** Column-API entry: `sorted` MUST be an array_sort'ed attribute. */
  def runLengthMax(sorted: Column): Column =
    ColumnBridge.toColumn(RunLengthMax(ColumnBridge.toExpr(sorted)))
}
