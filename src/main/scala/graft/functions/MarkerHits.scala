package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of array elements contained in a small FIXED marker set —
  * native form of `size(filter(toks, t => array_contains(lit(words),
  * t)))` (language-ID / stopword-ratio scoring). The composed form
  * evaluates an interpreted lambda per element and scans the literal
  * array per comparison; this kernel compares each token against the
  * marker list (tiny, fixed at plan time) with UTF8String.equals.
  * Null elements never match (array_contains semantics).
  */
case class MarkerHits(child: Expression, words: Seq[String]) extends UnaryExpression {
  require(words.nonEmpty, "marker set must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"marker_hits expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "marker_hits"

  @transient private lazy val set: Array[UTF8String] =
    words.map(UTF8String.fromString).toArray

  override protected def nullSafeEval(input: Any): Any =
    MarkerHits.hits(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship the marker set as a reference object into the generated class
    val setRef = ctx.addReferenceObj("markerSet", set, "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.MarkerHits.hits($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): MarkerHits =
    copy(child = newChild)
}

object MarkerHits {

  /** Static kernel: linear probe of the tiny marker array per token. */
  def hits(arr: ArrayData, set: Array[UTF8String]): Long = {
    val n = arr.numElements()
    var count = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        var j = 0
        var found = false
        while (j < set.length && !found) {
          if (t.equals(set(j))) found = true
          j += 1
        }
        if (found) count += 1
      }
      i += 1
    }
    count
  }

  /** Column-API entry: `toks` a materialized attribute, `words` a
    * fixed marker vocabulary.
    */
  def markerHits(toks: Column, words: Seq[String]): Column =
    ColumnBridge.toColumn(MarkerHits(ColumnBridge.toExpr(toks), words))
}
