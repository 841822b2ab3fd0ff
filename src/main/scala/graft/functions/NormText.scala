package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text normalization: value-identical to the composed
  * `lower(trim(regexp_replace(regexp_replace(c, '[^a-zA-Z0-9\s]', ' '),
  * '\s+', ' ')))` pipeline (and the DuckDB oracle's same regex chain)
  * in ONE byte pass with zero regex.
  *
  * Why the single pass is exact: the first regex maps every char
  * outside [a-zA-Z0-9\s] to a space (Java \s is ASCII-only, so every
  * non-ASCII byte becomes a separator too); collapse + trim then leave
  * exactly the maximal [a-zA-Z0-9] runs joined by single spaces; lower
  * acts on pure ASCII. I.e. the normalized string IS
  * `norm_tokens(c).mkString(" ")` — the same run scan as the
  * [[NormTokens]] kernel, emitted into one byte buffer instead of an
  * array. Token-free input normalizes to "" (trim of all-separator
  * text), matching the regex chain.
  *
  * normText sits under char_entropy, doc_fingerprint, text_quality,
  * normalize_text and every charShingles call site — at sf1 the two
  * regex passes alone measured ~2 s of every such query's scan.
  */
case class NormText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"norm_text expects a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "norm_text"

  override protected def nullSafeEval(input: Any): Any =
    NormText.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormText.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormText =
    copy(child = newChild)
}

object NormText {

  /** Static kernel: maximal [a-zA-Z0-9] runs, ASCII-lowercased, joined
    * by single spaces.
    */
  def normalize(s: UTF8String): UTF8String = {
    val b = s.getBytes
    val n = b.length
    val out = new Array[Byte](n)
    var o = 0
    var i = 0
    while (i < n) {
      while (i < n && !isTok(b(i))) i += 1
      if (i < n) {
        if (o > 0) { out(o) = ' '; o += 1 }
        while (i < n && isTok(b(i))) {
          val c = b(i)
          out(o) = if (c >= 'A' && c <= 'Z') (c + 32).toByte else c
          o += 1
          i += 1
        }
      }
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }

  @inline private def isTok(c: Byte): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  /** Column-API entry. */
  def normText(c: Column): Column =
    ColumnBridge.toColumn(NormText(ColumnBridge.toExpr(c)))
}
