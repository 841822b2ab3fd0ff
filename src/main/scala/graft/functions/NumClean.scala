package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the numeric de-formatting path (X2): comma-
  * grouped rendering and messy-numeric cleanup, each value-identical
  * to the expression chain it replaces (pinned in NumCleanSpec).
  * format_number's per-call java.text.DecimalFormat and the three
  * regexp_replace passes were the two hottest scalars in
  * regex_numeric_clean (measured 4.2 s + ~5 s over the 6 M-row sf1
  * lineitem).
  */
case class GroupDigits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"group_digits expects a bigint argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "group_digits"

  override protected def nullSafeEval(input: Any): Any =
    NumClean.groupDigits(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NumClean.groupDigits($c)")

  override protected def withNewChildInternal(newChild: Expression): GroupDigits =
    copy(child = newChild)
}

/** strip "," / canonicalize −–— to "-" / unwrap accounting "(x)" to
  * "-x" — the cleanNumericStr regex chain as one byte pass.
  */
case class CleanNumeric(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"clean_numeric expects a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "clean_numeric"

  override protected def nullSafeEval(input: Any): Any =
    NumClean.cleanNumeric(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NumClean.cleanNumeric($c)")

  override protected def withNewChildInternal(newChild: Expression): CleanNumeric =
    copy(child = newChild)
}

object NumClean {

  /** format_number(n, 0) for longs: decimal digits in groups of three
    * separated by ',' (en-US grouping, no decimals — exactly what
    * DecimalFormat("#,###") produces for a long, including negatives).
    */
  def groupDigits(n: Long): UTF8String = {
    if (n == 0L) return UTF8String.fromString("0")
    // Long.MIN_VALUE-safe via unsigned-style loop on the negation
    val neg = n < 0
    var v = if (neg) n else -n // work in negatives: no overflow at MIN_VALUE
    val buf = new Array[Byte](27) // 19 digits + 6 commas + sign
    var o = buf.length
    var digits = 0
    while (v != 0) {
      if (digits > 0 && digits % 3 == 0) { o -= 1; buf(o) = ',' }
      o -= 1
      buf(o) = ('0' - (v % 10)).toByte
      v /= 10
      digits += 1
    }
    if (neg) { o -= 1; buf(o) = '-' }
    UTF8String.fromBytes(java.util.Arrays.copyOfRange(buf, o, buf.length))
  }

  // UTF-8 encodings of − (U+2212), – (U+2013), — (U+2014)
  @inline private def isDash3(b: Array[Byte], i: Int): Boolean =
    i + 2 < b.length && b(i) == 0xe2.toByte &&
      ((b(i + 1) == 0x88.toByte && b(i + 2) == 0x92.toByte) ||
        (b(i + 1) == 0x80.toByte &&
          (b(i + 2) == 0x93.toByte || b(i + 2) == 0x94.toByte)))

  private val ParenRe = java.util.regex.Pattern.compile("^\\((.*)\\)$")

  /** Ordered exactly like the regex chain: drop every ',', map every
    * −/–/— to '-', then if the RESULT starts with '(' and ends with
    * ')', replace with '-' + inner (the greedy ^\((.*)\)$ rewrite).
    * Java's `.` excludes line terminators and `$` can match before a
    * trailing newline, so inputs containing \n/\r/NEL/LS/PS take the
    * real-regex slow path to stay value-identical.
    */
  def cleanNumeric(s: UTF8String): UTF8String = {
    val b = s.getBytes
    val out = new Array[Byte](b.length)
    var o = 0
    var i = 0
    var lineTerm = false
    while (i < b.length) {
      val c = b(i)
      if (c == ',') i += 1
      else if (c == 0xe2.toByte && isDash3(b, i)) { out(o) = '-'; o += 1; i += 3 }
      else {
        if (c == '\n' || c == '\r' ||
          (c == 0xc2.toByte && i + 1 < b.length && b(i + 1) == 0x85.toByte) ||
          (c == 0xe2.toByte && i + 2 < b.length && b(i + 1) == 0x80.toByte &&
            (b(i + 2) == 0xa8.toByte || b(i + 2) == 0xa9.toByte))) lineTerm = true
        out(o) = c
        o += 1
        i += 1
      }
    }
    if (lineTerm) {
      // slow path: exact Java-regex semantics on the comma/dash-mapped
      // string (reachable only for adversarial inputs, never the data
      // the cleaner exists for)
      val mapped = new String(java.util.Arrays.copyOf(out, o), java.nio.charset.StandardCharsets.UTF_8)
      return UTF8String.fromString(ParenRe.matcher(mapped).replaceAll("-$1"))
    }
    if (o >= 2 && out(0) == '(' && out(o - 1) == ')') {
      out(0) = '-'
      o -= 1
      UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
    } else UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }

  def groupDigits(c: Column): Column =
    ColumnBridge.toColumn(GroupDigits(ColumnBridge.toExpr(c)))
  def cleanNumericStr(c: Column): Column =
    ColumnBridge.toColumn(CleanNumeric(ColumnBridge.toExpr(c)))
}
