package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-string character statistics for the entropy signal.
  *
  * The expression-tree form — explode the string into a 1-char array
  * (`transform(sequence, substr)`), `array_sort` it, run-length fold —
  * allocates one UTF8String per character and comparison-sorts them,
  * all interpreted (HOF lambdas don't codegen). Measured 42.8 s for
  * the 50 k-doc sf1 corpus; these kernels do ONE O(n) counting pass
  * per row (ASCII fast path + treemap overflow) and read out the
  * statistics in ascending-codepoint order — the same term order as
  * `list_sort(list_distinct(chars))` in the DuckDB oracle, because
  * UTF-8 byte order is codepoint order. Same value, ~50x cheaper.
  *
  * Kernels are static methods; `doGenCode` emits one call (the
  * Slugify/Hash60 pattern) so whole-stage codegen keeps the row loop
  * compiled.
  */
case class CharDistinct(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_distinct expects a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_distinct"
  override protected def nullSafeEval(input: Any): Any =
    CharStats.distinctCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharStats.distinctCount($c)")
  override protected def withNewChildInternal(newChild: Expression): CharDistinct =
    copy(child = newChild)
}

/** Σ r·ln(r) over per-codepoint counts r, ascending codepoint order. */
case class CharRlnR(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_rlnr expects a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_rlnr"
  override protected def nullSafeEval(input: Any): Any =
    CharStats.rLnR(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharStats.rLnR($c)")
  override protected def withNewChildInternal(newChild: Expression): CharRlnR =
    copy(child = newChild)
}

/** Count of codepoints in a fixed character class — native form of
  * `size(regexp_extract_all(text, cls, 0))` for the single-char
  * classes the quality signals use (each matched char = one element):
  * `punct` = [^a-zA-Z0-9\s] (Java \s is ASCII-only, so every non-ASCII
  * codepoint counts), `upper` = [A-Z], `cjk` = [一-鿿]
  * (U+4E00–U+9FFF, the language-ID CJK block).
  */
case class CharClassCount(child: Expression, cls: String) extends UnaryExpression {
  require(cls == "punct" || cls == "upper" || cls == "cjk", s"unknown class $cls")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_class_count expects a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"char_count_$cls"
  private def kernel: String = cls match {
    case "punct" => "punctCount"
    case "upper" => "upperCount"
    case _ => "cjkCount"
  }
  override protected def nullSafeEval(input: Any): Any = cls match {
    case "punct" => CharStats.punctCount(input.asInstanceOf[UTF8String])
    case "upper" => CharStats.upperCount(input.asInstanceOf[UTF8String])
    case _ => CharStats.cjkCount(input.asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharStats.$kernel($c)")
  override protected def withNewChildInternal(newChild: Expression): CharClassCount =
    copy(child = newChild)
}

object CharStats {

  /** Per-codepoint counts: int[128] ASCII fast path, sorted-map
    * overflow for the rest. Returns (asciiCounts, overflow).
    */
  private def counts(s: UTF8String): (Array[Long], java.util.TreeMap[Integer, Long]) = {
    val ascii = new Array[Long](128)
    var overflow: java.util.TreeMap[Integer, Long] = null
    val str = s.toString
    var i = 0
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (overflow == null) overflow = new java.util.TreeMap[Integer, Long]()
        val prev = overflow.get(cp)
        overflow.put(cp, if (prev == null) 1L else prev + 1L)
      }
      i += Character.charCount(cp)
    }
    (ascii, overflow)
  }

  def distinctCount(s: UTF8String): Long = {
    val (ascii, overflow) = counts(s)
    var d = 0L
    var i = 0
    while (i < 128) { if (ascii(i) > 0) d += 1; i += 1 }
    if (overflow != null) d += overflow.size()
    d
  }

  /** Σ r·ln(r), ascending codepoint (ASCII block first, then the
    * sorted overflow map — codepoint order == UTF-8 byte order, the
    * order `array_sort`/`list_sort` of 1-char strings produces).
    */
  def rLnR(s: UTF8String): Double = {
    val (ascii, overflow) = counts(s)
    var sum = 0.0
    var i = 0
    while (i < 128) {
      val r = ascii(i)
      if (r > 1) sum += r.toDouble * StrictMath.log(r.toDouble) // r=1 contributes exactly 0; StrictMath = Spark's Log expression
      i += 1
    }
    if (overflow != null) {
      val it = overflow.values().iterator()
      while (it.hasNext) {
        val r = it.next()
        if (r > 1) sum += r.toDouble * StrictMath.log(r.toDouble)
      }
    }
    sum
  }

  /** Codepoints outside [a-zA-Z0-9] and Java \s (ASCII \t\n\x0B\f\r and
    * space) — one count per codepoint, like the regex form.
    */
  def punctCount(s: UTF8String): Long = {
    val str = s.toString
    var n = 0L
    var i = 0
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      val alnum = (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
        (cp >= '0' && cp <= '9')
      val ws = cp == ' ' || (cp >= '\t' && cp <= '\r') // \t \n \x0B \f \r
      if (!alnum && !ws) n += 1
      i += Character.charCount(cp)
    }
    n
  }

  /** Codepoints in [A-Z]. */
  def upperCount(s: UTF8String): Long = {
    val b = s.getBytes
    var n = 0L
    var i = 0
    while (i < b.length) {
      if (b(i) >= 'A' && b(i) <= 'Z') n += 1
      i += 1
    }
    n
  }

  /** Codepoints in U+4E00..U+9FFF (the CJK unified block the
    * language-ID regex [一-鿿] matches).
    */
  def cjkCount(s: UTF8String): Long = {
    val str = s.toString
    var n = 0L
    var i = 0
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      if (cp >= 0x4e00 && cp <= 0x9fff) n += 1
      i += Character.charCount(cp)
    }
    n
  }

  def charDistinct(c: Column): Column =
    ColumnBridge.toColumn(CharDistinct(ColumnBridge.toExpr(c)))
  def charRlnR(c: Column): Column =
    ColumnBridge.toColumn(CharRlnR(ColumnBridge.toExpr(c)))
  def punctCount(c: Column): Column =
    ColumnBridge.toColumn(CharClassCount(ColumnBridge.toExpr(c), "punct"))
  def upperCount(c: Column): Column =
    ColumnBridge.toColumn(CharClassCount(ColumnBridge.toExpr(c), "upper"))
  def cjkCount(c: Column): Column =
    ColumnBridge.toColumn(CharClassCount(ColumnBridge.toExpr(c), "cjk"))
}
