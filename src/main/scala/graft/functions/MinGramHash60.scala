package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing min-hash over character k-gram windows as ONE native
  * pass: value-identical to the composed
  * `array_min(transform(charShingles(norm, k), g => hash60(g)))`
  * — hash60 of every k-char substring, minimum over the row, null when
  * the string is shorter than k (array_min of the empty-array guard).
  *
  * The composed form materializes one UTF8String per window (~n
  * substrings per row) and evaluates a two-level lambda per element;
  * this kernel slides a window over the backing byte array and feeds
  * it straight to the digest — byte-indexed on pure-ASCII input (the
  * normText case), codepoint-indexed otherwise (matching substr's
  * character semantics on arbitrary SQL input). doc_fingerprint over
  * the sf1 corpus measured 31.9 s composed vs ~2 s native — the md5s
  * themselves are the remaining cost (see docs/PLANS.md round-5
  * notes).
  */
case class MinGramHash60(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"gram size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"min_gram_hash60 expects a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "min_gram_hash60"

  override protected def nullSafeEval(input: Any): Any =
    MinGramHash60.minHash(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("mgh")
      s"""
         |java.lang.Long $r = graft.functions.MinGramHash60.minHash($c, $k);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinGramHash60 =
    copy(child = newChild)
}

object MinGramHash60 {

  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static kernel: min over hash60 of every k-CHAR window; null (no
    * windows) when the input is shorter than k characters. Pure-ASCII
    * input (the normText case) takes the byte-window fast path; any
    * non-ASCII byte switches to codepoint-offset windows so the SQL
    * surface stays correct on arbitrary strings (a byte window would
    * split UTF-8 sequences and hash values the composed
    * charShingles→hash60 form never produces).
    */
  def minHash(s: UTF8String, k: Int): java.lang.Long = {
    val b = s.getBytes
    val n = b.length
    var ascii = true
    var i = 0
    while (ascii && i < n) { if (b(i) < 0) ascii = false; i += 1 }
    if (ascii) {
      if (n < k) return null
      val md = mdPool.get()
      var best = Long.MaxValue
      i = 0
      while (i <= n - k) {
        best = math.min(best, digest60(md, b, i, k + i))
        i += 1
      }
      best
    } else {
      // byte offsets of each codepoint start (UTF-8 lead bytes)
      val starts = new Array[Int](n + 1)
      var nc = 0
      i = 0
      while (i < n) {
        if ((b(i) & 0xc0) != 0x80) { starts(nc) = i; nc += 1 }
        i += 1
      }
      starts(nc) = n
      if (nc < k) return null
      val md = mdPool.get()
      var best = Long.MaxValue
      i = 0
      while (i <= nc - k) {
        best = math.min(best, digest60(md, b, starts(i), starts(i + k)))
        i += 1
      }
      best
    }
  }

  @inline private def digest60(md: java.security.MessageDigest,
      b: Array[Byte], from: Int, until: Int): Long = {
    md.update(b, from, until - from)
    val d = md.digest()
    var v = 0L
    var j = 0
    while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
    v >>> 4
  }

  /** Column-API entry: `norm` must be ASCII (normText output). */
  def minGramHash60(norm: Column, k: Int): Column =
    ColumnBridge.toColumn(MinGramHash60(ColumnBridge.toExpr(norm), k))
}
