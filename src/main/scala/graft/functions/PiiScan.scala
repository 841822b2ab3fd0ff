package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native scan for the two PII patterns the redaction operators use:
  *
  *   email: [a-z0-9]+@[a-z0-9]+\.[a-z]+
  *   ipv4 : [0-9]+\.[0-9]+\.[0-9]+\.[0-9]+
  *
  * Value-identical to java.util.regex find/replaceAll (and RE2 — both
  * patterns are backtracking-free): every quantified class is followed
  * by a literal OUTSIDE that class, so a greedy run can never shrink —
  * each match is "maximal class runs stitched by the literals", and a
  * match attempt starting mid-run fails exactly when the attempt at
  * the run's start fails (the run consumes to the same end either
  * way). Hence one left-to-right pass over maximal runs reproduces
  * find()'s leftmost, non-overlapping match sequence. Pinned against
  * the real regexes in PiiScanSpec (corpus + adversarial + randomized).
  *
  * The regex forms cost 4 engine passes per row (2 counts + 2
  * replaces) in pii_redact and again inside curation_pipeline's redact
  * stage — the last regex hot spot in the honest sf1 profile.
  */
case class PiiCount(child: Expression, kind: String) extends UnaryExpression {
  require(kind == "email" || kind == "ip", s"unknown kind $kind")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pii_count expects a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"pii_count_$kind"
  override protected def nullSafeEval(input: Any): Any =
    if (kind == "email") PiiScan.countEmails(input.asInstanceOf[UTF8String])
    else PiiScan.countIps(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (kind == "email") "countEmails" else "countIps"
    defineCodeGen(ctx, ev, c => s"graft.functions.PiiScan.$m($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): PiiCount =
    copy(child = newChild)
}

/** Replace every email with `<EMAIL>`, then every IPv4 with `<IP>` —
  * the composed two-regexp_replace chain as one kernel call.
  */
case class PiiRedact(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pii_redact expects a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pii_redact"
  override protected def nullSafeEval(input: Any): Any =
    PiiScan.redact(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PiiScan.redact($c)")
  override protected def withNewChildInternal(newChild: Expression): PiiRedact =
    copy(child = newChild)
}

object PiiScan {

  @inline private def isLower(c: Byte) = c >= 'a' && c <= 'z'
  @inline private def isDigit(c: Byte) = c >= '0' && c <= '9'
  @inline private def isLd(c: Byte) = isLower(c) || isDigit(c)

  /** Leftmost email match starting at or after `from`: returns
    * (start << 32) | end, or -1. Matches are maximal [a-z0-9] runs
    * around '@', then '.', then a maximal [a-z]+ run.
    */
  private def findEmail(b: Array[Byte], from: Int): Long = {
    var i = from
    val n = b.length
    while (i < n) {
      // candidate must start a [a-z0-9] run whose maximal end is '@'
      if (isLd(b(i))) {
        var j = i
        while (j < n && isLd(b(j))) j += 1
        // any start inside [i, j) behaves identically (same run end) —
        // try the stitch once, then skip the whole run on failure
        if (j < n && b(j) == '@') {
          var k = j + 1
          while (k < n && isLd(b(k))) k += 1
          if (k > j + 1 && k < n && b(k) == '.') {
            var m = k + 1
            while (m < n && isLower(b(m))) m += 1
            if (m > k + 1) return (i.toLong << 32) | m.toLong
          }
        }
        i = j // skip the failed run (mid-run starts fail identically)
      } else i += 1
    }
    -1L
  }

  /** Leftmost IPv4 match: four maximal digit runs stitched by '.'. */
  private def findIp(b: Array[Byte], from: Int): Long = {
    var i = from
    val n = b.length
    while (i < n) {
      if (isDigit(b(i))) {
        var j = i
        while (j < n && isDigit(b(j))) j += 1
        var ok = true
        var p = j
        var g = 0
        while (g < 3 && ok) {
          if (p < n && b(p) == '.') {
            var q = p + 1
            while (q < n && isDigit(b(q))) q += 1
            if (q > p + 1) { p = q; g += 1 } else ok = false
          } else ok = false
        }
        if (ok) return (i.toLong << 32) | p.toLong
        i = j // all starts inside this digit run fail identically
      } else i += 1
    }
    -1L
  }

  private def countMatches(b: Array[Byte],
      find: (Array[Byte], Int) => Long): Long = {
    var n = 0L
    var pos = 0
    var m = find(b, pos)
    while (m >= 0) {
      n += 1
      pos = (m & 0xffffffffL).toInt
      m = find(b, pos)
    }
    n
  }

  def countEmails(s: UTF8String): Long = countMatches(s.getBytes, findEmail)
  def countIps(s: UTF8String): Long = countMatches(s.getBytes, findIp)

  private def replaceAll(b: Array[Byte], token: Array[Byte],
      find: (Array[Byte], Int) => Long): Array[Byte] = {
    var m = find(b, 0)
    if (m < 0) return b
    val out = new java.io.ByteArrayOutputStream(b.length)
    var pos = 0
    while (m >= 0) {
      val st = (m >>> 32).toInt
      val en = (m & 0xffffffffL).toInt
      out.write(b, pos, st - pos)
      out.write(token, 0, token.length)
      pos = en
      m = find(b, pos)
    }
    out.write(b, pos, b.length - pos)
    out.toByteArray
  }

  private val EmailTok = "<EMAIL>".getBytes
  private val IpTok = "<IP>".getBytes

  /** regexp_replace(regexp_replace(s, email, `<EMAIL>`), ip, `<IP>`) */
  def redact(s: UTF8String): UTF8String = {
    val pass1 = replaceAll(s.getBytes, EmailTok, findEmail)
    UTF8String.fromBytes(replaceAll(pass1, IpTok, findIp))
  }

  def countEmails(c: Column): Column =
    ColumnBridge.toColumn(PiiCount(ColumnBridge.toExpr(c), "email"))
  def countIps(c: Column): Column =
    ColumnBridge.toColumn(PiiCount(ColumnBridge.toExpr(c), "ip"))
  def redact(c: Column): Column =
    ColumnBridge.toColumn(PiiRedact(ColumnBridge.toExpr(c)))
}
