package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit stable content hash as ONE native codegen'd expression.
  *
  * Value-identical to the composed form
  * `conv(substring(md5(c), 1, 15), 16, 10).cast("long")` (and to the
  * DuckDB oracle's `('0x' || substr(md5(x), 1, 15))::BIGINT`): the
  * first 15 hex nibbles of the md5 digest are the first 8 digest
  * bytes, big-endian, shifted right by one nibble. The composed form
  * pays digest -> 32-char hex string -> substring -> base-16 string
  * parse -> base-10 string render -> long parse PER CALL; this kernel
  * reads the 60 bits straight off the digest bytes with zero string
  * allocation. hash60 sits under every shingle of every dedup /
  * sampling / fingerprint query - at 100 TB it is the single
  * hottest scalar in the library.
  *
  * Kernel in a static method, `doGenCode` emits one call (the Slugify
  * pattern) so whole-stage codegen keeps the loop compiled.
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hash60 expects a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hash60"

  override protected def nullSafeEval(input: Any): Any =
    Hash60.md5Hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash60.md5Hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

object Hash60 {

  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static kernel: first 60 bits of md5(s) as a non-negative long. */
  def md5Hash60(s: UTF8String): Long = {
    val d = mdPool.get().digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Column-API entry. */
  def hash60(c: Column): Column =
    ColumnBridge.toColumn(Hash60(ColumnBridge.toExpr(c)))
}
