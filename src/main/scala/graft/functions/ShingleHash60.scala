package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed word k-gram shingles in ONE native pass: value-identical to
  * the composed
  * `transform(wordShingles(toks, k), g => hash60(g))`
  * (i.e. hash60 of every space-joined k-token window, empty array when
  * `size(toks) < k`, matching the DuckDB oracle's
  * `('0x' || substr(md5(array_to_string(w[i:i+k-1], ' ')), 1, 15))::BIGINT`).
  *
  * The composed form materializes every gram as a UTF8String (slice →
  * array_join builds the joined bytes, then md5 re-reads them): ~n
  * string allocations per row plus the lambda-eval overhead of two
  * nested higher-order functions. This kernel feeds the token bytes
  * and separator straight into the digest — zero gram strings — and
  * returns a primitive long array. Gram hashing sits under
  * decontamination, minhash signatures, duplicate-span detection, and
  * the n-gram Jaccard block: at 100 TB it is the hottest array-level
  * scalar in the dedup path (see docs/PLANS.md round-5 notes for the
  * measured deltas).
  *
  * Kernel is a static method; doGenCode emits one call (the Slugify /
  * Hash60 pattern) so the row loop stays whole-stage-compiled.
  */
case class ShingleHash60(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash60 expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hash60"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash60.hashShingles(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHash60.hashShingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash60 =
    copy(child = newChild)
}

object ShingleHash60 {

  private val Empty = new GenericArrayData(Array.emptyLongArray)

  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static kernel: hash60 of each of the (n - k + 1) space-joined
    * k-token windows; empty array when n < k. The digest consumes
    * token bytes + ' ' separators directly — byte-identical input to
    * md5("tok_i tok_{i+1} ... tok_{i+k-1}").
    */
  def hashShingles(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k) return Empty
    val md = mdPool.get()
    // token bytes fetched once per row, not once per window; null
    // elements (possible via the SQL surface — the tokenizer never
    // produces them) are SKIPPED like array_join skips them: no bytes,
    // no separator, matching the composed wordShingles->hash60 form
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Long](n - k + 1)
    i = 0
    while (i <= n - k) {
      var j = i
      var emitted = 0
      while (j < i + k) {
        if (toks(j) != null) {
          if (emitted > 0) md.update(' '.toByte)
          md.update(toks(j))
          emitted += 1
        }
        j += 1
      }
      val d = md.digest() // digest() resets the instance
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      out(i) = v >>> 4
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry: `toks` should be a materialized attribute (the
    * wordShingles contract), `k` a Scala constant.
    */
  def shingleHash60(toks: Column, k: Int): Column =
    ColumnBridge.toColumn(ShingleHash60(ColumnBridge.toExpr(toks), k))
}
