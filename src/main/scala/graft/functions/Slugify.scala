package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Executor-side slugification as a native Catalyst `Expression` with
  * codegen (SURVEY.md §4.3 item 1 — the optional custom expression for
  * when header/text normalization runs on executors rather than the
  * driver). Same semantics as [[graft.etl.Slug.slugify]]: strip ->
  * whitespace->underscore -> drop non-[a-zA-Z0-9_] -> NFKD ASCII fold
  * -> lowercase.
  *
  * `doGenCode` emits a single static call, so the expression
  * participates in whole-stage codegen (no CodegenFallback row boxing)
  * — the pattern to copy for future scalar extensions: keep the kernel
  * in a static method, generate a call to it.
  */
case class Slugify(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "slugify"

  override protected def nullSafeEval(input: Any): Any =
    Slugify.slugifyUtf8(input.asInstanceOf[UTF8String])

  // NB: the kernel must NOT be named `eval`: the companion class (this
  // case class) inherits eval(InternalRow), and a same-named object
  // method gets no static forwarder — the generated call then fails to
  // javac-compile and the WHOLE STAGE silently falls back to
  // interpreted mode (observed as "ERROR CodeGenerator: Failed to
  // compile" in the logs).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Slugify.slugifyUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): Slugify =
    copy(child = newChild)
}

object Slugify {
  /** Static kernel shared by interpreted eval and generated code. */
  def slugifyUtf8(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.etl.Slug.slugify(s.toString))

  /** Column-API entry. */
  def slugify(c: Column): Column =
    ColumnBridge.toColumn(Slugify(ColumnBridge.toExpr(c)))

  /** SQL registration: `SELECT slugify(col) FROM ...`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "slugify", exprs => Slugify(exprs.head), "scala_udf")
}
