package graft

import org.apache.spark.sql.{AnalysisException, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Library entry point for SQL-only users:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * registers the native codegen expressions as SQL functions on every
  * session — `slugify(s)` and `dot_product(a, b)` — so pure-SQL
  * pipelines (spark-sql, Thrift server, SQL cells) reach them without
  * a Column-API import. The Column API (`functions.Slugify.slugify`,
  * `functions.VectorFunctions.dot`) binds the same expressions
  * directly and needs no extension.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Arity gate: a wrong argument count must surface as the standard
    * WRONG_NUM_ARGS analysis error (with the expected signature), not
    * an IndexOutOfBoundsException from the builder's positional access.
    */
  private def arity(name: String, expected: Int, exprs: Seq[Expression]): Unit =
    if (exprs.length != expected)
      throw new AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> expected.toString,
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("slugify"),
      new ExpressionInfo(classOf[functions.Slugify].getName, "slugify"),
      (exprs: Seq[Expression]) => {
        arity("slugify", 1, exprs)
        functions.Slugify(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[functions.DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => {
        arity("dot_product", 2, exprs)
        functions.DotProduct(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("intersect_count"),
      new ExpressionInfo(classOf[functions.IntersectCount].getName, "intersect_count"),
      (exprs: Seq[Expression]) => {
        arity("intersect_count", 2, exprs)
        functions.IntersectCount(exprs.head, exprs(1))
      }))
  }
}
