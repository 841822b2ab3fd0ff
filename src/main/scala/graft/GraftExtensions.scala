package graft

import org.apache.spark.sql.SparkSessionExtensions
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

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("slugify"),
      new ExpressionInfo(classOf[functions.Slugify].getName, "slugify"),
      (exprs: Seq[Expression]) => functions.Slugify(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[functions.DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => functions.DotProduct(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("intersect_count"),
      new ExpressionInfo(classOf[functions.IntersectCount].getName, "intersect_count"),
      (exprs: Seq[Expression]) => functions.IntersectCount(exprs.head, exprs(1))))
  }
}
