package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>`/`array<double>` columns as
  * pure Catalyst expressions (`zip_with` + `aggregate`) — the
  * similarity-search building blocks. Sequential fold order matches
  * DuckDB's list_dot_product, so double-precision results agree
  * cross-engine to well past the 6 decimals the oracles round to.
  */
object VectorFunctions {

  /** Cast array<float> -> array<double> so all accumulation is double. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity with null-safe zero-norm guard. */
  def cosine(a: Column, b: Column): Column =
    Cleaning.safeDiv(dot(a, b), norm2(a) * norm2(b))
}
