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

  /** Native codegen'd kernel ([[DotProduct]]) — identical fold order
    * and null semantics to the expression-tree form
    * `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` it replaced.
    */
  def dot(a: Column, b: Column): Column = DotProduct.dot(a, b)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity with null-safe zero-norm guard. */
  def cosine(a: Column, b: Column): Column =
    Cleaning.safeDiv(dot(a, b), norm2(a) * norm2(b))

  /** Cosine with PRE-COMPUTED norms: per-pair work drops from 3 dot
    * products to 1 (and the safeDiv guard re-references cheap scalar
    * attributes, not 64-element aggregates). Compute the norm once per
    * row in its own select before any pair join — see
    * docs/PLANS.md "precompute per-row invariants".
    */
  def cosinePre(a: Column, na: Column, b: Column, nb: Column): Column =
    Cleaning.safeDiv(dot(a, b), na * nb)
}
