package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact money/quantity aggregation without a wide-decimal buffer.
  *
  * The exact-sum queries (q1_agg, rollup_revenue, pivot_status) need
  * order-independent, engine-reproducible totals over values that live
  * on a fixed decimal lattice (prices 2 dp, discounts 2 dp, so products
  * 4 dp). `sum(cast(x AS decimal(18,6)))` delivers that, but its
  * aggregation buffer is decimal(28,6) — beyond Spark's 18-digit
  * long-compact form, so every row update serializes a BigDecimal in
  * the hash-agg buffer and the sum falls out of the primitive fast
  * path.
  *
  * The equivalent primitive plan: scale each value to integer MICROS
  * (1e6) in codegen'd double arithmetic, sum as a plain long, and shift
  * the scale back in decimal only once per GROUP at the end.
  * Exactness argument, step by step:
  *
  *  - a lattice value v (<= 4 dp, |v| <= ~1e5) is stored as the nearest
  *    double, with absolute error <= ulp(1e5)/2 ~ 7.3e-12;
  *  - v * 1e6 in double arithmetic lands within ~1e-4 of the true
  *    integer v*1e6 (input representation error * 1e6, plus one
  *    multiplication rounding at magnitude <= 1e11) — far inside the
  *    0.5 needed for `round` to recover the integer exactly;
  *  - a long sum of exact integers is exact and order-independent
  *    (no overflow while the per-group total stays under 2^63 micros
  *    ~ 9.2e12 units — far above this corpus; a 100 TB deployment whose
  *    group totals could cross that line must fall back to the decimal
  *    path, which is the documented trade);
  *  - dividing the summed micros by 1e6 as DECIMAL shifts the scale
  *    exactly (result type decimal(38,6); our values carry <= 6 dp), so
  *    the final cast to double rounds once — the same nearest-double
  *    the decimal-sum path and the DuckDB oracle produce.
  *
  * `ExactSumSpec` pins byte-equality of the two paths on the corpus and
  * on adversarial random lattice data.
  */
object ExactSum {

  /** Lattice value → exact integer micros (long). Null propagates. */
  def micros(c: Column): Column = round(c * lit(1000000.0)).cast("long")

  /** Summed micros → the same double `sum(decimal).cast(double)` yields:
    * one exact decimal scale shift, then one nearest-double rounding.
    */
  def microsToDouble(sumMicros: Column): Column =
    (sumMicros.cast("decimal(38,6)") / lit(1000000)).cast("double")

  /** `sum(cast(c AS decimal(18,6))).cast(double)` on the primitive-long
    * path: exact, order-independent, codegen-friendly.
    */
  def sumExact(c: Column): Column = microsToDouble(sum(micros(c)))
}
