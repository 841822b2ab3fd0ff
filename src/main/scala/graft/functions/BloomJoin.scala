package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Column-API entries for the engine's own runtime-filter kernels:
  * `BloomFilterAggregate` (a TypedImperativeAggregate over
  * `org.apache.spark.util.sketch.BloomFilter` — partials merge
  * map-side like any aggregate, the sketch never exceeds `numBits/8`
  * bytes per partition) and `BloomFilterMightContain` (codegen'd
  * probe). These are the exact expressions Catalyst's
  * InjectRuntimeFilter plants under a selective join; exposing them
  * as columns lets an operator build the filter from one side of a
  * join and prune the other side BEFORE its shuffle — the semi-join
  * reduction that decides fact-to-fact join cost at 100 TB, available
  * even where the optimizer's own injection heuristics decline.
  */
object BloomJoin {

  /** Aggregate `c`'s values (long) into a serialized bloom filter.
    * `items`/`bits` are fixed hyperparameters, not data-dependent —
    * the plan stays deterministic.
    */
  def bloomAgg(c: Column, items: Long, bits: Long): Column =
    ColumnBridge.toColumn(
      BloomFilterAggregate(
        ColumnBridge.toExpr(c),
        ColumnBridge.toExpr(org.apache.spark.sql.functions.lit(items)),
        ColumnBridge.toExpr(org.apache.spark.sql.functions.lit(bits)),
        0, 0).toAggregateExpression())

  /** Probe: true if `v` might be in the serialized filter `bloom`
    * (a binary literal — no false negatives, bounded false positives).
    */
  def mightContain(bloom: Column, v: Column): Column =
    ColumnBridge.toColumn(
      BloomFilterMightContain(
        ColumnBridge.toExpr(bloom), ColumnBridge.toExpr(v)))
}
