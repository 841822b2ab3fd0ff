package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Bounded-heap per-group top-k as an AGGREGATE, not a window.
  *
  * `row_number().over(partitionBy(g).orderBy(o)) <= k` shuffles EVERY
  * row of the corpus to its group's partition and sorts the whole
  * group — O(n log n) per group, full-corpus shuffle bytes — to keep
  * k rows. A bounded priority queue as the aggregation buffer
  * (Catalyst's CollectTopK, the engine's own k-bounded Collect
  * variant) caps per-group state at k, combines map-side like any
  * partial aggregate (each input partition ships AT MOST k rows per
  * group it touches), and never sorts more than the k survivors.
  * Same result, shuffle bytes bounded by k x groups instead of n —
  * the difference between a window and an aggregate at 100 TB.
  *
  * The bounded queue keeps the k LARGEST elements under the child
  * type's ordering (structs order lexicographically by field) when
  * reverse = false; pass reverse = true for the k smallest — pinned
  * empirically in CorpusSpec against the window form.
  */
object TopKAgg {

  def collectTopK(c: Column, k: Int, reverse: Boolean = false): Column =
    ColumnBridge.collectTopK(c, k, reverse)
}
