package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys. AQE's skew-join split
  * (spark.sql.adaptive.skewJoin) is the first answer; explicit salting
  * is the fallback when the skew is on the BUILD side of a non-sort-
  * merge join, or on a groupBy key (AQE cannot split a hash aggregate).
  *
  * Pattern: fan the skewed (left) side into `buckets` sub-keys with a
  * deterministic salt, replicate the right side across all bucket
  * values, join on (key, salt). The shuffle then spreads each hot key
  * over `buckets` reducers.
  */
object Salting {

  /** Deterministic per-row salt in [0, buckets). Derived from stable
    * row content, never rand() — replays and retries must agree.
    */
  def salt(seedCol: Column, buckets: Int): Column =
    pmod(hash(seedCol), lit(buckets))

  /** Salted inner equi-join of a skewed left side against a smaller
    * right side. `leftSeed` picks the salt (any stable, high-cardinality
    * column, e.g. the left table's primary key).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 leftSeed: String, buckets: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt", salt(col(leftSeed), buckets))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted aggregation for skewed groupBy keys: partial
    * aggregate on (key, salt), then final aggregate on key. Caller
    * supplies both phases because the merge function depends on the
    * aggregate (sum->sum, count->sum, min->min ...).
    */
  def saltedAgg(df: DataFrame, key: String, seed: String, buckets: Int)(
      partial: (String, Seq[Column]), finalAgg: Seq[Column]): DataFrame = {
    val (saltName, partials) = partial
    df.withColumn(saltName, salt(col(seed), buckets))
      .groupBy(col(key), col(saltName))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(key))
      .agg(finalAgg.head, finalAgg.tail: _*)
  }
}
