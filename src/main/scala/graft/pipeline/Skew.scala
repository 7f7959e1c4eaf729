package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers.
  *
  * AQE's skew-join splitting (enabled session-wide) covers skewed JOINS;
  * what it cannot fix is a skewed groupBy whose aggregate has no
  * map-side combine — collect_list/collect_set ship every row of a hot
  * key to one reducer. The helpers here split each key across
  * `buckets` salt partitions, aggregate per (key, salt), then merge the
  * per-salt results — the hot key's rows spread over `buckets` reducers
  * and the final merge handles `buckets` pre-chunked arrays per key.
  *
  * (Counts/sums don't need this: Spark's hash aggregate already
  * partial-combines them map-side — see TextOps.ngramFrequencies.)
  */
object Skew {

  /** collect_list(valueCol) per key, salted two-stage. Element order is
    * not guaranteed (it never is for collect_list across partitions).
    *
    * The salt is the SOURCE partition id, not a hash of the value (r4
    * advice: value-hash salting spreads a hot key over at most
    * |distinct values| reducers — a hot key whose rows share one value
    * still lands on a single reducer). Every input partition's chunk of
    * a hot key goes to its own reducer, which is exactly the map-side
    * pre-chunking a combinable aggregate would do.
    */
  def saltedCollectList(df: DataFrame, key: String, valueCol: String,
      buckets: Int = 16): DataFrame =
    df.groupBy(col(key), pmod(spark_partition_id().cast("long"), lit(buckets)).as("__salt"))
      .agg(collect_list(col(valueCol)).as("__part"))
      .groupBy(col(key))
      .agg(flatten(collect_list(col("__part"))).as(s"${valueCol}s"))

  /** count_distinct per key without shipping a hot key's rows to one
    * reducer: distinct (key, value) pairs first (hash-partitioned by the
    * PAIR, so a hot key spreads), then a combinable count per key.
    */
  def skewSafeCountDistinct(df: DataFrame, key: String, valueCol: String): DataFrame =
    df.select(col(key), col(valueCol)).distinct()
      .groupBy(col(key))
      .agg(count(lit(1)).as(s"n_distinct_$valueCol"))
}
