package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Narrow bridge into Spark's `private[sql]` session surface, used by
  * graft's iterative algos and bounded-stream drains to run their
  * shuffle-partition clamps on an ISOLATED session instead of mutating
  * the caller's conf (a clamp on the shared session is visible to any
  * unrelated query planned concurrently — the r15 ConfScope caveat).
  *
  * Both entry points are thin renames of public-behavior Spark
  * operations that happen to be `private[sql]`:
  *  - `cloneSession` — `newSession()` with the parent's RUNTIME conf,
  *    temp views and registered functions copied (a plain newSession
  *    would silently drop runtime-set confs and graft's registered
  *    native kernels);
  *  - `retarget` — rebind a DataFrame's logical plan to another session
  *    (zero-cost: no data moves, the plan tree is reused verbatim), so
  *    loop inputs execute under the clone's conf and loop RESULTS hand
  *    back to the caller under the caller's conf.
  */
object GraftShims {
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()

  def retarget(df: DataFrame, to: SparkSession): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      to.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      // the ANALYZED plan, deliberately: temp-view references (e.g. a
      // memory-sink table registered on a drain clone) are resolved
      // against the SOURCE session before the plan crosses over — the
      // raw logical plan would re-resolve them on the target session's
      // catalog and miss
      df.queryExecution.analyzed)
}
