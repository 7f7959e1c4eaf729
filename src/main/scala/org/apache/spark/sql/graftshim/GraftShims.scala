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

  /** Pooled clamped clones, one per (parent session, conf key, value).
    *
    * A FRESH clone pays a measurable per-session warm-up on every early
    * action (lazy SessionState build + per-session planning caches:
    * ~0.2 s on its first action and elevated per-action cost through its
    * first query loop — a 4-level BFS measured 2× end-to-end on a fresh
    * clone vs a reused one, and a bench that clones per query call paid
    * it on every invocation). A REUSED clone matches the mutate-the-
    * caller baseline. So clamped sessions are pooled: created once per
    * distinct clamp value, conf set ONCE at creation and never mutated
    * after — concurrent loops with the same clamp share a session whose
    * conf they only read, so the isolation contract holds. The pool is
    * bounded by the number of distinct clamp values (partition clamps:
    * ≤ the session default, a few dozen). The clone snapshots the
    * parent's OTHER confs at first use per clamp value; later parent
    * conf changes don't propagate (documented trade, same as the
    * GraphLoader table cache).
    */
  private val pool = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), SparkSession]
  def clampedSession(parent: SparkSession, key: String, value: String): SparkSession =
    pool.getOrElseUpdate((parent, key, value), {
      val s = cloneSession(parent)
      s.conf.set(key, value)
      s
    })

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
