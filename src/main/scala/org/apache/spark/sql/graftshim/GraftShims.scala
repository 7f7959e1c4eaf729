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
  def clampedSession(parent: SparkSession, key: String, value: String): SparkSession = {
    // evict dead entries on access: a pool keyed by strong session refs
    // would otherwise leak SessionStates in processes that create/stop
    // many sessions (test suites) for the life of the JVM
    pool.keysIterator
      .filter(_._1.sparkContext.isStopped)
      .foreach(pool.remove)
    pool.getOrElseUpdate((parent, key, value), {
      val s = cloneSession(parent)
      s.conf.set(key, value)
      s
    })
  }

  def retarget(df: DataFrame, to: SparkSession): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      to.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      // the ANALYZED plan, deliberately: temp-view references (e.g. a
      // memory-sink table registered on a drain clone) are resolved
      // against the SOURCE session before the plan crosses over — the
      // raw logical plan would re-resolve them on the target session's
      // catalog and miss
      df.queryExecution.analyzed)

  /** Eager localCheckpoint whose resulting plan carries the REAL stored
    * size as its statistics.
    *
    * Why this exists: `Dataset.localCheckpoint` copies the ORIGIN plan's
    * estimated statistics onto the resulting `LogicalRDD`. In an
    * iterative loop that checkpoints every step, each step's estimate is
    * a PRODUCT over the previous checkpoint's stats (join size estimation
    * multiplies children), so the recorded `sizeInBytes` grows as
    * ~prev^3 per step — after ~15 steps the BigInt has millions of bits
    * and every stats visit burns minutes of driver CPU in Toom-Cook
    * multiplication (measured: SCC's coloring loop went from seconds to
    * a half-hour hang). The historical accident that masked this was a
    * Dataset-level `persist()` in front of the checkpoint: the cached
    * InMemoryRelation's REAL materialized size became the origin stats,
    * resetting the growth each step — at the cost of storing every
    * iteration twice. This helper gives the same reset from the
    * checkpoint's own storage: after the eager checkpoint it reads the
    * RDD's actual block sizes from the block manager and rebuilds the
    * `LogicalRDD` with `Statistics(realSize)` — accurate input to
    * downstream broadcast decisions, no duplicate storage.
    */
  def localCheckpointRealStats(df: DataFrame): DataFrame = {
    val out = df.localCheckpoint(true)
    out.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        val sess = out.sparkSession
          .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        val size = sess.sparkContext.getRDDStorageInfo
          .find(_.id == lr.rdd.id)
          .map(i => BigInt(i.memSize + i.diskSize))
          .filter(_ > 0)
          .getOrElse(BigInt(8))
        val stats = org.apache.spark.sql.catalyst.plans.logical
          .Statistics(sizeInBytes = size)
        org.apache.spark.sql.classic.Dataset.ofRows(
          sess,
          new org.apache.spark.sql.execution.LogicalRDD(
            lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
            lr.isStreaming, lr.stream)(sess, Some(stats), None))
      case _ => out
    }
  }

  /** Free the storage blocks of a `localCheckpoint`-ed frame NOW.
    *
    * `Dataset.unpersist()` on a checkpointed frame is a silent no-op:
    * the frame's plan is a `LogicalRDD`, which the CacheManager has no
    * entry for, and the checkpoint RDD's blocks are only reclaimed when
    * the ContextCleaner garbage-collects the RDD reference — so an
    * iterative loop that "unpersists" its previous iteration actually
    * accumulates every iteration's blocks for the life of the query
    * (measured: the blocks also hold RAW InternalRow copies, ~40× the
    * columnar-cache footprint of the same data). This unpersists the
    * backing RDD directly.
    *
    * Matches the plan ROOT only, deliberately: a deep traversal could
    * release a checkpointed leaf that a live sibling plan still reads.
    * CALLER CONTRACT: only release a frame whose every live descendant
    * has already been forced into storage — a checkpointed RDD cannot
    * be recomputed, so a lazy plan still referencing it will fail after
    * release.
    */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
