package graft.util

import org.apache.spark.sql.SparkSession
import java.util.concurrent.ConcurrentHashMap

/** Depth-tracked scoped override of a session conf value.
  *
  * The iterative algos and the bounded-stream drains clamp
  * `spark.sql.shuffle.partitions` to their data size for the duration of
  * a loop (see [[graft.algos.Algos]]). Those scopes used to save/restore
  * the conf naively, so two OVERLAPPING scopes on one session could each
  * capture the other's clamp as the "original" and leave it behind after
  * both exited (r14 advice). Here the true session default is recorded
  * once, by the outermost scope, in a per-(session, key) depth counter —
  * restoration happens exactly when the last scope exits, and nested or
  * concurrent scopes can never persist a clamped value past their
  * lifetime.
  *
  * Concurrency caveat (documented, not solved): the key is still
  * session-global, so an UNRELATED query planned on the same
  * SparkSession while a scope is active sees the override. Callers that
  * interleave independent workloads should give each its own
  * `spark.newSession()` (isolated SQLConf, shared cache); these scopes
  * guarantee clean restoration, not isolation.
  */
object ConfScope {

  private final case class St(depth: Int, orig: String)
  private val states = new ConcurrentHashMap[(SparkSession, String), St]()

  /** Runs `body` with `key` set to `value(sessionDefault)`, restoring the
    * session default when the outermost scope on this (session, key)
    * exits. `value` always receives the OUTERMOST original, never an
    * inner scope's override.
    */
  def scoped[T](spark: SparkSession, key: String)(value: String => String)(
      body: => T): T = {
    val k = (spark, key)
    val st = states.compute(k, (_, cur) =>
      if (cur == null) St(1, spark.conf.get(key)) else St(cur.depth + 1, cur.orig))
    try { spark.conf.set(key, value(st.orig)); body }
    finally {
      val after = states.compute(k, (_, cur) =>
        if (cur == null || cur.depth <= 1) null else St(cur.depth - 1, cur.orig))
      if (after == null) spark.conf.set(key, st.orig)
    }
  }
}
