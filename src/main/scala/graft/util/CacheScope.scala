package graft.util

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame

/** Registry for operator-internal persisted frames whose lifetime must
  * outlive the operator call: a returned lazy DataFrame still
  * references the cache, so the operator cannot unpersist before the
  * CALLER runs its action. Left alone, a long-lived session accumulates
  * one cached frame per such operator call (r7 audit: ~22 persists vs
  * 7 in-scope unpersists). Operators register here instead; harnesses
  * and library users call [[drain]] once the query's results are
  * consumed. Verify and Bench drain between queries, and
  * CacheAuditSpec proves the full persisting-operator sweep leaves
  * zero cached RDDs after a drain.
  *
  * Persists that are BOTH created and fully consumed inside one
  * operator (iteration pins, training samples) keep their local
  * persist/unpersist pairs — this registry is only for caches that
  * ride the returned plan.
  */
object CacheScope {
  private val active = new ConcurrentLinkedQueue[DataFrame]()

  /** persist() + register for a later [[drain]]. */
  def cached(df: DataFrame): DataFrame = register(df.persist())

  /** Register an already-persisted frame (e.g. the final round of an
    * iterative loop whose earlier rounds were unpersisted in-scope).
    */
  def register(df: DataFrame): DataFrame = { active.add(df); df }

  /** Unpersist every registered frame; returns how many were dropped.
    * Safe to call while other queries build plans — only frames
    * registered at call time are drained.
    */
  def drain(): Int = {
    var n = 0
    var df = active.poll()
    while (df != null) {
      df.unpersist()
      n += 1
      df = active.poll()
    }
    n
  }

  /** Currently registered (not yet drained) frame count. */
  def pending: Int = active.size()
}
