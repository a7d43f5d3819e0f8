package graft

import org.apache.spark.sql.Dataset

/** Registry of intra-query persisted intermediates.
  *
  * Operators persist frames that feed multiple branches of their own
  * plan (the prefixJaccard convention), but the results they return are
  * lazy — the operator can never unpersist without destroying the
  * sharing it persisted for. The old contract ("caller clearCache()")
  * worked but was session-wide: it also dropped caches the CALLER owned.
  * This registry scopes release to exactly the frames graft created:
  * every operator persist is `.persist().tracked`, and a caller (Bench,
  * Verify, a long-lived session) calls [[Caches.release]] after
  * consuming a result. Double-unpersist is a no-op, so operators that
  * also unpersist eagerly (iterative loops) track safely.
  */
object Caches {

  private val frames =
    new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Number of currently tracked frames (test hook). */
  def trackedCount: Int = frames.size()

  /** Unpersist (non-blocking) and forget every tracked frame. Safe at
    * any point: consumed frames free their storage; a frame whose query
    * has not run yet just loses the persist (correct, merely slower).
    */
  def release(): Unit = {
    var d = frames.poll()
    while (d != null) { d.unpersist(false); d = frames.poll() }
  }

  implicit class TrackedDataset[T](private val ds: Dataset[T]) {
    /** Register this (persisted) frame for [[Caches.release]]. */
    def tracked: Dataset[T] = { frames.add(ds); ds }
  }
}
