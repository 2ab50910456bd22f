package graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame

/** Session-hygiene seam for operator-internal caches.
  *
  * Several operators return LAZY frames built over an internal
  * `.persist` (the shingle frames of `Dedup.minhashNearDups` and
  * `Hygiene.decontaminate`, the cleaned base of `Corpus.prepare`) or
  * over a final `localCheckpoint` (`Dedup.clusterPairs`). The operator
  * cannot unpersist before returning — the caller has not acted on the
  * frame yet — so without a seam a long-lived session accumulates
  * cached frames until eviction. Operators register those caches here;
  * a caller (or a driver loop, between pipeline runs) calls `drain()`
  * once its actions are done.
  *
  * `localCheckpoint` needs special handling: `Dataset.localCheckpoint`
  * does not expose the RDD it persisted, and `df.unpersist()` only
  * clears CacheManager entries, not checkpoint RDDs. The handle is
  * recovered by diffing `sc.getPersistentRDDs` around the EAGER
  * checkpoint — best-effort under concurrent persists from other
  * threads (a foreign RDD persisted inside that window would be
  * captured too), which graft's single-action call pattern does not do.
  *
  * Handles can also be released early and individually (`release`):
  * iterative algorithms drop round k's checkpoint the moment round
  * k+1 materializes, bounding in-flight cache at O(1) rounds, and the
  * streaming batch step releases its per-batch checkpoints at the end
  * of the batch instead of leaking one set per micro-batch.
  */
object InternalCaches {

  /** The persisted RDDs behind one tracked checkpoint. */
  type Handle = Seq[RDD[_]]

  private val frames = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val rdds = new java.util.concurrent.ConcurrentLinkedQueue[RDD[_]]()

  /** Register an internally-persisted frame for the next `drain()`. */
  def track(df: DataFrame): DataFrame = { frames.add(df); df }

  /** Register a checkpoint handle for the next `drain()`. */
  def trackRdds(h: Handle): Unit = h.foreach(rdds.add)

  /** Eager localCheckpoint returning the persisted-RDD handle, so the
    * caller can `release` it (or `trackRdds` it for the next drain).
    */
  def localCheckpointHandle(df: DataFrame): (DataFrame, Handle) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = df.localCheckpoint(true)
    val added = sc.getPersistentRDDs.collect {
      case (id, rdd) if !before.contains(id) => rdd
    }.toSeq
    (out, added)
  }

  /** Unpersist one checkpoint handle now. */
  def release(h: Handle, blocking: Boolean = false): Unit =
    h.foreach(_.unpersist(blocking))

  /** Unpersist everything registered since the last drain; returns the
    * number of caches dropped. Safe to call at any quiesced point — a
    * tracked frame acted on later just recomputes.
    */
  def drain(blocking: Boolean = false): Int = {
    var n = 0
    var df = frames.poll()
    while (df != null) { df.unpersist(blocking); n += 1; df = frames.poll() }
    var rdd = rdds.poll()
    while (rdd != null) { rdd.unpersist(blocking); n += 1; rdd = rdds.poll() }
    n
  }
}
