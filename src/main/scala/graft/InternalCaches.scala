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
  * DRAIN CONTRACT: call `drain()` only at a QUIESCED point — after the
  * actions on every previously-obtained operator output have run, and
  * before obtaining new ones. A persisted frame acted on after a drain
  * merely recomputes, but a frame backed by a dropped localCheckpoint
  * is INVALID (lineage was truncated; the blocks are gone) — acting on
  * it fails. Bench/Verify drain between queries; a pipeline drains
  * between runs.
  *
  * SCOPES: `scoped { ... }` redirects every registration made by the
  * current thread for the duration of the block into a private bin and
  * releases that bin when the block exits. Work that must not touch —
  * and must not be touched by — the rest of the session (a streaming
  * micro-batch sharing the session with other queries) wraps itself in
  * a scope: its caches are cleaned eagerly, everyone else's survive.
  *
  * `localCheckpoint` needs special handling: `Dataset.localCheckpoint`
  * does not expose the RDD it persisted, and `df.unpersist()` only
  * clears CacheManager entries, not checkpoint RDDs. The handle is
  * recovered by diffing `sc.getPersistentRDDs` around the EAGER
  * checkpoint — best-effort under concurrent persists from other
  * threads (a foreign RDD persisted inside that window would be
  * captured too), which graft's single-action call pattern does not do.
  */
object InternalCaches {

  /** The persisted RDDs behind one tracked checkpoint. */
  type Handle = Seq[RDD[_]]

  private final class Bin {
    val frames = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
    val rdds = new java.util.concurrent.ConcurrentLinkedQueue[RDD[_]]()
    def drain(blocking: Boolean): Int = {
      var n = 0
      var df = frames.poll()
      while (df != null) { df.unpersist(blocking); n += 1; df = frames.poll() }
      var rdd = rdds.poll()
      while (rdd != null) { rdd.unpersist(blocking); n += 1; rdd = rdds.poll() }
      n
    }
  }

  private val global = new Bin
  private val scopeBin = new ThreadLocal[Bin]
  private def bin: Bin = Option(scopeBin.get).getOrElse(global)

  /** Register an internally-persisted frame for the next `drain()`
    * (or the end of the enclosing scope).
    */
  def track(df: DataFrame): DataFrame = { bin.frames.add(df); df }

  /** Register a checkpoint handle for the next `drain()` (or the end
    * of the enclosing scope).
    */
  def trackRdds(h: Handle): Unit = h.foreach(bin.rdds.add)

  /** Run `body` with all of THIS thread's registrations captured in a
    * private bin, released when the block exits. Actions on the
    * operator outputs must complete inside the block — checkpoint-
    * backed frames do not outlive it (see DRAIN CONTRACT).
    */
  def scoped[A](body: => A): A = {
    val outer = scopeBin.get
    val mine = new Bin
    scopeBin.set(mine)
    try body
    finally {
      if (outer == null) scopeBin.remove() else scopeBin.set(outer)
      mine.drain(false)
    }
  }

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

  /** Unpersist everything registered (outside scopes) since the last
    * drain; returns the number of caches dropped. See DRAIN CONTRACT.
    */
  def drain(blocking: Boolean = false): Int = global.drain(blocking)
}
