package graft.core

import scala.collection.mutable
import org.apache.spark.sql.DataFrame

/** Lifecycle for operator-created caches.
  *
  * Several operators cache an intermediate frame that multiple plan
  * branches read (e.g. the exploded shingle stream both sides of a
  * set-similarity self-join consume). The returned frame is lazy, so the
  * operator itself can never know when it is safe to unpersist — but at
  * corpus scale those caches are themselves corpus-sized, and a long-lived
  * session that runs dedup after dedup would accumulate them until
  * executors spill everything else.
  *
  * A `CacheScope` makes the lifecycle explicit: the operator records every
  * cache it creates in the scope it was handed, and the CALLER releases
  * the scope once the operator's output has been fully consumed
  * (collected, written, or checkpointed):
  *
  * {{{
  * CacheScope.using { scope =>
  *   Dedup.minhashNearDupPairs(docs, "doc_id", "text", n = 3,
  *     threshold = 0.5, scope = scope).write.parquet(out) // consumed HERE
  * } // caches released
  * }}}
  *
  * The default [[CacheScope.session]] scope records nothing — caches then
  * live for the session (reclaim via `spark.catalog.clearCache()`), which
  * is the right trade for interactive exploration where the same operator
  * output is re-queried repeatedly.
  */
final class CacheScope private[core] (track: Boolean) {
  private val frames = mutable.ArrayBuffer.empty[DataFrame]

  /** Cache `df`, recording it for [[release]] if this scope tracks. */
  def cached(df: DataFrame): DataFrame = {
    df.cache()
    if (track) synchronized { frames += df }
    df
  }

  /** Unpersist every cache this scope recorded. Only call after the
    * operator output derived from them has been fully consumed — the
    * outputs are lazy, and releasing early silently re-runs the shared
    * upstream work once per consuming branch.
    */
  def release(blocking: Boolean = false): Unit = synchronized {
    frames.foreach(_.unpersist(blocking))
    frames.clear()
  }

  /** Number of currently-tracked caches (test/introspection hook). */
  def trackedCount: Int = synchronized(frames.size)
}

object CacheScope {
  /** A fresh tracking scope; pair with [[CacheScope.release]]. */
  def apply(): CacheScope = new CacheScope(track = true)

  /** Session-lifetime caches (records nothing; `release` is a no-op). */
  val session: CacheScope = new CacheScope(track = false)

  /** Run `body` with a fresh scope and release its caches afterwards.
    * `body` must CONSUME whatever frames it derives — anything lazy that
    * escapes `body` loses its caches and recomputes from source.
    */
  def using[A](body: CacheScope => A): A = {
    val scope = CacheScope()
    try body(scope) finally scope.release()
  }
}
