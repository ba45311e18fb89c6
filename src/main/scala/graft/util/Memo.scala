package graft.util

import scala.collection.concurrent.TrieMap

/** Atomic once-per-key memoization for the session caches.
  *
  * `TrieMap.getOrElseUpdate` evaluates its by-name default in EVERY
  * thread that races on a cold key (lookup, then `insertifhc` — losers
  * return the winner's value but have already run the body). The cached
  * bodies here are expensive multi-job Spark chains holding
  * `localCheckpoint` blocks, and the Verify sweep runs 8 workers, so a
  * race means duplicated multi-second job chains and duplicate
  * checkpoint blocks pinned for the session.
  *
  * Storing a lazy HOLDER makes the race cheap: racers insert trivially
  * constructed holders, `TrieMap` keeps exactly one, and every thread
  * forces that single holder's `lazy val` — the JVM's lazy-val lock
  * guarantees the body runs exactly once per key.
  */
final class Memo[K, V] {
  private final class Holder(body: () => V) { lazy val value: V = body() }
  private val m = TrieMap.empty[K, Holder]

  /** Returns the memoized value for `key`, running `body` exactly once
    * per key even under concurrent first access.
    */
  def getOrElseUpdate(key: K, body: => V): V =
    m.getOrElseUpdate(key, new Holder(() => body)).value
}
