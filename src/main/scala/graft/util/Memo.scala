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
  Memo.register(this)
  private final class Holder(body: () => V) { lazy val value: V = body() }
  private val m = TrieMap.empty[K, Holder]

  /** Returns the memoized value for `key`, running `body` exactly once
    * per key even under concurrent first access.
    */
  def getOrElseUpdate(key: K, body: => V): V =
    m.getOrElseUpdate(key, new Holder(() => body)).value

  /** Drops every memoized entry (the JVM-side references). The next
    * access re-runs the body and re-seals.
    */
  def clear(): Unit = m.clear()
}

/** Global registry of every Memo instance — the sealed session stores
  * are all memoized through this class, so a long-lived driver session
  * (a 281-query bench run, a production service) can release them
  * between work phases: [[clearAll]] drops the JVM references, and the
  * caller unpersists the now-unreferenced checkpoint blocks via
  * `SparkContext.getPersistentRDDs` (see Bench's `GRAFT_BENCH_RELEASE`
  * mode). Without this, ~56 sealed `localCheckpoint` stores accumulate
  * in executor storage memory for the whole session — the round-15
  * late-run-drag suspect this hook exists to test and to fix.
  */
object Memo {
  private val all = new java.util.concurrent.ConcurrentLinkedQueue[Memo[_, _]]
  private def register(m: Memo[_, _]): Unit = all.add(m): Unit

  /** Clears every registered Memo. Safe at a quiesced point only: an
    * in-flight query holding a sealed frame whose blocks the caller
    * then unpersists would recompute from a truncated (empty) lineage.
    */
  def clearAll(): Unit = all.forEach(_.clear())
}
