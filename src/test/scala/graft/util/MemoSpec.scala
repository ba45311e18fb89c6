package graft.util

import java.util.concurrent.atomic.AtomicInteger
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

class MemoSpec extends AnyFunSuite {

  test("concurrent first access runs the body exactly once per key") {
    val memo = new Memo[Int, Long]
    val evals = new AtomicInteger(0)
    val threads = 16
    val gate = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(threads)
    try {
      val futures = (1 to threads).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = {
            gate.await()
            memo.getOrElseUpdate(7, { evals.incrementAndGet(); Thread.sleep(20); 42L })
          }
        })
      }
      gate.countDown()
      val results = futures.map(_.get(30, TimeUnit.SECONDS))
      assert(results.forall(_ == 42L))
      // the point of Memo over TrieMap.getOrElseUpdate: no duplicate runs
      assert(evals.get() == 1, s"body evaluated ${evals.get()} times")
    } finally pool.shutdownNow(): Unit
  }

  test("distinct keys evaluate independently; repeat access is cached") {
    val memo = new Memo[String, Int]
    val evals = new AtomicInteger(0)
    assert(memo.getOrElseUpdate("a", { evals.incrementAndGet(); 1 }) == 1)
    assert(memo.getOrElseUpdate("b", { evals.incrementAndGet(); 2 }) == 2)
    assert(memo.getOrElseUpdate("a", { evals.incrementAndGet(); 99 }) == 1)
    assert(evals.get() == 2)
  }
}
