package graft.jobs

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** Concurrency contract of the serving-cache LRU (the LocalLookup /
  * IndexExport hot path): hits are never serialized behind another
  * key's compute, `mk` memoizes per key under racing gets, eviction is
  * bounded and least-recently-used, and a failed compute retries. The
  * round-12 global-monitor form deadlocks the first test (a hit blocks
  * on a cold miss of a DIFFERENT key) — this spec is the regression
  * pin for that serving-tier cliff.
  */
final class LruSpec extends AnyFunSuite {

  test("a hit on one key completes while another key's compute is blocked") {
    val lru = new Lru[String, Int](8)
    assert(lru.get("warm")(_ => 1) == 1)
    val started = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    try {
      val slow = pool.submit[Int](() =>
        lru.get("cold") { _ => started.countDown(); release.await(); 2 })
      assert(started.await(5, TimeUnit.SECONDS), "cold compute never started")
      // with compute-under-global-lock this .get would time out: the
      // hit on "warm" would queue behind "cold"'s in-flight mk
      val hit = pool.submit[Int](() => lru.get("warm")(_ => -1))
      assert(hit.get(5, TimeUnit.SECONDS) == 1)
      release.countDown()
      assert(slow.get(5, TimeUnit.SECONDS) == 2)
    } finally { release.countDown(); pool.shutdownNow(); () }
  }

  test("mk runs at most once per key under racing gets") {
    val lru = new Lru[Int, Int](64)
    val computes = new AtomicInteger(0)
    val pool = Executors.newFixedThreadPool(8)
    try {
      val gate = new CountDownLatch(1)
      val futs = (0 until 8).map(_ => pool.submit[Int] { () =>
        gate.await()
        lru.get(42) { k => computes.incrementAndGet(); Thread.sleep(50); k * 2 }
      })
      gate.countDown()
      futs.foreach(f => assert(f.get(5, TimeUnit.SECONDS) == 84))
      assert(computes.get() == 1, s"mk ran ${computes.get()} times")
    } finally { pool.shutdown(); () }
  }

  test("eviction is bounded and least-recently-used") {
    val lru = new Lru[Int, Int](3)
    (1 to 3).foreach(k => lru.get(k)(identity))
    lru.get(1)(_ => fail("1 should be cached")) // touch 1: now 2 is LRU
    lru.get(4)(identity)                        // evicts 2
    assert(lru.size == 3)
    assert(lru.peek(1).contains(1))
    assert(lru.peek(2).isEmpty)
    assert(lru.peek(3).contains(3))
    assert(lru.peek(4).contains(4))
  }

  test("a failed mk surfaces to every waiter and the next get retries") {
    val lru = new Lru[String, Int](8)
    val boom = intercept[IllegalStateException] {
      lru.get("k")(_ => throw new IllegalStateException("boom"))
    }
    assert(boom.getMessage == "boom")
    assert(lru.peek("k").isEmpty)
    assert(lru.get("k")(_ => 7) == 7)
  }

  test("removeIf drops matching keys only") {
    val lru = new Lru[String, Int](8)
    lru.get("a/1")(_ => 1); lru.get("a/2")(_ => 2); lru.get("b/1")(_ => 3)
    lru.removeIf(_.startsWith("a/"))
    assert(lru.size == 1)
    assert(lru.peek("b/1").contains(3))
  }
}
