package graft

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Concurrent

/** The concurrency helper's contract: order-preserving results,
  * fail-fast propagation, single-item short-circuit (no pool), and
  * genuine overlap (the property the Spark callers buy). */
class ConcurrentSpec extends AnyFunSuite {

  test("results keep item order") {
    val out = Concurrent.mapInParallel(Seq(3, 1, 2)) { i =>
      Thread.sleep(i * 20L); i * 10
    }
    assert(out == Seq(30, 10, 20))
  }

  test("a chain failure propagates to the caller") {
    val ex = intercept[IllegalStateException] {
      Concurrent.mapInParallel(Seq(1, 2, 3)) { i =>
        if (i == 2) throw new IllegalStateException(s"chain $i")
        i
      }
    }
    assert(ex.getMessage == "chain 2")
  }

  test("single item runs on the calling thread (no pool)") {
    val caller = Thread.currentThread()
    val ran = Concurrent.mapInParallel(Seq(42)) { i =>
      assert(Thread.currentThread() eq caller); i + 1
    }
    assert(ran == Seq(43))
  }

  test("empty input returns empty") {
    assert(Concurrent.mapInParallel(Seq.empty[Int])(identity).isEmpty)
  }

  test("maxWaitSec bound: a wedged chain throws a diagnostic NAMING it") {
    System.setProperty("graft.concurrent.waitLogSec", "1")
    System.setProperty("graft.concurrent.maxWaitSec", "2")
    try {
      val ex = intercept[java.util.concurrent.TimeoutException] {
        Concurrent.mapInParallel(Seq("fast-chain", "wedged-chain")) { s =>
          if (s == "wedged-chain") {
            // a chain that never completes on its own (interruptible, so
            // the bound's shutdownNow cleans it up)
            try Thread.sleep(3600000L)
            catch { case _: InterruptedException => () }
          }
          s.length
        }
      }
      assert(ex.getMessage.contains("maxWaitSec=2"))
      assert(ex.getMessage.contains("wedged-chain"),
        s"diagnostic must name the stuck chain: ${ex.getMessage}")
      assert(!ex.getMessage.contains("fast-chain"),
        s"finished chains must not be listed: ${ex.getMessage}")
    } finally {
      System.clearProperty("graft.concurrent.waitLogSec")
      System.clearProperty("graft.concurrent.maxWaitSec")
    }
  }

  test("chains overlap: n sleeps of t take ~t, not n*t") {
    val inFlight = new AtomicInteger(0)
    val maxSeen = new AtomicInteger(0)
    val t0 = System.nanoTime()
    Concurrent.mapInParallel(1 to 4) { _ =>
      val cur = inFlight.incrementAndGet()
      maxSeen.updateAndGet(m => math.max(m, cur))
      Thread.sleep(200L)
      inFlight.decrementAndGet()
    }
    val wallMs = (System.nanoTime() - t0) / 1000000L
    assert(maxSeen.get() >= 2, s"no overlap observed (max in-flight ${maxSeen.get()})")
    assert(wallMs < 700L, s"4x200ms chains took ${wallMs}ms — serialized")
  }
}
