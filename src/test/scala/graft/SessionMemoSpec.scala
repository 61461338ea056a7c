package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** Contract of [[SessionMemo]] — the container behind every staging /
  * model memo in the library. Pins the round-15 per-key locking change:
  * compute-once per key, parallel first-touch across DIFFERENT keys
  * (the earlier memo-wide lock serialized unrelated stagings), and
  * retry after a failed thunk. */
class SessionMemoSpec extends SparkSpecBase {

  test("same-key racers share one computation") {
    val memo = new SessionMemo[String, Int]
    val calls = new AtomicInteger(0)
    val start = new CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        start.await()
        results.add(memo.getOrElseUpdate(spark, "k") {
          calls.incrementAndGet()
          Thread.sleep(50)
          42
        })
      })
    }
    threads.foreach(_.start())
    start.countDown()
    threads.foreach(_.join(10000))
    assert(calls.get() === 1, "thunk must run exactly once per key")
    assert(results.size === 8 && results.stream().allMatch(_ == 42))
  }

  test("different keys compute in parallel (no memo-wide lock)") {
    val memo = new SessionMemo[String, Int]
    // Each thunk waits for the OTHER to have started: under a memo-wide
    // lock this deadlocks past the await timeout; per-key locking lets
    // both proceed and the latches release each other.
    val aStarted = new CountDownLatch(1)
    val bStarted = new CountDownLatch(1)
    var overlapped = true
    val ta = new Thread(() => memo.getOrElseUpdate(spark, "a") {
      aStarted.countDown()
      if (!bStarted.await(5, TimeUnit.SECONDS)) overlapped = false
      1
    })
    val tb = new Thread(() => memo.getOrElseUpdate(spark, "b") {
      bStarted.countDown()
      if (!aStarted.await(5, TimeUnit.SECONDS)) overlapped = false
      2
    })
    ta.start(); tb.start()
    ta.join(10000); tb.join(10000)
    assert(overlapped, "first-touch of two keys must overlap in time")
    assert(memo(spark, "a") === 1 && memo(spark, "b") === 2)
  }

  test("a thunk that throws is retried by the next caller") {
    val memo = new SessionMemo[String, Int]
    val calls = new AtomicInteger(0)
    def attempt(): Int = memo.getOrElseUpdate(spark, "k") {
      if (calls.incrementAndGet() == 1) sys.error("transient staging failure")
      7
    }
    intercept[RuntimeException](attempt())
    assert(attempt() === 7, "second caller must re-run the failed thunk")
    assert(calls.get() === 2)
    assert(attempt() === 7 && calls.get() === 2, "success is memoized")
  }

  test("get does not populate; update overwrites") {
    val memo = new SessionMemo[String, Int]
    assert(memo.get(spark, "k").isEmpty)
    memo.update(spark, "k", 1)
    assert(memo.get(spark, "k") === Some(1))
    memo.update(spark, "k", 2)
    assert(memo(spark, "k") === 2)
    memo.clear()
    assert(memo.get(spark, "k").isEmpty)
  }
}
