package graft.engine

import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

/** Load-shedding semantics of the rez-manager analog: free handles are
  * taken immediately, waiters queue up to maxQueue, and saturation
  * beyond that fails fast with the [426] signal instead of convoying
  * (/root/reference/internal/rez/mercy.go + README.md). */
class AdmissionSpec extends AnyFunSuite {

  test("a free pool admits; handles are released on exit and on exception") {
    val a = new Admission(Map("write" -> 2))
    assert(a.run("write")(1 + 1) == 2)
    intercept[RuntimeException] { a.run("write")(throw new RuntimeException("op")) }
    // both handles free again: two nested acquires succeed
    assert(a.run("write")(a.run("write")(42)) == 42)
  }

  test("saturated pool with a full queue sheds load with [426]") {
    val a = new Admission(Map("write" -> 1), maxQueue = 0)
    val entered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val holder = new Thread(() => a.run("write") {
      entered.countDown()
      release.await(10, TimeUnit.SECONDS); ()
    })
    holder.start()
    assert(entered.await(10, TimeUnit.SECONDS))
    // pool saturated, queue size 0 → immediate load-shed
    val e = intercept[ResourceExhaustedException] { a.run("write")(()) }
    assert(e.getMessage.contains("[426]"))
    release.countDown()
    holder.join(10000)
    // handle returned → admitted again
    assert(a.run("write")(7) == 7)
  }

  test("waiters inside the queue bound block until a handle frees") {
    val a = new Admission(Map("write" -> 1), maxQueue = 1)
    val entered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val holder = new Thread(() => a.run("write") {
      entered.countDown()
      release.await(10, TimeUnit.SECONDS); ()
    })
    holder.start()
    assert(entered.await(10, TimeUnit.SECONDS))
    @volatile var got = 0
    val waiter = new Thread(() => got = a.run("write")(5))
    waiter.start()
    // the single queue slot is taken; give the waiter time to park
    Thread.sleep(100)
    assert(a.queuedWaiters("write") == 1)
    release.countDown()
    waiter.join(10000)
    assert(got == 5 && a.queuedWaiters("write") == 0)
  }

  test("unknown pools run unguarded") {
    val a = Admission.unlimited
    assert(a.run("anything")(3) == 3)
  }

  test("gauges report occupancy and queue depth under load") {
    val a = new Admission(Map("write" -> 1, "point_op" -> 4), maxQueue = 8)
    assert(a.gauges == Map(
      "write" -> PoolGauge(1, 0, 0), "point_op" -> PoolGauge(4, 0, 0)))
    val entered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val holder = new Thread(() => a.run("write") {
      entered.countDown()
      release.await(10, TimeUnit.SECONDS); ()
    })
    holder.start()
    assert(entered.await(10, TimeUnit.SECONDS))
    val waiter = new Thread(() => a.run("write")(()))
    waiter.start()
    Thread.sleep(100) // let the waiter park in the queue
    assert(a.gauges("write") == PoolGauge(1, 1, 1),
      s"saturated pool with one waiter, got ${a.gauges("write")}")
    assert(a.gauges("point_op") == PoolGauge(4, 0, 0))
    release.countDown()
    holder.join(10000); waiter.join(10000)
    assert(a.gauges("write") == PoolGauge(1, 0, 0))
  }
}
