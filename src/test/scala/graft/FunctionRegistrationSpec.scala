package graft

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}
import java.util.concurrent.CountDownLatch

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** Pins GraftFunctions' registration discipline: a concurrent caller
  * must not observe a session as "registered" until registration has
  * actually COMPLETED (the old mark-first code let a second thread
  * return early and hit "undefined function minhash_bands" mid-
  * registration), and the body must run at most once per session. */
class FunctionRegistrationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("second caller blocks until the first caller's registration completes") {
    val session = spark.newSession()
    val bodyDone = new AtomicBoolean(false)
    val bodyRuns = new AtomicInteger(0)
    val firstInBody = new CountDownLatch(1)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()

    val first = new Thread(() =>
      GraftFunctions.registerWith(session, _ => {
        bodyRuns.incrementAndGet()
        firstInBody.countDown()
        Thread.sleep(300) // a slow registration in flight
        bodyDone.set(true)
      }))
    val second = new Thread(() => {
      firstInBody.await() // enter only once the first thread is mid-body
      GraftFunctions.registerWith(session, _ => bodyRuns.incrementAndGet())
      // the fixed contract: when registerWith returns, registration is done
      if (!bodyDone.get())
        failures.add("second caller returned before registration completed")
    })
    first.start(); second.start()
    first.join(10000); second.join(10000)
    assert(failures.isEmpty, failures.toString)
    assert(bodyRuns.get() == 1, "registration body must run exactly once")
  }

  test("register is idempotent and functions resolve afterwards") {
    GraftFunctions.register(spark)
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT size(minhash_bands(array('a b c','b c d'), 16, 8)) AS n")
      .head().getInt(0)
    assert(r > 0)
  }
}
