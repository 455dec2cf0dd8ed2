package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Sources.stageOnceInJvm]]'s memo contract (the r12 ADVICE fix
  * that moved the multi-minute layout write out of the staging map's
  * `computeIfAbsent` bin lock): one staging per key under concurrency,
  * siblings observe completion, and — the path no other spec covered —
  * a FAILED staging is forgotten, so the next caller retries instead of
  * inheriting a poisoned memo (matching `computeIfAbsent`'s
  * exception-not-recorded semantics).
  */
class StageOnceSpec extends AnyFunSuite {

  test("concurrent callers for one key run the staging exactly once") {
    val runs = new AtomicInteger(0)
    val done = new AtomicInteger(0)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (1 to 8).map { _ =>
      Future {
        Sources.stageOnceInJvm("stage-once-spec-k1") {
          runs.incrementAndGet()
          Thread.sleep(200) // widen the race window
        }
        done.incrementAndGet()
      }
    }
    Await.result(Future.sequence(fs), 30.seconds)
    assert(runs.get() === 1, "staging body must run exactly once per key")
    assert(done.get() === 8, "every caller must return after completion")
  }

  test("a failed staging is retried by the next caller") {
    val attempts = new AtomicInteger(0)
    val boom = intercept[RuntimeException] {
      Sources.stageOnceInJvm("stage-once-spec-k2") {
        attempts.incrementAndGet()
        throw new RuntimeException("staging failed")
      }
    }
    assert(boom.getMessage === "staging failed")
    // the failure must not be memoized: the next caller re-runs the body
    Sources.stageOnceInJvm("stage-once-spec-k2") {
      attempts.incrementAndGet()
    }
    assert(attempts.get() === 2, "failed staging must be forgotten and retried")
    // and a completed staging IS memoized: a third call never re-runs
    Sources.stageOnceInJvm("stage-once-spec-k2") {
      attempts.incrementAndGet()
    }
    assert(attempts.get() === 2, "completed staging must be memoized")
  }

  // r13 ADVICE fix: waiters CONCURRENT with a failing staging must also
  // retry (loop back through putIfAbsent), not fail-fast with a wrapped
  // CompletionException — the semantics computeIfAbsent waiters had.
  test("waiters concurrent with a failed staging retry until one succeeds") {
    val attempts = new AtomicInteger(0)
    val succeeded = new AtomicInteger(0)
    val firstEntered = new java.util.concurrent.CountDownLatch(1)
    val waitersQueued = new java.util.concurrent.CountDownLatch(1)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val owner = Future {
      intercept[RuntimeException] {
        Sources.stageOnceInJvm("stage-once-spec-k3") {
          attempts.incrementAndGet()
          firstEntered.countDown()
          // hold the failure until the waiters are parked on our future
          waitersQueued.await(10, java.util.concurrent.TimeUnit.SECONDS)
          throw new RuntimeException("owner failed")
        }
      }
    }
    firstEntered.await(10, java.util.concurrent.TimeUnit.SECONDS)
    val waiters = (1 to 4).map { _ =>
      Future {
        Sources.stageOnceInJvm("stage-once-spec-k3") {
          attempts.incrementAndGet()
        }
        succeeded.incrementAndGet()
      }
    }
    Thread.sleep(300) // let the waiters reach prior.join()
    waitersQueued.countDown()
    Await.result(Future.sequence(waiters :+ owner.map(_ => ())), 30.seconds)
    assert(succeeded.get() === 4,
      "every waiter must eventually return from a successful staging")
    assert(attempts.get() === 2,
      "exactly one retry owner re-runs the body after the failure")
  }
}
