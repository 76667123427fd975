package graft.sink

import org.scalatest.funsuite.AnyFunSuite
import Resilience._

/** Deterministic-clock specs for the sink resilience primitives
  * (reference parity: rate_limiter.py token bucket, circuit_breaker.py
  * state machine, client backoff policy).
  */
class ResilienceSpec extends AnyFunSuite {

  /** Manually-advanced nano clock. */
  private final class FakeClock(var now: Long = 0L) {
    def tick(seconds: Double): Unit = now += (seconds * 1e9).toLong
    def apply(): Long = now
  }

  test("token bucket: burst drains, refills at rate/per, caps at burst") {
    val c = new FakeClock
    val tb = new TokenBucket(rate = 100, perSeconds = 60, burst = 10,
      clock = c.apply _)
    // the full burst is available immediately, then exhausted
    assert((1 to 10).forall(_ => tb.tryAcquire()))
    assert(!tb.tryAcquire())
    // refill: 100 tokens / 60 s → 0.6 s buys one token
    assert(tb.delayFor() > 0.59 && tb.delayFor() < 0.61)
    c.tick(0.6)
    assert(tb.tryAcquire())
    assert(!tb.tryAcquire())
    // a long idle period caps at burst, not rate*elapsed
    c.tick(3600)
    assert(tb.available > 9.99 && tb.available <= 10.0)
  }

  test("circuit breaker: threshold trips, timeout half-opens, successes close") {
    val c = new FakeClock
    val cb = new CircuitBreaker(failureThreshold = 5,
      recoveryTimeoutSeconds = 60, successThreshold = 2, clock = c.apply _)
    def boom(): Unit = intercept[RuntimeException] {
      cb.call(throw new RuntimeException("x"))
    }
    // four failures: still closed (threshold is 5)
    (1 to 4).foreach(_ => boom())
    assert(cb.state == Closed)
    boom()
    assert(cb.state == Open)
    // open: calls rejected WITHOUT invoking the function
    var invoked = false
    intercept[CircuitOpenException] { cb.call { invoked = true } }
    assert(!invoked)
    // before the timeout: still open; after: half-open
    c.tick(59); assert(cb.state == Open)
    c.tick(2); assert(cb.state == HalfOpen)
    // one success is not enough (successThreshold = 2)
    cb.call(())
    assert(cb.state == HalfOpen)
    cb.call(())
    assert(cb.state == Closed)
    // a half-open failure re-opens immediately
    (1 to 5).foreach(_ => boom())
    c.tick(61); assert(cb.state == HalfOpen)
    boom()
    assert(cb.state == Open)
    // closed-state successes reset the failure count
    c.tick(61); cb.call(()); cb.call(())
    assert(cb.state == Closed)
    (1 to 4).foreach(_ => boom())
    cb.call(())          // resets consecutive failures
    (1 to 4).foreach(_ => boom())
    assert(cb.state == Closed) // never reached 5 in a row
  }

  test("fatal throwables are not retried and do not trip the breaker") {
    // InterruptedException during a streaming shutdown must propagate
    // on the FIRST attempt and must not count as a service failure
    var calls = 0
    intercept[InterruptedException] {
      withRetries(maxAttempts = 5, sleep = _ => ()) {
        calls += 1; throw new InterruptedException("stop")
      }
    }
    assert(calls == 1)
    val c = new FakeClock
    val cb = new CircuitBreaker(failureThreshold = 1, clock = c.apply _)
    intercept[InterruptedException] {
      cb.call(throw new InterruptedException("stop"))
    }
    assert(cb.state == Closed) // not evidence of a service outage
  }

  test("half-open admits at most successThreshold concurrent probes") {
    val c = new FakeClock
    val cb = new CircuitBreaker(failureThreshold = 1,
      recoveryTimeoutSeconds = 60, successThreshold = 2, clock = c.apply _)
    intercept[RuntimeException] { cb.call(throw new RuntimeException("x")) }
    c.tick(61)
    assert(cb.state == HalfOpen)
    // simulate two in-flight probes by entering call() on blocked fns
    val gate = new java.util.concurrent.CountDownLatch(1)
    val started = new java.util.concurrent.CountDownLatch(2)
    val probes = (1 to 2).map(_ => new Thread(() =>
      cb.call { started.countDown(); gate.await(); () }))
    probes.foreach(_.start())
    started.await()
    // a third caller is rejected instead of stampeding the service
    var invoked = false
    intercept[CircuitOpenException] { cb.call { invoked = true } }
    assert(!invoked)
    gate.countDown()
    probes.foreach(_.join())
    assert(cb.state == Closed) // the two probes' successes closed it
  }

  test("token requests above burst fail fast; exact-sleep boundary holds") {
    val c = new FakeClock
    val tb = new TokenBucket(rate = 7, perSeconds = 13, burst = 10,
      clock = c.apply _)
    intercept[IllegalArgumentException] { tb.tryAcquire(15) }
    intercept[IllegalArgumentException] { tb.delayFor(15) }
    // drain, then sleep EXACTLY delayFor(): acquisition must succeed
    // for awkward rate/per ratios (ulp padding)
    (1 to 10).foreach(_ => tb.tryAcquire())
    for (_ <- 1 to 50) {
      val d = tb.delayFor(1.0)
      c.tick(d)
      assert(tb.tryAcquire(), s"exact-sleep acquire failed after $d")
    }
  }

  test("backoff: exponential with cap, deterministic jitter in [0, 25%)") {
    val d = (0 to 6).map(backoffSeconds(_))
    assert(d(0) >= 1.0 && d(0) < 1.25)
    assert(d(1) >= 2.0 && d(1) < 2.5)
    assert(d(4) >= 16.0 && d(4) < 20.0)
    assert(d(6) >= 30.0 && d(6) < 37.5) // capped at 30 before jitter
    assert(d == (0 to 6).map(backoffSeconds(_))) // rerun-stable
  }

  test("backoff: per-writer seeds decorrelate schedules, stay deterministic") {
    def schedule(seed: Long) = (0 to 6).map(backoffSeconds(_, jitterSeed = seed))
    // deterministic per writer (rerun-stable for checkpoint replay)
    assert(schedule(7L) == schedule(7L))
    // distinct writers must NOT retry in lockstep (the thundering-herd
    // decorrelation jitter exists for) — schedules differ pairwise
    val seeds = (0L until 16L).map(schedule)
    assert(seeds.distinct.size == seeds.size,
      "concurrent writers computed identical delay schedules")
    // jitter bounds hold for every seed
    for (s <- 0L until 16L; k <- 0 to 6) {
      val raw = math.min(30.0, math.pow(2.0, k))
      val v = backoffSeconds(k, jitterSeed = s)
      assert(v >= raw && v < raw * 1.25)
    }
  }

  test("withRetries: retries retryable failures, honors breaker, propagates") {
    var calls = 0
    var slept = List.empty[Double]
    val out = withRetries(maxAttempts = 4, sleep = s => slept ::= s) {
      calls += 1
      if (calls < 3) throw new RuntimeException("transient")
      "ok"
    }
    assert(out == "ok" && calls == 3 && slept.length == 2)
    // non-retryable: a single attempt
    calls = 0
    intercept[IllegalArgumentException] {
      withRetries(maxAttempts = 4,
        isRetryable = !_.isInstanceOf[IllegalArgumentException],
        sleep = _ => ()) {
        calls += 1; throw new IllegalArgumentException("fatal")
      }
    }
    assert(calls == 1)
    // an OPEN breaker short-circuits instead of burning attempts
    val c = new FakeClock
    val cb = new CircuitBreaker(failureThreshold = 1, clock = c.apply _)
    intercept[RuntimeException] { cb.call(throw new RuntimeException("x")) }
    calls = 0
    intercept[CircuitOpenException] {
      withRetries(maxAttempts = 4, breaker = Some(cb), sleep = _ => ()) {
        calls += 1; "never"
      }
    }
    assert(calls == 0)
  }
}
