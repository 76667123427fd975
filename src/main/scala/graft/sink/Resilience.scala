package graft.sink

/** Client-side resilience primitives for a materialization sink — the
  * pure state machines of the reference's upload stack, re-expressed
  * without its network layer (the HTTP client itself stays out of scope
  * per the brief: no egress in this sandbox). A `foreachBatch` sink
  * writer wires these around its calls exactly as the reference's
  * FabricClient does.
  *
  * Parity contract (reference files):
  *  - token bucket: rate/per with burst capacity, fractional refill
  *    over elapsed time; non-blocking acquire plus an exact
  *    delay-until-available so callers own the sleep
  *    (`src/core/platform/resilience/rate_limiter.py:43-200`; defaults
  *    rate 100/min, burst 10 — `src/constants.py:87-93`);
  *  - circuit breaker: CLOSED → OPEN after `failureThreshold`
  *    consecutive failures, OPEN → HALF_OPEN after `recoveryTimeout`,
  *    HALF_OPEN → CLOSED after `successThreshold` successes, any
  *    half-open failure re-opens
  *    (`src/core/platform/resilience/circuit_breaker.py:60-340`;
  *    threshold 5 / timeout 60 s — `src/constants.py:104-106`);
  *  - retry with exponential backoff + deterministic jitter for
  *    retryable failures (`src/core/platform/fabric_client.py` policy).
  *
  * All time flows through an injected `clock` (nanos), so behavior is
  * deterministic and the specs need no sleeps; instances are
  * thread-safe (a sink writer is shared across streaming batches).
  */
object Resilience {

  final class TokenBucket(rate: Double, perSeconds: Double, burst: Double,
                          clock: () => Long = System.nanoTime _) {
    require(rate > 0 && perSeconds > 0 && burst >= 1)
    private[this] var tokens: Double = burst
    private[this] var last: Long = clock()

    private def refill(): Unit = {
      val now = clock()
      val elapsed = math.max(0L, now - last) / 1e9
      tokens = math.min(burst, tokens + elapsed * rate / perSeconds)
      last = now
    }

    /** Non-blocking: take `n` tokens if available. `n` must fit in the
      * bucket — a request above `burst` can NEVER succeed (refill caps
      * there), so it fails fast instead of letting the documented
      * sleep-then-retry wire-up spin forever. */
    def tryAcquire(n: Double = 1.0): Boolean = synchronized {
      require(n <= burst, s"requested $n tokens > burst capacity $burst")
      refill()
      if (tokens >= n) { tokens -= n; true } else false
    }

    /** Seconds until `n` tokens will be available (0 if now), padded by
      * one nanosecond — the clock's own resolution — so sleeping exactly
      * this long always satisfies the next tryAcquire (the raw boundary
      * is float-exact, and a nano-truncating sleep would land just
      * under `n`). Callers sleeping on a coarser clock must round UP to
      * their granularity. */
    def delayFor(n: Double = 1.0): Double = synchronized {
      require(n <= burst, s"requested $n tokens > burst capacity $burst")
      refill()
      if (tokens >= n) 0.0
      else (n - tokens) * perSeconds / rate + 1e-9
    }

    def available: Double = synchronized { refill(); tokens }

    def reset(): Unit = synchronized { tokens = burst; last = clock() }
  }

  sealed trait CircuitState
  case object Closed extends CircuitState
  case object Open extends CircuitState
  case object HalfOpen extends CircuitState

  final class CircuitOpenException(val remainingSeconds: Double)
    extends RuntimeException(
      f"circuit open; retry in $remainingSeconds%.1f s")

  final class CircuitBreaker(failureThreshold: Int = 5,
                             recoveryTimeoutSeconds: Double = 60.0,
                             successThreshold: Int = 2,
                             clock: () => Long = System.nanoTime _) {
    require(failureThreshold >= 1 && successThreshold >= 1 &&
      recoveryTimeoutSeconds > 0)
    private[this] var st: CircuitState = Closed
    private[this] var failures = 0
    private[this] var halfOpenSuccesses = 0
    private[this] var halfOpenInFlight = 0
    private[this] var openedAt = 0L

    private def remaining(now: Long): Double =
      math.max(0.0, recoveryTimeoutSeconds - (now - openedAt) / 1e9)

    def state: CircuitState = synchronized {
      if (st == Open && remaining(clock()) <= 0) { // lazily half-open
        st = HalfOpen; halfOpenSuccesses = 0; halfOpenInFlight = 0
      }
      st
    }

    /** Run `f` through the breaker. Open circuit → CircuitOpenException
      * without invoking `f`; `f`'s own SERVICE failure (NonFatal) is
      * counted and rethrown; fatal/cancellation throwables propagate
      * WITHOUT tripping the breaker (an interrupted sink thread is not
      * evidence the remote service is down). HALF_OPEN admits at most
      * `successThreshold` concurrent probes — a microbatch fanning many
      * writers into a recovering service must not stampede it; excess
      * callers get CircuitOpenException(0) and retry shortly.
      */
    def call[A](f: => A): A = {
      val probing = synchronized {
        state match {
          case Open => throw new CircuitOpenException(remaining(clock()))
          case HalfOpen =>
            if (halfOpenInFlight >= successThreshold)
              throw new CircuitOpenException(0)
            halfOpenInFlight += 1
            true
          case Closed => false
        }
      }
      try {
        val result =
          try f
          catch {
            case scala.util.control.NonFatal(e) => onFailure(); throw e
          }
        onSuccess()
        result
      } finally if (probing) synchronized {
        if (halfOpenInFlight > 0) halfOpenInFlight -= 1
      }
    }

    def onSuccess(): Unit = synchronized {
      state match {
        case HalfOpen =>
          halfOpenSuccesses += 1
          if (halfOpenSuccesses >= successThreshold) { st = Closed; failures = 0 }
        case _ => failures = 0
      }
    }

    def onFailure(): Unit = synchronized {
      state match {
        case HalfOpen => trip()
        case Closed =>
          failures += 1
          if (failures >= failureThreshold) trip()
        case Open => ()
      }
    }

    private def trip(): Unit = {
      st = Open; openedAt = clock(); failures = 0; halfOpenInFlight = 0
    }
  }

  /** Exponential backoff schedule with deterministic jitter (Knuth
    * multiplicative hash of the attempt index — rerun-stable, per the
    * pipeline checkpoint contract):
    * delay(k) = min(cap, base·2^k) · (1 + jitter(k)), jitter ∈ [0, 0.25).
    *
    * `jitterSeed` decorrelates CONCURRENT writers (round-5 advisor: a
    * pure function of the attempt index puts every executor's retries in
    * lockstep — zero thundering-herd protection, jitter's whole job).
    * Callers pass a per-writer identity (partition id, task attempt id);
    * the schedule stays deterministic PER WRITER for rerun-stability,
    * and seed 0 reproduces the historical schedule exactly.
    */
  def backoffSeconds(attempt: Int, baseSeconds: Double = 1.0,
                     capSeconds: Double = 30.0, jitterSeed: Long = 0L): Double = {
    require(attempt >= 0)
    val raw = math.min(capSeconds, baseSeconds * math.pow(2.0, attempt))
    val decorrelate = jitterSeed * 0x9E3779B97F4A7C15L // 0 for seed 0
    val jitter =
      Math.floorMod((attempt * 2654435761L) ^ decorrelate, 1000L) / 4000.0
    raw * (1.0 + jitter)
  }

  /** Retry `f` up to `maxAttempts` through an optional breaker,
    * sleeping via `sleep` (injected for tests). Retries only NonFatal
    * failures `isRetryable` accepts — interrupts/OOM/linkage errors
    * propagate immediately (retrying a cancelled or broken JVM blocks
    * shutdown for nothing); the last failure propagates.
    */
  def withRetries[A](maxAttempts: Int,
                     breaker: Option[CircuitBreaker] = None,
                     isRetryable: Throwable => Boolean = _ => true,
                     sleep: Double => Unit = s =>
                       Thread.sleep((s * 1000).toLong),
                     jitterSeed: Long = 0L)(f: => A): A = {
    require(maxAttempts >= 1)
    var attempt = 0
    while (true) {
      try {
        return breaker.map(_.call(f)).getOrElse(f)
      } catch {
        case e: CircuitOpenException => throw e // not a service failure
        case scala.util.control.NonFatal(e) =>
          attempt += 1
          if (attempt >= maxAttempts || !isRetryable(e)) throw e
          sleep(backoffSeconds(attempt - 1, jitterSeed = jitterSeed))
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
