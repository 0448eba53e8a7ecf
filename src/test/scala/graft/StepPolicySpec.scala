package graft

import graft.pipeline.Pipeline

/** Orchestration policy semantics (`sales_pipeline_dag.py:70-76`
  * twin): bounded retries, per-attempt execution timeout, typed
  * failure after exhaustion.
  */
class StepPolicySpec extends SparkSpec {

  test("flaky step succeeds within the retry budget") {
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val got = Pipeline.runStep("flaky", Pipeline.StepPolicy(retries = 2)) {
      if (attempts.incrementAndGet() < 3) sys.error("transient")
      "ok"
    }
    assert(got === "ok")
    assert(attempts.get() === 3)
  }

  test("retries exhausted → StepFailed carries attempts and cause") {
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val e = intercept[Pipeline.StepFailed] {
      Pipeline.runStep("doomed", Pipeline.StepPolicy(retries = 1)) {
        attempts.incrementAndGet(); sys.error("always")
      }
    }
    assert(e.step === "doomed")
    assert(e.attempts === 2)
    assert(attempts.get() === 2)
    assert(e.cause.getMessage === "always")
  }

  test("execution timeout aborts the attempt, then retries") {
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val e = intercept[Pipeline.StepFailed] {
      Pipeline.runStep("slow", Pipeline.StepPolicy(retries = 1, timeoutMs = 150)) {
        attempts.incrementAndGet()
        Thread.sleep(5000)
        "unreachable"
      }
    }
    assert(e.attempts === 2)
    assert(e.cause.isInstanceOf[java.util.concurrent.TimeoutException])
  }

  test("timeout generous enough → step completes normally") {
    val got = Pipeline.runStep("fine", Pipeline.StepPolicy(timeoutMs = 60000)) {
      Thread.sleep(50); 41 + 1
    }
    assert(got === 42)
  }
}
