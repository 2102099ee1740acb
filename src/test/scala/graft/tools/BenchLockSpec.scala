package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The bench exclusivity lock: one measurement harness at a time per box.
  * (Two rounds of phantom bench regressions traced to overlapping harness
  * runs — the lock turns silent contamination into a fast refusal.)
  */
class BenchLockSpec extends AnyFunSuite {

  test("second acquire is refused and names the holder; release frees it") {
    BenchLock.acquire("first-harness") match {
      case Left(h) => fail(s"lock unexpectedly held by: $h (stray harness running?)")
      case Right(release) =>
        try {
          BenchLock.acquire("second-harness") match {
            case Right(r2) => r2(); fail("overlapping acquire must be refused")
            case Left(holder) =>
              assert(holder.contains("first-harness"),
                s"refusal must name the holder, got: $holder")
              assert(holder.contains("pid="), s"holder info must carry a pid: $holder")
          }
        } finally release()
        // after release the lock is free again
        BenchLock.acquire("third-harness") match {
          case Left(h) => fail(s"lock not released: $h")
          case Right(r3) => r3()
        }
    }
  }

  test("lock is held across processes, not just in-JVM (fcntl semantics)") {
    // a child process tries to take the same lock while we hold it; the
    // OS-level lock must refuse it (this is the actual two-sbt-runs case)
    BenchLock.acquire("parent-harness") match {
      case Left(h) => fail(s"lock unexpectedly held by: $h")
      case Right(release) =>
        try {
          val probe = new ProcessBuilder("python3", "-c",
            """import fcntl, sys
f = open("/tmp/graft-bench.lock", "a+")
try:
    fcntl.lockf(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
    sys.exit(0)  # acquired: BAD, parent holds it
except OSError:
    sys.exit(3)  # refused: GOOD
""").start()
          assert(probe.waitFor() === 3,
            "child process acquired the lock while the parent held it")
        } finally release()
    }
  }
}
