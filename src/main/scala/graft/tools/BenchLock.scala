package graft.tools

/** Machine-wide exclusivity for measurement harnesses.
  *
  * Two rounds in a row, a "regression" in the bench sweep traced to a
  * CONCURRENT harness run on the same box (r4: four per-query deltas, all
  * recovered; r5: one reconciliation sweep provably contaminated by an
  * overlapping ImportBench — q81 read 10.7 s vs its 3.6 s clean median).
  * Any two timing jobs sharing the 32 cores corrupt each other's numbers
  * without failing, which is worse than failing. So every harness that
  * prints a number somebody might compare (Bench, ImportBench, Profile,
  * the Debug* A/B harnesses) takes this lock and REFUSES to run when
  * another holds it.
  *
  * Mechanism: an OS-level advisory lock (`FileChannel.tryLock`) on
  * `/tmp/graft-bench.lock`. The kernel releases it when the holding
  * process exits — crashed runs cannot leave a stale lock, unlike
  * existence-check lockfiles. The file body carries the holder's harness
  * name, pid and start time so the refusal message says WHO is running.
  */
object BenchLock {

  val LockPath = "/tmp/graft-bench.lock"

  /** Try to take the lock. Right(release) on success — the file body now
    * names this holder; Left(holderInfo) when another harness (any process,
    * or an overlapping attempt in this JVM) already holds it.
    */
  private[graft] def acquire(harness: String): Either[String, () => Unit] = {
    val path = java.nio.file.Paths.get(LockPath)
    val ch = java.nio.channels.FileChannel.open(path,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE,
      java.nio.file.StandardOpenOption.READ)
    val lock =
      try ch.tryLock()
      catch { case _: java.nio.channels.OverlappingFileLockException => null }
    if (lock == null) {
      val holder =
        try {
          val buf = java.nio.ByteBuffer.allocate(512)
          val n = ch.read(buf, 0L)
          if (n > 0) new String(buf.array(), 0, n, "UTF-8").trim else "unknown"
        } catch { case _: Throwable => "unknown" }
      ch.close()
      Left(holder)
    } else {
      val info = s"$harness pid=${ProcessHandle.current().pid()} " +
        s"since ${java.time.Instant.now()}\n"
      ch.truncate(0)
      ch.write(java.nio.ByteBuffer.wrap(info.getBytes("UTF-8")), 0L)
      ch.force(true)
      Right(() => { lock.release(); ch.close() })
    }
  }

  /** Run `body` holding the machine-wide bench lock; exit(2) with a clear
    * message naming the current holder if another harness already holds it.
    */
  def exclusive[T](harness: String)(body: => T): T = acquire(harness) match {
    case Left(holder) =>
      System.err.println(
        s"[bench-lock] $LockPath is held by: $holder\n" +
        s"[bench-lock] refusing to run '$harness' concurrently — overlapping " +
        "measurement jobs share the cores and fake per-query regressions " +
        "(see BENCH.md noise-floor analysis). Wait for the holder to finish, " +
        "then re-run.")
      sys.exit(2)
    case Right(release) =>
      try body finally release()
  }
}
