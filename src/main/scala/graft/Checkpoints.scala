package graft

import org.apache.spark.sql.DataFrame

/** Lineage-cut materialization for reused or iterated relations.
  *
  * Operators that feed one relation to several consumers (self-joins, df/tf
  * aggregates, iteration loops) must materialize it once — an uncached
  * subplan behind reuse re-executes per consumer (the recorded round-2
  * lesson). Two modes, selected per session:
  *
  *   - default: `localCheckpoint` — executor-local blocks, zero storage
  *     dependency; right for single-app/local runs, but blocks are lost with
  *     executor failures;
  *   - `spark.conf.set("graft.checkpointDir", hdfsPath)`: RELIABLE
  *     `checkpoint()` into durable storage — a 1000-executor run survives
  *     executor loss mid-query. This is the 100 TB mode; one conf switch
  *     flips every operator in the library, no signature changes.
  *
  * Reliable mode sets the SparkContext checkpoint dir (a documented GLOBAL
  * side effect — Spark appends a per-context UUID subdir, so distinct
  * sessions never collide on the same base path). Because the dir is
  * context-global, the set-dir + checkpoint pair is made atomic under
  * [[checkpointDirLock]]: without it, two concurrent reliable-mode calls in
  * the one driver JVM race — the last `setCheckpointDir` wins and call A's
  * checkpoint lands in call B's directory. The lock serializes the
  * checkpoint JOBS of concurrent library calls (a priced trade: reliable
  * mode buys fault tolerance, not parallel-call throughput); user code that
  * calls `sc.setCheckpointDir` directly while a library checkpoint is in
  * flight is outside the lock and remains the caller's responsibility.
  * Spark does not delete
  * checkpoint files on its own; operate the base path with a TTL/cleanup
  * policy, or use [[graft.dedup.Components]]' explicit parameter for the
  * iterative case where superseded snapshots are deleted eagerly.
  */
object Checkpoints {

  /** Session conf key holding the durable checkpoint base path. */
  val ConfKey = "graft.checkpointDir"

  /** JVM-wide lock making the (context-global) `setCheckpointDir` +
    * `checkpoint()` pair atomic across every reliable-mode call in this
    * library — [[materialize]] here and [[graft.dedup.Components]]'
    * iteration checkpoints share it.
    */
  private[graft] val checkpointDirLock = new Object

  /** Materialize `df` eagerly and cut its lineage; mode per the session conf
    * (explicit `checkpointDir` overrides it).
    */
  def materialize(df: DataFrame, checkpointDir: Option[String] = None): DataFrame = {
    val dir = checkpointDir
      .orElse(df.sparkSession.conf.getOption(ConfKey))
      .filter(_.nonEmpty)
    dir match {
      case Some(d) =>
        // the lock guards only the set-dir + checkpoint REGISTRATION pair:
        // the checkpoint path is captured when `checkpoint()` is called
        // (ReliableRDDCheckpointData resolves it at construction), so the
        // materializing job itself can run OUTSIDE the lock — one long
        // reliable-mode materialize no longer serializes every concurrent
        // reliable checkpoint in the JVM (dedup iterations, q121 stream
        // batches), only the microsecond dir-swap does
        val lazyCp = checkpointDirLock.synchronized {
          df.sparkSession.sparkContext.setCheckpointDir(d)
          df.checkpoint(eager = false)
        }
        lazyCp.count() // materialize + write the checkpoint, lock-free
        lazyCp
      case None => df.localCheckpoint(eager = true)
    }
  }
}
