package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Connected components over a near-duplicate candidate-pair graph — the
  * step that turns LSH pairs into dedup GROUPS with one canonical survivor.
  *
  * Iterative minimum-label propagation WITH pointer jumping: each round every
  * node adopts the smallest label in its neighborhood, then labels are
  * compressed through the label graph (comp := comp-of-comp), giving
  * O(log diameter) rounds instead of O(diameter). Each round is two joins on
  * the (small) edge/label sets — shuffle volume proportional to edges.
  * Deterministic: labels are min() folds.
  *
  * Results are checkpointed between iterations so the lineage doesn't grow
  * exponentially. Two modes:
  *
  *   - default: `localCheckpoint` — zero-HDFS-dependency, right for bounded
  *     local iteration (blocks are lost with executor failures);
  *   - `checkpointDir = Some(dir)`: RELIABLE checkpoints — sets the
  *     SparkContext checkpoint dir and uses `checkpoint()`, so a
  *     1000-executor run survives executor loss mid-iteration. This is the
  *     100 TB mode; pass a durable (HDFS/object-store) path.
  *
  * Reliable-mode caveats: `setCheckpointDir` is a GLOBAL SparkContext
  * mutation. Because this implementation DELETES superseded checkpoint
  * directories (below), each invocation isolates itself under a fresh
  * per-call subdirectory (`dir/cc-<uuid>`), which protects the listing-diff
  * against FOREIGN data: pre-existing files and checkpoints from other
  * sessions/applications sharing the same root are never captured or
  * deleted. Same-context concurrency is handled separately — the dir is
  * re-set and the checkpoint run atomically under
  * [[graft.Checkpoints.checkpointDirLock]] each iteration, so a concurrent
  * `connectedComponents` or `Checkpoints.materialize` call in the same
  * driver JVM cannot redirect this call's checkpoint into its own directory
  * (the pre-lock failure mode: last set-dir wins, call A's LIVE checkpoint
  * lands in call B's dir and B's listing-diff deletes it). The lock
  * serializes concurrent reliable-mode checkpoint jobs; direct user calls
  * to `sc.setCheckpointDir` outside this library are not covered.
  * Spark itself never
  * deletes checkpoint files (`spark.cleaner.referenceTracking.cleanCheckpoints`
  * defaults to false and only triggers on GC), so each iteration would leave
  * its superseded label snapshot on durable storage forever; this
  * implementation instead deletes an iteration's checkpoint as soon as the
  * next one is materialized — only the edge set and the final labels remain
  * on disk when the function returns.
  */
object Components {

  /** @param edges two BIGINT columns (src, dst), undirected
    * @param checkpointDir durable checkpoint location (reliable mode); None
    *                      falls back to the `graft.checkpointDir` session
    *                      conf ([[graft.Checkpoints.ConfKey]] — the one-conf
    *                      switch that flips EVERY operator in the library,
    *                      including the dedup family's component iterations),
    *                      and to localCheckpoint when neither is set
    * @return (node, component) — component = smallest node id reachable
    */
  def connectedComponents(edges: DataFrame, src: String, dst: String,
                          maxIter: Int = 20,
                          checkpointDir: Option[String] = None): DataFrame = {
    val sc = edges.sparkSession.sparkContext
    val effectiveDir = checkpointDir.orElse(
      edges.sparkSession.conf.getOption(graft.Checkpoints.ConfKey).filter(_.nonEmpty))
    // per-call isolation: a fresh subdir means the rdd-* listing-diff below
    // only ever sees THIS run's checkpoints — safe to delete aggressively
    // even when other jobs checkpoint concurrently under the caller's root
    val callDir = effectiveDir.map(_ + "/cc-" + java.util.UUID.randomUUID())
    // reliable-mode checkpoint hygiene: re-set the (context-global) dir and
    // run the checkpoint ATOMICALLY under the shared lock — a concurrent
    // reliable-mode call may have moved the global dir since the last
    // iteration (scaladoc: the pre-lock race put call A's live checkpoint
    // inside call B's dir). Spark appends a fresh UUID subdir on every
    // setCheckpointDir, so each checkpoint here gets a private parent dir;
    // the listing-diff of that parent identifies exactly this checkpoint's
    // rdd-* files, and a superseded iteration's parent can be deleted whole
    // as soon as its successor is materialized (Spark never cleans them).
    def ckptTracked(df: DataFrame): (DataFrame, Set[String]) = callDir match {
      case Some(dir) =>
        // lock only the set-dir + checkpoint REGISTRATION (the path is
        // captured when checkpoint() is called); the materializing job and
        // the rdd-* listing run outside — the listed dir is this call's
        // private UUID subdir, which no concurrent call writes into
        val (lazyCp, resolved) = graft.Checkpoints.checkpointDirLock.synchronized {
          sc.setCheckpointDir(dir)
          (df.checkpoint(eager = false),
            new org.apache.hadoop.fs.Path(sc.getCheckpointDir.get))
        }
        val fs = resolved.getFileSystem(sc.hadoopConfiguration)
        def ls(): Set[String] =
          if (fs.exists(resolved)) fs.listStatus(resolved).map(_.getPath.toString).toSet
          else Set.empty
        val before = ls()
        lazyCp.count() // materialize + write the checkpoint, lock-free
        (lazyCp, ls() -- before)
      case None => (df.localCheckpoint(eager = true), Set.empty[String])
    }
    def deleteDirs(dirs: Set[String]): Unit = dirs.foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      // delete the per-checkpoint UUID parent too — it held only this rdd
      p.getFileSystem(sc.hadoopConfiguration).delete(p.getParent, true)
    }
    // materialize the caller's edge pipeline ONCE before symmetrizing — the
    // two union branches would otherwise re-execute it (edge generation is
    // often the most expensive part, e.g. q56's exact-Jaccard join)
    val (e0, e0Dirs) = ckptTracked(
      edges.select(col(src).cast("long").as("a"), col(dst).cast("long").as("b")))
    val (sym, _) = ckptTracked(e0.union(e0.select(col("b").as("a"), col("a").as("b")))
      .distinct())
    deleteDirs(e0Dirs) // sym is materialized; the raw edge snapshot is dead
    // iteration 0 folded into init: with labels = node ids, the neighbor-min
    // is just min(b) — one aggregate instead of a join round
    var (labels, labelDirs) = ckptTracked(sym.groupBy(col("a"))
      .agg(min(col("b")).as("nb_min"))
      .select(col("a").as("node"), least(col("a"), col("nb_min")).as("comp")))
    def labelSum(l: DataFrame): java.math.BigDecimal =
      l.agg(sum(col("comp").cast(DecimalType(38, 0)))).head().getDecimal(0)
    val debug = sys.env.contains("GRAFT_DEBUG_CC")
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val t0 = System.nanoTime()
      // candidate label per node: min over its own label and neighbors' labels
      val viaNeighbors = sym
        .join(labels.withColumnRenamed("node", "b").withColumnRenamed("comp", "nb_comp"), Seq("b"))
        .groupBy(col("a").as("node")).agg(min(col("nb_comp")).as("nb_min"))
      val propagated = labels.join(viaNeighbors, Seq("node"), "left_outer")
        .select(col("node"), least(col("comp"), coalesce(col("nb_min"), col("comp"))).as("comp"))
      // pointer jumping: comp := comp's own comp (labels are node ids, so the
      // lookup always hits) — collapses chains logarithmically
      val (next, nextDirs) = ckptTracked(propagated
        .join(propagated.select(col("node").as("cnode"), col("comp").as("ccomp")),
          col("comp") === col("cnode"))
        .select(col("node"), col("ccomp").as("comp")))
      // labels only ever DECREASE (min folds), so an unchanged exact sum ⇔
      // a fixpoint — one cheap aggregate instead of a join-based diff count
      val s = labelSum(next)
      deleteDirs(labelDirs) // `next` is materialized; its predecessor is dead
      labels = next
      labelDirs = nextDirs
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      iter += 1
      if (debug) println(f"[cc] iter $iter sum=$s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    labels
  }

  /** Full dedup resolution: candidate pairs → components → per-document
    * (component, is_canonical) where the canonical survivor is the smallest
    * id in its component; unpaired documents are their own canonical.
    */
  def resolveDuplicates(docs: DataFrame, idCol: String, pairs: DataFrame,
                        id1: String = "id1", id2: String = "id2"): DataFrame = {
    val comps = connectedComponents(pairs, id1, id2)
    docs.select(col(idCol).as("node"))
      .join(comps, Seq("node"), "left_outer")
      .select(col("node").as(idCol),
        coalesce(col("comp"), col("node")).as("component"))
      .withColumn("is_canonical", col(idCol) === col("component"))
  }
}
