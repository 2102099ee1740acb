package graft.dedup

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Connected components + dedup resolution over candidate pairs. */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("components: chains, cliques and singletons resolve to min labels") {
    // graph: chain 1-2-3-4, pair 10-11, triangle 20-21-22 (+ edge 22-20)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 20L)).toDF("id1", "id2")
    val comps = Components.connectedComponents(edges, "id1", "id2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comps(_) == 1L))
    assert(Seq(10L, 11L).forall(comps(_) == 10L))
    assert(Seq(20L, 21L, 22L).forall(comps(_) == 20L))
  }

  test("long path converges within the iteration budget") {
    val n = 30
    val edges = (0 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("id1", "id2")
    val comps = Components.connectedComponents(edges, "id1", "id2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.values.toSet === Set(0L))
  }

  test("reliable-checkpoint mode matches localCheckpoint mode") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 20L)).toDF("id1", "id2")
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    val reliable = Components.connectedComponents(edges, "id1", "id2",
      checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = Components.connectedComponents(edges, "id1", "id2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable === local)
    // reliable mode actually wrote RDD checkpoint data to the durable dir
    def anyFiles(f: java.io.File): Boolean =
      f.isFile || Option(f.listFiles()).exists(_.exists(anyFiles))
    assert(anyFiles(new java.io.File(dir)), s"no checkpoint data under $dir")
    // each invocation isolates under a fresh cc-<uuid> subdir so its
    // aggressive cleanup can never delete another job's checkpoints
    val callDirs = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("cc-"))
    assert(callDirs.length === 1, s"expected one per-call subdir under $dir")
    // superseded per-iteration checkpoints were deleted as the loop advanced:
    // only the symmetrized edge set and the final labels remain on disk
    def rddDirs(f: java.io.File): Seq[java.io.File] = {
      val kids = Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq
      kids.filter(k => k.isDirectory && k.getName.startsWith("rdd-")) ++
        kids.filter(_.isDirectory).flatMap(rddDirs)
    }
    val remaining = rddDirs(new java.io.File(dir)).distinct
    assert(remaining.length <= 2,
      s"superseded checkpoints not cleaned: ${remaining.map(_.getName).mkString(", ")}")
  }

  test("shared checkpoint root: foreign rdd dirs are never deleted") {
    // another job's checkpoint data already lives under the shared root —
    // the per-call cc-<uuid> isolation must leave it untouched
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-shared")
    val foreign = dir.resolve("ctx-uuid-other").resolve("rdd-999")
    java.nio.file.Files.createDirectories(foreign)
    java.nio.file.Files.writeString(foreign.resolve("part-00000"), "live data")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2")
    Components.connectedComponents(edges, "id1", "id2",
      checkpointDir = Some(dir.toString)).collect()
    assert(java.nio.file.Files.exists(foreign.resolve("part-00000")),
      "foreign checkpoint data under the shared root was destroyed")
  }

  test("concurrent reliable-mode calls in one context do not cross-delete checkpoints") {
    // pre-lock failure mode: last setCheckpointDir wins, call A's checkpoint
    // lands in call B's cc-dir, B's listing-diff deletes A's LIVE checkpoint
    // and A's next iteration reads a missing file. The shared
    // Checkpoints.checkpointDirLock makes set-dir + checkpoint atomic.
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-conc").toString
    val chain = (0 until 24).map(i => (i.toLong, (i + 1).toLong)).toDF("id1", "id2")
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val futures = (1 to 2).map { _ =>
      Future(Components.connectedComponents(chain, "id1", "id2",
        checkpointDir = Some(dir))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    }
    val results = Await.result(Future.sequence(futures), 300.seconds)
    results.foreach(m => assert(m.values.toSet === Set(0L)))
  }

  test("resolveDuplicates: every doc gets a component; one canonical each") {
    val docs = Tables(spark, sf0001, "documents")
    val pairs = MinHashLSH.candidatePairs(docs, "doc_id", "text")
      .filter($"est_jaccard" >= 0.5).select($"id1", $"id2")
    val resolved = Components.resolveDuplicates(docs, "doc_id", pairs)
    assert(resolved.count() === 500)
    // exactly one canonical per component
    val perComp = resolved.groupBy($"component")
      .agg(sum(when($"is_canonical", 1).otherwise(0)).as("n_canon"))
      .collect()
    assert(perComp.forall(_.getLong(1) === 1L))
    // canonical is the component id itself (smallest member)
    assert(resolved.filter($"is_canonical" && $"doc_id" =!= $"component").count() === 0)
  }
}
