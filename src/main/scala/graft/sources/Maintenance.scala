package graft.sources

import org.apache.spark.sql.SparkSession

/** The ONE maintenance entry point a lake operator schedules: runs the
  * bounded-write-amplification tiered merge and then the time-graced
  * trash GC over EVERY append-maintained artifact the engine owns for
  * a lake dir — the text shingle index, the IVF inverted file and the
  * image/audio/video signature indexes. Before this existed, each
  * artifact's compaction and gc were five separate per-modality calls
  * (and four of the five gc entries were not even reachable from
  * outside their query module) — a quiesced media artifact kept its
  * trashed slice data forever unless someone remembered its specific
  * hook.
  *
  * Safety is inherited wholesale from [[SliceLadder]]: merges run
  * UNLOCKED (live streaming ingest keeps committing mid-merge), commits
  * re-validate liveness + rebuild epoch, subsumed data is deleted one
  * grace period later, and gc never touches an artifact that does not
  * exist (each step is a no-op on an untrained modality — a text-only
  * lake runs only the shingle leg). Artifacts are processed
  * independently: one modality's failure (e.g. a concurrent rebuild
  * racing a merge commit) must not block the others' maintenance, so
  * per-artifact errors are collected and rethrown ONCE at the end,
  * after every artifact had its turn.
  *
  * `graceMs` is the gc grace window and is deliberately REQUIRED (no
  * default): the scheduled entry point defaulting to 0 — the
  * quiesced-only setting — was a footgun where an operator scheduling
  * `runAll(spark, dir)` verbatim on a LIVE lake would have gc delete
  * trashed slices (and in-flight .tmp watermark dirs) under
  * cross-process readers/writers that the in-JVM locks cannot see.
  * Pick it above the longest in-flight read AND the longest stall
  * between a live writer's file-visible updates (orphan age is the
  * newest mtime under the candidate, so a progressing write protects
  * itself; one that surfaces nothing until close is covered only by
  * the grace — lakehouse orphan-cleanup defaults are hours-days for
  * this reason); pass 0 explicitly only for provably quiesced lakes. `minRun` is [[SliceLadder.compactTiered]]'s
  * tier-run threshold. Returns the total number of tier merges
  * performed across all artifacts. */
object Maintenance {
  def runAll(spark: SparkSession, dir: String, graceMs: Long,
      minRun: Int = 4): Int = {
    var merges = 0
    val errors = scala.collection.mutable.ArrayBuffer.empty[Throwable]
    def leg(what: String)(f: => Int): Unit =
      try merges += f
      catch { case scala.util.control.NonFatal(e) =>
        errors += new RuntimeException(s"maintenance leg '$what' failed",
          e) }
    import graft.queries.{DedupQueries, MultimodalQueries,
      SimilarityQueries}
    leg("shingle") {
      val n =
        if (DedupQueries.shingleIndexBound(spark, dir).isDefined)
          DedupQueries.compactShingleTiered(spark, dir, minRun)
        else 0
      DedupQueries.gcShingleIndex(spark, dir, graceMs); n
    }
    leg("ivf") {
      val n =
        if (SimilarityQueries.ivfAssignBound(spark, dir).isDefined)
          SimilarityQueries.compactIvfTiered(spark, dir, minRun)
        else 0
      SimilarityQueries.gcIvfIndex(spark, dir, graceMs); n
    }
    leg("image") {
      val n =
        if (MultimodalQueries.mediaSigBound(spark, dir).isDefined)
          MultimodalQueries.compactMediaSigTiered(spark, dir, minRun)
        else 0
      MultimodalQueries.gcMediaSigIndex(spark, dir, graceMs); n
    }
    leg("audio") {
      val n =
        if (MultimodalQueries.audioSigBound(spark, dir).isDefined)
          MultimodalQueries.compactAudioSigTiered(spark, dir, minRun)
        else 0
      MultimodalQueries.gcAudioSigIndex(spark, dir, graceMs); n
    }
    leg("video") {
      val n =
        if (MultimodalQueries.videoSigBound(spark, dir).isDefined)
          MultimodalQueries.compactVideoSigTiered(spark, dir, minRun)
        else 0
      MultimodalQueries.gcVideoSigIndex(spark, dir, graceMs); n
    }
    if (errors.nonEmpty) {
      // the per-leg root causes belong in the MESSAGE: schedulers and
      // test reports routinely print only getMessage, and a composite
      // that says "1 leg failed" without the why costs a log dive per
      // incident (suppressed exceptions still carry the full traces)
      val causes = errors.map { e =>
        // bounded walk: a deserialized/hand-built cause CYCLE must not
        // hang the error-reporting path itself (20 levels is far past
        // any real chain; on a cycle the 20th element stands in for the
        // root, which still names the failure)
        val root = Iterator.iterate(e: Throwable)(_.getCause)
          .take(20).takeWhile(_ != null).toSeq.last
        s"${e.getMessage}: ${root.getClass.getSimpleName}: ${root.getMessage}"
      }.mkString("; ")
      val ex = new RuntimeException(
        s"${errors.size} maintenance leg(s) failed " +
          s"(${merges} merges completed on the others): $causes")
      errors.foreach(ex.addSuppressed)
      throw ex
    }
    merges
  }
}
