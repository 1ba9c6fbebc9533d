package graft

import graft.queries.{DedupQueries, MultimodalQueries}
import graft.sources.Maintenance

/** The unified maintenance entry point: one call merges and GCs every
  * artifact the lake dir owns, skips the modalities it doesn't, and
  * never changes what a reader sees. */
class MaintenanceSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("Maintenance.runAll merges every trained ladder, collects trash, and leaves reads unchanged") {
    // rebuild the two artifacts this test measures as 4-slice ladders
    // (other modalities may or may not exist from earlier suites in the
    // shared JVM — runAll must handle both without this test caring)
    DedupQueries.dropShingleIndex(spark, dir)
    MultimodalQueries.dropMediaSigIndex(spark, dir)
    DedupQueries.trainShingleIndex(spark, dir, 3)
    DedupQueries.appendShingleIndex(spark, dir, 5)
    DedupQueries.appendShingleIndex(spark, dir, 7)
    DedupQueries.appendShingleIndex(spark, dir, Int.MaxValue)
    MultimodalQueries.trainMediaSigIndex(spark, dir, 300)
    MultimodalQueries.appendMediaSigs(spark, dir, 600)
    MultimodalQueries.appendMediaSigs(spark, dir, 800)
    MultimodalQueries.appendMediaSigs(spark, dir, Long.MaxValue)
    assert(DedupQueries.shingleIndexLadder(spark, dir).size == 4)
    val shingleBefore = DedupQueries.shingleHashesFromIndex(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mediaBefore = MultimodalQueries.sigsFromIndex(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    // ONE maintenance call over the whole lake dir
    val merges = Maintenance.runAll(spark, dir, graceMs = 0L, minRun = 2)
    assert(merges >= 2,
      s"expected tier merges on both rebuilt ladders, got $merges")
    assert(DedupQueries.shingleIndexLadder(spark, dir).size < 4,
      "shingle ladder must have collapsed")
    // reads are row-for-row what they were before maintenance
    assert(DedupQueries.shingleHashesFromIndex(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == shingleBefore)
    assert(MultimodalQueries.sigsFromIndex(spark, dir)
      .collect().map(_.toString).sorted.toSeq == mediaBefore)
    // each leg compacts THEN gcs, and gc(grace 0) on the now-quiesced
    // artifact collects what that same call's compaction trashed — no
    // trash entries survive the call
    def trashCount(base: String): Int = {
      val d = new java.io.File(base, "trash")
      Option(d.list()).map(_.length).getOrElse(0)
    }
    assert(trashCount(DedupQueries.shingleIndexBase(dir)) == 0,
      "runAll's gc leg must collect the trash its compaction produced")
    // a second call finds nothing left to merge on ANY artifact and is
    // still safe end-to-end
    assert(Maintenance.runAll(spark, dir, graceMs = 0L, minRun = 2) == 0)
    DedupQueries.dropShingleIndex(spark, dir)
    MultimodalQueries.dropMediaSigIndex(spark, dir)
  }
}
