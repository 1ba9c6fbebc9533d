package graft

import scala.jdk.CollectionConverters._

/** The one concurrency claim the in-JVM suites cannot test:
  * SliceLadder's commit discipline (marker-last temp+rename appends,
  * liveness-revalidated merge commits, trash-deferred deletes, graced
  * gc) is what protects CROSS-PROCESS writers — the per-base locks
  * only serialize threads of one JVM. This suite forks a REAL second
  * JVM ([[XpChild]], same classpath and --add-opens as the forked
  * test JVM) that appends slices to the artifact while THIS process
  * runs compactTiered + graced gc against it in a loop, then proves
  * the final state is exact: every child commit present, read ≡
  * derivation, ladder contiguous, no trash or orphan dirs after a
  * quiesced gc. */
class CrossProcessSpec extends SparkSpec {

  test("a second JVM appends while this one compacts and GCs: nothing lost, nothing leaked") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_xp").toString + "/artifact"
    val lad = XpLadder.make(base)
    lad.train(spark, 8L)
    lad.append(spark, 12L)
    lad.append(spark, 16L)

    // child JVM: same java, same classpath, the module opens Spark
    // needs on JDK 17+ (copied from this forked JVM's own arguments —
    // "--add-opens" and its value arrive as separate list entries)
    val jvmArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala
    val opens = jvmArgs.zipWithIndex.collect {
      case (a, i) if a == "--add-opens" || a == "--add-exports" =>
        Seq(a, jvmArgs(i + 1))
      case (a, _) if a.startsWith("--add-opens=") ||
          a.startsWith("--add-exports=") => Seq(a)
    }.flatten
    val cmd = Seq(
      System.getProperty("java.home") + "/bin/java") ++ opens ++ Seq(
      "-Xmx1500m", "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.XpChild", base,
      "18", "20", "22", "24", "26", "28", "30", "32")
    val child = new ProcessBuilder(cmd.asJava)
      .redirectErrorStream(true)
      .redirectOutput(java.io.File.createTempFile("xp_child", ".log"))
      .start()

    // maintenance loop against the SAME artifact while the child
    // appends: tier merges plus a GRACED gc. The first run of this
    // suite caught a real bug here: gc aged orphans by the TOP dir's
    // mtime, which goes stale while a write job works inside
    // _temporary, so the child's cold-JVM first append lost its slice
    // mid-write — gc now ages by the newest mtime anywhere under the
    // candidate (SliceLadder.newestMtime), and the grace only has to
    // cover the writer's longest stall between file-visible updates
    var loops = 0
    var seenBound = 16L
    var mergesAfterChildCommits = 0
    while (child.isAlive && loops < 600) {
      val m = lad.compactTiered(spark, minRun = 2)
      lad.gc(spark, graceMs = 3000L)
      if (seenBound > 16L) mergesAfterChildCommits += m
      seenBound = math.max(seenBound, lad.bound(spark).getOrElse(0L))
      Thread.sleep(250)
      loops += 1
    }
    assert(child.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
      "child JVM did not finish")
    assert(child.exitValue() == 0,
      s"child JVM failed (exit ${child.exitValue()}) — check its log")
    // genuine interleaving, not child-after-parent: at least one tier
    // merge committed in this JVM AFTER the child's commits started
    // landing (the child holds a >2 s window open via its inter-append
    // sleeps, so a live loop always gets a post-commit iteration)
    assert(mergesAfterChildCommits >= 1,
      s"no merge interleaved with the child's appends " +
        s"($loops loops, bound reached $seenBound)")

    // every child commit is present and the artifact is exact
    assert(lad.bound(spark) == Some(32L),
      "a child append was lost under concurrent maintenance")
    val ladder = lad.ladder(spark)
    assert(ladder.head._1 == 0L && ladder.last._2 == 32L &&
      ladder.sliding(2).forall {
        case Seq((_, a), (b, _)) => a == b
        case _ => true
      }, s"ladder not contiguous: $ladder")
    val got = lad.read(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.sameElements((0L until 32L).map(i => (i, i * 2))),
      "read diverged from the derivation after cross-process maintenance")

    // quiesced close-out: one more merge pass + zero-grace gc leaves
    // no trash entries and no non-live slice dirs
    lad.compactTiered(spark, minRun = 2)
    lad.gc(spark, graceMs = 0L)
    lad.gc(spark, graceMs = 0L) // second pass collects what the first trashed
    val live = lad.ladder(spark).toSet
    val slicesDir = new java.io.File(base, "slices")
    val stray = Option(slicesDir.list()).getOrElse(Array.empty[String])
      .filterNot { n =>
        val m = "^s(\\d+|full)-(\\d+|full)$".r.findFirstMatchIn(n)
        m.exists(g => live.contains((g.group(1).toLong, g.group(2).toLong)))
      }
    assert(stray.isEmpty, s"non-live slice dirs leaked: ${stray.toSeq}")
    val trash = Option(new java.io.File(base, "trash").list())
      .getOrElse(Array.empty[String])
    assert(trash.isEmpty, s"trash entries leaked: ${trash.toSeq}")
  }
}
