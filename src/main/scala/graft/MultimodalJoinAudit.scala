package graft

import org.apache.spark.sql.SparkSession
import graft.queries.{MultimodalQueries, Registry}

/** Broadcast-cliff audit for the multimodal corpus×corpus banded
  * self-joins (round-19; the text-dedup family got this audit in
  * round 18 and it caught the q_ngram_jaccard mid-scale cliff: a
  * statically-under-estimated corpus side was broadcast and the
  * exchange-free probe inherited ONE scan partition).
  *
  * For each media/audio/video neardup / incremental /
  * clusters-incremental query this prints, per join in the plan:
  * whether a broadcast was chosen STATICALLY (visible in the initial,
  * pre-AQE plan — a size-estimate decision that goes wrong exactly at
  * the mid-scale cliff) vs introduced by AQE at runtime (decided from
  * ACTUAL sizes — safe by construction), plus the scan partition count
  * the probe side inherits. A corpus-derived side under a STATIC
  * BroadcastExchange is the cliff shape and gets a hint.
  *
  * Usage: `sbt "runMain graft.MultimodalJoinAudit [sfDir]"` — run at
  * sf0.01 and sf0.1 (the two committed scales) and record the table in
  * PLANS.md. */
object MultimodalJoinAudit {
  private val Targets = Seq(
    "q_media_neardup", "q_audio_neardup", "q_video_neardup",
    "q_media_incremental", "q_audio_incremental", "q_video_incremental",
    "q_media_clusters_incremental", "q_audio_clusters_incremental",
    "q_video_clusters_incremental")

  def main(args: Array[String]): Unit = {
    // flags must not be consumed as the sfDir positional: a bare `-v`
    // run should audit the default dir verbosely, not train artifacts
    // under a literal ./-v path
    val dir = args.filterNot(_.startsWith("-")).headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    // the artifact state the queries fail-fast on
    MultimodalQueries.trainMediaSigIndex(spark, dir)
    MultimodalQueries.trainAudioSigIndex(spark, dir)
    MultimodalQueries.trainVideoSigIndex(spark, dir)
    MultimodalQueries.trainMediaClusterLabels(spark, dir)
    MultimodalQueries.trainAudioClusterLabels(spark, dir)
    MultimodalQueries.trainVideoClusterLabels(spark, dir)
    println(s"== multimodal join audit at $dir ==")
    Targets.foreach { n =>
      val df = Registry.byName(n).fn(spark, dir)
      df.collect()
      val full = df.queryExecution.executedPlan.toString
      val parts = full.split("== Initial Plan ==")
      val finalP = parts.head
      val initialP = if (parts.length > 1) parts(1) else finalP
      def joins(p: String): Seq[String] =
        p.linesIterator.map(_.trim.dropWhile(c => !c.isLetter))
          .filter(l => l.startsWith("BroadcastHashJoin") ||
            l.startsWith("SortMergeJoin") ||
            l.startsWith("ShuffledHashJoin") ||
            l.startsWith("BroadcastNestedLoopJoin") ||
            l.startsWith("CartesianProduct"))
          .map(_.takeWhile(_ != '[').trim).toSeq
      def count(ls: Seq[String]): String =
        ls.groupBy(identity).toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k x${v.size}" }.mkString(", ")
      val staticBc = initialP.linesIterator
        .count(_.contains("BroadcastExchange"))
      println(f"$n%-32s initial: [${count(joins(initialP))}] " +
        f"final: [${count(joins(finalP))}] staticBroadcasts=$staticBc")
      if (args.contains("-v")) {
        // the build subtree under each static BroadcastExchange: the
        // next few deeper lines name the relation being broadcast, which
        // is what classifies it (bounded model vs corpus-derived side)
        val lines = initialP.linesIterator.toVector
        // tree depth = position where the operator name (or its `*(N)`
        // codegen marker) starts — counting all non-letters would let
        // codegen-id digits and the `*(N) ` prefix skew sibling depths
        // and mis-slice the very subtree the -v mode exists to show
        def depth(s: String) = {
          val i = s.indexWhere(c => c.isLetter || c == '*')
          if (i < 0) s.length else i
        }
        lines.zipWithIndex
          .filter(_._1.contains("BroadcastExchange")).foreach {
            case (l, i) =>
              val d = depth(l)
              val sub = lines.drop(i + 1).takeWhile(depth(_) > d)
                .filter(x => x.contains("Scan") || x.contains("Aggregate")
                  || x.contains("Join") || x.contains("Project"))
                .take(4)
              println(s"    broadcast@$i builds:")
              sub.foreach(s => println(s"      ${s.trim.take(150)}"))
          }
      }
    }
    spark.stop()
  }
}
