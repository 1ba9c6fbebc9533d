package graft

import org.apache.spark.sql.SparkSession
import graft.queries.SimilarityQueries

/** Offline LSH layout sweep: recall@1 / recall@10 / visited fraction for
  * a grid of (planes-per-table, multiprobe Hamming radius) layouts vs
  * brute-force ground truth — the measurement behind the production
  * LSH_PLANES / LSH_RADIUS constants in [[queries.SimilarityQueries]].
  *
  * Usage: `sbt "runMain graft.LshTune /root/testdata/sf0.1"`
  */
object LshTune {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions.local(cpus)
    val layouts = Seq((4, 0), (4, 1), (7, 1), (8, 1), (8, 2), (10, 1),
      (10, 2), (11, 2), (12, 2), (12, 3))
    println("| sf dir | planes | radius | recall@1 | recall@10 | visited |")
    println("|---|---|---|---|---|---|")
    dirs.foreach { dir =>
      SimilarityQueries.lshSweep(spark, dir, layouts).foreach {
        case ((planes, radius), s) =>
          println(f"| ${new java.io.File(dir).getName} | $planes | $radius " +
            f"| ${s.recallAt1}%.2f | ${s.recallAt10}%.2f " +
            f"| ${s.visitedFraction * 100}%.1f%% |")
      }
    }
    spark.stop()
  }
}
