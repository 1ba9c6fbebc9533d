package graft

import org.apache.spark.sql.SparkSession
import graft.queries.SimilarityQueries

/** Offline ANN quality report: recall@1 / recall@10 / visited fraction
  * for the LSH and IVF routes vs brute-force ground truth, per SF dir.
  * Prints the markdown rows pasted into README's recall table.
  *
  * Usage: `sbt "runMain graft.RecallEval /root/testdata/sf0.01 /root/testdata/sf0.1"`
  */
object RecallEval {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions.local(cpus)
    println("| sf dir | route | recall@1 | recall@10 | visited |")
    println("|---|---|---|---|---|")
    dirs.foreach { dir =>
      SimilarityQueries.annRecallStats(spark, dir).foreach { s =>
        println(f"| ${new java.io.File(dir).getName} | ${s.route} " +
          f"| ${s.recallAt1}%.2f | ${s.recallAt10}%.2f " +
          f"| ${s.visitedFraction * 100}%.1f%% |")
      }
    }
    spark.stop()
  }
}
