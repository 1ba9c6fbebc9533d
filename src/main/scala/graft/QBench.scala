package graft

import graft.queries.Registry

/** Times the named queries only — the per-query A/B loop Bench is too
  * coarse for (Bench always runs the whole headline set). Same
  * discipline: warmup rep, then rep-major measured reps, median
  * reported.
  * Usage: `SPARK_GRAFT_SF_DIR=… sbt "runMain graft.QBench q_basket_pairs [reps]"` */
object QBench {
  def main(args: Array[String]): Unit = {
    // query names are never all-digit; the LAST numeric arg (if any) is
    // the rep count, floored at 1 so `0` can't crash the median index
    // after the expensive warmup
    val (numeric, names) =
      args.partition(a => a.nonEmpty && a.forall(_.isDigit))
    val reps = numeric.lastOption.map(_.toInt).getOrElse(5).max(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // SPARK_GRAFT_SKIP_TRAIN=1: the caller guarantees every artifact the
    // named queries need already exists — lets a probe measure a query on
    // a dir that lacks OTHER modalities' tables (e.g. a documents-only
    // synthetic corpus, where the IVF/media training below would fail on
    // missing parquet) and keeps the measuring JVM free of training-run
    // residency (cached tables, GC pressure, sfDir parquet paged in by
    // the training scans) the timed query never pays in production.
    // "0"/"false" mean unset — presence-only parsing made
    // SPARK_GRAFT_SKIP_TRAIN=0 silently skip the training it asks for.
    val skipTrain = sys.env.get("SPARK_GRAFT_SKIP_TRAIN")
      .exists(v => v != "0" && v.toLowerCase != "false")
    if (!skipTrain) {
    graft.queries.DedupQueries.trainShingleIndex(spark, sfDir)
    graft.queries.SimilarityQueries.trainIvfCentroids(spark, sfDir)
    graft.queries.SimilarityQueries.trainIvfAssignments(spark, sfDir)
    graft.queries.SimilarityQueries.trainPqCodes(spark, sfDir)
    graft.queries.TextQueries.trainBpeMerges(spark, sfDir)
    graft.queries.TextQueries.trainUnigramPieces(spark, sfDir)
    graft.queries.DedupQueries.trainClusterLabels(spark, sfDir)
    graft.queries.MultimodalQueries.trainAudioSigIndex(spark, sfDir)
    graft.queries.MultimodalQueries.trainVideoSigIndex(spark, sfDir)
    graft.queries.MultimodalQueries.trainMediaSigIndex(spark, sfDir)
    graft.queries.MultimodalQueries.trainMediaClusterLabels(spark, sfDir)
    graft.queries.MultimodalQueries.trainVideoClusterLabels(spark, sfDir)
    graft.queries.MultimodalQueries.trainAudioClusterLabels(spark, sfDir)
    }
    val qs = names.toSeq.map(Registry.byName)
    // COLD-PROBE mode (SPARK_GRAFT_COLD_DIR=<small sf dir>): warm codegen
    // on the small dir instead of sfDir, so rep 1 at sfDir is a true
    // first-touch — the Bench cold column reproduced in isolation (used
    // to adjudicate cold outliers like r17's 71 s q_vwap after a
    // page-cache drop). Only the FIRST named query's rep 1 is a true
    // cold (later queries' first reps read pages and shared artifacts
    // the earlier ones touched), so cold= is printed for it alone —
    // probe one query per invocation, and pair with
    // SPARK_GRAFT_SKIP_TRAIN=1 unless the query needs artifacts (the
    // training scans page sfDir tables in)
    val coldDir = sys.env.get("SPARK_GRAFT_COLD_DIR")
    qs.foreach(_.fn(spark, coldDir.getOrElse(sfDir)).count())
    val times = Array.fill(qs.size, reps)(0.0)
    for (r <- 0 until reps; (q, i) <- qs.zipWithIndex) {
      val t0 = System.nanoTime()
      q.fn(spark, sfDir).count()
      times(i)(r) = (System.nanoTime() - t0) / 1e9
    }
    qs.zipWithIndex.foreach { case (q, i) =>
      val sorted = times(i).sorted
      val med = sorted(reps / 2)
      val cold =
        if (coldDir.isDefined && i == 0) f" cold=${times(i)(0)}%.3f" else ""
      println(f"QBENCH ${q.name}%-24s median=$med%.3f$cold reps=${times(i).map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
