package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.Registry

/** One-decade scale demonstration for the dedup AND vector families:
  * generates synthetic corpora with 10× (and, for the exponent pin,
  * 20×) sf0.1's rows but the SAME shape, then times the headline
  * candidate-generating queries at each scale and reports growth
  * ratios. The claim under test is the 100 TB design argument:
  *
  *  - text dedup — every candidate generator is a banded equi-join,
  *    so TIME and CANDIDATE counts must grow ~linearly in rows
  *    (ratio ≈ 10), never quadratically (ratio ≈ 100);
  *  - q_ngram_jaccard gets an extra ×20 point: it was the family's
  *    closest-to-linear at ×10 (×8.8, round 17), so the ×10→×20 leg
  *    pins its growth EXPONENT (log2 of the time ratio) — postings
  *    joins grow superlinearly only if the df cap stops binding;
  *  - vector family — IVF probe cost is proportional to list
  *    OCCUPANCY (N / nlist): the ×10 corpus is trained at ×10 lists
  *    (`graft.ivf.nlist`), holding occupancy constant the way a
  *    100 TB deployment sizes its quantizer, so probe/dedup time must
  *    grow ~linearly (the per-vector assignment read plus a
  *    constant-occupancy list join). One-time training (k-means,
  *    inverted-file build, PQ codebooks) is timed separately — the
  *    once-per-lake cost, not the per-query cost.
  *
  * Replica salting keeps duplicate structure constant instead of
  * exploding it: text replicas get per-replica token suffixes (zero
  * cross-replica shingle overlap); embedding replicas get a cyclic
  * DIMENSION rotation (a rotation preserves every intra-replica dot
  * product exactly, while cross-replica cosines decohere). Synthetic
  * corpora live in /tmp and are never committed.
  * Usage: `sbt "runMain graft.ScaleDemo"`. Results recorded in
  * PLANS.md (round-17 text table; round-18 exponent + vector table). */
object ScaleDemo {
  private val TextQueries = Seq("q_dedup_minhash", "q_dedup_simhash",
    "q_ngram_jaccard", "q_clusters_incremental")
  private val VecQueries = Seq("q_ann_ivf", "q_ann_ivfpq",
    "q_semdedup_incremental")
  private val Factor = 10

  private[graft] def synthDocs(spark: SparkSession, src: String, dst: String,
      factor: Int): Unit = {
    val base = spark.read.parquet(s"$src/documents.parquet")
    val n = base.count()
    val reps = spark.range(factor).select(col("id").as("rep"))
    // per-replica token salt: every token of replica k ends in "_k", so
    // within-replica Jaccard structure is EXACTLY the base corpus's
    // (both pair members get the same rewrite) while cross-replica
    // shingle overlap is zero — factor× rows at a constant duplicate rate
    base.crossJoin(broadcast(reps))
      .select(
        (col("doc_id") + col("rep") * n).as("doc_id"),
        when(col("rep") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1_"), col("rep")))).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
  }

  private def synthEmb(spark: SparkSession, src: String, dst: String,
      factor: Int): Unit = {
    val base = spark.read.parquet(s"$src/embeddings.parquet")
    val n = base.count()
    val reps = spark.range(factor).select(col("id").as("rep"))
    // per-replica cyclic dimension rotation: replica k's vector is the
    // base vector rolled k·7 dims (7 is coprime-ish to 64 so replicas
    // spread). A rotation is an orthogonal map, so every intra-replica
    // dot product (and hence the near-dup structure) is the base
    // corpus's up to float summation ORDER — the fold visits the same
    // products rotated, which can move the sum a few ulps, so a pair
    // sitting exactly on a 6-dp rounding edge could flip in some
    // replica; the duplicate rate is constant to that tolerance, not
    // bit-exact. Cross-replica cosines decohere, so factor× vectors at
    // a ~constant duplicate rate
    base.crossJoin(broadcast(reps))
      .select(
        (col("vec_id") + col("rep") * n).as("vec_id"),
        expr("""transform(sequence(0, size(embedding) - 1),
                 i -> embedding[cast((i + rep * 7) % size(embedding) AS INT)])""")
          .as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
  }

  private def rmrf(p: String): Unit = {
    def walk(f: java.io.File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).foreach(walk)
      f.delete()
    }
    if (p != null) walk(new java.io.File(p))
  }

  /** Synthetic corpora must measure a FRESH, canonical artifact state:
    * /tmp corpus dirs persist across runs on one machine and their
    * artifact roots are keyed by the dir path, so a rerun would
    * silently reuse — and time — whatever ladder/model shape an
    * earlier run (or an interrupted one) left behind, making the 10x
    * and 20x readings incomparable (first seen as a 20x jaccard
    * median FASTER than the 10x one). Drop everything keyed to the
    * dir before regenerating. */
  private def freshDir(spark: SparkSession, d: String): Unit = {
    import graft.queries.{DedupQueries, SimilarityQueries}
    rmrf(d)
    DedupQueries.dropShingleIndex(spark, d)
    Seq("text", "text-lake").foreach(k =>
      rmrf(DedupQueries.clusterModelPath(d, k)))
    SimilarityQueries.dropIvfAssignments(spark, d)
    rmrf(new java.io.File(SimilarityQueries.ivfModelPath(d)).getParent)
    rmrf(new java.io.File(SimilarityQueries.pqModelPath(d)).getParent)
  }

  private def time3(f: => Long): (Double, Long) = {
    var rows = 0L
    val ts = (0 until 3).map { _ =>
      val t0 = System.nanoTime(); rows = f; (System.nanoTime() - t0) / 1e9
    }.sorted
    (ts(1), rows)
  }

  private def timed[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime(); val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }

  def main(args: Array[String]): Unit = {
    val oneDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tenDir = "/tmp/graft_scale10"
    val twentyDir = "/tmp/graft_scale20"
    val tenVecDir = "/tmp/graft_scale10v"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    // ---------------- text dedup family at ×10 ----------------
    println(s"[scale] generating ${Factor}x corpus at $tenDir from $oneDir")
    freshDir(spark, tenDir)
    synthDocs(spark, oneDir, tenDir, Factor)
    val results = Seq(oneDir, tenDir).map { d =>
      val (train, _) = timed {
        graft.queries.DedupQueries.trainShingleIndex(spark, d)
        graft.queries.DedupQueries.trainClusterLabels(spark, d)
      }
      val docs = spark.read.parquet(s"$d/documents.parquet").count()
      println(f"[scale] $d: $docs rows, offline train $train%.1f s")
      // warmup pass (codegen + page cache), then 3-rep medians
      TextQueries.foreach(q => Registry.byName(q).fn(spark, d).count())
      d -> TextQueries.map { q =>
        val (med, rows) = time3(Registry.byName(q).fn(spark, d).count())
        println(f"[scale] $d $q%-24s median=$med%.2f s rows=$rows")
        q -> (med, rows)
      }.toMap
    }.toMap
    println(f"%n[scale] growth at ${Factor}x rows (linear = ${Factor}.0, quadratic = ${Factor * Factor}.0):")
    var worst = 0.0
    TextQueries.foreach { q =>
      val (t1, r1) = results(oneDir)(q)
      val (t10, r10) = results(tenDir)(q)
      val tr = t10 / t1; val rr = r10.toDouble / math.max(1L, r1)
      worst = math.max(worst, tr)
      println(f"[scale] $q%-24s time x$tr%.1f  result-rows x$rr%.1f")
    }
    // report-grade gate: 1.5x slack over linear for fixed per-query
    // overheads amortizing differently at the two scales
    val verdict = if (worst <= Factor * 1.5) "PASS (~linear)" else "WARN"
    println(f"[scale] worst time growth x$worst%.1f -> $verdict")

    // ------------- q_ngram_jaccard exponent pin at ×20 -------------
    println(f"%n[scale] generating 20x corpus at $twentyDir")
    freshDir(spark, twentyDir)
    synthDocs(spark, oneDir, twentyDir, 2 * Factor)
    val (train20, _) = timed {
      graft.queries.DedupQueries.trainShingleIndex(spark, twentyDir)
    }
    println(f"[scale] $twentyDir: offline train $train20%.1f s")
    Registry.byName("q_ngram_jaccard").fn(spark, twentyDir).count() // warm
    val (t20, r20) = time3(
      Registry.byName("q_ngram_jaccard").fn(spark, twentyDir).count())
    val (t10j, r10j) = results(tenDir)("q_ngram_jaccard")
    // growth exponent over the ×10→×20 leg: time ∝ rows^e → e = log2(t20/t10)
    val e = math.log(t20 / t10j) / math.log(2.0)
    println(f"[scale] q_ngram_jaccard x20: median=$t20%.2f s rows=$r20 " +
      f"(x10: $t10j%.2f s rows=$r10j)")
    println(f"[scale] q_ngram_jaccard growth exponent (x10->x20): e=$e%.2f " +
      s"-> ${if (e <= 1.3) "PASS (~linear — the df cap binds)" else "WARN (superlinear: raise the df cap question)"}")

    // ---------------- vector family at ×10 ----------------
    // 1x side first, with the default quantizer (nlist=16) and the
    // already-persisted artifacts (idempotent train)
    val (trainV1, _) = timed {
      graft.queries.SimilarityQueries.trainIvfCentroids(spark, oneDir)
      graft.queries.SimilarityQueries.trainIvfAssignments(spark, oneDir)
      graft.queries.SimilarityQueries.trainPqCodes(spark, oneDir)
    }
    VecQueries.foreach(q => Registry.byName(q).fn(spark, oneDir).count())
    val vec1 = VecQueries.map { q =>
      val (med, rows) = time3(Registry.byName(q).fn(spark, oneDir).count())
      println(f"[scale] $oneDir $q%-24s median=$med%.2f s rows=$rows")
      q -> (med, rows)
    }.toMap
    // recall alongside time (NPROBE is FIXED at both scales — see the
    // verdict print below), and the semdedup candidate count, so the
    // growth table separates output-bound from plan-bound growth
    val recall1 = graft.queries.SimilarityQueries.annRecallIvf(spark, oneDir)
    val cands1 = semdedupCandidates(spark, oneDir)
    // 10x side: ×10 vectors AND ×10 lists — the occupancy-constant
    // scaling a 100 TB deployment uses (nlist ∝ N); the knob folds into
    // the artifact paths, so this never touches the 1x artifacts
    println(s"[scale] generating ${Factor}x embeddings at $tenVecDir")
    freshDir(spark, tenVecDir)
    synthEmb(spark, oneDir, tenVecDir, Factor)
    System.setProperty("graft.ivf.nlist", (16 * Factor).toString)
    // the nlist knob folds into the artifact paths, so the scaled
    // quantizer's artifacts need their own fresh-state drop too
    graft.queries.SimilarityQueries.dropIvfAssignments(spark, tenVecDir)
    rmrf(new java.io.File(
      graft.queries.SimilarityQueries.ivfModelPath(tenVecDir)).getParent)
    val (vec10, recall10, cands10) =
      try {
        val (trainV10, _) = timed {
          graft.queries.SimilarityQueries.trainIvfCentroids(spark, tenVecDir)
          graft.queries.SimilarityQueries.trainIvfAssignments(spark, tenVecDir)
          graft.queries.SimilarityQueries.trainPqCodes(spark, tenVecDir)
        }
        println(f"[scale] offline vector train: 1x $trainV1%.1f s, " +
          f"${Factor}x (nlist x$Factor) $trainV10%.1f s")
        VecQueries.foreach(q =>
          Registry.byName(q).fn(spark, tenVecDir).count())
        val m = VecQueries.map { q =>
          val (med, rows) = time3(
            Registry.byName(q).fn(spark, tenVecDir).count())
          println(f"[scale] $tenVecDir $q%-24s median=$med%.2f s rows=$rows")
          q -> (med, rows)
        }.toMap
        val r10 = graft.queries.SimilarityQueries.annRecallIvf(spark, tenVecDir)
        (m, r10, semdedupCandidates(spark, tenVecDir))
      } finally System.clearProperty("graft.ivf.nlist")
    println(f"%n[scale] vector growth at ${Factor}x vectors, nlist x$Factor (occupancy constant; linear = ${Factor}.0):")
    var worstV = 0.0
    VecQueries.foreach { q =>
      val (t1, r1) = vec1(q)
      val (t10, r10) = vec10(q)
      val tr = t10 / t1; val rr = r10.toDouble / math.max(1L, r1)
      worstV = math.max(worstV, tr)
      println(f"[scale] $q%-24s time x$tr%.1f  result-rows x$rr%.1f")
    }
    val verdictV = if (worstV <= Factor * 1.5) "PASS (~linear)" else "WARN"
    println(f"[scale] worst vector time growth x$worstV%.1f -> $verdictV")
    // NPROBE is FIXED (3) at both scales while nlist grows ×10, so the
    // probed corpus FRACTION shrinks ×10 (3/16 → 3/160): the time table
    // above is occupancy-constant, fraction-shrinking — the way a
    // deployment that holds per-query latency constant scales — and the
    // recall cost of that choice is reported here rather than hidden
    println(f"[scale] ivf recall under fixed nprobe=3 (probed fraction " +
      f"shrinks x$Factor): 1x recall@10=${recall1.recallAt10}%.2f " +
      f"visited=${recall1.visitedFraction * 100}%.1f%%  " +
      f"${Factor}x recall@10=${recall10.recallAt10}%.2f " +
      f"visited=${recall10.visitedFraction * 100}%.1f%%")

    // ---------- q_semdedup_incremental exponent pin at ×20 ----------
    // the vector family's closest-to-superlinear ×10 reading (×6.1 time,
    // output ×31.3 in round 18) gets the same treatment that caught the
    // jaccard broadcast cliff: a ×20 leg with CANDIDATES and OUTPUT
    // counted alongside time, so output-bound growth (pairs Σbᵢ·nᵢ over
    // constant-occupancy lists) is separable from a plan regression
    val twentyVecDir = "/tmp/graft_scale20v"
    println(f"%n[scale] generating ${2 * Factor}x embeddings at $twentyVecDir")
    freshDir(spark, twentyVecDir)
    synthEmb(spark, oneDir, twentyVecDir, 2 * Factor)
    System.setProperty("graft.ivf.nlist", (16 * 2 * Factor).toString)
    graft.queries.SimilarityQueries.dropIvfAssignments(spark, twentyVecDir)
    rmrf(new java.io.File(
      graft.queries.SimilarityQueries.ivfModelPath(twentyVecDir)).getParent)
    try {
      val (trainV20, _) = timed {
        graft.queries.SimilarityQueries.trainIvfCentroids(spark, twentyVecDir)
        graft.queries.SimilarityQueries.trainIvfAssignments(spark, twentyVecDir)
      }
      println(f"[scale] ${2 * Factor}x offline vector train " +
        f"(nlist x${2 * Factor}): $trainV20%.1f s")
      Registry.byName("q_semdedup_incremental").fn(spark, twentyVecDir)
        .count() // warm
      val (t20v, r20v) = time3(
        Registry.byName("q_semdedup_incremental").fn(spark, twentyVecDir)
          .count())
      val cands20 = semdedupCandidates(spark, twentyVecDir)
      val (t10v, r10v) = vec10("q_semdedup_incremental")
      val eV = math.log(t20v / t10v) / math.log(2.0)
      val eOut = math.log(r20v.toDouble / math.max(1L, r10v)) / math.log(2.0)
      val eCand = math.log(cands20.toDouble / math.max(1L, cands10)) /
        math.log(2.0)
      println(f"[scale] q_semdedup_incremental x20: median=$t20v%.2f s " +
        f"rows=$r20v cands=$cands20 (x10: $t10v%.2f s rows=$r10v " +
        f"cands=$cands10; x1 cands=$cands1)")
      println(f"[scale] q_semdedup_incremental exponents (x10->x20): " +
        f"time e=$eV%.2f, output e=$eOut%.2f, candidates e=$eCand%.2f -> " +
        (if (eV <= eCand + 0.3) "PASS (time tracks candidate volume)"
         else "WARN (time grows past the candidate count: plan regression)"))
    } finally System.clearProperty("graft.ivf.nlist")
    spark.stop()
  }

  /** The semdedup candidate volume — the pre-cosine join size Σ over
    * lists of batch×earlier co-occupants — counted with the SAME
    * inverted-file read the query uses, so the exponent table can
    * attribute time growth to candidates vs plan. */
  private def semdedupCandidates(spark: SparkSession, d: String): Long = {
    import graft.queries.{DedupQueries, SimilarityQueries}
    val a = SimilarityQueries.assignmentsFromIndex(spark, d)
    val batch = a.filter(col("vec_id") >= DedupQueries.LakeVecBound)
    a.as("a").join(batch.as("b"),
        col("a.c_id") === col("b.c_id") && col("a.vec_id") < col("b.vec_id"))
      .count()
  }
}
