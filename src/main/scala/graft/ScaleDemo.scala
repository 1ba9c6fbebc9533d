package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.Registry

/** One-decade scale demonstration for the dedup family: generates a
  * synthetic corpus with 10× sf0.1's rows but the SAME shape (20
  * sources, same per-doc length distribution, same within-replica
  * near-dup rate — each replica's tokens are salted so replicas are
  * NOT near-dups of each other, keeping the duplicate rate constant
  * instead of exploding cluster sizes quadratically), then times
  * q_dedup_minhash / q_dedup_simhash / q_ngram_jaccard /
  * q_clusters_incremental at 1× and 10× and reports the growth
  * ratios. The claim under test is the 100 TB design argument: every
  * candidate generator is a banded equi-join, so TIME and CANDIDATE
  * counts must grow ~linearly in rows (ratio ≈ 10), never
  * quadratically (ratio ≈ 100). The synthetic corpus lives in /tmp
  * and is never committed. Offline model training (shingle ladder,
  * cluster labels) is timed separately — it is the once-per-lake cost,
  * not the per-query cost.
  * Usage: `sbt "runMain graft.ScaleDemo"` (≈ sf0.1 bench runtime ×
  * low tens). Results recorded in PLANS.md round-17. */
object ScaleDemo {
  private val Queries = Seq("q_dedup_minhash", "q_dedup_simhash",
    "q_ngram_jaccard", "q_clusters_incremental")
  private val Factor = 10

  private def synth(spark: SparkSession, src: String, dst: String): Unit = {
    val base = spark.read.parquet(s"$src/documents.parquet")
    val n = base.count()
    val reps = spark.range(Factor).select(col("id").as("rep"))
    // per-replica token salt: every token of replica k ends in "_k", so
    // within-replica Jaccard structure is EXACTLY the base corpus's
    // (both pair members get the same rewrite) while cross-replica
    // shingle overlap is zero — 10× rows at a constant duplicate rate
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

  private def time3(f: => Long): (Double, Long) = {
    var rows = 0L
    val ts = (0 until 3).map { _ =>
      val t0 = System.nanoTime(); rows = f; (System.nanoTime() - t0) / 1e9
    }.sorted
    (ts(1), rows)
  }

  def main(args: Array[String]): Unit = {
    val oneDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tenDir = "/tmp/graft_scale10"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    println(s"[scale] generating ${Factor}x corpus at $tenDir from $oneDir")
    synth(spark, oneDir, tenDir)
    val results = Seq(oneDir, tenDir).map { d =>
      val t0 = System.nanoTime()
      graft.queries.DedupQueries.trainShingleIndex(spark, d)
      graft.queries.DedupQueries.trainClusterLabels(spark, d)
      val train = (System.nanoTime() - t0) / 1e9
      val docs = spark.read.parquet(s"$d/documents.parquet").count()
      println(f"[scale] $d: $docs rows, offline train $train%.1f s")
      // warmup pass (codegen + page cache), then 3-rep medians
      Queries.foreach(q => Registry.byName(q).fn(spark, d).count())
      d -> Queries.map { q =>
        val (med, rows) = time3(Registry.byName(q).fn(spark, d).count())
        println(f"[scale] $d $q%-24s median=$med%.2f s rows=$rows")
        q -> (med, rows)
      }.toMap
    }.toMap
    println(f"%n[scale] growth at ${Factor}x rows (linear = ${Factor}.0, quadratic = ${Factor * Factor}.0):")
    var worst = 0.0
    Queries.foreach { q =>
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
    spark.stop()
  }
}
