package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{KeyedValue, StreamingPipeline}

/** Evidence for the round-18 provider switch: drive the H6
  * latest-per-key state through BOTH state-store providers at a keyspace
  * large enough to matter (default 300k keys × 3 micro-batches) and
  * report, per provider, the state operator's own telemetry
  * (numRowsTotal, memoryUsedBytes) plus the JVM heap delta across the
  * run. The claim under test is the 100 TB scale argument for RocksDB:
  * the default HDFSBackedStateStoreProvider holds every state row ON
  * HEAP (memoryUsedBytes tracks the keyspace and is all heap), while
  * RocksDB keeps rows in native memory + executor-local disk with a
  * bounded block cache — at billions of latest-per-key entries the heap
  * provider OOMs and RocksDB does not. 300k keys in one JVM can't show
  * an OOM, but it shows the MECHANISM: heap-provider state memory grows
  * ~linearly with keys on the JVM heap; RocksDB's on-heap share stays
  * near-flat (its memoryUsedBytes reports the native rocksdb footprint).
  * The same measurement, at a smaller keyset, is ASSERTED in
  * StreamingSpec ("rocksdb keeps state off the JVM heap") so a
  * provider-config regression fails CI, not just this manual probe.
  * Usage: `sbt "runMain graft.StateScaleProbe [nKeys]"`. Results in
  * PLANS.md round-18. */
object StateScaleProbe {

  /** One provider's reading: the state operator's own telemetry plus
    * the JVM heap growth across the run (GC'd before each sample). */
  final case class Reading(label: String, rowsTotal: Long,
      stateMemBytes: Long, heapDeltaBytes: Long)

  private def heapUsed(): Long = {
    System.gc(); Thread.sleep(200); System.gc()
    val r = Runtime.getRuntime; r.totalMemory() - r.freeMemory()
  }

  /** Runs the latest-per-key pipeline over `nKeys` keys × `nBatches`
    * micro-batches under each provider and returns the readings —
    * shared by the manual probe main and the StreamingSpec assertion.
    * Restores the session's provider config afterwards. */
  def measure(spark: SparkSession, nKeys: Int,
      nBatches: Int = 3): Seq[Reading] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def batch(b: Int) = (0 until nKeys).map(k =>
      KeyedValue(s"k$k", new java.sql.Timestamp(1700000000000L + b * 1000L),
        b.toLong, k * 1.0 + b))
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(providerKey)
    try {
      Seq(
        "rocksdb" -> ("org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider"),
        "hdfs-heap" -> ("org.apache.spark.sql.execution.streaming.state." +
          "HDFSBackedStateStoreProvider")
      ).map { case (label, provider) =>
        spark.conf.set(providerKey, provider)
        val mem = MemoryStream[KeyedValue]
        val h0 = heapUsed()
        // per-run checkpoint dir, deleted below: the probe runs from
        // tests too, and leaked sst/delta trees in tmpdir accumulate
        // across CI runs
        val ckpt = java.nio.file.Files.createTempDirectory(s"graft_ssp_$label")
        try {
          val q = StreamingPipeline.latestPerKeyState(mem.toDS(), "10 minutes")
            .toDF.writeStream.format("noop")
            .option("checkpointLocation", ckpt.toString)
            .outputMode("append")
            .trigger(Trigger.AvailableNow())
          // micro-batches over the SAME keyspace: state holds nKeys rows
          // throughout, each batch rewrites every key (the worst-case
          // update pattern for a latest-per-key operator)
          var last: org.apache.spark.sql.streaming.StreamingQueryProgress = null
          (0 until nBatches).foreach { b =>
            mem.addData(batch(b))
            val run = q.start()
            run.awaitTermination()
            if (run.lastProgress != null) last = run.lastProgress
          }
          val h1 = heapUsed()
          // a misconfigured run (no progress reported, or a progress with
          // no state operator) must surface as a named error, not an NPE
          val so = Option(last).flatMap(_.stateOperators.headOption)
            .getOrElse(throw new IllegalStateException(
              s"state probe [$label]: no micro-batch reported state-operator " +
                "progress — the pipeline did not run stateful"))
          Reading(label, so.numRowsTotal, so.memoryUsedBytes, h1 - h0)
        } finally {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(ckpt).iterator().asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        }
      }
    } finally before match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  def main(args: Array[String]): Unit = {
    val nKeys = args.headOption.map(_.toInt).getOrElse(300000)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    measure(spark, nKeys).foreach { r =>
      println(f"PROBE ${r.label}%-10s keys=$nKeys rowsTotal=${r.rowsTotal} " +
        f"stateMemBytes=${r.stateMemBytes} " +
        f"heapDeltaMB=${r.heapDeltaBytes / 1048576.0}%.1f")
    }
    spark.stop()
  }
}
