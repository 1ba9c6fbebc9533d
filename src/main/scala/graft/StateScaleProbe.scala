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
  * Usage: `sbt "runMain graft.StateScaleProbe [nKeys]"`. Results in
  * PLANS.md round-18. */
object StateScaleProbe {
  def main(args: Array[String]): Unit = {
    val nKeys = args.headOption.map(_.toInt).getOrElse(300000)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def heapUsed(): Long = {
      System.gc(); Thread.sleep(200); System.gc()
      val r = Runtime.getRuntime; r.totalMemory() - r.freeMemory()
    }
    def batch(b: Int) = (0 until nKeys).map(k =>
      KeyedValue(s"k$k", new java.sql.Timestamp(1700000000000L + b * 1000L),
        b.toLong, k * 1.0 + b))

    Seq(
      "rocksdb" -> ("org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider"),
      "hdfs-heap" -> ("org.apache.spark.sql.execution.streaming.state." +
        "HDFSBackedStateStoreProvider")
    ).foreach { case (label, provider) =>
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
      val mem = MemoryStream[KeyedValue]
      val h0 = heapUsed()
      val q = StreamingPipeline.latestPerKeyState(mem.toDS(), "10 minutes")
        .toDF.writeStream.format("noop")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(s"graft_ssp_$label")
            .toString)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
      // three micro-batches over the SAME keyspace: state holds nKeys
      // rows throughout, each batch rewrites every key (the worst-case
      // update pattern for a latest-per-key operator)
      var last: org.apache.spark.sql.streaming.StreamingQueryProgress = null
      (0 until 3).foreach { b =>
        mem.addData(batch(b))
        val run = q.start()
        run.awaitTermination()
        if (run.lastProgress != null) last = run.lastProgress
      }
      val h1 = heapUsed()
      val so = last.stateOperators(0)
      println(f"PROBE $label%-10s keys=$nKeys rowsTotal=${so.numRowsTotal} " +
        f"stateMemBytes=${so.memoryUsedBytes} " +
        f"heapDeltaMB=${(h1 - h0) / 1048576.0}%.1f " +
        s"customMetrics=${so.customMetrics}")
    }
    spark.stop()
  }
}
