package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Thin source/sink layer (SURVEY.md §2.A) — connector code stays out of
  * operator logic. Schemas are always declared (never inferred) so engine
  * semantics don't depend on sampling.
  *
  * Reference mappings:
  *  - A1 CSV scan with declared schema + legacy encoding
  *    (include/tasks/batch_ingestion.py:26, latin-1 COTAHIST file);
  *  - A2/A7/A8 partitioned parquet/JSON zone writers with date-derived
  *    partition columns ({topic}/{Y}/{M}/{d} layout,
  *    kafka_to_minio_raw/main.py:88-101);
  *  - A9 single-file JSON snapshot (data_warehouse.py:80-86);
  *  - A15 insert-if-absent batch upsert (yfinance_to_postgres.py:28-56).
  *
  * Scale notes: partition columns give free partition pruning on read-back;
  * writers never coalesce except the explicitly-small snapshot sink; the
  * upsert's left-anti join broadcasts whichever side AQE finds small and
  * only scans the target's key columns.
  */
object Connectors {

  /** Declared-schema CSV scan; `encoding` covers latin-1-style files.
    * Malformed rows yield nulls (PERMISSIVE), matching pandas coerce. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      encoding: String = "UTF-8", header: Boolean = true): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("encoding", encoding)
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(path)

  /** Parquet writer partitioned by arbitrary columns (lake zone layout). */
  def writePartitionedParquet(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** JSON archive partitioned by a timestamp's Y/M/D — the raw-zone
    * `{topic}/{Y}/{M}/{d}/` layout as real partition columns. */
  def writeDatePartitionedJson(df: DataFrame, path: String,
      tsCol: String): Unit =
    df.withColumn("y", year(col(tsCol)))
      .withColumn("m", format_string("%02d", month(col(tsCol))))
      .withColumn("d", format_string("%02d", dayofmonth(col(tsCol))))
      .write.mode("overwrite").partitionBy("y", "m", "d").json(path)

  /** Whole-table single-file JSON snapshot (loaded-zone export). Only for
    * deliberately-small final tables — the coalesce(1) is the point. */
  def writeJsonSnapshot(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").json(path)

  /** A4/A5: Kafka JSON source, streaming. Multi-topic subscribe tags rows
    * with the `topic` metadata column; `earliest` + a fresh checkpoint
    * reproduces the reference's re-read-all drain, a durable checkpoint
    * its incremental archiver. (No broker in this test environment — the
    * construction is exercised to the unresolved-relation boundary only.) */
  def kafkaJsonStream(spark: SparkSession, bootstrapServers: String,
      topics: Seq[String], schema: StructType,
      startingOffsets: String = "earliest"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", startingOffsets)
      .load()
      .select(col("topic"), col("timestamp").as("kafka_ts"),
        from_json(col("value").cast("string"), schema).as("js"))
      .select(col("topic"), col("kafka_ts"), col("js.*"))

  /** A4 batch flavor: bounded read of everything currently in the topic. */
  def kafkaJsonBatch(spark: SparkSession, bootstrapServers: String,
      topics: Seq[String], schema: StructType): DataFrame =
    spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", "earliest")
      .load()
      .select(from_json(col("value").cast("string"), schema).as("js"))
      .select(col("js.*"))

  /** A6: JSON-serialize every row into a Kafka topic (acks=all is the
    * Kafka sink default in Spark). */
  def writeKafkaJson(df: DataFrame, bootstrapServers: String,
      topic: String): Unit =
    df.select(to_json(struct(col("*"))).as("value"))
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .save()

  /** A13/H5: high-watermark incremental scan — rows strictly beyond the
    * cursor, plus the next cursor value, in one pass. The caller persists
    * the cursor between polls (the reference keeps it in process memory,
    * postgres_producer/main.py:56-79). */
  def incrementalScan(df: DataFrame, tsCol: String,
      cursor: Option[java.sql.Timestamp]): (DataFrame, Option[java.sql.Timestamp]) = {
    val fresh = cursor.map(c => df.filter(col(tsCol) > lit(c))).getOrElse(df)
    val nextCursor = fresh.agg(max(col(tsCol))).collect()(0) match {
      case row if row.isNullAt(0) => cursor
      case row => Some(row.getTimestamp(0))
    }
    (fresh, nextCursor)
  }

  /** A10/A11: JDBC scan (the reference's whole DW is a SQL database —
    * data_warehouse.py:67-68 reads the last 40 days, dashboard.py:39 the
    * last 24 h). Declared as a plain jdbc relation so Catalyst pushes
    * filters and column pruning INTO the database (`PushedFilters` /
    * pruned SELECT list in the scan) — the 40-day predicate never ships
    * unneeded rows.
    *
    * Scale: a bare JDBC read is ONE partition (one connection). For large
    * tables pass `partitionColumn`/`lowerBound`/`upperBound`/
    * `numPartitions` in `options` so executors read disjoint slices in
    * parallel; keep numPartitions ≤ what the database tolerates. */
  def readJdbc(spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(options)
      .load()

  /** A14: full-replace JDBC write (`to_sql(if_exists="replace")`,
    * data_warehouse.py:78). Overwrite drops/recreates (or truncates, if
    * `options("truncate") = "true"` — cheaper, keeps indexes) the target.
    * Writes go one connection per partition — repartition small final
    * tables down so a 1000-partition DataFrame doesn't open 1000
    * connections. */
  def writeJdbc(df: DataFrame, url: String, table: String,
      mode: String = "overwrite",
      options: Map[String, String] = Map.empty): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(options)
      .mode(mode)
      .save()

  /** SQLStates that mean "that table does not exist" across the common
    * dialects: Derby 42X05 / 42Y07 (schema), SQL-standard & MySQL-family
    * 42S02, Postgres 42P01, legacy ODBC S0002. Dialects that DON'T give
    * missing-table its own SQLState are matched below by vendor error
    * code (Oracle ORA-00942 arrives as the generic 42000) or, for
    * drivers that report a null SQLState (SQLite), by the driver's
    * documented message. Supported dialect set: Derby, MySQL/MariaDB,
    * Postgres, SQL Server (42S02), Oracle, SQLite; anything else that
    * signals absence with a generic state still RETHROWS — by design,
    * see [[jdbcTableExists]]. */
  private val MissingTableSqlStates =
    Set("42X05", "42Y07", "42S02", "42P01", "S0002")

  private def isMissingTable(t: Throwable): Boolean =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).exists {
      case s: java.sql.SQLException =>
        MissingTableSqlStates.contains(Option(s.getSQLState).getOrElse("")) ||
          // Oracle: ORA-00942 "table or view does not exist" under the
          // catch-all SQLState 42000 — only the vendor code disambiguates
          (s.getErrorCode == 942 &&
            Option(s.getSQLState).forall(_ == "42000")) ||
          // SQLite (xerial): null SQLState, generic code, fixed message
          (s.getSQLState == null &&
            Option(s.getMessage).exists(_.contains("no such table")))
      case _ => false
    }

  /** True iff `table` is readable over JDBC (the dashboard's
    * information_schema probe, dashboard.py:29-34, expressed engine-
    * agnostically: resolving the relation's schema costs one metadata
    * round-trip and no rows).
    *
    * Only a table-NOT-FOUND SQLState counts as "absent": any other
    * failure (auth, network, bad driver) RETHROWS. Folding those into
    * `false` would make [[upsertJdbc]] silently skip its anti-join on a
    * transient error and append the whole batch — duplicate keys landing
    * without a sound, since Spark's JDBC writer creates no UNIQUE
    * constraint to catch them. */
  def jdbcTableExists(spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): Boolean =
    try { readJdbc(spark, url, table, options).schema; true }
    catch {
      case e: Throwable if isMissingTable(e) => false
    }

  /** A15: JDBC insert-if-absent (`ON CONFLICT (keys) DO NOTHING`,
    * yfinance_to_postgres.py:28-56). Spark's JDBC sink has no native
    * upsert, so: anti-join the batch against the target's key columns
    * (key-only SELECT — column pruning reaches the database), then append
    * the survivors. Existing rows always win across batches; within a
    * batch dropDuplicates keeps an arbitrary survivor, as in the
    * reference's row-at-a-time loop. NOT atomic vs concurrent writers —
    * matches the reference's semantics, which relies on the UNIQUE
    * constraint only. */
  def upsertJdbc(batch: DataFrame, keys: Seq[String], url: String,
      table: String, options: Map[String, String] = Map.empty): Unit = {
    val spark = batch.sparkSession
    val fresh =
      if (jdbcTableExists(spark, url, table, options)) {
        val existing = readJdbc(spark, url, table, options)
          .select(keys.map(col): _*)
        batch.join(existing, keys, "left_anti")
      } else batch
    writeJdbc(fresh.dropDuplicates(keys), url, table, mode = "append",
      options = options)
  }

  /** A18: catalog table-existence probe (dashboard.py:29-34). Covers
    * temp views, global temp views and catalog tables. */
  def tableExists(spark: SparkSession, name: String): Boolean =
    spark.catalog.tableExists(name)

  /** True on any Hadoop-visible filesystem (local, HDFS, s3a) — a plain
    * java.io.File check silently fails for every non-local URI. */
  private[graft] def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Batch insert-if-absent: append only rows whose composite key is not
    * already present in the parquet target (ON CONFLICT DO NOTHING).
    * Across batches the existing row always wins; WITHIN a batch the
    * surviving duplicate is whichever dropDuplicates sees first — pass
    * data with an upstream dedup (e.g. dedupFirstWins) when the in-batch
    * survivor must be deterministic. */
  def upsertParquet(batch: DataFrame, keys: Seq[String],
      targetPath: String): Unit = {
    val spark = batch.sparkSession
    val fresh =
      if (pathExists(spark, targetPath)) {
        val existing = spark.read.parquet(targetPath)
          .select(keys.map(col): _*)
        batch.join(existing, keys, "left_anti")
      } else batch
    fresh.dropDuplicates(keys).write.mode("append").parquet(targetPath)
  }

  /** Lake maintenance: rewrite a parquet directory so files approach
    * `targetFileBytes` instead of the per-micro-batch slivers an
    * append-heavy sink accumulates — the small-files problem is the
    * classic silent killer of 100 TB scan throughput (every file is an
    * open + footer read + a scheduler task floor). Unpartitioned data is
    * repartitioned to ceil(bytes/target); partitioned data is
    * repartitioned ON the partition columns so each partition value's
    * rows land in one task → one file per value. The rewrite goes to a
    * sibling tmp dir, then two renames swap it in — briefly non-atomic
    * (a reader between the renames sees a missing dir); a table format
    * with a transactional manifest is the production answer, this is the
    * dependency-free equivalent. Returns (files before, files after). */
  def compactParquet(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L << 20,
      partitionCols: Seq[String] = Nil): (Int, Int) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // The last file written into the rewrite before any rename: its
    // presence under the live path proves the live dir is a COMPLETE
    // compacted copy. Without it, "live dir exists" is not evidence —
    // on object stores (S3A) rename is copy+delete, so a crash mid
    // tmp→live swap leaves a PARTIAL live dir beside a complete
    // __compact_old, and deleting the old copy on sight would destroy
    // the only complete data. Spark readers ignore `_`-prefixed files.
    val markerName = "_GRAFT_COMPACT_OK"
    def hasMarker(dir: org.apache.hadoop.fs.Path): Boolean =
      fs.exists(new org.apache.hadoop.fs.Path(dir, markerName))
    // Crash recovery before starting a new rewrite: a previous run that
    // died between the two renames leaves the data ONLY under
    // __compact_old (rename it back). If live and __compact_old BOTH
    // exist, the marker decides which copy is real: marker present →
    // live is the finished rewrite, drop the old copy; marker absent →
    // live is a partial swap, drop it and restore __compact_old. A stale
    // __compact_tmp from any failure is always safe to drop — the
    // rewrite is recreated from the live dir. (The move-aside rename
    // live→old itself still assumes per-file atomicity; a transactional
    // table format is the answer where even that doesn't hold.)
    val staleOld = new org.apache.hadoop.fs.Path(path + "__compact_old")
    val staleTmp = new org.apache.hadoop.fs.Path(path + "__compact_tmp")
    if (!fs.exists(p) && fs.exists(staleOld)) {
      if (!fs.rename(staleOld, p))
        sys.error(s"compact: cannot recover $staleOld back to $path")
    } else if (fs.exists(p) && fs.exists(staleOld)) {
      if (hasMarker(p)) fs.delete(staleOld, true)
      else {
        fs.delete(p, true)
        if (!fs.rename(staleOld, p))
          sys.error(s"compact: cannot recover $staleOld back to $path")
      }
    }
    if (fs.exists(staleTmp)) fs.delete(staleTmp, true)
    def dataFiles(root: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.LocatedFileStatus] = {
      val it = fs.listFiles(root, true)
      val buf = Seq.newBuilder[org.apache.hadoop.fs.LocatedFileStatus]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) buf += f
      }
      buf.result()
    }
    val before = dataFiles(p)
    val totalBytes = before.map(_.getLen).sum
    val df = spark.read.parquet(path)
    val out =
      if (partitionCols.nonEmpty) df.repartition(partitionCols.map(col): _*)
      else df.repartition(
        math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt))
    val tmp = new org.apache.hadoop.fs.Path(path + "__compact_tmp")
    val writer = out.write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).parquet(tmp.toString)
    // marker is the LAST file written before any rename: a tmp (or a
    // live dir mid copy-rename) without it is by definition incomplete
    fs.create(new org.apache.hadoop.fs.Path(tmp, markerName), true).close()
    val old = new org.apache.hadoop.fs.Path(path + "__compact_old")
    if (!fs.rename(p, old)) {
      fs.delete(tmp, true) // don't leave a full second copy on disk
      sys.error(s"compact: cannot move $path aside")
    }
    if (!fs.rename(tmp, p)) {
      fs.rename(old, p) // roll back; original data untouched
      sys.error(s"compact: cannot swap in $tmp, original restored")
    }
    // drop the old copy only once the live dir provably carries the
    // complete rewrite — on a copy+delete rename a "successful" return
    // is not that proof, the marker is
    if (!hasMarker(p))
      sys.error(s"compact: swap finished but $markerName missing under " +
        s"$path — old copy kept at $old")
    fs.delete(old, true)
    (before.size, dataFiles(p).size)
  }
}
