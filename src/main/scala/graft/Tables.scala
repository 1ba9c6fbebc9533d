package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Testdata table access + session-level semantics the whole engine relies
  * on. Every query entry point calls [[Tables.ensureConf]] so the engine's
  * semantics do not depend on who constructed the SparkSession.
  *
  * ANSI is forced OFF because the reference's computations are pandas-shaped
  * (see SURVEY.md §4): `pd.to_numeric(errors="coerce")` maps to non-ANSI
  * cast-to-null (reference: include/tasks/batch_ingestion.py:33), and
  * division by zero must yield null, not an error
  * (reference: include/tasks/data_warehouse.py:21 turnover_ratio).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Sessions already configured by [[ensureConf]]. Weak keys: test
    * suites churn sessions, and the marker must not keep them alive.
    * The guard exists because ensureConf runs on EVERY table read —
    * inside the bench's timed region — and an unguarded pass re-put
    * 3 UDF registrations per call through the function registry's
    * lock, each emitting a synchronized "replaced a previously
    * registered function" log line (3 439 of them per bench run). */
  private val confEnsured =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def ensureConf(spark: SparkSession): Unit = {
    if (confEnsured.containsKey(spark)) return
    graft.functions.DotProduct.register(spark)
    graft.functions.Md5Hash60.register(spark)
    graft.functions.ProductAgg.register(spark)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // Tiny dims (region/nation/supplier) must broadcast; default 10MB is fine
    // but make intent explicit for a 1000-executor deployment.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
    // Prefer shuffled-hash over sort-merge when neither side broadcasts:
    // skips both sort passes; AQE still rewrites per-stage from runtime
    // stats, and Spark falls back to SMJ when a build side can't fit.
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    // Older driver-generated events.ts was parquet TIMESTAMP(NANOS), which
    // Spark cannot read natively; surface it as the raw int64 so the reader
    // below can truncate it. Current testdata writes plain TIMESTAMP(MICROS),
    // for which this conf is a no-op.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    confEnsured.put(spark, java.lang.Boolean.TRUE)
  }

  /** Inferred-once parquet schema per table path. Every bare
    * `spark.read.parquet(path)` pays schema inference at DataFrame
    * CONSTRUCTION time — a file listing plus a footer-read Spark job
    * (ParquetFileFormat.mergeSchemasInParallel) — and query entry
    * points construct their inputs inside the measured region, so the
    * engine was re-paying that driver-side job for the same immutable
    * table on every query × rep (guide §5: the driver should do almost
    * no data work; §6: metadata belongs in a catalog). In production
    * the fix is a catalog table with a declared schema; here the first
    * read infers and every later read pins `.schema(...)`, which skips
    * the footer job entirely. This caches METADATA only (one
    * StructType per table file) — never rows, plans or results — and
    * the testdata files are immutable for a run, so the pinned schema
    * cannot go stale. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[
      (String, Long), org.apache.spark.sql.types.StructType]()

  /** Cache key: (path, commit stamp). The stamp is the `_SUCCESS`
    * marker's mtime — every rewrite of a table through Spark commits a
    * fresh `_SUCCESS`, so an in-JVM overwrite at a cached path (DedupSpec
    * and ScaleDemo overwrite documents/embeddings.parquet at fixed /tmp
    * targets) gets a NEW key and re-infers instead of silently reading
    * with the stale StructType. Falls back to the directory's own mtime
    * (bare-parquet-file fixtures), and to 0 on non-local filesystems —
    * where the key degrades to path-only, the r19 behavior. One local
    * stat per read (~µs) vs the footer-inference job it replaces
    * (60–110 ms). */
  private def commitStamp(path: String): Long = {
    val succ = new java.io.File(path, "_SUCCESS").lastModified()
    if (succ != 0L) succ else new java.io.File(path).lastModified()
  }

  /** Test hook (clearShingleCache precedent): drop every pinned schema
    * so the next read re-infers. The mtime key makes staleness
    * self-healing for Spark-committed rewrites; this hook covers
    * fixtures written by other means (raw file copies preserve mtimes). */
  def clearSchemaCache(): Unit = schemaCache.clear()

  /** Read one testdata table from a scale-factor directory. `events.ts` is
    * normalized to Spark's microsecond TimestampType whichever way the
    * driver generated it: TIMESTAMP(NANOS) parquet surfaces as LongType
    * (via `nanosAsLong`) and is truncated ns→µs; TIMESTAMP(MICROS) reads
    * as TimestampType and passes through. The DuckDB oracle reads the same
    * column with a plain `CAST(ts AS TIMESTAMP)` (see
    * [[graft.queries.OracleSources]]) so ordering/equality agree. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    ensureConf(spark)
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.computeIfAbsent((path, commitStamp(path)),
      k => spark.read.parquet(k._1).schema)
    val df = spark.read.schema(schema).parquet(path)
    if (name != "events") df
    else df.schema("ts").dataType match {
      // TIMESTAMP(NANOS) parquet, surfaced as int64 via nanosAsLong
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      // TIMESTAMP(MICROS) without tz metadata infers as TIMESTAMP_NTZ;
      // the engine's contract (and what unix_micros & friends need) is
      // TimestampType, and the session tz is pinned UTC so the NTZ→LTZ
      // cast is the identity on the wall-clock values DuckDB sees
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      // already the engine contract (tz-adjusted TIMESTAMP(MICROS))
      case org.apache.spark.sql.types.TimestampType => df
      // a THIRD driver vintage must fail HERE, loudly — flowing an
      // unrecognized ts type downstream is how round 8 silently lost
      // every events-reading query
      case other => throw new IllegalStateException(
        s"events.ts read as unsupported type ${other.simpleString} from " +
          s"$dir — a new testdata vintage; teach Tables.apply to " +
          "normalize it to TimestampType")
    }
  }
}
