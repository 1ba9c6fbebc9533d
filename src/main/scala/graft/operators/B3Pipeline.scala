package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's composite computations as reusable DataFrame → DataFrame
  * operators. Semantics mirror RyanRibeiroM/b3-analytics-engine exactly;
  * the physical shape is Spark-native (window functions over a single
  * per-key hash partitioning, reused across every metric — one shuffle
  * feeds dedup + both SMAs + returns).
  *
  * Reference citations:
  *  - keep-last dedup: include/tasks/data_warehouse.py:73-74
  *  - sma_5/sma_20 (rolling, min_periods=1): include/tasks/data_warehouse.py:18-19
  *  - turnover_ratio + fillna(0): include/tasks/data_warehouse.py:21-25
  *  - daily_return (pct_change): include/tasks/generate_dashboard.py:31
  *  - cumulative_return (cumprod(1+r)-1, skipna): include/tasks/generate_dashboard.py:32
  *  - latest-value-per-key + inner join: include/tasks/data_processing.py:44-64
  *  - change_day falsy-zero guard: include/tasks/data_processing.py:66-67
  *  - symbol normalize (.SA strip): include/tasks/data_processing.py:55
  */
object B3Pipeline {

  /** Keep the newest row per composite key — the row MAXIMIZING
    * `newestBy` (lexicographic), ties impossible by construction when the
    * last element is a unique id; pandas concat order + keep='last'
    * semantics (new batch wins).
    *
    * Implemented as a `max_by` groupBy, NOT a row_number window. The win
    * is SHUFFLE VOLUME: the partial aggregate collapses each key's rows
    * to one per map task before the exchange, so the network moves one
    * row per (key, partition) where the window ships every input row and
    * then sorts it. (Spark plans struct-valued max_by as a SortAggregate
    * — a LOCAL per-partition sort by grouping key remains; the global
    * shuffle-then-sort of the full input does not.) The ordering tuple
    * rides inside a struct so a null sort field can't make max_by drop
    * the key (a bare null ordering value would). */
  def dedupKeepLast(df: DataFrame, keys: Seq[String],
      newestBy: Seq[Column]): DataFrame = {
    val others = df.columns.filterNot(keys.contains)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(others.map(col): _*), struct(newestBy: _*)).as("__r"))
      .select(df.columns.toSeq.map(c =>
        if (keys.contains(c)) col(c) else col("__r").getField(c).as(c)): _*)
  }

  /** Latest whole row per key by event time (max_by semantics). */
  def latestPerKey(df: DataFrame, key: String, ts: Column, tieBreak: Column): DataFrame =
    dedupKeepLast(df, Seq(key), Seq(ts, tieBreak))

  /** pandas `.SA` suffix strip for the yfinance → brapi symbol join. */
  def normalizeSymbol(c: Column): Column = regexp_replace(c, "\\.SA$", "")

  /** change_day with the reference's falsy-zero guard: 0 when either side
    * is null OR zero (Python truthiness, not SQL null semantics). */
  def changeDay(open: Column, close: Column): Column =
    when(open.isNotNull && open =!= 0.0 && close.isNotNull && close =!= 0.0,
      close - open).otherwise(0.0)

  /** The historical batch load (SURVEY.md §3.1): declared-schema CSV scan
    * → lot-padrão filter (CODBDI=2) → coerce-casts → dropna → strict date
    * parse → date-partitioned parquet zone write. Single stage, zero
    * shuffles (the partitionBy write is file-level, not a repartition). */
  def historicalLoad(spark: org.apache.spark.sql.SparkSession,
      csvPath: String, outPath: String): DataFrame = {
    val numeric = Seq("PREABE", "PREMAX", "PREMIN", "PREULT", "QUATOT", "VOLTOT")
    // coerce-to-null happens in the PERMISSIVE CSV parse against the
    // declared DoubleType schema — dropna then removes the coerced rows
    val raw = graft.sources.Connectors.readCsv(
      spark, csvPath, graft.Schemas.cotahistBar, "ISO-8859-1")
    val cleaned = raw.filter(col("CODBDI") === 2)
      .na.drop(numeric)
      .withColumn("trade_date", to_date(col("DATPRE"), "yyyy-MM-dd"))
      .filter(col("trade_date").isNotNull)
    graft.sources.Connectors.writePartitionedParquet(
      cleaned, outPath, Seq("trade_date"))
    cleaned
  }

  /** The full calculate_metrics stage over a (key, ts, tiebreak, close,
    * volume) table: keep-last dedup → sma_5/sma_20 → daily_return →
    * cumulative_return → turnover_ratio → fillna(0) on derived metrics. */
  def calculateMetrics(df: DataFrame, key: String, tsCol: String,
      tieCol: String, closeCol: String, volumeCol: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(tsCol), col(tieCol))
    // Keep-last dedup on (key, ts) expressed over the SAME partitioning as
    // every metric window: a row survives iff it is the last of its equal-ts
    // run in (ts, tie) order. One hash shuffle on `key` then feeds dedup and
    // all windows — vs. a naive row_number over (key, ts) which would add a
    // second, wider shuffle before the metrics.
    val nextTs = lead(col(tsCol), 1).over(w)
    val deduped = df
      .withColumn("__last", nextTs.isNull || nextTs =!= col(tsCol))
      .filter(col("__last")).drop("__last")
    val wAll = w.rowsBetween(Window.unboundedPreceding, 0)
    val close = col(closeCol)
    // returns are defined over positive prices only: a zero on either side
    // yields null, which the skipna cumulative product then ignores — keeps
    // the log-rewrite total (no ln(0)/inf) on data containing zeros.
    val prev = lag(close, 1).over(w)
    val r = when(prev > 0.0 && close > 0.0, close / prev - 1.0)
    // marketCap analog: the key's max volume; turnover = volume*close/mcap.
    val mcap = max(col(volumeCol)).over(Window.partitionBy(key))
    deduped
      .withColumn("sma_5", avg(close).over(w.rowsBetween(-4, 0)))
      .withColumn("sma_20", avg(close).over(w.rowsBetween(-19, 0)))
      .withColumn("daily_return", r)
      .withColumn("cumulative_return",
        when(col("daily_return").isNull, lit(null))
          .otherwise(exp(sum(log1p(col("daily_return"))).over(wAll)) - 1.0))
      .withColumn("turnover_ratio",
        coalesce(when(mcap =!= 0.0, col(volumeCol) * close / mcap), lit(0.0)))
      .na.fill(0.0, Seq("sma_5", "sma_20", "turnover_ratio"))
  }
}
