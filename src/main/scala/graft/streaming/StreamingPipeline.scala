package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupStateTimeout, OutputMode, Trigger}

/** One keyed, timestamped, tie-broken record — the unit of the engine's
  * latest-per-key streaming state. */
case class KeyedValue(key: String, ts: java.sql.Timestamp, seq: Long,
    value: Double)

/** Structured-Streaming re-expression of the reference's streaming
  * semantics (SURVEY.md §2.H). The reference's Kafka consumers are
  * modeled as any streaming DataFrame (MemoryStream in tests, Kafka or
  * file source in production — the transforms are source-agnostic).
  *
  * Reference mappings:
  *  - bounded drain (consumer_timeout_ms=15000, data_processing.py:13)
  *    → Trigger.AvailableNow: process everything available, then stop;
  *  - per-key latest-value dicts (data_processing.py:44-56)
  *    → dropDuplicates within watermark, keep-first per (key, ts) after
  *      event reversal, or stateful latest via window on the sink side;
  *  - late/duplicate handling, UNIQUE(symbol,ts) DO NOTHING
  *    (init.sql:32) → watermark + dropDuplicates(key, ts): first write
  *    wins, exactly the ON CONFLICT DO NOTHING semantics;
  *  - 40-day recompute window (data_warehouse.py:67) → withWatermark
  *    bounding state instead of the reference's full re-read;
  *  - insert-if-absent JDBC upsert (yfinance_to_postgres.py:28-56)
  *    → foreachBatch + left_anti against existing keys.
  *
  * Scale notes: every stateful op is keyed-state with a watermark TTL —
  * state is O(active keys in window), never O(history). The reference's
  * reread-everything pattern (H3) is deliberately NOT reproduced; its
  * downstream-visible semantics (idempotent, new-wins) are.
  */
object StreamingPipeline {

  /** First-write-wins dedup on (key, eventTime) — ON CONFLICT DO NOTHING.
    * Watermark bounds the dedup state to the lateness horizon. */
  def dedupFirstWins(src: DataFrame, key: String, tsCol: String,
      lateness: String): DataFrame =
    src.withWatermark(tsCol, lateness)
      .dropDuplicates(key, tsCol)

  /** Streaming exact dedup of a DOCUMENT stream by content fingerprint —
    * the north-star ingest shape: an arriving corpus is deduped online
    * against everything seen inside the lateness horizon, so re-crawled /
    * re-published boilerplate never reaches the lake. First occurrence
    * wins (same batch semantics as the batch q_dedup_exact canonical =
    * first seen). State is one 60-bit fingerprint per distinct content in
    * the watermark window — O(distinct recent docs), never O(history). */
  def dedupByContent(src: DataFrame, textCol: String, tsCol: String,
      lateness: String): DataFrame =
    src.withColumn("fp",
        expr(s"cast(conv(substr(md5(lower(trim($textCol))), 1, 15), 16, 10) AS BIGINT)"))
      .withWatermark(tsCol, lateness)
      .dropDuplicates("fp")

  /** The enrichment projection of data_processing.py:69-83 applied on a
    * stream: symbol normalize + guarded change_day. Stateless → appends. */
  def enrich(src: DataFrame): DataFrame =
    src.withColumn("symbol",
        regexp_replace(col("symbol"), "\\.SA$", ""))
      .withColumn("change_day",
        when(col("open").isNotNull && col("open") =!= 0.0 &&
          col("close").isNotNull && col("close") =!= 0.0,
          col("close") - col("open")).otherwise(0.0))

  /** Tumbling event-time aggregation with watermark — the per-minute
    * micro-batch rollup shape (H1) as a first-class streaming agg. */
  def windowedAgg(src: DataFrame, tsCol: String, key: String,
      valueCol: String, window: String, lateness: String): DataFrame =
    src.withWatermark(tsCol, lateness)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window),
        col(key))
      .agg(count(lit(1)).as("n"), sum(valueCol).as("total"),
        avg(valueCol).as("mean"))
      .select(col("window.start").as("w_start"), col(key),
        col("n"), col("total"), col("mean"))

  /** C1 streaming variant: two quote streams inner-joined on the
    * normalized symbol, with event-time watermarks and a join-time bound
    * so both sides' state is droppable — the reference's in-memory dict
    * join (data_processing.py:44-64) with bounded state instead of
    * unbounded topic re-reads. `maxDelay` is how far the two sources may
    * drift apart and still match. */
  def streamStreamJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, lateness: String, maxDelay: String): DataFrame = {
    val l = left.withWatermark(tsCol, lateness)
    val r = right
      .withColumnRenamed(keyCol, "r_key")
      .withColumnRenamed(tsCol, "r_ts")
      .withWatermark("r_ts", lateness)
    l.join(r,
      col(keyCol) === col("r_key") &&
        col("r_ts") >= col(tsCol) - expr(s"INTERVAL $maxDelay") &&
        col("r_ts") <= col(tsCol) + expr(s"INTERVAL $maxDelay"))
  }

  /** H6 as explicit keyed state: keep the newest (ts, value) per key with
    * flatMapGroupsWithState, emitting the running latest on every update.
    * State is one record per key — O(active keys), with event-time timeout
    * dropping keys idle past the watermark. */
  def latestPerKeyState(src: Dataset[KeyedValue], lateness: String):
      Dataset[KeyedValue] = {
    import src.sparkSession.implicits._
    src.withWatermark("ts", lateness)
      .groupByKey(_.key)
      .flatMapGroupsWithState[KeyedValue, KeyedValue](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val newest = (rows ++ state.getOption.iterator)
              .maxBy(r => (r.ts.getTime, r.seq))
            state.update(newest)
            // arm the event-time timeout: drop this key once the watermark
            // passes its newest event — without this the state never expires
            // and grows O(all keys ever seen)
            state.setTimeoutTimestamp(newest.ts.getTime, lateness)
            Iterator.single(newest)
          }
      }
  }

  /** Bounded drain to an in-memory sink: process all available input then
    * stop — the 15 s-idle-timeout consumer loop, idiomatically. */
  def drainAvailableNow(df: DataFrame, queryName: String): Unit = {
    val q = df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Insert-if-absent sink: per micro-batch, left-anti the batch against
    * the existing keys then append — A15's ON CONFLICT DO NOTHING for an
    * arbitrary table. `existing` is re-read per batch so repeated keys
    * across batches are also suppressed. */
  def upsertSink(src: DataFrame, keys: Seq[String], targetPath: String):
      DataStreamWriter[org.apache.spark.sql.Row] =
    src.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.sources.Connectors.upsertParquet(batch, keys, targetPath)
      }
}
