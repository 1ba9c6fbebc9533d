package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupStateTimeout, OutputMode, Trigger}

/** One keyed, timestamped, tie-broken record — the unit of the engine's
  * latest-per-key streaming state. */
case class KeyedValue(key: String, ts: java.sql.Timestamp, seq: Long,
    value: Double)

/** One smoothed point of a key's Holt level+trend stream. */
case class HoltPoint(key: String, ts: java.sql.Timestamp, seq: Long,
    level: Double, trend: Double)

/** One observation of a key's mutable attribute — streaming SCD2 input. */
case class AttrObs(key: String, ts: java.sql.Timestamp, seq: Long,
    attr: String)

/** One type-2 dimension row: [valid_from, valid_to) — valid_to None means
  * the interval was still open (is_current) when emitted. */
case class Scd2Row(key: String, attr: String,
    valid_from: java.sql.Timestamp, valid_to: Option[java.sql.Timestamp])

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
    * first seen).
    *
    * Uses `dropDuplicatesWithinWatermark`, NOT `dropDuplicates`: plain
    * dropDuplicates only evicts state when the event-time column is part
    * of the dedup keys, so keying on `fp` alone would retain every
    * fingerprint EVER seen — unbounded state. The within-watermark
    * variant expires each fingerprint once the watermark passes its
    * event time + lateness, so state really is O(distinct recent docs),
    * never O(history): a re-crawl inside the horizon is dropped, one
    * far outside it is (deliberately) re-admitted and left to the batch
    * dedup compaction — the bounded-state / exactness trade every
    * streaming deduper at 100 TB/day has to make. */
  def dedupByContent(src: DataFrame, textCol: String, tsCol: String,
      lateness: String, fingerprintExpr: Option[String] = None): DataFrame =
    src.withColumn("fp",
        // default: lowercase-trim fingerprint (≡ batch q_dedup_exact);
        // callers can pass a stronger row-local fold — e.g.
        // md5_60(TextQueries.normalizeExpr(textCol)) so accent/
        // whitespace variants dedup together at ingest
        expr(fingerprintExpr.getOrElse(s"md5_60(lower(trim($textCol)))")))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("fp")

  /** Online near-dup CLUSTER ASSIGNMENT — the serving twin of the batch
    * incremental connected components (q_clusters_incremental's
    * batch-lake stage): each arriving document shingles ROW-LOCALLY
    * (word 3-grams → 60-bit hashes, the exact batch spelling), probes
    * the static lake shingle index, verifies exact Jaccard ≥ 0.5, and
    * emits its best match's persisted cluster label (an unclustered lake
    * doc represents itself). A document matching nothing emits NO row —
    * absence means "novel, cluster = itself" (emitting it would need a
    * stream-stream outer self-join for zero information gain).
    *
    * Granularity trade (the [[dedupByContent]] discipline): assignment
    * is per-document vs the LAKE — pairs among in-flight streamed docs
    * wait for the batch incremental merge, which also heals lake-side
    * label merges the per-doc view cannot see. Static sides re-bind per
    * micro-batch, so a lake recompaction (retrained labels, fresh
    * shingle artifact) is picked up without restarting the query.
    *
    * Plan shape: two chained streaming aggregations in append mode
    * (common-shingle count per candidate, then best-candidate max_by),
    * both keyed on the watermarked event time — Spark 4's
    * multiple-stateful-operator support; state is O(in-horizon docs ×
    * their candidates), never lake-sized. Only (doc_id, h) pairs
    * shuffle; the probe is the SAME join skeleton as the batch
    * incremental's batch-lake stage.
    *
    * DF-CAP PARITY (`hotShingles`): the lake shingle index is
    * stop-shingle df-capped, so an arriving document's shingle COUNT
    * must drop the same hot (boilerplate) shingles before sizing —
    * otherwise boilerplate inflates |arrival| and deflates Jaccard vs
    * the batch computation (a doc sharing all its content shingles with
    * a lake near-dup but carrying 6 boilerplate shingles would miss the
    * 0.5 threshold ONLY on the stream). The hot list is model-sized by
    * construction (≤ distinct-shingles / cap — a handful of corpus-wide
    * boilerplate hashes), so it bakes into the plan as a literal
    * array_except, the IVF-serving bake-the-model pattern: the filter
    * stays row-local and the chained-agg count stays at two.
    * [[graft.queries.DedupQueries.lakeHotShingles]] is the production
    * source — the SAME census that capped the lake index. */
  def assignClusters(src: DataFrame, lakeShingles: DataFrame,
      lakeLabels: DataFrame, tsCol: String, lateness: String,
      hotShingles: Option[DataFrame] = None): DataFrame = {
    val hotSet: Array[Long] = hotShingles
      .map(_.select("h").collect().map(_.getLong(0)).sorted)
      .getOrElse(Array.empty)
    val capExpr =
      if (hotSet.isEmpty) "hs"
      else s"array_except(hs, array(${hotSet.mkString("L, ")}L))"
    val sh = src.withWatermark(tsCol, lateness)
      .selectExpr("doc_id", tsCol, "split(trim(text), '\\\\s+') AS t")
      .selectExpr("doc_id", tsCol,
        """CASE WHEN size(t) >= 3
             THEN array_distinct(transform(sequence(0, size(t) - 3),
                    i -> md5_60(concat_ws(' ', t[i], t[i+1], t[i+2]))))
             ELSE array() END AS hs""")
      .selectExpr("doc_id", tsCol, s"$capExpr AS hs2")
      .selectExpr("doc_id", tsCol, "size(hs2) AS nb", "explode(hs2) AS h")
    val lk = lakeShingles.select(col("doc_id").as("lake_id"), col("h"))
    val sizes = lk.groupBy("lake_id").agg(count(lit(1)).as("ne"))
    val common = sh.join(lk, "h")
      .groupBy(col("doc_id"), col(tsCol), col("nb"), col("lake_id"))
      .agg(count(lit(1)).as("c"))
    val cand = common.join(sizes, "lake_id")
      .withColumn("jaccard",
        expr("round(c / CAST(nb + ne - c AS DOUBLE) + 1e-9, 6)"))
      .filter(col("jaccard") >= 0.5)
    val lbl = lakeLabels.select(col("doc_id").as("lake_id"),
      col("cluster_id"))
    cand.join(lbl, Seq("lake_id"), "left")
      .selectExpr("doc_id", tsCol, "lake_id", "jaccard",
        "coalesce(cluster_id, lake_id) AS cluster_id")
      .groupBy(col("doc_id"), col(tsCol))
      .agg(max_by(
        struct(col("cluster_id"), col("lake_id"), col("jaccard")),
        // best jaccard; ties to the smaller lake doc id
        struct(col("jaccard"), col("lake_id") * -1)).as("m"))
      .select(col("doc_id"), col(tsCol), col("m.cluster_id").as("cluster_id"),
        col("m.lake_id").as("matched_id"), col("m.jaccard").as("jaccard"))
  }

  /** The enrichment projection of data_processing.py:69-83 applied on a
    * stream: symbol normalize + guarded change_day. Stateless → appends. */
  def enrich(src: DataFrame): DataFrame =
    src.withColumn("symbol",
        regexp_replace(col("symbol"), "\\.SA$", ""))
      .withColumn("change_day",
        when(col("open").isNotNull && col("open") =!= 0.0 &&
          col("close").isNotNull && col("close") =!= 0.0,
          col("close") - col("open")).otherwise(0.0))

  /** Stream-static dimension join: enrich each micro-batch against a
    * static (or slowly-refreshed) dimension DataFrame. Spark re-binds the
    * static side per micro-batch, so a dim refreshed in place (e.g. a
    * parquet dir rewritten by a batch job) is picked up without
    * restarting the query. Stateless — no watermark needed on the join
    * itself; the dim should be broadcastable (it is a dimension) so each
    * batch joins map-side without shuffling the stream. Left join keeps
    * stream rows whose key has no dim row yet (late-arriving dims are a
    * fact of life; drop or route them downstream). */
  def enrichAgainstStatic(src: DataFrame, dim: DataFrame,
      key: String): DataFrame =
    src.join(broadcast(dim), Seq(key), "left")

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

  /** Streaming EWMA — the online form of the batch blocked scan in
    * [[graft.operators.LinearRecurrence]]: the recurrence
    * y₁ = x₁, yₙ = α·xₙ + (1−α)·yₙ₋₁ carried as ONE (ts, seq, y) triple
    * of keyed state per active series — O(active keys), never O(history),
    * expired by the event-time timeout once the watermark passes the
    * key's newest observation by the lateness horizon. Eviction FORGETS
    * the recursion: a key's next observation reseeds y = x, so choose
    * `lateness` longer than any real key's silence (the price of bounded
    * state on an endless stream). Within a micro-batch rows are processed
    * in (ts, seq) order; an observation at or before the state's frontier
    * is late and is DROPPED rather than folded out of order (the batch
    * scan would have placed it earlier in the recursion — folding it now
    * would silently compute a different series; the twin spec proves the
    * on-time path equals the batch scan). Emits every accepted row with
    * its smoothed value. */
  def ewmaState(src: Dataset[KeyedValue], alpha: Double, lateness: String):
      Dataset[KeyedValue] = {
    import src.sparkSession.implicits._
    src.withWatermark("ts", lateness)
      .groupByKey(_.key)
      .flatMapGroupsWithState[
        (java.sql.Timestamp, Long, Double), KeyedValue](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.seq))
            val out = Seq.newBuilder[KeyedValue]
            var cur = state.getOption
            sorted.foreach { r =>
              val accept = cur.forall { case (ts, seq, _) =>
                r.ts.getTime > ts.getTime ||
                  (r.ts.getTime == ts.getTime && r.seq > seq) }
              if (accept) {
                val y = cur match {
                  case None => r.value
                  case Some((_, _, prev)) => alpha * r.value + (1.0 - alpha) * prev
                }
                cur = Some((r.ts, r.seq, y))
                out += KeyedValue(r.key, r.ts, r.seq, y)
              } // else: late row — the recursion's frontier already passed it
            }
            cur.foreach { c =>
              state.update(c)
              state.setTimeoutTimestamp(c._1.getTime, lateness)
            }
            out.result().iterator
          }
      }
  }

  /** [[ewmaState]]'s coupled-state sibling: Holt level+trend smoothing
    * served online. State per key is ONE (ts, seq, level, trend) tuple
    * with event-time timeout eviction; late rows (at or behind the
    * frontier) are dropped, never folded out of order — the recursion a
    * re-ordered fold would silently corrupt. StreamingSpec proves
    * cross-micro-batch equality with the batch blocked matrix scan
    * ([[graft.operators.LinearRecurrence.holt]]). */
  def holtState(src: Dataset[KeyedValue], alpha: Double, beta: Double,
      lateness: String): Dataset[HoltPoint] = {
    import src.sparkSession.implicits._
    src.withWatermark("ts", lateness)
      .groupByKey(_.key)
      .flatMapGroupsWithState[
        (java.sql.Timestamp, Long, Double, Double), HoltPoint](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.seq))
            val out = Seq.newBuilder[HoltPoint]
            var cur = state.getOption
            sorted.foreach { r =>
              val accept = cur.forall { case (ts, seq, _, _) =>
                r.ts.getTime > ts.getTime ||
                  (r.ts.getTime == ts.getTime && r.seq > seq) }
              if (accept) {
                val (l, t) = cur match {
                  case None => (r.value, 0.0)
                  case Some((_, _, pl, pt)) =>
                    val ln = alpha * r.value + (1.0 - alpha) * (pl + pt)
                    (ln, beta * (ln - pl) + (1.0 - beta) * pt)
                }
                cur = Some((r.ts, r.seq, l, t))
                out += HoltPoint(r.key, r.ts, r.seq, l, t)
              }
            }
            cur.foreach { c =>
              state.update(c)
              state.setTimeoutTimestamp(c._1.getTime, lateness)
            }
            out.result().iterator
          }
      }
  }

  /** Streaming SCD2 — the online form of the batch q_scd2 historization:
    * CDC-style attribute observations arrive per key; a CLOSED type-2 row
    * [valid_from, valid_to) is emitted the moment a key's attribute
    * CHANGES, and the still-open row is emitted (valid_to = None,
    * is_current) when the key goes idle past the watermark and its state
    * times out. State is one (attr, valid_from, latest_ts) triple per
    * active key — O(active keys), never O(history) — exactly the
    * incremental version of the batch query's lag/lead window pair.
    * Within an invocation rows are processed in (ts, seq) order;
    * observations at or before the state's latest timestamp are dropped
    * (late data cannot rewrite already-emitted intervals). */
  def scd2State(src: Dataset[AttrObs], lateness: String): Dataset[Scd2Row] = {
    import src.sparkSession.implicits._
    // state = (current attr, interval open ts, newest observation ts)
    src.withWatermark("ts", lateness)
      .groupByKey(_.key)
      .flatMapGroupsWithState[
        (String, java.sql.Timestamp, java.sql.Timestamp), Scd2Row](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, rows, state) =>
          if (state.hasTimedOut) {
            val (attr, from, _) = state.get
            state.remove()
            Iterator.single(Scd2Row(key, attr, from, None))
          } else {
            val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.seq))
            val closed = Seq.newBuilder[Scd2Row]
            var cur = state.getOption
            sorted.foreach { o =>
              cur match {
                case None => cur = Some((o.attr, o.ts, o.ts))
                case Some((attr, from, latest)) =>
                  if (o.ts.getTime > latest.getTime) {
                    if (o.attr != attr) {
                      closed += Scd2Row(key, attr, from, Some(o.ts))
                      cur = Some((o.attr, o.ts, o.ts))
                    } else cur = Some((attr, from, o.ts))
                  } // else: late observation, interval already advanced
              }
            }
            cur.foreach { c =>
              state.update(c)
              // expire the key (emitting its open row) once the watermark
              // passes its newest event by the lateness horizon
              state.setTimeoutTimestamp(c._3.getTime, lateness)
            }
            closed.result().iterator
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

  /** Continual-ingest sink for the VECTOR modality — the embedding-side
    * twin of [[assignClusters]]'s doc-ingest loop: each micro-batch of
    * arriving (vec_id, v) embeddings is assigned against the frozen
    * coarse quantizer and committed as the next slice of the persisted
    * IVF inverted file, so downstream semantic-dedup / ANN stages
    * ([[graft.queries.DedupQueries]] `q_semdedup_incremental`,
    * `q_ann_ivf`) read an index that is maintained BY the stream, never
    * rebuilt from the lake. Replay-safe: already-covered vec_ids are
    * dropped inside the append (foreachBatch is at-least-once), so a
    * restarted query re-commits nothing — see
    * [[graft.queries.SimilarityQueries.appendAssignedBatch]]. */
  def ingestVectorsSink(src: DataFrame, dir: String):
      DataStreamWriter[org.apache.spark.sql.Row] =
    src.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.queries.SimilarityQueries.appendAssignedBatch(
          batch.sparkSession, dir, batch)
      }

  /** STREAMING cluster assignment for the IMAGE modality — the image
    * twin of [[assignClusters]], completing the ingest → assign →
    * compact loop for media: each arriving (media_id, ts, bytes) blob
    * is decoded and aHashed per-partition (stateless, so it runs on the
    * stream), its 4 pigeonhole bands probe the LAKE's band buckets
    * (`lakeSigs`, read from the persisted signature index — the lake is
    * never re-decoded), candidates within Hamming ≤ 3 resolve to the
    * persisted cluster label of the best match (min hamming, ties to
    * the smaller lake id), and non-matching images produce no row (a
    * later batch compaction clusters them). `hotBuckets` carries the
    * lake census's over-popular (band, value) list
    * ([[graft.queries.MultimodalQueries.mediaHotBuckets]]) so the
    * stream applies the same df-cap the batch pipeline does — the
    * stream itself cannot census an unbounded corpus. The cut is
    * STRUCTURAL, not optional: when `hotBuckets` is not supplied it is
    * derived from `lakeSigs` itself (the same 4-band census formula as
    * [[graft.queries.MultimodalQueries.mediaHotBuckets]]), so a caller
    * that forgets the census at a real df-capped corpus gets parity
    * anyway — at the price of re-aggregating the static side per
    * micro-batch; production passes the artifact-served `mediaHotBuckets`
    * to pay the census once. Join shape at scale: stream bands ×
    * broadcast hot cut, then a stream-static equi-join on
    * (band, value) — per-image work is bounded by 4 × bucket cap. */
  def assignMediaClusters(src: DataFrame, lakeSigs: DataFrame,
      lakeLabels: DataFrame, tsCol: String, lateness: String,
      hotBuckets: Option[DataFrame] = None): DataFrame = {
    val bandStructs = (0 until 4).map(b =>
      s"named_struct('b', $b, 'v', shiftright(phash, ${b * 16}) & 65535)")
      .mkString(", ")
    def banded(df: DataFrame, keep: Seq[String]): DataFrame =
      df.selectExpr(keep ++ Seq("phash",
          s"explode(array($bandStructs)) AS band"): _*)
        .selectExpr(keep ++ Seq("phash", "band.b AS b", "band.v AS v"): _*)
    val lkBands = banded(
      lakeSigs.select(col("media_id").as("lake_id"), col("phash")),
      Seq("lake_id"))
    val hot = hotBuckets.getOrElse(
      lkBands.groupBy("b", "v").agg(count(lit(1)).as("bucket_n"))
        .filter(col("bucket_n") > graft.operators.Multimodal.BandBucketCap)
        .select("b", "v"))
    def cut(df: DataFrame): DataFrame =
      df.join(broadcast(hot), Seq("b", "v"), "left_anti")
    val sb = cut(banded(
      graft.operators.Multimodal
        .perceptualHashTimedPartitioned(src, "media_id", tsCol, "bytes")
        .toDF("media_id", tsCol, "phash")
        .withWatermark(tsCol, lateness),
      Seq("media_id", tsCol)))
    val lk = cut(lkBands)
      .select(col("b"), col("v"), col("lake_id"),
        col("phash").as("lake_phash"))
    val lbl = lakeLabels.select(col("doc_id").as("lake_id"),
      col("cluster_id"))
    sb.join(lk, Seq("b", "v"))
      .withColumn("hamming",
        expr("cast(bit_count(phash ^ lake_phash) AS BIGINT)"))
      .filter(col("hamming") <= 3)
      .join(lbl, Seq("lake_id"), "left")
      .selectExpr("media_id", tsCol, "lake_id", "hamming",
        "coalesce(cluster_id, lake_id) AS cluster_id")
      .groupBy(col("media_id"), col(tsCol))
      .agg(max_by(
        struct(col("cluster_id"), col("lake_id"), col("hamming")),
        // best = min hamming; ties to the smaller lake id
        struct(col("hamming") * -1, col("lake_id") * -1)).as("m"))
      .select(col("media_id"), col(tsCol),
        col("m.cluster_id").as("cluster_id"),
        col("m.lake_id").as("matched_id"), col("m.hamming").as("hamming"))
  }

  /** Continual-ingest sink for the IMAGE modality — the third leg of
    * the per-modality ingest triad (documents → shingle index, vectors
    * → IVF inverted file, images → signature index): each micro-batch
    * of arriving (media_id, bytes) blobs is decoded and aHashed
    * executor-side and committed as the next slice of the persisted
    * signature index, so the pixel decode — the most expensive stage in
    * the media pipeline — runs exactly once per image, at ingest, and
    * every near-dup/cluster/canonical stage reads 8-byte signatures
    * instead of refetching pixels. Replay-safe: already-covered
    * media_ids are dropped inside the append (foreachBatch is
    * at-least-once) — see
    * [[graft.queries.MultimodalQueries.appendMediaSigBatch]]. */
  def ingestMediaSink(src: DataFrame, dir: String):
      DataStreamWriter[org.apache.spark.sql.Row] =
    src.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.queries.MultimodalQueries.appendMediaSigBatch(
          batch.sparkSession, dir, batch)
      }

  /** Continual-ingest sink for the AUDIO modality: each micro-batch of
    * arriving (media_id, bytes) PCM blobs is framed, fingerprinted
    * (pure-Catalyst decode — the whole hash stays in codegen) and
    * committed as the next slice of the persisted fingerprint index.
    * Same replay contract as the image and vector sinks — see
    * [[graft.queries.MultimodalQueries.appendAudioSigBatch]]. */
  def ingestAudioSink(src: DataFrame, dir: String):
      DataStreamWriter[org.apache.spark.sql.Row] =
    src.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.queries.MultimodalQueries.appendAudioSigBatch(
          batch.sparkSession, dir, batch)
      }

  /** Continual-ingest sink for the VIDEO modality: each micro-batch of
    * arriving (media_id, bytes) framed video blobs is scene-segmented
    * (pure-Catalyst frame extraction + per-id change-point windows) and
    * its scene-level signature committed as the next slice of the
    * persisted video signature index — frames are decoded exactly once,
    * at ingest, and every near-dup/incremental stage downstream reads
    * 8-byte signatures. Same replay contract as the other sinks — see
    * [[graft.queries.MultimodalQueries.appendVideoSigBatch]]. */
  def ingestVideoSink(src: DataFrame, dir: String):
      DataStreamWriter[org.apache.spark.sql.Row] =
    src.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.queries.MultimodalQueries.appendVideoSigBatch(
          batch.sparkSession, dir, batch)
      }

  /** Continual-ingest sink for the TEXT modality — the fourth leg of
    * the per-modality ingest set (vectors → IVF inverted file, images →
    * signature index, audio → fingerprint index, documents → SHINGLE
    * INDEX): each micro-batch of arriving (doc_id, source, text)
    * documents is shingled executor-side and committed as the next
    * slice of the persisted shingle index, census merge included, so
    * the corpus tokenize+hash pass — the expensive stage every dedup /
    * decontamination query reads — runs exactly once per document, at
    * ingest. Until now the text index was appended only by the batch
    * compaction loop; this sink closes the symmetry gap. Replay-safe
    * under the same guarded dense-monotone contract as the other three
    * sinks, plus the text-specific source-atomic batch contract — see
    * [[graft.queries.DedupQueries.appendShingleBatch]]. */
  def ingestDocsSink(src: DataFrame, dir: String):
      DataStreamWriter[org.apache.spark.sql.Row] =
    src.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.queries.DedupQueries.appendShingleBatch(
          batch.sparkSession, dir, batch)
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
