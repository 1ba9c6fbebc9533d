package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.B3Pipeline

/** The reference's two composite pipelines as single DataFrame programs
  * (SURVEY.md §3.2): the DW load's calculate_metrics chain and the
  * processing stage's latest-per-key enrichment join. These are the
  * flagship multi-operator queries.
  */
object PipelineQueries {

  /** Flagship: dedup keep-last → SMA(5/20) → daily/cumulative returns →
    * turnover ratio → fillna(0), per user over time — the whole analytical
    * essence of the reference in one plan. One shuffle (hash by user_id)
    * feeds every window; the volume column is parsed from the props string
    * with coerce-cast semantics. */
  def b3Metrics(spark: SparkSession, dir: String): DataFrame =
    b3MetricsOf(Tables(spark, dir, "events"))

  /** The full q_b3_metrics plan over any events-shaped DataFrame — shared
    * by the batch query and its streaming twin (StreamingSpec), which
    * stream-ingests the same events through dedup + idempotent upsert and
    * asserts this plan over the staged table is byte-identical to the
    * batch run. */
  def b3MetricsOf(events: DataFrame): DataFrame = {
    val ev = events
      .withColumn("volume",
        regexp_extract(col("props"), "[0-9]+", 0).cast("long"))
    B3Pipeline.calculateMetrics(ev, "user_id", "ts", "event_id",
        "value", "volume")
      .select(
        col("event_id"), col("user_id"), col("ts"),
        round(col("value"), 2).as("close"),
        Num.r(col("sma_5"), 4).as("sma_5"),
        Num.r(col("sma_20"), 4).as("sma_20"),
        Num.r(col("daily_return"), 6).as("daily_return"),
        Num.rExp(col("cumulative_return"), 6).as("cumulative_return"),
        Num.r(col("turnover_ratio"), 6).as("turnover_ratio"))
      .orderBy("event_id")
  }

  private val E = OracleSources.events

  private val b3MetricsSql = s"""
    WITH src AS (
      SELECT event_id, user_id, ts, value,
             CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS volume
      FROM $E),
    deduped AS (
      SELECT * FROM src
      QUALIFY row_number() OVER (PARTITION BY user_id, ts
                                 ORDER BY event_id DESC) = 1),
    metrics AS (
      SELECT event_id, user_id, ts, value, volume,
             avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS sma_5,
             avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS sma_20,
             CASE WHEN lag(value, 1) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) > 0.0 AND value > 0.0
                  THEN value / lag(value, 1) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) - 1.0 END AS daily_return,
             max(volume) OVER (PARTITION BY user_id) AS mcap
      FROM deduped),
    compounded AS (
      SELECT *,
             CASE WHEN daily_return IS NULL THEN NULL
                  ELSE exp(sum(ln(1.0 + daily_return)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) - 1.0
             END AS cumulative_return,
             COALESCE(CASE WHEN mcap <> 0
                           THEN volume * value / mcap END, 0.0)
               AS turnover_ratio
      FROM metrics)
    SELECT event_id, user_id, ts,
           round(value, 2) AS close,
           round(COALESCE(sma_5, 0.0) + 1e-9, 4) AS sma_5,
           round(COALESCE(sma_20, 0.0) + 1e-9, 4) AS sma_20,
           round(daily_return + 1e-9, 6) AS daily_return,
           round(cumulative_return + 1e-8, 6) AS cumulative_return,
           round(turnover_ratio + 1e-9, 6) AS turnover_ratio
    FROM compounded
    ORDER BY event_id"""

  /** The processing stage (data_processing.py:32-108): two "topics" are
    * carved out of events (purchases = brapi side; views with a `.SA`
    * suffixed symbol = yfinance side), each reduced to its latest record
    * per key, then inner-joined on the normalized symbol and projected to
    * the enriched record with the change_day falsy-zero guard. The small
    * side is broadcast, mirroring the reference's in-memory dict join. */
  def enrichJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val brapi = B3Pipeline.latestPerKey(
      ev.filter(col("event_type") === "purchase")
        .select(concat(lit("U"), col("user_id")).as("symbol"),
          col("ts"), col("event_id"), col("value").as("regular_price")),
      "symbol", col("ts"), col("event_id"))
    val yf = B3Pipeline.latestPerKey(
      ev.filter(col("event_type") === "view")
        .select(concat(lit("U"), col("user_id"), lit(".SA")).as("raw_symbol"),
          col("ts"), col("event_id"),
          col("value").as("close"),
          lag(col("value"), 1).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("user_id").orderBy(col("ts"), col("event_id")))
            .as("open")),
      "raw_symbol", col("ts"), col("event_id"))
      .withColumn("symbol", B3Pipeline.normalizeSymbol(col("raw_symbol")))
    brapi.join(broadcast(yf), Seq("symbol"), "inner")
      .select(
        col("symbol"),
        round(col("regular_price"), 2).as("regular_price"),
        round(col("open"), 2).as("open"),
        round(col("close"), 2).as("close"),
        round(B3Pipeline.changeDay(col("open"), col("close")), 2)
          .as("change_day"))
      .orderBy("symbol")
  }

  private val enrichJoinSql = s"""
    WITH brapi AS (
      SELECT 'U' || CAST(user_id AS VARCHAR) AS symbol,
             value AS regular_price
      FROM $E WHERE event_type = 'purchase'
      QUALIFY row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts DESC, event_id DESC) = 1),
    views AS (
      SELECT user_id, ts, event_id, value AS close,
             lag(value, 1) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS open
      FROM $E WHERE event_type = 'view'),
    yf AS (
      SELECT 'U' || CAST(user_id AS VARCHAR) || '.SA' AS raw_symbol,
             close, open
      FROM views
      QUALIFY row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts DESC, event_id DESC) = 1),
    yf_norm AS (
      SELECT regexp_replace(raw_symbol, '\\.SA$$', '') AS symbol, close, open
      FROM yf)
    SELECT b.symbol,
           round(b.regular_price, 2) AS regular_price,
           round(y.open, 2) AS open,
           round(y.close, 2) AS close,
           round(CASE WHEN y.open IS NOT NULL AND y.open <> 0.0
                       AND y.close IS NOT NULL AND y.close <> 0.0
                      THEN y.close - y.open ELSE 0.0 END, 2) AS change_day
    FROM brapi b JOIN yf_norm y ON b.symbol = y.symbol
    ORDER BY b.symbol"""

  /** The dashboard read path (SURVEY.md §3.3) as one DataFrame program:
    * 24h-window predicated scan (relative to the data's max ts — no wall
    * clock), symbol-picker membership filter (B12 isin), latest row per
    * key (D2), share-of-total (D5) and argmax flags (D3). */
  def dashboard(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val selected = Seq(1L, 2L, 3L, 5L, 8L, 13L, 21L, 34L)
    val ev = Tables(spark, dir, "events")
    // ONE job: the anchor max(ts) is a broadcast 1-row aggregate joined
    // into the plan (not a driver .collect() that splits the query into
    // two jobs); the membership filter still pushes into the scan.
    val anchor = ev.agg(max("ts").as("max_ts"))
    val recent = ev
      .filter(col("user_id").isin(selected: _*))
      .join(broadcast(anchor))
      .filter(col("ts") >= col("max_ts") - expr("INTERVAL 24 HOURS"))
      .drop("max_ts")
    // latest-row-per-key AND totals in ONE groupBy (max_by on the
    // (ts, event_id) sort key ≡ the row_number()=1 pick): one scan of
    // events, one shuffle — not a window pass plus an agg pass joined.
    val fused = recent.groupBy("user_id")
      .agg(
        max_by(struct(col("event_id"), col("value")),
          struct(col("ts"), col("event_id"))).as("last"),
        sum("value").as("total_value"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("last.event_id").as("event_id"),
        col("last.value").as("value"), col("total_value"), col("n_events"))
    fused
      .select(col("user_id"), col("event_id"),
        round(col("value"), 2).as("latest_value"),
        Num.r(col("total_value"), 2).as("total_value"),
        col("n_events"),
        Num.r(col("total_value") /
          sum("total_value").over(Window.partitionBy()), 6).as("share"),
        (rank().over(Window.partitionBy()
          .orderBy(Num.r(col("total_value"), 2).desc)) === 1)
          .as("is_top_by_value"))
      .orderBy("user_id")
  }

  private val dashboardSql = s"""
    WITH ev AS (SELECT * FROM $E),
    recent AS (
      SELECT * FROM ev
      WHERE ts >= (SELECT max(ts) FROM ev) - INTERVAL 24 HOUR
        AND user_id IN (1, 2, 3, 5, 8, 13, 21, 34)),
    latest AS (
      SELECT user_id, event_id, value
      FROM recent
      QUALIFY row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts DESC, event_id DESC) = 1),
    totals AS (
      SELECT user_id, sum(value) AS total_value, count(*) AS n_events
      FROM recent GROUP BY user_id)
    SELECT l.user_id, l.event_id,
           round(l.value, 2) AS latest_value,
           round(t.total_value + 1e-9, 2) AS total_value,
           t.n_events,
           round(t.total_value / sum(t.total_value) OVER () + 1e-9, 6) AS share,
           (rank() OVER (ORDER BY round(t.total_value + 1e-9, 2) DESC) = 1)
             AS is_top_by_value
    FROM latest l JOIN totals t ON l.user_id = t.user_id
    ORDER BY l.user_id"""

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_b3_metrics", b3Metrics, Some(b3MetricsSql)),
    QueryDef("q_enrich_join", enrichJoin, Some(enrichJoinSql)),
    QueryDef("q_dashboard", dashboard, Some(dashboardSql)),
  )
}
