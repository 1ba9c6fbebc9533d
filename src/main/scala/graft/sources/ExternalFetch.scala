package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A16/A17: external market-data fetch connectors (SURVEY.md §2.A).
  *
  * Reference mappings:
  *  - A16 REST quote fetch: include/tasks/brapi_producer.py:19-30 — GET
  *    `https://brapi.dev/api/quote/{ticker}` per ticker, keep
  *    `results[0]`, ship the quote object downstream;
  *  - A17 market-data lib fetch: include/tasks/yfinance_to_postgres.py:73-88
  *    — per ticker take the LAST bar of a one-day history and upsert
  *    (symbol, timestamp) ON CONFLICT DO NOTHING.
  *
  * Design: the HTTP/library call is injected as a `Fetcher`
  * (url → response body), so the connector is testable with canned
  * payloads and swappable for any transport. The fetch loop runs
  * DRIVER-SIDE on purpose: the ticker list is a handful of symbols (the
  * reference monitors 3-4) — a distributed fetch would be per-row HTTP
  * from executors, which no rate-limited quote API tolerates. Everything
  * after the fetch is a normal DataFrame with a DECLARED schema (never
  * inferred — engine semantics must not depend on response sampling);
  * malformed payloads coerce to null fields (PERMISSIVE), matching the
  * reference's skip-and-log loop. Downstream is the existing engine
  * core: latest-per-key ([[graft.operators.B3Pipeline.latestPerKey]]) and
  * insert-if-absent ([[Connectors.upsertJdbc]] / [[Connectors.upsertParquet]]
  * on (symbol, timestamp)).
  */
object ExternalFetch {

  /** url → raw response body. Inject an HTTP client in production, a
    * canned map in tests. */
  type Fetcher = String => String

  /** Plain-JDK HTTP GET fetcher (no extra dependencies); `headers` covers
    * the reference's Authorization bearer token. Unused in this
    * environment (zero egress) — the injectable seam is the point. */
  def httpFetcher(headers: Map[String, String] = Map.empty,
      timeoutMillis: Int = 15000): Fetcher = { url =>
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(timeoutMillis)
    conn.setReadTimeout(timeoutMillis)
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    try {
      val src = scala.io.Source.fromInputStream(conn.getInputStream, "UTF-8")
      try src.mkString finally src.close()
    } finally conn.disconnect()
  }

  /** brapi quote envelope: `{"results": [ {quote...} ]}`. Declared
    * subset of fields the reference pipeline consumes. */
  val brapiQuoteSchema: StructType = StructType(Seq(
    StructField("results", ArrayType(StructType(Seq(
      StructField("symbol", StringType),
      StructField("shortName", StringType),
      StructField("regularMarketPrice", DoubleType),
      StructField("regularMarketChange", DoubleType),
      StructField("regularMarketVolume", LongType),
      StructField("regularMarketTime", StringType)))))))

  /** A16: one GET per ticker against the brapi quote endpoint, keep
    * `results[0]` exactly as the reference does, one row per ticker.
    * Tickers whose payload is malformed or missing `results` yield a row
    * of nulls with `fetch_ok = false` — visible, never silently dropped. */
  def fetchBrapiQuotes(spark: SparkSession, tickers: Seq[String],
      fetch: Fetcher,
      baseUrl: String = "https://brapi.dev/api/quote"): DataFrame = {
    import spark.implicits._
    // per-ticker fault tolerance, as the reference's try/except-per-ticker
    // loop: one failing fetch must not sink the batch — the ticker's row
    // survives with fetch_ok = false (null payload parses to null quote)
    val payloads = tickers.map(t =>
      (t, scala.util.Try(fetch(s"$baseUrl/$t")).getOrElse(null)))
    payloads.toDF("ticker", "payload")
      .select(col("ticker"),
        from_json(col("payload"), brapiQuoteSchema).as("js"))
      .select(col("ticker"), element_at(col("js.results"), 1).as("r"))
      .select(
        col("ticker"),
        col("r").isNotNull.as("fetch_ok"),
        col("r.symbol").as("symbol"),
        col("r.shortName").as("short_name"),
        col("r.regularMarketPrice").as("regular_price"),
        col("r.regularMarketChange").as("regular_change"),
        col("r.regularMarketVolume").as("volume"),
        to_timestamp(col("r.regularMarketTime")).as("quote_ts"))
  }

  /** yfinance-adapter payload contract: the library's one-day history
    * rendered as `{"symbol": ..., "bars": [{timestamp, open, high, low,
    * close, volume}...]}` (what a thin driver-side wrapper around the
    * library would emit). */
  val yfinanceHistorySchema: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("bars", ArrayType(StructType(Seq(
      StructField("timestamp", StringType),
      StructField("open", DoubleType),
      StructField("high", DoubleType),
      StructField("low", DoubleType),
      StructField("close", DoubleType),
      StructField("volume", LongType)))))))

  /** A17: per ticker, parse the history payload and keep the LAST bar
    * (`info.iloc[-1]` in the reference) as the current quote row. The
    * result's (symbol, timestamp) key is what the reference's
    * ON CONFLICT DO NOTHING protects — feed this straight into
    * [[Connectors.upsertJdbc]]/[[Connectors.upsertParquet]] with those
    * keys. Empty histories (`bars: []`) produce no row, matching the
    * reference's `if not info.empty` guard. */
  def fetchYfinanceQuotes(spark: SparkSession, tickers: Seq[String],
      fetch: Fetcher, urlFor: String => String = t => t): DataFrame = {
    import spark.implicits._
    // failing tickers are skipped (the reference's except-and-continue):
    // a null payload parses to a null bars array and emits no row
    val payloads = tickers.map(t =>
      scala.util.Try(fetch(urlFor(t))).getOrElse(null))
    payloads.toDF("payload")
      .select(from_json(col("payload"), yfinanceHistorySchema).as("js"))
      .select(col("js.symbol").as("symbol"),
        element_at(col("js.bars"), -1).as("b"))
      .filter(col("b").isNotNull)
      .select(
        col("symbol"),
        col("b.open").as("open"),
        col("b.high").as("high"),
        col("b.low").as("low"),
        col("b.close").as("close"),
        col("b.volume").as("volume"),
        to_timestamp(col("b.timestamp")).as("timestamp"))
  }
}
