package graft

import org.apache.spark.sql.types._

/** The engine's record catalog — explicit StructTypes for every source
  * shape the reference consumes (SURVEY.md §1.3: never rely on schema
  * inference in the engine). Field names and types follow the reference's
  * observed payloads; nullability is permissive because every upstream is
  * schemaless JSON/CSV with `.get()`-default semantics.
  *
  * Reference citations: COTAHIST CSV columns
  * (ingestion_services/batch_ingestion/COTAHIST_*.csv header, consumed at
  * include/tasks/batch_ingestion.py:26-40); brapi quote
  * (include/tasks/data_processing.py:70-75); yfinance OHLCV
  * (include/tasks/yfinance_to_postgres.py:80-88, postgres-init-db/
  * init.sql:23-33); enriched record (data_processing.py:69-83); DW
  * analytics row (data_warehouse.py:62,76-78).
  */
object Schemas {

  /** COTAHIST historical bar — the consumed subset of the 27-column CSV. */
  val cotahistBar: StructType = StructType(Seq(
    StructField("TIPREG", IntegerType),
    StructField("DATPRE", StringType), // parsed strictly to date downstream
    StructField("CODBDI", IntegerType),
    StructField("CODNEG", StringType),
    StructField("TPMERC", IntegerType),
    StructField("NOMRES", StringType),
    StructField("ESPECI", StringType),
    StructField("PREABE", DoubleType),
    StructField("PREMAX", DoubleType),
    StructField("PREMIN", DoubleType),
    StructField("PREMED", DoubleType),
    StructField("PREULT", DoubleType),
    StructField("TOTNEG", LongType),
    StructField("QUATOT", DoubleType),
    StructField("VOLTOT", DoubleType),
    StructField("CODISI", StringType)))

  /** brapi live quote (JSON message). */
  val brapiQuote: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("longName", StringType),
    StructField("regularMarketPrice", DoubleType),
    StructField("regularMarketChange", DoubleType),
    StructField("regularMarketChangePercent", DoubleType),
    StructField("marketCap", LongType)))

  /** yfinance OHLCV quote (JSON message / DW table row). */
  val yfinanceQuote: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("volume", LongType),
    StructField("timestamp", TimestampType)))

  /** Enriched record — the processing stage's join output. */
  val enrichedRecord: StructType = StructType(
    brapiQuote.fields.toSeq ++ Seq(
      StructField("open", DoubleType),
      StructField("high", DoubleType),
      StructField("low", DoubleType),
      StructField("close", DoubleType),
      StructField("volume", LongType),
      StructField("change_day", DoubleType),
      StructField("processed_at", StringType)))

  /** DW analytics row: enriched + derived metrics, processed_at → date. */
  val analyticsRow: StructType = StructType(
    enrichedRecord.fields.toSeq.filterNot(_.name == "processed_at") ++ Seq(
      StructField("date", TimestampType),
      StructField("sma_5", DoubleType),
      StructField("sma_20", DoubleType),
      StructField("turnover_ratio", DoubleType)))
}
