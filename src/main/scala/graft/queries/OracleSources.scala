package graft.queries

/** Shared DuckDB source snippets. `events.ts` is TIMESTAMP(NANOS) in the
  * parquet; Spark truncates it to microseconds on read (see graft.Tables),
  * so every oracle query must read events through the same truncation or
  * window ordering / key equality could diverge within a microsecond. */
object OracleSources {
  /** Use as `FROM $events` wherever Spark reads the events table. */
  val events: String =
    "(SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events"
}
