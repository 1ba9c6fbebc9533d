package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed through the driver contract: a Spark
  * implementation plus (when SQL-expressible) an equivalent DuckDB oracle
  * query over the same parquet tables.
  *
  * Conventions that make the driver's hash compare deterministic:
  *   - every computed float column is `round(_, n)` in BOTH sides, so
  *     ulp-level summation-order differences between engines vanish;
  *   - every result carries a deterministic total order (ORDER BY on a
  *     unique non-null key in both sides);
  *   - computed integer columns are cast to BIGINT on both sides
  *     (Spark `size`/`row_number` are 32-bit, DuckDB's are 64-bit).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** include in the sf0.1 benchmark headline set */
    headline: Boolean = true)
