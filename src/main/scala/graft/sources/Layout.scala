package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout optimization for scan pruning (north star; no reference
  * analog — the reference writes unordered tables): Z-order clustered
  * parquet writes, the plain-lake analog of Delta/Iceberg's
  * `OPTIMIZE ZORDER BY`.
  *
  * Why it matters at 100 TB: parquet readers prune files and row groups
  * by column min/max statistics. A table sorted by ONE column prunes
  * scans filtered on that column and nothing else; interleaving the bits
  * of several columns' quantile ranks gives every clustered column
  * partial locality, so a selective filter on ANY of them skips most
  * files. This is a write-side cost (one range shuffle) paid once to
  * make every subsequent selective scan cheap.
  *
  * Scale shape: per-column bucket boundaries come from
  * `approxQuantile` — an aggregate returning BUCKETS-1 doubles to the
  * driver (a model, not data). Bucketing is a per-row CASE chain
  * (codegen'd), the z-value is pure bit arithmetic, and the layout write
  * is `repartitionByRange` + in-partition sort on the z-value — exactly
  * one shuffle, no global sort bottleneck (range boundaries are sampled,
  * partitions write in parallel).
  */
object Layout {

  /** Buckets per clustered column; 16 = 4 bits each, so two columns
    * interleave into an 8-bit z-value — plenty of resolution for file
    * counts in the hundreds while keeping the CASE chain short. */
  val Buckets = 16

  private val Bits = 4 // log2(Buckets)

  /** Quantile-rank a numeric column into [0, Buckets) using precomputed
    * boundaries — quantile (not min/max width) so skewed data still
    * spreads over all buckets. */
  private def bucketOf(c: Column, bounds: Array[Double]): Column =
    bounds.foldLeft(lit(0))((acc, b) => acc + when(c > b, 1).otherwise(0))

  /** Interleave the low `Bits` bits of two bucket ids (Morton order). */
  private def zValue(b1: Column, b2: Column): Column =
    (0 until Bits).foldLeft(lit(0)) { (acc, i) =>
      acc +
        (shiftright(b1, i) % 2) * lit(1 << (2 * i + 1)) +
        (shiftright(b2, i) % 2) * lit(1 << (2 * i))
    }

  /** The z-value column for two numeric cluster columns, boundaries
    * estimated from the data (relativeError 0.01 keeps the quantile
    * sketch a single small-state aggregate). */
  def zOrderColumn(df: DataFrame, c1: String, c2: String): Column = {
    val probs = (1 until Buckets).map(_.toDouble / Buckets).toArray
    val Array(bounds1, bounds2) =
      df.stat.approxQuantile(Array(c1, c2), probs, 0.01)
    zValue(bucketOf(col(c1).cast("double"), bounds1),
      bucketOf(col(c2).cast("double"), bounds2))
  }

  /** Write `df` as `nFiles` parquet files clustered in Morton (Z) order
    * on two numeric columns: each output file covers a narrow range of
    * BOTH columns' value space, so min/max file stats prune selective
    * scans on either one. */
  def writeZOrdered(df: DataFrame, c1: String, c2: String, path: String,
      nFiles: Int): Unit =
    df.withColumn("__z", zOrderColumn(df, c1, c2))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
