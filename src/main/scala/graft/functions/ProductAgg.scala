package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact product aggregate (SURVEY.md §7.2's optional custom Aggregator):
  * the precision-exact alternative to the exp∘sum∘log1p rewrite for
  * cumulative compounding (E4). Multiplies doubles sequentially in frame
  * order — plain IEEE semantics (sign, zero, inf all propagate exactly as
  * DuckDB's product() does), nulls skipped like every SQL aggregate.
  *
  * Scale note: as a window aggregate this is not invertible, so Spark
  * re-evaluates the frame per row — O(frame²) per key. Use it where
  * exactness beats the log-rewrite (bounded frames, audit paths); the
  * log-sum-exp form in [[graft.operators.B3Pipeline]] remains the
  * unbounded-frame scale path.
  */
object ProductAgg extends Aggregator[java.lang.Double, (Double, Boolean), java.lang.Double] {
  // buffer = (runningProduct, sawAnyValue)
  override def zero: (Double, Boolean) = (1.0, false)

  override def reduce(b: (Double, Boolean), x: java.lang.Double): (Double, Boolean) =
    if (x == null) b else (b._1 * x.doubleValue(), true)

  override def merge(a: (Double, Boolean), b: (Double, Boolean)): (Double, Boolean) =
    (a._1 * b._1, a._2 || b._2)

  override def finish(b: (Double, Boolean)): java.lang.Double =
    if (b._2) b._1 else null

  override def bufferEncoder: Encoder[(Double, Boolean)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaBoolean)

  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE

  /** Register as `product_agg` for SQL/expr use (incl. window frames). */
  def register(spark: SparkSession): Unit =
    spark.udf.register("product_agg", udaf(ProductAgg))
}
