package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys (100 TB design note made
  * executable): two-phase salted aggregation and a salted broadcast-side
  * replication join.
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; salting
  * is the static fallback for (a) aggregations where one key dominates a
  * partition and (b) broadcast-infeasible skewed joins. Both shapes here
  * are deterministic (salt = positive hash of a tie-break column, not
  * rand()) so results are reproducible and testable.
  */
object Skew {

  /** Two-phase aggregation: partial-aggregate on (key, salt) so a heavy
    * key's rows spread over `buckets` reducers, then final-aggregate on
    * the key. Works for any commutative re-aggregable pairs (sum/count/
    * min/max). */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      saltFrom: String, buckets: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(col(saltFrom)), lit(buckets)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__s"), count(lit(1)).as("__c"))
      .groupBy(col(key))
      .agg(sum("__s").as("total"), sum("__c").as("n"))

  /** Skewed fact ⋈ small dim without broadcast: salt the fact side,
    * replicate the dim side across all salt values, join on (key, salt).
    * Each heavy key spreads over `buckets` tasks. `dimHint` ("shuffle_hash",
    * "merge", …) pins the join strategy — pass it when the dim is small
    * enough that Spark would otherwise broadcast it and silently erase the
    * distribution the salt exists to demonstrate (in production the dim
    * exceeds the broadcast threshold, which is the only reason to salt). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltFrom: String, buckets: Int, dimHint: String = ""): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(hash(col(saltFrom)), lit(buckets)))
    val replicated0 = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    val replicated =
      if (dimHint.isEmpty) replicated0 else replicated0.hint(dimHint)
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
