package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BloomProbe

/** Bloom-filtered join: probe a compact bloom sketch of the (filtered)
  * dimension's keys at the FACT SCAN, so rows that cannot possibly join
  * are dropped before any exchange — the standard way to join a 100 TB
  * fact against a selective dimension without shuffling the fact's
  * non-matching majority.
  *
  * Why not rely on Spark's automatic runtime filter
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`): injection
  * depends on size estimates and join shape heuristics, and never fires
  * for the broadcast joins this engine prefers; this operator plans the
  * sketch explicitly, with an explicit memory budget (a bloom over 1 B
  * keys at 3% fpp is ~0.9 GB — broadcastable where the key SET is not).
  *
  * Exactness: the bloom admits false positives, so [[semiJoin]] always
  * re-checks survivors with a real left-semi join — the bloom only
  * shrinks that join's probe side (typically by 10-1000×), it never
  * decides membership. No false negatives (spec-proven), so dropping
  * non-matches is sound.
  */
object BloomJoin {

  /** Build a bloom sketch of `dim(dimKey)` (one distributed aggregate,
    * sketch collected to the driver like any broadcast model) and return
    * `fact` filtered to rows whose key MIGHT be present. The probe is a
    * codegen'd native expression evaluated at the scan — no shuffle, no
    * UDF. `expectedItems` sizes the sketch: overestimate freely (memory
    * is 1.2 bytes/key at 3% fpp); underestimating inflates fpp, which
    * costs re-check work but never correctness. */
  def preFilter(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val baos = new ByteArrayOutputStream()
    bf.writeTo(baos)
    val spark = fact.sparkSession
    BloomProbe.register(spark)
    fact.where(call_function("bloom_probe", lit(baos.toByteArray), col(factKey)))
  }

  /** Exact left-semi join of `fact` against `dim`'s keys, bloom-pruned:
    * bloom probe at the fact scan (drops the non-joining majority), then
    * an exact semi join over the survivors removes bloom false
    * positives. Result is IDENTICAL to a plain semi join. */
  def semiJoin(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val pruned = preFilter(fact, factKey, dim, dimKey, expectedItems, fpp)
    pruned.join(dim.select(col(dimKey).as(factKey)), Seq(factKey), "left_semi")
  }

  /** [[semiJoin]] with the sketch sized from an exact dim count, so the
    * target fpp holds at any scale factor instead of eroding once the
    * qualifying-key count outgrows a hard-coded capacity. The count is
    * one cheap aggregate over the (already filtered, pushed-down) dim
    * scan — the same scan the sketch build reads next; a fixed 1024-key
    * floor keeps degenerate tiny dims from rounding the sketch below
    * its minimum useful size. Deliberately NOT cached: a cache would be
    * dropped before the lazily-returned join ever executed, so it could
    * only ever cost, never serve. */
  def semiJoinAutoSized(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, fpp: Double = 0.03): DataFrame = {
    val n = math.max(dim.count(), 1024L)
    semiJoin(fact, factKey, dim, dimKey, expectedItems = n, fpp = fpp)
  }
}
