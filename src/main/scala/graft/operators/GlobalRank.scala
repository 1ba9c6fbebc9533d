package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact global rank / NTILE without a partition-less window.
  *
  * `row_number().over(Window.orderBy(...))` and
  * `ntile(n).over(Window.orderBy(...))` collapse the whole input into
  * ONE window partition — a single task holds every row at any scale,
  * and (unlike a `rank <= K` filter) NTILE cannot be rewritten to a
  * per-partition heap because every row needs a bin. This is the last
  * 100 TB straggler shape, and the fix is the classic two-pass
  * distributed sort-rank:
  *
  *   1. `repartitionByRange(keys)` + `sortWithinPartitions(keys)` —
  *      Spark's distributed total order (non-overlapping ordered key
  *      ranges, each partition locally sorted);
  *   2. count rows per range partition — a bounded collect of ONE row
  *      per partition (thousands of longs on a 1000-executor cluster,
  *      never data rows);
  *   3. prefix-sum the counts into per-partition rank offsets,
  *      broadcast them back, and add each row's partition-local index
  *      (the low 33 bits of `monotonically_increasing_id`, which is
  *      the record number within the partition — evaluated above the
  *      local sort, so it follows key order; the projection is
  *      nondeterministic, which is exactly what stops the optimizer
  *      from reordering it past the sort).
  *
  * Two passes over the input, zero global single-task sorts: the plan
  * contains no Window at all (PlanSpec pins this for the consumers).
  * Both passes share one lineage, so the range boundaries agree: the
  * RangePartitioner samples with per-partition deterministic seeds
  * over the same deterministic child.
  *
  * Determinism: ranks are exact (1..N in key order) for DISTINCT keys;
  * callers tie-break with a unique column (doc_id) exactly as the
  * window form does, so results hash-match the NTILE oracle.
  */
object GlobalRank {

  private val LocalIdxMask = (1L << 33) - 1

  /** Adds the exact 1-based global rank by `keys` as `rankCol` (LONG).
    * Returns the ranked frame and the total row count (already known
    * from the offset pass — callers binning by rank need N anyway).
    * `parts` is the range-partition fan-out (normally
    * `spark.sql.shuffle.partitions`). */
  def withRank(df: DataFrame, rankCol: String, keys: Seq[Column],
      parts: Int): (DataFrame, Long) = {
    val spark = df.sparkSession
    import spark.implicits._
    // the temp names below are dropped at the end — an input that
    // already carries one would be silently destroyed (or ambiguous),
    // so refuse up front
    val clash = df.columns.toSet
      .intersect(Set("__gr_mid", "__gr_pid", "__gr_off"))
    require(clash.isEmpty,
      s"GlobalRank: input columns collide with temp names: $clash")
    // Eager localCheckpoint: ONE materialization of the range-sorted
    // input feeds both passes — without it pass 2 re-executes the whole
    // upstream pipeline (for the calibration deciles that means scoring
    // the corpus through the classifier twice). The blocks are
    // executor-local MEMORY_AND_DISK — at cluster scale that is the
    // same cost class as the range exchange itself (a two-pass
    // distributed sort materializes between passes by construction) —
    // and it also hard-guarantees both passes see identical rows, so
    // the collected offsets can never drift from the ranked output.
    // Durability trade, stated plainly: localCheckpoint TRUNCATES
    // lineage, so losing an executor mid-query fails the job instead of
    // recomputing the lost blocks. For a query engine that is the right
    // trade (retry = re-run the query; reliable checkpointing would pay
    // a distributed-FS round trip on EVERY query to insure the rare
    // one); a long-lived pipeline embedding this operator should swap
    // in `df.checkpoint()` via sparkContext.setCheckpointDir — the
    // one-line escape hatch — rather than silently inheriting the
    // fail-fast behavior.
    val sorted = df.repartitionByRange(parts, keys: _*)
      .sortWithinPartitions(keys: _*)
      .withColumn("__gr_mid", monotonically_increasing_id())
      .localCheckpoint()
    // Pass 1: per-range-partition row counts. Bounded collect: at most
    // `parts` (pid, count) pairs — a model-sized table, never data.
    val perPart = sorted
      .groupBy(spark_partition_id().as("__gr_pid"))
      .agg(count(lit(1)).as("__gr_cnt"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    // the local record index lives in the LOW 33 BITS of
    // monotonically_increasing_id — a partition beyond 2^33 rows wraps
    // into the partition-id bits and corrupts ranks SILENTLY. The
    // counts are already on the driver, so the guard is free: fail
    // with the fix (raise `parts`) instead of emitting wrong ranks.
    perPart.find(_._2 >= (1L << 33)).foreach { case (p, c) =>
      throw new IllegalStateException(
        s"GlobalRank: range partition $p holds $c rows (>= 2^33, the " +
          "local-index bit budget) — increase `parts` so no partition " +
          "exceeds 8.5e9 rows") }
    var acc = 0L
    val offs = perPart.map { case (p, c) => val o = acc; acc += c; (p, o) }
    val offDf = offs.toSeq.toDF("__gr_pid", "__gr_off")
    // Pass 2: broadcast the offsets back onto the same sorted lineage;
    // rank = partition offset + local record index + 1.
    val ranked = sorted
      .withColumn("__gr_pid", shiftright(col("__gr_mid"), 33).cast("int"))
      .join(broadcast(offDf), "__gr_pid")
      .withColumn(rankCol,
        col("__gr_off") +
          col("__gr_mid").bitwiseAND(lit(LocalIdxMask)) + lit(1L))
      .drop("__gr_pid", "__gr_off", "__gr_mid")
    (ranked, acc)
  }

  /** Adds the exact NTILE(n) bin by `keys` as `binCol` (LONG), matching
    * SQL NTILE semantics bit-for-bit (first `N mod n` buckets get the
    * extra row): rank via [[withRank]], then pure map-side integer
    * arithmetic — no window anywhere in the plan. */
  def withNtile(df: DataFrame, binCol: String, n: Int, keys: Seq[Column],
      parts: Int): DataFrame = {
    require(!df.columns.contains("__gr_rank"),
      "GlobalRank: input already carries the __gr_rank temp column")
    val (ranked, total) = withRank(df, "__gr_rank", keys, parts)
    val base = total / n
    val rem = total % n
    val thr = rem * (base + 1)
    // Integer DIV keeps the bin exact at any N (a double division can
    // round across an exact bucket boundary); the CASE guards the
    // base=0 branch (N < n) from ever evaluating its DIV.
    ranked
      .withColumn(binCol, expr(
        s"""CAST(CASE WHEN __gr_rank <= ${thr}L
                      THEN (__gr_rank - 1L) DIV ${base + 1}L + 1L
                      ELSE ${rem}L + (__gr_rank - ${thr}L - 1L) DIV ${base}L + 1L
                 END AS BIGINT)"""))
      .drop("__gr_rank")
  }
}
