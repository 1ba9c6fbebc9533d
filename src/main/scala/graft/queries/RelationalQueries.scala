package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational core: scans, filters, coerce-casts, aggregation, joins
  * (broadcast / semi / anti / multi-way), set ops, sorts and top-k.
  *
  * Reference semantics covered (SURVEY.md §2): A3 parquet scan, B1 equality
  * filter, B2 coerce casts, B3 drop-null, B10 arithmetic derive, C1/C2
  * join family, D4 distinct, D7 counts, F2/F3/F4 sort/top-k, G1 union.
  *
  * Scale notes (100 TB design): all joins against `region`/`nation`/
  * `supplier`/`part`/`customer` are dimension joins — explicitly
  * `broadcast()` so the fact table never shuffles for them; aggregations
  * are partial-agg friendly (plain hash aggregates over low-cardinality
  * keys); filters and projections sit directly over the scan so Catalyst
  * pushes them into the parquet reader.
  */
object RelationalQueries {

  /** B1+B2+B3+B10: filter → derive revenue → project. Filter is pushed to
    * the parquet scan; no shuffle at all. */
  private def scanFilter(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.filter(col("l_returnflag") === "R" && col("l_quantity") >= 30)
      .select(
        col("l_orderkey"), col("l_linenumber").cast("bigint").as("l_linenumber"),
        col("l_quantity"),
        Num.r(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2)
          .as("revenue"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** TPC-H Q1-shaped pricing summary: single shuffle on a 6-value key,
    * map-side partial aggregation does almost all the work. */
  private def aggPricing(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        // 4-decimal addends rounded to 2 sit on tie boundaries: sum as
        // exact integer ten-thousandths so both engines see identical bits
        round(Num.cents4Sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        Num.r(avg("l_quantity"), 4).as("avg_qty"),
        Num.r(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Broadcast dimension join: fact lineitem ⋈ part — part is tiny relative
    * to lineitem at every SF, so broadcast keeps the fact un-shuffled until
    * the final small aggregation. */
  private def joinBroadcastDim(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val part = Tables(spark, dir, "part")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        round(Num.cents4Sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand")
  }

  /** Customer ⋈ orders rollup by market segment. */
  private def joinCustomerOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total_value"),
        Num.r(avg("o_totalprice"), 4).as("avg_value"))
      .orderBy("c_mktsegment")
  }

  /** C2 semi: customers having at least one high-value order (EXISTS). */
  private def joinSemi(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
    c.join(o.filter(col("o_totalprice") > 400000).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** Bloom-filtered semi join: lineitems of high-value orders, with the
    * fact scan pre-pruned by a bloom sketch of the qualifying order keys
    * (graft.operators.BloomJoin — codegen'd `bloom_probe` at the scan,
    * exact semi join over the survivors removes false positives). Same
    * result as a plain EXISTS; the sketch is what keeps the fact's
    * non-joining majority off the exchange when the key SET outgrows the
    * broadcast budget at 100 TB. */
  private def bloomJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val hot = Tables(spark, dir, "orders")
      .filter(col("o_totalprice") > 450000).select("o_orderkey")
    graft.operators.BloomJoin
      .semiJoinAutoSized(li, "l_orderkey", hot, "o_orderkey", fpp = 0.03)
      .groupBy("l_returnflag")
      .agg(
        round(Num.cents4Sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("l_returnflag")
  }

  /** C2 anti: lapsed customers — no orders on/after the cutoff (NOT
    * EXISTS with the date predicate pushed to the probe-side scan) — the
    * reference's insert-if-absent upsert shape (yfinance_to_postgres
    * .py:28-56). The cutoff is chosen so the result is NON-EMPTY at
    * every test SF: an anti-join certified on zero rows is vacuous
    * evidence for its semantics (every customer has SOME order in this
    * data, so the unfiltered NOT EXISTS always returned 0 rows). */
  private def joinAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val recent = Tables(spark, dir, "orders")
      .filter(to_date(col("o_orderdate")) >= lit("1998-06-01"))
      .select("o_custkey")
    c.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")
  }

  /** TPC-H Q5-shaped snowflake: region ⋈ nation ⋈ customer ⋈ orders ⋈
    * lineitem. All dims broadcast; only the orders⋈lineitem equi-join
    * shuffles, on the natural key. */
  private def joinSnowflake(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables(spark, dir, "region").filter(col("r_name") === "ASIA")
    val nation = Tables(spark, dir, "nation")
    val cust = Tables(spark, dir, "customer")
    val orders = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem")
    val dim = broadcast(
      cust.join(broadcast(nation.join(broadcast(region),
          col("n_regionkey") === col("r_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name")))
    orders.join(dim, col("o_custkey") === col("c_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("n_name"))
      .agg(
        round(Num.cents4Sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy("n_name")
  }

  /** G1+D1: union history with an updates batch, keep-last by explicit
    * source priority — the reference's concat + drop_duplicates(keep='last')
    * (data_warehouse.py:73-74) with the implicit concat order made explicit. */
  private def unionDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables(spark, dir, "events")
    val history = ev.filter(col("event_id") % 3 =!= 0)
      .withColumn("src_priority", lit(1))
    val updates = ev.filter(col("event_id") % 2 === 0)
      .withColumn("value", round(col("value") * 2.0, 2))
      .withColumn("src_priority", lit(2))
    val w = Window.partitionBy("event_id")
      .orderBy(col("src_priority").desc)
    history.unionByName(updates)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("value"), 2).as("value"),
        col("src_priority").cast("bigint").as("src_priority"))
      .orderBy("event_id")
  }

  /** D4: distinct + sort (dashboard symbol picker, dashboard.py:73). */
  private def distinctSort(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select("event_type").distinct().orderBy("event_type")

  /** F3: global top-k with deterministic tie-break. */
  private def topK(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .limit(10)

  /** D7: counts per group (match accounting, data_processing.py:101). */
  private def countGroups(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type")

  /** B2: null-coercing cast — props is a JSON-ish string; extract the
    * numeric and cast, null on failure (pd.to_numeric errors='coerce'). */
  private def castCoerce(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(
        col("event_id"),
        regexp_extract(col("props"), "[0-9]+", 0).cast("long").as("k"),
        col("value").cast("string").cast("double").as("value_roundtrip"))
      .na.drop(Seq("k"))
      .orderBy("event_id")

  /** B13/B14: time bucketing + formatting (dashboard axis labels). */
  private def timeBuckets(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(
        col("ts").cast("date").as("day"),
        date_format(col("ts"), "HH").as("hour"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .orderBy("day", "hour")

  /** B8/B15/B16/B17: string surgery — suffix strip, first token, abs,
    * range derive (dashboard.py:117,158,169; data_processing.py:55). */
  private def stringOps(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(
        col("doc_id"),
        regexp_replace(col("source"), "[0-9]+$", "").as("source_family"),
        element_at(split(col("text"), " "), 1).as("first_token"),
        abs(col("n_chars") - lit(300)).as("abs_dev"),
        (greatest(col("n_chars"), lit(300)) - least(col("n_chars"), lit(300)))
          .as("range_amp"))
      .orderBy("doc_id")

  /** Set operations beyond union: cohort membership with INTERSECT /
    * EXCEPT semantics over two halves of the month — computed as ONE
    * scan + ONE shuffle (per-user half-membership flags in a single
    * groupBy) instead of three intersect/except passes that each re-scan
    * events. The oracle cross-checks against literal INTERSECT/EXCEPT,
    * proving the rewrite is the same operator. */
  private def setOps(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy("user_id")
      .agg(
        max(when(dayofmonth(col("ts")) <= 15, 1).otherwise(0)).as("in_first"),
        max(when(dayofmonth(col("ts")) > 15, 1).otherwise(0)).as("in_second"))
      .select(
        when(col("in_first") === 1 && col("in_second") === 1, "both")
          .when(col("in_first") === 1, "first_only")
          .otherwise("second_only").as("cohort"),
        col("user_id"))
      .orderBy("cohort", "user_id")

  /** Outer-join family: per-customer order rollup keeping order-less
    * customers (left outer + null-safe aggregates). */
  private def joinOuter(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("total_spent"))
      .orderBy("c_custkey")
  }

  /** Deterministic hash sampling — the reproducible, cluster-stable
    * alternative to random sampling for building eval/dev splits: keep
    * rows whose 60-bit content hash lands in the lowest 5% of the space,
    * then per-stratum counts. Same rows selected on any cluster, any
    * partitioning, any engine. */
  private def sampleHash(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .filter(expr(
        "md5_60(cast(event_id AS STRING)) % 100 < 5"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_sampled"),
        round(sum("value"), 2).as("sampled_value"))
      .orderBy("event_type")

  /** Equi-width histogram per group — width-10 value buckets. */
  private def histogram(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(col("event_type"),
        floor(col("value") / 10).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type", "bucket")

  /** Salted heavy-hitter aggregation, oracle-proven: the whole events
    * table collapses onto 5 event_type keys — the degenerate skew where a
    * plain groupBy leaves all but 5 reducers idle and the hottest key
    * lands on ONE task. [[graft.operators.Skew.saltedSumCount]] spreads
    * each key over 16 salt buckets (partial sums/counts per (key, salt)),
    * then re-aggregates the 5×16 partials — identical result, bounded
    * per-task fan-in at any scale. The oracle is the PLAIN aggregation:
    * the gate proves salting is an execution detail, not a semantics
    * change. */
  private def skewSalted(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Skew.saltedSumCount(
      Tables(spark, dir, "events"), "event_type", "value", "event_id", 16)
      .select(col("event_type"),
        Num.r(col("total"), 2).as("total_value"),
        col("n").as("n_events"))
      .orderBy("event_type")

  /** Distinct-count sketch (fixed-threshold KMV / theta family): keep
    * only rows whose portable 60-bit content hash is ≡ 0 (mod
    * [[SketchMod]]) — a deterministic 1/[[SketchMod]] uniform sample of
    * the DISTINCT key space — and scale the surviving distinct count back
    * up. Unlike HLL the estimator is bit-reproducible on any engine, any
    * partitioning, so the oracle can replay it exactly. Scale shape:
    * sketch-ONLY, the mod filter drops (SketchMod-1)/SketchMod of
    * distinct keys before the shuffle (map-side pre-dedup, wire carries
    * ~1/[[SketchMod]] of the key space). THIS demo plan also computes the
    * exact count as a verification twin, so it still shuffles every
    * (type, user_id) pair — the twin is exactly what you would NOT run
    * at 100 TB; drop the `exact_distinct`/`err_pct` columns there. */
  private val SketchMod = 8L

  /** Distinct-count sketch: hash-mod sampled distinct-user estimate
    * per event type, reported next to the exact count with its error
    * pct. */
  private def distinctSketch(spark: SparkSession, dir: String): DataFrame = {
    val h =
      "md5_60(cast(user_id AS STRING))"
    Tables(spark, dir, "events")
      .selectExpr("event_type", "user_id", s"$h AS h")
      .groupBy("event_type")
      .agg(
        (countDistinct(when(col("h") % SketchMod === 0, col("h"))) * SketchMod)
          .cast("long").as("est_distinct"),
        countDistinct(col("user_id")).as("exact_distinct"))
      .withColumn("err_pct",
        Num.r(lit(100.0) * abs(col("est_distinct") - col("exact_distinct")) /
          col("exact_distinct"), 2))
      .orderBy("event_type")
  }

  /** HyperLogLog distinct-count (Flajolet et al. '07): 64 registers per
    * key over the portable 60-bit hash — bucket = h mod 64, register =
    * max ρ where ρ is the position of w = h div 64's lowest set bit
    * (via `length(bin(w & -w))`, identical strings on both engines).
    * The harmonic sum Σ2^(−M_j) is computed as the EXACT integer
    * Σ2^(56−M_j) (registers capped at 56, so 64 terms stay under 2^63):
    * both engines divide the same α·m²·2^56 by the same BIGINT — the
    * raw-estimate branch decision (small-range linear counting when
    * est ≤ 2.5m with empty registers) is therefore bit-deterministic.
    * Scale shape: the sketch is the canonical MERGEABLE distinct
    * summary — registers max-combine map-side, so the wire carries at
    * most keys × 64 rows regardless of corpus size (the exact-count
    * column beside it is the verification tier, itself one
    * count-distinct aggregate). */
  private def hll(spark: SparkSession, dir: String): DataFrame = {
    val regs = Tables(spark, dir, "events")
      .selectExpr("event_type",
        "md5_60(cast(user_id AS STRING)) AS h")
      .selectExpr("event_type", "h % 64 AS bucket",
        "least(length(bin((h DIV 64) & -(h DIV 64))), 56) AS rho")
      .groupBy("event_type", "bucket").agg(max("rho").as("mreg"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("observed"),
        sum(expr("shiftleft(1L, 56 - mreg)")).as("sb_obs"))
      .selectExpr("event_type", "64 - observed AS zeros",
        "sb_obs + (64 - observed) * shiftleft(1L, 56) AS sb")
      // alpha_64 = 0.7213/(1 + 1.079/64), written as the same 6-dp
      // literal in both dialects so the product chain is bit-identical
      .selectExpr("event_type", "zeros",
        "0.709358e0 * 4096 * shiftleft(1L, 56) / sb AS est_raw")
      .selectExpr("event_type", "zeros",
        """CASE WHEN est_raw <= 160e0 AND zeros > 0
                THEN 64 * ln(64e0 / zeros) ELSE est_raw END AS est""")
    val exact = Tables(spark, dir, "events")
      .groupBy("event_type").agg(countDistinct("user_id").as("exact_distinct"))
    regs.join(exact, "event_type")
      .select(col("event_type"), Num.rExp(col("est"), 2).as("hll_est"),
        col("exact_distinct"))
      .withColumn("err_pct",
        Num.r(lit(100.0) * abs(col("hll_est") - col("exact_distinct")) /
          col("exact_distinct"), 2))
      .orderBy("event_type")
  }

  private val hllSql = """
    WITH h AS (
      SELECT event_type,
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM events),
    r AS (
      SELECT event_type, h % 64 AS bucket,
             least(length(bin((h // 64) & -(h // 64))), 56) AS rho
      FROM h),
    regs AS (
      SELECT event_type, bucket, max(rho) AS mreg
      FROM r GROUP BY 1, 2),
    agg AS (
      SELECT event_type, 64 - count(*) AS zeros,
             CAST(sum(1::BIGINT << (56 - mreg)) AS BIGINT)
               + (64 - count(*)) * (1::BIGINT << 56) AS sb
      FROM regs GROUP BY 1),
    est0 AS (
      SELECT event_type, zeros,
             0.709358e0 * 4096 * (1::BIGINT << 56) / sb AS est_raw
      FROM agg),
    est AS (
      SELECT event_type,
             CASE WHEN est_raw <= 160e0 AND zeros > 0
                  THEN 64 * ln(64e0 / zeros) ELSE est_raw END AS est
      FROM est0),
    exact AS (
      SELECT event_type, count(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY 1),
    rounded AS (
      SELECT e.event_type, round(est + 1e-8, 2) AS hll_est, exact_distinct
      FROM est e JOIN exact USING (event_type))
    SELECT event_type, hll_est, exact_distinct,
           round(100.0 * abs(hll_est - exact_distinct) / exact_distinct
                 + 1e-9, 2) AS err_pct
    FROM rounded
    ORDER BY event_type"""

  /** HLL set algebra via register MERGE — the property that makes the
    * sketch distributed: registers max-combine, so est(A ∪ B) needs only
    * the two 64-register summaries, never a re-scan, and
    * est(A ∩ B) = est(A) + est(B) − est(A ∪ B) by inclusion–exclusion.
    * Demonstrated on the click/view event slices next to their exact
    * counterparts. Same exact-integer harmonic sums as [[hll]], so every
    * estimate (and the small-range branch) is bit-deterministic; the
    * merge itself is max() over (bucket) — associative, map-side
    * combinable, the shape a 1000-executor rollup would use. */
  private def hllUnion(spark: SparkSession, dir: String): DataFrame = {
    val regs = Tables(spark, dir, "events")
      .filter(col("event_type").isin("click", "view"))
      .selectExpr("event_type", "user_id",
        "md5_60(cast(user_id AS STRING)) AS h")
      .selectExpr("event_type", "user_id", "h % 64 AS bucket",
        "least(length(bin((h DIV 64) & -(h DIV 64))), 56) AS rho")
    def estimate(df: DataFrame, label: String): DataFrame =
      df.groupBy("bucket").agg(max("rho").as("mreg"))
        .agg(count(lit(1)).as("observed"),
          sum(expr("shiftleft(1L, 56 - mreg)")).as("sb_obs"))
        .selectExpr("64 - observed AS zeros",
          "sb_obs + (64 - observed) * shiftleft(1L, 56) AS sb")
        .selectExpr("zeros",
          "0.709358e0 * 4096 * shiftleft(1L, 56) / sb AS est_raw")
        .selectExpr(s"'$label' AS side",
          """CASE WHEN est_raw <= 160e0 AND zeros > 0
                  THEN 64 * ln(64e0 / zeros) ELSE est_raw END AS est""")
    val a = estimate(regs.filter(col("event_type") === "click"), "a")
    val b = estimate(regs.filter(col("event_type") === "view"), "b")
    // the union estimate comes from MERGED registers (max per bucket
    // across both slices) — the sketch combine, not a data re-scan
    val u = estimate(regs, "u")
    val ests = a.unionByName(b).unionByName(u)
      .groupBy().pivot("side", Seq("a", "b", "u")).agg(first("est"))
    val exact = Tables(spark, dir, "events")
      .filter(col("event_type").isin("click", "view"))
      .agg(
        countDistinct(when(col("event_type") === "click", col("user_id")))
          .as("exact_a"),
        countDistinct(when(col("event_type") === "view", col("user_id")))
          .as("exact_b"),
        countDistinct("user_id").as("exact_union"))
    ests.crossJoin(exact)
      .select(
        Num.rExp(col("a"), 2).as("est_a"),
        Num.rExp(col("b"), 2).as("est_b"),
        Num.rExp(col("u"), 2).as("est_union"),
        Num.rExp(col("a") + col("b") - col("u"), 2).as("est_intersect"),
        col("exact_a"), col("exact_b"), col("exact_union"),
        (col("exact_a") + col("exact_b") - col("exact_union"))
          .as("exact_intersect"))
  }

  private val hllUnionSql = """
    WITH src AS (
      SELECT event_type, user_id,
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM events WHERE event_type IN ('click', 'view')),
    r AS (
      SELECT event_type, h % 64 AS bucket,
             least(length(bin((h // 64) & -(h // 64))), 56) AS rho
      FROM src),
    est AS (
      SELECT side, CASE WHEN est_raw <= 160e0 AND zeros > 0
                        THEN 64 * ln(64e0 / zeros) ELSE est_raw END AS est
      FROM (
        SELECT side, zeros,
               0.709358e0 * 4096 * (1::BIGINT << 56) / sb AS est_raw
        FROM (
          SELECT side, 64 - count(*) AS zeros,
                 CAST(sum(1::BIGINT << (56 - mreg)) AS BIGINT)
                   + (64 - count(*)) * (1::BIGINT << 56) AS sb
          FROM (
            SELECT CASE event_type WHEN 'click' THEN 'a' ELSE 'b' END AS side,
                   bucket, max(rho) AS mreg
            FROM r GROUP BY 1, 2
            UNION ALL
            SELECT 'u' AS side, bucket, max(rho) AS mreg
            FROM r GROUP BY 1, 2)
          GROUP BY side))),
    p AS (
      SELECT max(CASE WHEN side = 'a' THEN est END) AS a,
             max(CASE WHEN side = 'b' THEN est END) AS b,
             max(CASE WHEN side = 'u' THEN est END) AS u
      FROM est),
    exact AS (
      SELECT count(DISTINCT CASE WHEN event_type = 'click' THEN user_id END)
               AS exact_a,
             count(DISTINCT CASE WHEN event_type = 'view' THEN user_id END)
               AS exact_b,
             count(DISTINCT user_id) AS exact_union
      FROM events WHERE event_type IN ('click', 'view'))
    SELECT round(a + 1e-8, 2) AS est_a,
           round(b + 1e-8, 2) AS est_b,
           round(u + 1e-8, 2) AS est_union,
           round(a + b - u + 1e-8, 2) AS est_intersect,
           exact_a, exact_b, exact_union,
           CAST(exact_a + exact_b - exact_union AS BIGINT) AS exact_intersect
    FROM p CROSS JOIN exact"""

  /** Salted JOIN, oracle-proven: enrich every event with its type's mean
    * and keep the extreme deviations. The whole 100k-row (100 TB: N-row)
    * fact collapses onto 5 join keys — the degenerate skew where a plain
    * shuffle join sends each key's entire volume to ONE task.
    * [[graft.operators.Skew.saltedJoin]] spreads each key over 16 salt
    * buckets and replicates the 5-row stats dim 16×, so the fact shuffles
    * over 80 well-spread keys with bounded per-task fan-in. The join is
    * hinted shuffle_hash because at THIS dim size Spark would broadcast
    * (also fine — but then nothing is demonstrated); the oracle is the
    * PLAIN join: the gate proves salting changes execution, not results.
    * Deviations compare ROUNDED values on both engines. */
  private def skewJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables(spark, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    val stats = events.groupBy("event_type")
      .agg(Num.r(avg("value"), 4).as("type_avg"))
    graft.operators.Skew
      .saltedJoin(events, stats, "event_type", "event_id", 16, "shuffle_hash")
      .withColumn("deviation", Num.r(col("value") - col("type_avg"), 4))
      .filter(abs(col("deviation")) >= 45.0)
      .select(col("event_id"), col("event_type"), col("value"),
        col("type_avg"), col("deviation"))
      .orderBy("event_id")
  }

  /** CUBE over (event_type, month): all four grouping sets — (type, month),
    * (type), (month), () — in ONE logical aggregation. Spark expands the
    * cube as an `Expand` over the scan feeding a single hash aggregate
    * with map-side partials, so the fact table is read once and shuffled
    * once regardless of how many grouping sets the cube implies — the
    * alternative (a UNION of 4 aggregations) would scan 4×. `grouping_id`
    * disambiguates the null placeholders from genuine nulls. */
  private def cubePricing(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .withColumn("month", date_format(col("ts"), "yyyy-MM"))
      .cube(col("event_type"), col("month"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"),
        Num.r(sum("value"), 2).as("total_value"))
      .select(col("event_type"), col("month"), col("gid"), col("n"),
        col("total_value"))
      .orderBy(col("gid"), col("event_type").asc_nulls_first,
        col("month").asc_nulls_first)

  /** PII/identifier scrubbing report: redact email-shaped tokens and
    * multi-digit runs from the free-text `props` payload, then aggregate
    * per event_type — rows scanned once, redaction is pure per-row
    * codegen'd regexp work (no UDF). Two shuffles: the exact
    * `countDistinct(scrubbed)` dedups on (type, scrubbed) first — its
    * volume is bounded by the DISTINCT scrubbed forms (scrubbing
    * collapses cardinality, which is the point), with a map-side
    * pre-dedup before the exchange — then the final 5-key aggregate.
    * The regex subset used ([...]+ classes, {n,} bounds)
    * behaves identically under Java regex (Spark) and RE2 (DuckDB); the
    * dot is written `[.]` (not `\.`) because Spark's non-ANSI SQL string
    * literals process backslash escapes and DuckDB's don't — a bracketed
    * class reaches both regex engines as the same bytes. */
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  private val digitsRe = "[0-9]{2,}"

  /** PII scrub (events): count email/digit-run matches in props and
    * mask them to <EMAIL>/<NUM> — row-local regex work, no shuffle. */
  private def piiScrub(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .selectExpr(
        "event_type",
        s"size(regexp_extract_all(props, '$emailRe', 0)) AS n_emails",
        s"size(regexp_extract_all(props, '$digitsRe', 0)) AS n_digit_runs",
        s"regexp_replace(regexp_replace(props, '$emailRe', '<EMAIL>'), '$digitsRe', '<NUM>') AS scrubbed")
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum("n_emails").cast("long").as("total_emails"),
        sum("n_digit_runs").cast("long").as("total_digit_runs"),
        countDistinct("scrubbed").as("n_scrubbed_forms"),
        min("scrubbed").as("sample_scrubbed"))
      .orderBy("event_type")

  /** Data-quality rule suite (Deequ-style constraint checking as a
    * query): primary-key uniqueness, FK orphan count, not-null, value
    * range and sign rules, one row per rule with its violation count.
    * Each rule is an independent aggregate over a pushed-down scan —
    * they run as parallel stages and the union is 5 rows; the FK rule
    * is the only join and the fact side streams through a left-anti
    * probe of the (broadcastable) key side. */
  private def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem")
    val c = Tables(spark, dir, "customer")
    def shaped(name: String, agg: DataFrame): DataFrame =
      agg.select(lit(name).as("rule"), col("violations"),
        (col("violations") === 0).as("passed"))
    shaped("customer_name_not_null",
        c.filter(col("c_name").isNull).agg(count(lit(1)).as("violations")))
      .unionByName(shaped("lineitem_fk_orphans",
        li.select("l_orderkey")
          .join(Tables(spark, dir, "orders").select("o_orderkey"),
            col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("violations"))))
      .unionByName(shaped("lineitem_qty_range",
        li.filter(col("l_quantity") < 1 || col("l_quantity") > 50)
          .agg(count(lit(1)).as("violations"))))
      .unionByName(shaped("orders_pk_unique",
        o.agg((count(lit(1)) - countDistinct("o_orderkey")).as("violations"))))
      .unionByName(shaped("orders_price_positive",
        o.filter(col("o_totalprice") <= 0).agg(count(lit(1)).as("violations"))))
      .orderBy("rule")
  }

  private val dqChecksSql = """
    SELECT 'customer_name_not_null' AS rule, count(*) AS violations,
           count(*) = 0 AS passed
    FROM customer WHERE c_name IS NULL
    UNION ALL
    SELECT 'lineitem_fk_orphans', count(*), count(*) = 0
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'lineitem_qty_range', count(*), count(*) = 0
    FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50
    UNION ALL
    SELECT 'orders_pk_unique', count(*) - count(DISTINCT o_orderkey),
           count(*) - count(DISTINCT o_orderkey) = 0
    FROM orders
    UNION ALL
    SELECT 'orders_price_positive', count(*), count(*) = 0
    FROM orders WHERE o_totalprice <= 0
    ORDER BY rule"""

  /** Market-basket co-occurrence: top-20 part pairs by order support
    * with lift. The pair join runs per-order after a distinct — order
    * fan-out is the (small, bounded) basket size, never the catalog —
    * and lift's inputs are exact integer counts broadcast back from two
    * tiny aggregates. The classic retail affinity query at 100 TB:
    * shuffle on orderkey once, aggregate pairs with map-side partials. */
  private def basketPairs(spark: SparkSession, dir: String): DataFrame = {
    // Pairs come from a per-order COLLECTED basket, not an items×items
    // self-join: one shuffle on orderkey builds the sorted distinct part
    // set per order (collect_set partials map-side), then pair
    // generation is array-local with no join at all. Generation is TWO
    // chained explodes (posexplode for (i, part_a), explode of the
    // tail slice for part_b) rather than one nested transform lambda —
    // Generate+slice stay inside whole-stage codegen while higher-order
    // lambdas run interpreted (A/B at sf0.1: 0.84 s vs 1.26 s to the
    // same 1.196 M aggregated pairs; full query 1.32 s → 1.09 s vs the
    // self-join). The freq branch consumes the same baskets aggregate
    // (AQE reuses its exchange), so lineitem is scanned and shuffled
    // exactly once.
    val baskets = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey")
      .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
    val nOrders = Tables(spark, dir, "orders")
      .agg(countDistinct("o_orderkey").as("n_orders"))
    val freq = baskets.select(explode(col("parts")).as("l_partkey"))
      .groupBy("l_partkey").agg(count(lit(1)).as("pf"))
    val pairs = baskets
      .select(col("parts"), posexplode(col("parts")).as(Seq("i", "part_a")))
      .select(col("part_a"),
        explode(expr("slice(parts, i + 2, size(parts) - i - 1)")).as("part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("support"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("support").desc, col("part_a"), col("part_b"))
    // global top-20 via orderBy+limit — expresses TakeOrderedAndProject
    // (per-partition heap, tiny final merge) DIRECTLY instead of via the
    // optimizer's window-limit pushdown (which does also handle the
    // row_number form on 4.1 — verified); the rank column is then a
    // window over just the 20 winners, and the lift decoration joins
    // touch 20 rows, not the full pair set
    pairs
      .orderBy(col("support").desc, col("part_a"), col("part_b"))
      .limit(20)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .join(freq.select(col("l_partkey").as("part_a"), col("pf").as("fa")), "part_a")
      .join(freq.select(col("l_partkey").as("part_b"), col("pf").as("fb")), "part_b")
      .crossJoin(broadcast(nOrders))
      .select(col("rnk"), col("part_a"), col("part_b"), col("support"),
        Num.r(col("support").cast("double") * col("n_orders") /
          (col("fa") * col("fb")), 4).as("lift"))
      .orderBy("rnk")
  }

  private val basketPairsSql = """
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    freq AS (
      SELECT l_partkey, count(*) AS pf FROM items GROUP BY 1),
    n AS (SELECT count(DISTINCT o_orderkey) AS n_orders FROM orders),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS support
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2),
    ranked AS (
      SELECT part_a, part_b, support,
             CAST(row_number() OVER (ORDER BY support DESC, part_a, part_b)
                  AS BIGINT) AS rnk
      FROM pairs)
    SELECT rnk, part_a, part_b, support,
           round(CAST(support AS DOUBLE) * n.n_orders / (fa.pf * fb.pf)
                 + 1e-9, 4) AS lift
    FROM ranked
    JOIN freq fa ON fa.l_partkey = part_a
    JOIN freq fb ON fb.l_partkey = part_b, n
    WHERE rnk <= 20
    ORDER BY rnk"""

  /** Sorted group string-aggregation: per nation, supplier counts/
    * balances plus a comma-joined top-3 supplier list (group_concat /
    * string_agg surface). Order inside the aggregate is made explicit —
    * collect_list is unordered, so the names ride in a (rank, name)
    * struct and are array_sort'ed before joining; the top-3 cut is a
    * rank window per nation (WindowGroupLimit shape). */
  private def stringAgg(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = Tables(spark, dir, "supplier")
    val n = Tables(spark, dir, "nation")
    val j = s.join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
    val totals = j.groupBy("n_name")
      .agg(count(lit(1)).as("n_suppliers"),
        round(Num.centsSum(col("s_acctbal")), 2).as("total_acctbal"))
    val w = Window.partitionBy("n_name")
      .orderBy(col("s_acctbal").desc, col("s_name"))
    val top3 = j.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .groupBy("n_name")
      .agg(expr(
        "array_join(transform(array_sort(collect_list(struct(rnk, s_name))), x -> x.s_name), ',')")
        .as("top_suppliers"))
    totals.join(top3, "n_name").orderBy("n_name")
  }

  private val stringAggSql = """
    WITH j AS (
      SELECT n.n_name, s.s_name, s.s_acctbal
      FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey),
    totals AS (
      SELECT n_name, count(*) AS n_suppliers,
             round(CAST(sum(CAST(round(s_acctbal*100) AS BIGINT)) AS DOUBLE)/100.0, 2)
               AS total_acctbal
      FROM j GROUP BY n_name),
    top3 AS (
      SELECT n_name,
             string_agg(s_name, ',' ORDER BY s_acctbal DESC, s_name)
               AS top_suppliers
      FROM (SELECT * FROM j
            QUALIFY row_number() OVER (PARTITION BY n_name
                                       ORDER BY s_acctbal DESC, s_name) <= 3)
      GROUP BY n_name)
    SELECT n_name, n_suppliers, total_acctbal, top_suppliers
    FROM totals JOIN top3 USING (n_name)
    ORDER BY n_name"""

  /** Equi-depth (decile) histogram of lineitem prices. Boundaries are
    * EXACT type-7 percentiles via the classic two-pass distributed
    * quantile shape:
    *
    *  1. COARSE pass: count rows per $100 cents-range — map-side
    *     combinable to ~1 000 groups no matter the corpus size, then a
    *     window over that tiny table locates, fully plan-side (no
    *     driver collect), the ≤ 18 "hot" ranges holding a decile
    *     boundary index (type-7 percentile p needs the rows at 0-based
    *     indices floor/ceil of p·(n−1)).
    *  2. REFINE pass: exact per-cent cumulative counts over ONLY the
    *     hot ranges (a broadcast semi-join keeps ~2% of rows; windows
    *     partition by range, so no single-task global sort anywhere),
    *     then 9 interpolated lookups in one tiny aggregate.
    *
    * This replaces both Spark's holistic `percentile` aggregate (3.0 s
    * at sf0.1 — buffers per-partition value maps) and the round-6
    * full-domain cumsum (1.33 s — sf0.1 already shows 583 k distinct
    * cents in 600 k rows, so the "domain-bounded" grouped table neither
    * compresses nor keeps its single-task window safe at scale);
    * measured ~0.95 s. Boundaries land on the 2-decimal grid (+ nudge)
    * so bucket-edge comparisons are exact on both engines; the oracle
    * states the same semantics directly with quantile_cont. */
  private def equidepthHist(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables(spark, dir, "lineitem").select("l_extendedprice")
    val cents = li.select(round(col("l_extendedprice") * 100).cast("long").as("c"))
    val ps = (1 to 9).map(_ / 10.0)
    val coarse = cents.groupBy(expr("c DIV 10000").as("r"))
      .agg(count(lit(1)).as("cnt"))
    val coarseCum = coarse
      .withColumn("cumBefore", coalesce(sum("cnt").over(
        Window.orderBy("r").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", sum("cnt").over(Window.partitionBy()))
    // range r holds target index t iff cumBefore <= t < cumBefore+cnt;
    // the exists() lambda runs interpreted but over ~1 000 rows only
    val targets = array(ps.flatMap { p =>
      val pos = lit(p) * (col("n") - 1)
      Seq(floor(pos), ceil(pos))
    }: _*)
    val hot = coarseCum
      .filter(exists(targets,
        t => col("cumBefore") <= t && t < col("cumBefore") + col("cnt")))
      .select("r", "cumBefore", "n")
    val cum = cents.join(broadcast(hot), expr("c DIV 10000") === col("r"))
      .groupBy("r", "cumBefore", "n", "c").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", col("cumBefore") + sum("cnt").over(
        Window.partitionBy("r").orderBy("c")
          .rowsBetween(Window.unboundedPreceding, 0)))
    // value at 0-based sorted index i = min c with cum > i — the
    // crossing cent is in the hot set by construction, and every other
    // hot row with cum > i has a larger c, so the min over hot rows IS
    // the global min
    val aggs = ps.zipWithIndex.flatMap { case (p, i) =>
      val pos = lit(p) * (col("n") - 1)
      Seq(
        min(when(col("cum") > floor(pos), col("c"))).as(s"lo$i"),
        min(when(col("cum") > ceil(pos), col("c"))).as(s"hi$i"))
    } :+ max("n").as("n")
    val looked = cum.agg(aggs.head, aggs.tail: _*)
    val bElems = ps.zipWithIndex.map { case (p, i) =>
      val pos = lit(p) * (col("n") - 1)
      val frac = pos - floor(pos)
      round((col(s"lo$i") / 100.0) +
        frac * ((col(s"hi$i") / 100.0) - (col(s"lo$i") / 100.0)) + 1e-9, 2)
    }
    val bounds = looked.select(array(bElems: _*).as("bs"))
    // bucket = 1 + #boundaries crossed, as NINE codegen'd comparisons —
    // the equivalent higher-order filter() runs interpreted per row and
    // measured ~3× slower on the scan pass; 10 output groups make the
    // final aggregate map-side-combining, so the shuffle is trivial
    val crossed = (1 to 9)
      .map(i => when(col("l_extendedprice") > element_at(col("bs"), i), 1)
        .otherwise(0))
      .reduce(_ + _)
    li.crossJoin(broadcast(bounds))
      .select(col("l_extendedprice"),
        (crossed + 1).cast("long").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min("l_extendedprice").as("lo"),
        max("l_extendedprice").as("hi"),
        round(Num.centsSum(col("l_extendedprice")), 2).as("total"))
      .orderBy("bucket")
  }

  private val equidepthHistSql = """
    WITH bounds AS (
      SELECT list_transform(
               quantile_cont(l_extendedprice,
                             [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
               b -> round(b + 1e-9, 2)) AS bs
      FROM lineitem),
    bucketed AS (
      SELECT l_extendedprice,
             CAST(len(list_filter(bs, b -> l_extendedprice > b)) + 1 AS BIGINT)
               AS bucket
      FROM lineitem, bounds)
    SELECT bucket, count(*) AS n,
           min(l_extendedprice) AS lo,
           max(l_extendedprice) AS hi,
           round(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0, 2)
             AS total
    FROM bucketed
    GROUP BY bucket
    ORDER BY bucket"""

  /** Benford first-digit audit over order totals — the classic
    * fabricated-data screen. The leading digit comes from the INTEGER
    * cents rendered as a string (integer→string is identical across
    * engines; float→string formatting is not, and log10-based digit
    * extraction can flip at exact powers of ten), and the expected
    * Benford mass log10(1+1/d) gets the standard exp/log nudge. One
    * 9-row aggregate. */
  private def benford(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val total = o.agg(count(lit(1)).as("n_total"))
    o.select(expr(
        "CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING), 1, 1) AS BIGINT)")
        .as("digit"))
      .groupBy("digit")
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        Num.r(col("n") / col("n_total").cast("double"), 6).as("observed"),
        Num.rExp(log10(lit(1.0) + lit(1.0) / col("digit")), 6).as("benford"))
      .orderBy("digit")
  }

  private val benfordSql = """
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders),
    n AS (SELECT count(*) AS n_total FROM orders)
    SELECT digit, count(*) AS n,
           round(count(*) / CAST(n.n_total AS DOUBLE) + 1e-9, 6) AS observed,
           round(log10(1.0 + 1.0 / digit) + 1e-8, 6) AS benford
    FROM digits, n
    GROUP BY digit, n.n_total
    ORDER BY digit"""

  /** RFM customer segmentation: recency (days since last order,
    * anchored at the data's own max date), frequency and monetary per
    * customer, each scored into quintiles against EXACT percentile
    * cutoffs computed over the per-customer table (already aggregated —
    * one row per customer, far below the fact stream) and broadcast
    * back. Output is the ≤125-cell segment matrix. Cutoff comparisons
    * use the rounded-to-grid cutoffs so edges are exact on both
    * engines; quintile-bucket populations are deterministic. */
  private def rfm(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val anchor = o.agg(max(to_date(col("o_orderdate"))).as("maxd"))
    val perCust = o.crossJoin(broadcast(anchor))
      .groupBy("o_custkey")
      .agg(
        min(datediff(col("maxd"), to_date(col("o_orderdate"))))
          .cast("long").as("recency"),
        count(lit(1)).as("frequency"),
        round(Num.centsSum(col("o_totalprice")), 2).as("monetary"))
    val cuts = perCust.agg(expr(
      """transform(percentile(recency, array(0.2D,0.4D,0.6D,0.8D)),
           b -> round(b + 1e-9, 2))""").as("rc"),
      expr("""transform(percentile(frequency, array(0.2D,0.4D,0.6D,0.8D)),
           b -> round(b + 1e-9, 2))""").as("fc"),
      expr("""transform(percentile(monetary, array(0.2D,0.4D,0.6D,0.8D)),
           b -> round(b + 1e-9, 2))""").as("mc"))
    def score(v: org.apache.spark.sql.Column, cutsCol: String) =
      (1 to 4).map(i =>
        when(v > element_at(col(cutsCol), i), 1).otherwise(0))
        .reduce(_ + _) + 1
    perCust.crossJoin(broadcast(cuts))
      .select(
        // low recency = recently active = BEST: invert the bucket
        (lit(6) - score(col("recency").cast("double"), "rc"))
          .cast("long").as("r_score"),
        score(col("frequency").cast("double"), "fc").cast("long").as("f_score"),
        score(col("monetary"), "mc").cast("long").as("m_score"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("r_score", "f_score", "m_score")
  }

  private val rfmSql = """
    WITH anchor AS (SELECT max(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
    per_cust AS (
      SELECT o_custkey,
             CAST(min(date_diff('day', CAST(o_orderdate AS DATE), anchor.maxd))
                  AS BIGINT) AS recency,
             count(*) AS frequency,
             round(CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0, 2)
               AS monetary
      FROM orders, anchor
      GROUP BY o_custkey, anchor.maxd),
    cuts AS (
      SELECT
        list_transform(quantile_cont(recency, [0.2,0.4,0.6,0.8]),
                       b -> round(b + 1e-9, 2)) AS rc,
        list_transform(quantile_cont(frequency, [0.2,0.4,0.6,0.8]),
                       b -> round(b + 1e-9, 2)) AS fc,
        list_transform(quantile_cont(monetary, [0.2,0.4,0.6,0.8]),
                       b -> round(b + 1e-9, 2)) AS mc
      FROM per_cust),
    scored AS (
      SELECT
        CAST(6 - (len(list_filter(rc, b -> recency > b)) + 1) AS BIGINT) AS r_score,
        CAST(len(list_filter(fc, b -> frequency > b)) + 1 AS BIGINT) AS f_score,
        CAST(len(list_filter(mc, b -> monetary > b)) + 1 AS BIGINT) AS m_score
      FROM per_cust, cuts)
    SELECT r_score, f_score, m_score, count(*) AS n_customers
    FROM scored
    GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score"""

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_rfm", rfm, Some(rfmSql)),
    QueryDef("q_benford", benford, Some(benfordSql)),
    QueryDef("q_string_agg", stringAgg, Some(stringAggSql)),
    QueryDef("q_equidepth_hist", equidepthHist, Some(equidepthHistSql)),
    QueryDef("q_basket_pairs", basketPairs, Some(basketPairsSql)),
    QueryDef("q_dq_checks", dqChecks, Some(dqChecksSql)),
    QueryDef("q_join_outer", joinOuter, Some("""
      SELECT c_custkey, c_mktsegment,
             count(o_orderkey) AS n_orders,
             round(COALESCE(sum(o_totalprice), 0.0), 2) AS total_spent
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_mktsegment
      ORDER BY c_custkey""")),
    QueryDef("q_sample_hash", sampleHash, Some("""
      SELECT event_type, count(*) AS n_sampled,
             round(sum(value), 2) AS sampled_value
      FROM events
      WHERE CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 5
      GROUP BY event_type
      ORDER BY event_type""")),
    QueryDef("q_histogram", histogram, Some("""
      SELECT event_type, CAST(floor(value / 10) AS BIGINT) AS bucket,
             count(*) AS n
      FROM events
      GROUP BY 1, 2
      ORDER BY event_type, bucket""")),
    QueryDef("q_set_ops", setOps, Some("""
      WITH first_half AS (
        SELECT DISTINCT user_id FROM events WHERE day(ts) <= 15),
      second_half AS (
        SELECT DISTINCT user_id FROM events WHERE day(ts) > 15)
      SELECT 'both' AS cohort, user_id
      FROM (SELECT user_id FROM first_half INTERSECT SELECT user_id FROM second_half)
      UNION ALL
      SELECT 'first_only', user_id
      FROM (SELECT user_id FROM first_half EXCEPT SELECT user_id FROM second_half)
      UNION ALL
      SELECT 'second_only', user_id
      FROM (SELECT user_id FROM second_half EXCEPT SELECT user_id FROM first_half)
      ORDER BY cohort, user_id""")),
    QueryDef("q_scan_filter", scanFilter, Some("""
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity,
             round(l_extendedprice * (1.0 - l_discount) + 1e-9, 2) AS revenue
      FROM lineitem
      WHERE l_returnflag = 'R' AND l_quantity >= 30
      ORDER BY l_orderkey, l_linenumber""")),
    QueryDef("q_agg_pricing", aggPricing, Some(s"""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             round(${Num.sqlCents4Sum("l_extendedprice * (1.0 - l_discount)")}, 2) AS sum_disc_price,
             round(avg(l_quantity) + 1e-9, 4) AS avg_qty,
             round(avg(l_discount) + 1e-9, 4) AS avg_disc,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")),
    QueryDef("q_join_dim", joinBroadcastDim, Some(s"""
      SELECT p_brand,
             round(${Num.sqlCents4Sum("l_extendedprice * (1.0 - l_discount)")}, 2) AS revenue,
             count(*) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand
      ORDER BY p_brand""")),
    QueryDef("q_join_cust_orders", joinCustomerOrders, Some("""
      SELECT c_mktsegment,
             count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS total_value,
             round(avg(o_totalprice) + 1e-9, 4) AS avg_value
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""")),
    QueryDef("q_join_semi", joinSemi, Some("""
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      ORDER BY c_custkey""")),
    QueryDef("q_bloom_join", bloomJoin, Some(s"""
      SELECT l_returnflag,
             round(${Num.sqlCents4Sum("l_extendedprice * (1.0 - l_discount)")}, 2) AS revenue,
             count(*) AS n_items
      FROM lineitem
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_orderkey = l_orderkey AND o_totalprice > 450000)
      GROUP BY l_returnflag
      ORDER BY l_returnflag""")),
    QueryDef("q_join_anti", joinAnti, Some("""
      SELECT c_custkey, c_name, c_acctbal
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND CAST(o_orderdate AS DATE) >= DATE '1998-06-01')
      ORDER BY c_custkey""")),
    QueryDef("q_join_snowflake", joinSnowflake, Some(s"""
      SELECT n_name,
             round(${Num.sqlCents4Sum("l_extendedprice * (1.0 - l_discount)")}, 2) AS revenue
      FROM region
      JOIN nation   ON n_regionkey = r_regionkey
      JOIN customer ON c_nationkey = n_nationkey
      JOIN orders   ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name
      ORDER BY n_name""")),
    QueryDef("q_union_dedup", unionDedup, Some("""
      WITH history AS (
        SELECT event_id, user_id, event_type, value, 1 AS src_priority
        FROM events WHERE event_id % 3 <> 0),
      updates AS (
        SELECT event_id, user_id, event_type,
               round(value * 2.0, 2) AS value, 2 AS src_priority
        FROM events WHERE event_id % 2 = 0),
      unioned AS (SELECT * FROM history UNION ALL SELECT * FROM updates)
      SELECT event_id, user_id, event_type,
             round(value, 2) AS value, CAST(src_priority AS BIGINT) AS src_priority
      FROM unioned
      QUALIFY row_number() OVER (PARTITION BY event_id
                                 ORDER BY src_priority DESC) = 1
      ORDER BY event_id""")),
    QueryDef("q_distinct_sort", distinctSort, Some("""
      SELECT DISTINCT event_type FROM events ORDER BY event_type""")),
    QueryDef("q_topk", topK, Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 10""")),
    QueryDef("q_count_groups", countGroups, Some("""
      SELECT event_type, count(*) AS n,
             count(DISTINCT user_id) AS n_users
      FROM events GROUP BY event_type ORDER BY event_type""")),
    QueryDef("q_cast_coerce", castCoerce, Some("""
      SELECT event_id,
             CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS k,
             CAST(CAST(value AS VARCHAR) AS DOUBLE) AS value_roundtrip
      FROM events
      WHERE regexp_extract(props, '[0-9]+') <> ''
      ORDER BY event_id""")),
    QueryDef("q_time_buckets", timeBuckets, Some("""
      SELECT CAST(ts AS DATE) AS day, strftime(ts, '%H') AS hour,
             count(*) AS n, round(sum(value), 2) AS total
      FROM events
      GROUP BY 1, 2
      ORDER BY day, hour""")),
    QueryDef("q_string_ops", stringOps, Some("""
      SELECT doc_id,
             regexp_replace(source, '[0-9]+$', '') AS source_family,
             string_split(text, ' ')[1] AS first_token,
             abs(n_chars - 300) AS abs_dev,
             greatest(n_chars, 300) - least(n_chars, 300) AS range_amp
      FROM documents
      ORDER BY doc_id""")),
    QueryDef("q_skew_salted", skewSalted, Some("""
      SELECT event_type,
             round(sum(value) + 1e-9, 2) AS total_value,
             count(*) AS n_events
      FROM events GROUP BY event_type ORDER BY event_type""")),
    QueryDef("q_skew_join", skewJoin, Some("""
      WITH stats AS (
        SELECT event_type, round(avg(value) + 1e-9, 4) AS type_avg
        FROM events GROUP BY event_type),
      joined AS (
        SELECT e.event_id, e.event_type, e.value, s.type_avg,
               round(e.value - s.type_avg + 1e-9, 4) AS deviation
        FROM events e JOIN stats s USING (event_type))
      SELECT event_id, event_type, value, type_avg, deviation
      FROM joined
      WHERE abs(deviation) >= 45.0
      ORDER BY event_id""")),
    QueryDef("q_cube", cubePricing, Some(s"""
      WITH e AS (
        SELECT event_type, strftime(ts, '%Y-%m') AS month, value
        FROM ${OracleSources.events})
      SELECT event_type, month,
             CAST(GROUPING(event_type, month) AS BIGINT) AS gid,
             count(*) AS n,
             round(sum(value) + 1e-9, 2) AS total_value
      FROM e
      GROUP BY CUBE (event_type, month)
      ORDER BY gid, event_type NULLS FIRST, month NULLS FIRST""")),
    QueryDef("q_pii_scrub", piiScrub, Some(s"""
      WITH scrubbed AS (
        SELECT event_type,
               len(regexp_extract_all(props, '$emailRe')) AS n_emails,
               len(regexp_extract_all(props, '$digitsRe')) AS n_digit_runs,
               regexp_replace(regexp_replace(props, '$emailRe', '<EMAIL>', 'g'),
                              '$digitsRe', '<NUM>', 'g') AS scrubbed
        FROM events)
      SELECT event_type,
             count(*) AS n_events,
             CAST(sum(n_emails) AS BIGINT) AS total_emails,
             CAST(sum(n_digit_runs) AS BIGINT) AS total_digit_runs,
             count(DISTINCT scrubbed) AS n_scrubbed_forms,
             min(scrubbed) AS sample_scrubbed
      FROM scrubbed
      GROUP BY event_type
      ORDER BY event_type""")),
    QueryDef("q_hll", hll, Some(hllSql)),
    QueryDef("q_hll_union", hllUnion, Some(hllUnionSql)),
    QueryDef("q_distinct_sketch", distinctSketch, Some("""
      WITH h AS (
        SELECT event_type, user_id,
               CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        FROM events),
      agg AS (
        SELECT event_type,
               CAST(count(DISTINCT CASE WHEN h % 8 = 0 THEN h END) * 8 AS BIGINT) AS est_distinct,
               count(DISTINCT user_id) AS exact_distinct
        FROM h GROUP BY event_type)
      SELECT event_type, est_distinct, exact_distinct,
             round(100.0 * abs(est_distinct - exact_distinct) / exact_distinct + 1e-9, 2) AS err_pct
      FROM agg ORDER BY event_type""")),
  )
}
