package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-analytics operators beyond the reference's own surface: as-of
  * join, session windows, rollup hierarchies, exact percentiles, day-
  * over-day retention, and a view→purchase funnel — the standard toolkit
  * of a large event table.
  *
  * Scale notes: the as-of join is the UNION trick — one shuffle on the
  * key, one in-partition sort, `last_value(ignoreNulls)` carry-forward —
  * never a range self-join (which explodes on dense quote sides).
  * Sessionization is native `session_window` keyed state. Retention and
  * funnel pre-aggregate to per-(user, day)/per-(user, stage) minimums
  * before any join, so joins move only distinct keys.
  */
object AnalyticsQueries {

  /** As-of join: each purchase picks the same user's latest view at or
    * before it (price-at-decision attribution). Union-trick plan: tag
    * sides, one window pass, filter back to purchases. */
  private def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(0).as("side"), col("value").as("view_value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(1).as("side"), lit(null).cast("double").as("view_value"))
    // views sort before purchases at the same instant (side 0 < 1) so a
    // same-ts view is visible to the purchase — the <= of an ASOF join.
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    views.unionByName(purchases)
      .withColumn("asof_view_value",
        last(col("view_value"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("ts"),
        round(col("asof_view_value"), 2).as("asof_view_value"))
      .orderBy("event_id")
  }

  private val E = OracleSources.events

  private val asofJoinSql = s"""
    WITH tagged AS (
      SELECT user_id, ts, event_id, 0 AS side, value AS view_value
      FROM $E WHERE event_type = 'view'
      UNION ALL
      SELECT user_id, ts, event_id, 1 AS side, NULL AS view_value
      FROM $E WHERE event_type = 'purchase'),
    carried AS (
      SELECT *,
             last_value(view_value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, side, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS asof_view_value
      FROM tagged)
    SELECT event_id, user_id, ts,
           round(asof_view_value, 2) AS asof_view_value
    FROM carried WHERE side = 1
    ORDER BY event_id"""

  /** As-of join via the engine's NATIVE operator (graft.plans.AsOfJoin:
    * LogicalPlan + Strategy + per-partition streaming-merge exec) — same
    * attribution semantics as [[asofJoin]] but each side shuffles at its
    * own natural width instead of through the union's padded schema.
    * The view side is pre-aggregated to one row per (user, ts) so the
    * equal-timestamp tie is deterministic on both engines. Oracle is
    * the same backward as-of spelled dialect-portably (latest
    * qualifying view per purchase + unique join-back), equivalent to
    * DuckDB's ASOF LEFT JOIN and runnable on both engines. */
  private def asofExec(spark: SparkSession, dir: String): DataFrame = {
    val purchases = Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val views = Tables(spark, dir, "events")
      .filter(col("event_type") === "view")
      .groupBy(col("user_id").as("v_user"), col("ts").as("view_ts"))
      .agg(round(max("value"), 2).as("view_value"))
    graft.plans.AsOfJoin
      .backward(purchases, views, "user_id", "v_user", "ts", "view_ts",
        Seq("view_ts", "view_value"))
      .orderBy("event_id")
  }

  // Dialect-portable as-of spelling (runs on DuckDB AND Spark, so the
  // SqlCrossCheck third-engine pass can execute it): the backward as-of
  // is "latest qualifying view_ts per purchase, join the row back" — the
  // join-back is exact because v is grouped unique on (v_user, view_ts).
  private val asofExecSql = s"""
    WITH p AS (
      SELECT event_id, user_id, ts FROM $E WHERE event_type = 'purchase'),
    v AS (
      SELECT user_id AS v_user, ts AS view_ts, round(max(value), 2) AS view_value
      FROM $E WHERE event_type = 'view' GROUP BY 1, 2),
    m AS (
      SELECT p.event_id AS m_event, max(v.view_ts) AS m_ts
      FROM p JOIN v ON p.user_id = v.v_user AND p.ts >= v.view_ts
      GROUP BY 1)
    SELECT p.event_id, p.user_id, p.ts, v.view_ts, v.view_value
    FROM p
    LEFT JOIN m ON p.event_id = m.m_event
    LEFT JOIN v ON v.v_user = p.user_id AND v.view_ts = m.m_ts
    ORDER BY p.event_id"""

  /** Forward as-of via the native operator: each purchase picks the same
    * user's EARLIEST view at or after it (next-touch attribution).
    * Oracle is the portable forward as-of (earliest qualifying
    * view + unique join-back), equivalent to DuckDB's ASOF with the
    * inequality flipped. */
  private def asofForward(spark: SparkSession, dir: String): DataFrame = {
    val purchases = Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val views = Tables(spark, dir, "events")
      .filter(col("event_type") === "view")
      .groupBy(col("user_id").as("v_user"), col("ts").as("view_ts"))
      .agg(round(max("value"), 2).as("view_value"))
    graft.plans.AsOfJoin
      .forward(purchases, views, "user_id", "v_user", "ts", "view_ts",
        Seq("view_ts", "view_value"))
      .orderBy("event_id")
  }

  // Portable forward as-of: EARLIEST qualifying view per purchase, row
  // joined back on the unique (v_user, view_ts) key (see asofExecSql).
  private val asofForwardSql = s"""
    WITH p AS (
      SELECT event_id, user_id, ts FROM $E WHERE event_type = 'purchase'),
    v AS (
      SELECT user_id AS v_user, ts AS view_ts, round(max(value), 2) AS view_value
      FROM $E WHERE event_type = 'view' GROUP BY 1, 2),
    m AS (
      SELECT p.event_id AS m_event, min(v.view_ts) AS m_ts
      FROM p JOIN v ON p.user_id = v.v_user AND p.ts <= v.view_ts
      GROUP BY 1)
    SELECT p.event_id, p.user_id, p.ts, v.view_ts, v.view_value
    FROM p
    LEFT JOIN m ON p.event_id = m.m_event
    LEFT JOIN v ON v.v_user = p.user_id AND v.view_ts = m.m_ts
    ORDER BY p.event_id"""

  /** Tolerance-bounded backward as-of (pandas merge_asof tolerance): the
    * view must be within ONE HOUR before the purchase or the match is
    * dropped — stale context is worse than none. Tolerance is enforced
    * inside the merge exec; the oracle states the same window with a
    * bounded-range join + max_by (exact because the view side is unique
    * per (user, ts)). */
  private def asofTolerance(spark: SparkSession, dir: String): DataFrame = {
    val purchases = Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val views = Tables(spark, dir, "events")
      .filter(col("event_type") === "view")
      .groupBy(col("user_id").as("v_user"), col("ts").as("view_ts"))
      .agg(round(max("value"), 2).as("view_value"))
    graft.plans.AsOfJoin
      .backward(purchases, views, "user_id", "v_user", "ts", "view_ts",
        Seq("view_ts", "view_value"),
        toleranceUnits = Some(3600L * 1000000L)) // 1 h in µs
      .orderBy("event_id")
  }

  private val asofToleranceSql = s"""
    WITH p AS (
      SELECT event_id, user_id, ts FROM $E WHERE event_type = 'purchase'),
    v AS (
      SELECT user_id AS v_user, ts AS view_ts, round(max(value), 2) AS view_value
      FROM $E WHERE event_type = 'view' GROUP BY 1, 2)
    SELECT p.event_id, p.user_id, p.ts,
           max_by(v.view_ts, v.view_ts) AS view_ts,
           max_by(v.view_value, v.view_ts) AS view_value
    FROM p LEFT JOIN v
      ON p.user_id = v.v_user AND v.view_ts <= p.ts
     AND v.view_ts >= p.ts - INTERVAL 1 HOUR
    GROUP BY p.event_id, p.user_id, p.ts
    ORDER BY p.event_id"""

  /** Point-in-time join against an SCD2 dimension: each purchase picks
    * the user's activity state (last non-purchase event type) VALID AT
    * the purchase instant — the dimension is change-compressed first
    * (one row per state run, q_scd2's construction), so the as-of probe
    * touches state CHANGES, not raw events. Implemented with the native
    * as-of exec on valid_from; the valid_to containment filter is
    * stated explicitly even though contiguous SCD2 intervals make it
    * vacuous — the contract survives dims with gaps. */
  private def pitJoin(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val dim = Tables(spark, dir, "events")
      .filter(col("event_type") =!= "purchase")
      .select(col("user_id").as("d_user"), col("ts").as("valid_from"),
        col("event_id").as("d_event_id"), col("event_type").as("state"),
        lag("event_type", 1).over(w).as("prev_state"))
      .filter(col("prev_state").isNull || col("prev_state") =!= col("state"))
      // two changes at the SAME instant collapse to the latest (by event
      // id) so the as-of tie is deterministic on both engines
      .groupBy("d_user", "valid_from")
      .agg(max_by(col("state"), col("d_event_id")).as("state"))
      .withColumn("valid_to", lead("valid_from", 1).over(
        Window.partitionBy("d_user").orderBy(col("valid_from"))))
      .select("d_user", "valid_from", "valid_to", "state")
    val purchases = Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    graft.plans.AsOfJoin
      .backward(purchases, dim, "user_id", "d_user", "ts", "valid_from",
        Seq("state", "valid_from", "valid_to"))
      .filter(col("state").isNull ||
        col("valid_to").isNull || col("ts") < col("valid_to"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("state"), col("valid_from"))
      .orderBy("event_id")
  }

  private val pitJoinSql = s"""
    WITH obs AS (
      SELECT user_id AS d_user, ts AS valid_from, event_id,
             event_type AS state,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_state
      FROM $E WHERE event_type <> 'purchase'),
    changes AS (
      SELECT d_user, valid_from, max_by(state, event_id) AS state
      FROM obs
      WHERE prev_state IS NULL OR prev_state <> state
      GROUP BY d_user, valid_from),
    dim AS (
      SELECT d_user, valid_from, state,
             lead(valid_from) OVER (PARTITION BY d_user
                                    ORDER BY valid_from) AS valid_to
      FROM changes),
    p AS (
      SELECT event_id, user_id, ts FROM $E WHERE event_type = 'purchase'),
    m AS (
      SELECT p.event_id AS m_event, max(dim.valid_from) AS m_from
      FROM p JOIN dim ON p.user_id = dim.d_user AND p.ts >= dim.valid_from
      GROUP BY 1)
    SELECT p.event_id, p.user_id, p.ts, dim.state, dim.valid_from
    FROM p
    LEFT JOIN m ON p.event_id = m.m_event
    LEFT JOIN dim ON dim.d_user = p.user_id AND dim.valid_from = m.m_from
    WHERE dim.state IS NULL OR dim.valid_to IS NULL OR p.ts < dim.valid_to
    ORDER BY p.event_id"""

  /** Funnel latency: time from each user's FIRST view to FIRST purchase,
    * summarized as count + exact p50/p90. One conditional-min aggregate
    * per user (map-side partials, no window over the stream), then a
    * 1-row percentile over the per-user deltas — the converted-user set,
    * orders of magnitude below the event stream. */
  private def funnelTime(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("first_view"),
        min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))
      .filter(col("first_view").isNotNull && col("first_purchase").isNotNull &&
        col("first_purchase") >= col("first_view"))
      .select(((unix_micros(col("first_purchase")) -
        unix_micros(col("first_view"))) / 1e6).as("delta_s"))
      .agg(count(lit(1)).as("n_converted"),
        Num.r(expr("percentile(delta_s, 0.5)"), 2).as("p50_s"),
        Num.r(expr("percentile(delta_s, 0.9)"), 2).as("p90_s"))

  private val funnelTimeSql = s"""
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM $E WHERE event_type IN ('view', 'purchase')
      GROUP BY user_id),
    deltas AS (
      SELECT (epoch_us(first_purchase) - epoch_us(first_view)) / 1e6 AS delta_s
      FROM firsts
      WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
        AND first_purchase >= first_view)
    SELECT count(*) AS n_converted,
           round(quantile_cont(delta_s, 0.5) + 1e-9, 2) AS p50_s,
           round(quantile_cont(delta_s, 0.9) + 1e-9, 2) AS p90_s
    FROM deltas"""

  /** Daily/weekly/monthly active users with DAU/MAU stickiness. Rolling
    * DISTINCT counts never range-join the stream: each (day, user) pair
    * — already one aggregated row — is exploded onto the ≤7/≤30 future
    * spine days it contributes to, then counted per day with map-side
    * partials. Cost is bounded by (active pairs × window), independent
    * of per-day event volume. */
  private def activeUsers(spark: SparkSession, dir: String): DataFrame = {
    val dayUsers = Tables(spark, dir, "events")
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val dau = dayUsers.groupBy("day").agg(count(lit(1)).as("dau"))
    def rolling(win: Int, name: String): DataFrame = dayUsers
      .select(explode(expr(
        s"sequence(day, date_add(day, ${win - 1}), interval 1 day)")).as("day"),
        col("user_id"))
      .groupBy("day")
      .agg(countDistinct("user_id").as(name))
    dau
      .join(rolling(7, "wau"), "day")
      .join(rolling(30, "mau"), "day")
      .select(col("day"), col("dau"), col("wau"), col("mau"),
        Num.r(col("dau") / col("mau").cast("double"), 4).as("stickiness"))
      .orderBy("day")
  }

  private val activeUsersSql = s"""
    WITH day_users AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM $E),
    dau AS (SELECT day, count(*) AS dau FROM day_users GROUP BY day),
    wau0 AS (
      SELECT unnest(generate_series(day, day + 6, INTERVAL 1 DAY)) AS dayts,
             user_id
      FROM day_users),
    wau AS (SELECT CAST(dayts AS DATE) AS day, user_id FROM wau0),
    wau_c AS (SELECT day, count(DISTINCT user_id) AS wau FROM wau GROUP BY day),
    mau0 AS (
      SELECT unnest(generate_series(day, day + 29, INTERVAL 1 DAY)) AS dayts,
             user_id
      FROM day_users),
    mau AS (SELECT CAST(dayts AS DATE) AS day, user_id FROM mau0),
    mau_c AS (SELECT day, count(DISTINCT user_id) AS mau FROM mau GROUP BY day)
    SELECT dau.day, dau.dau, wau_c.wau, mau_c.mau,
           round(dau.dau / CAST(mau_c.mau AS DOUBLE) + 1e-9, 4) AS stickiness
    FROM dau JOIN wau_c USING (day) JOIN mau_c USING (day)
    ORDER BY day"""

  /** Cohort lifetime value: revenue by signup-week cohort and age-week,
    * with the running cumulative per cohort. Joins move only the
    * per-user signup day (aggregated, broadcastable) onto purchases;
    * the cumulative window runs over the cohort×age matrix, not the
    * stream. */
  private def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val signup = Tables(spark, dir, "events")
      .filter(col("event_type") === "signup")
      .groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("s_day"))
    val purchases = Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("p_day"), col("value"))
    purchases.join(broadcast(signup), "user_id")
      .filter(col("p_day") >= col("s_day"))
      .select(date_trunc("week", col("s_day")).cast("date").as("cohort"),
        floor(datediff(col("p_day"), col("s_day")) / 7).cast("long").as("age_w"),
        col("value"))
      .groupBy("cohort", "age_w")
      .agg(count(lit(1)).as("n_purchases"),
        round(Num.centsSum(col("value")), 2).as("revenue"))
      .withColumn("cum_revenue", round(sum("revenue").over(
        Window.partitionBy("cohort").orderBy("age_w")
          .rowsBetween(Window.unboundedPreceding, 0)) + lit(1e-9), 2))
      .orderBy("cohort", "age_w")
  }

  private val cohortLtvSql = s"""
    WITH signup AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS s_day
      FROM $E WHERE event_type = 'signup' GROUP BY user_id),
    p AS (
      SELECT events.user_id, CAST(events.ts AS DATE) AS p_day, events.value,
             s.s_day
      FROM $E JOIN signup s USING (user_id)
      WHERE event_type = 'purchase' AND CAST(events.ts AS DATE) >= s.s_day),
    cells AS (
      SELECT CAST(date_trunc('week', s_day) AS DATE) AS cohort,
             CAST(floor(date_diff('day', s_day, p_day) / 7) AS BIGINT) AS age_w,
             count(*) AS n_purchases,
             round(CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0, 2)
               AS revenue
      FROM p
      GROUP BY 1, 2)
    SELECT cohort, age_w, n_purchases, revenue,
           round(sum(revenue) OVER (PARTITION BY cohort ORDER BY age_w
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1e-9, 2)
             AS cum_revenue
    FROM cells
    ORDER BY cohort, age_w"""

  /** View abandonment: per day, how many views converted to a purchase
    * by the same user within 24 hours vs not — the inverse funnel,
    * computed with the native FORWARD + TOLERANCE as-of exec (earliest
    * purchase at-or-after each view, capped at 24 h) instead of a range
    * self-join of the stream. Purchases pre-aggregate to one row per
    * (user, ts). */
  private def abandonment(spark: SparkSession, dir: String): DataFrame = {
    val views = Tables(spark, dir, "events")
      .filter(col("event_type") === "view")
      .select("event_id", "user_id", "ts")
    val purchases = Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .agg(count(lit(1)).as("n_p"))
    graft.plans.AsOfJoin
      .forward(views, purchases, "user_id", "p_user", "ts", "p_ts",
        Seq("p_ts"), toleranceUnits = Some(24L * 3600L * 1000000L))
      .select(to_date(col("ts")).as("day"),
        col("p_ts").isNotNull.as("converted"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_views"),
        sum(when(col("converted"), 1L).otherwise(0L)).as("n_converted"))
      .select(col("day"), col("n_views"), col("n_converted"),
        Num.r((col("n_views") - col("n_converted")) /
          col("n_views").cast("double"), 4).as("abandon_rate"))
      .orderBy("day")
  }

  private val abandonmentSql = s"""
    WITH v AS (
      SELECT event_id, user_id, ts FROM $E WHERE event_type = 'view'),
    p AS (
      SELECT user_id AS p_user, ts AS p_ts, count(*) AS n_p
      FROM $E WHERE event_type = 'purchase' GROUP BY 1, 2),
    matched AS (
      SELECT v.ts,
             min(p.p_ts) AS p_ts
      FROM v LEFT JOIN p
        ON v.user_id = p.p_user AND p.p_ts >= v.ts
       AND p.p_ts <= v.ts + INTERVAL 24 HOUR
      GROUP BY v.event_id, v.ts)
    SELECT CAST(ts AS DATE) AS day, count(*) AS n_views,
           CAST(sum(CASE WHEN p_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_converted,
           round((count(*) - sum(CASE WHEN p_ts IS NOT NULL THEN 1 ELSE 0 END))
                 / CAST(count(*) AS DOUBLE) + 1e-9, 4) AS abandon_rate
    FROM matched
    GROUP BY 1
    ORDER BY day"""

  /** Session path mining: the 20 most common event-type sequences
    * (first 5 steps) across 30-minute-gap sessions. Sessions come from
    * a gap-flag running sum on the shared per-user sort; each session
    * collapses to ONE ordered path string inside a (user, session)
    * aggregate — order is pinned by sorting (ts, event_id, type)
    * structs, since collect_list itself is unordered — and the final
    * top-20 is an orderBy+limit heap over the aggregated path counts. */
  private def sessionPaths(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val sessions = Tables(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("gap",
        when(unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(w)) >
          1800L * 1000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum("gap").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    sessions
      .groupBy("user_id", "session_id")
      .agg(expr(
        """concat_ws('>', slice(transform(
             array_sort(collect_list(struct(ts, event_id, event_type))),
             x -> x.event_type), 1, 5))""").as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(20)
  }

  private val sessionPathsSql = s"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS gap
      FROM $E
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessioned AS (
      SELECT *, sum(gap) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged),
    paths AS (
      SELECT user_id, session_id,
             array_to_string(list(event_type ORDER BY ts, event_id)[1:5], '>')
               AS path
      FROM sessioned
      GROUP BY user_id, session_id)
    SELECT path, count(*) AS n_sessions
    FROM paths
    GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 20"""

  /** First-order Markov transition matrix over each user's event
    * sequence: P(next type | type) with counts. One lead() on the shared
    * user_id shuffle forms the (from, to) pairs; the probability
    * normalization is a window over the ALREADY-AGGREGATED ≤|types|²
    * matrix, not the event stream. */
  private def transitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val counts = Tables(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"),
        lead("event_type", 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("prob", Num.r(
        col("n") / sum("n").over(Window.partitionBy("from_type")), 6))
      .orderBy("from_type", "to_type")
  }

  private val transitionsSql = s"""
    WITH pairs AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM $E),
    counts AS (
      SELECT from_type, to_type, count(*) AS n
      FROM pairs WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type)
    SELECT from_type, to_type, n,
           round(n / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE)
                 + 1e-9, 6) AS prob
    FROM counts
    ORDER BY from_type, to_type"""

  /** Sessionization: native session_window with a 30-minute gap; a
    * session ends 30 min after its last event. */
  /** The sessionization aggregation shared by the batch query and its
    * streaming twin (StreamingSpec): 30-minute-gap session windows per
    * user. `session_window` is the same Catalyst operator in both modes —
    * streaming callers watermark `ev` first and run append-mode, batch
    * callers aggregate directly; the spec asserts both produce identical
    * rows. */
  def sessionWindows(ev: DataFrame): DataFrame =
    ev.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("session_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("session_value"))

  /** Sessionization: 30-minute-gap session windows per user via
    * session_window, event counts and value mass per session. */
  private def sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionWindows(Tables(spark, dir, "events"))
      .orderBy("user_id", "session_start")

  private val sessionizeSql = s"""
    WITH ordered AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                    < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
      FROM $E),
    ids AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM ordered)
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           round(sum(value), 2) AS session_value
    FROM ids
    GROUP BY user_id, sid
    ORDER BY user_id, session_start"""

  /** Rollup hierarchy totals: (flag, status), (flag), () — one pass. */
  private def rollupPricing(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(Num.r(sum("l_quantity"), 2).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  private val rollupPricingSql = """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity) + 1e-9, 2) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""

  /** Exact interpolated percentiles per group (median / p90 / p99). */
  private def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy("event_type")
      .agg(
        Num.r(expr("percentile(value, 0.5)"), 4).as("p50"),
        Num.r(expr("percentile(value, 0.9)"), 4).as("p90"),
        Num.r(expr("percentile(value, 0.99)"), 4).as("p99"))
      .orderBy("event_type")

  /** Daily OHLC resampling (the reference domain's core bar shape —
    * include/tasks/data_processing.py computes open/close deltas):
    * per (event_type, day) open/high/low/close/volume bars from the raw
    * event stream in ONE hash aggregate — open/close are `min_by`/
    * `max_by` on the (ts, event_id) struct (deterministic under equal
    * timestamps), NOT a ranking window, so the whole resample is a
    * single shuffle with map-side partials and no per-key sort of the
    * full stream. */
  private def ohlcDaily(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .withColumn("day", to_date(col("ts")))
      .groupBy("event_type", "day")
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max("value").as("high"),
        min("value").as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        count(lit(1)).as("n_trades"),
        Num.r(sum("value"), 2).as("volume"))
      .orderBy("event_type", "day")

  private val ohlcDailySql = s"""
    WITH e AS (
      SELECT event_type, CAST(ts AS DATE) AS day, ts, event_id, value
      FROM $E),
    ranked AS (
      SELECT event_type, day, value, ts, event_id,
             row_number() OVER (PARTITION BY event_type, day
                                ORDER BY ts, event_id) AS rf,
             row_number() OVER (PARTITION BY event_type, day
                                ORDER BY ts DESC, event_id DESC) AS rl
      FROM e)
    SELECT event_type, day,
           max(CASE WHEN rf = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rl = 1 THEN value END) AS close,
           count(*) AS n_trades,
           round(sum(value) + 1e-9, 2) AS volume
    FROM ranked
    GROUP BY event_type, day
    ORDER BY event_type, day"""

  /** 14-day Average True Range over the daily OHLC bars (Cutler-style
    * simple average — the recursive Wilder smoothing lives in
    * [[WindowQueries]]' rsi_wilder family; the simple form is
    * order-independent and engine-exact). True range follows Wilder's
    * convention: day 1 per key is high−low (no prior close), later days
    * are max(high−low, |high−prev_close|, |low−prev_close|). The
    * prev-close null branch is EXPLICIT — Spark's `greatest` skips nulls
    * while engines differ on null-propagation, so the CASE keeps both
    * sides on the same arm. TR is rounded before the 14-day average so
    * both engines smooth identical inputs; ATR is null until 14 TRs
    * exist.
    * Scale shape: one hash aggregate to daily bars (map-side partials,
    * min_by/max_by — no per-event sort), then windows over the tiny
    * per-(type, day) table. */
  private def atr(spark: SparkSession, dir: String): DataFrame = {
    val wDay = Window.partitionBy("event_type").orderBy("day")
    val w14 = wDay.rowsBetween(-13, 0)
    val bars = Tables(spark, dir, "events")
      .withColumn("day", to_date(col("ts")))
      .groupBy("event_type", "day")
      .agg(max("value").as("high"), min("value").as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"))
    val prevClose = lag("close", 1).over(wDay)
    bars
      .select(col("event_type"), col("day"), col("high"), col("low"),
        col("close"),
        Num.r(when(prevClose.isNull, col("high") - col("low"))
          .otherwise(greatest(col("high") - col("low"),
            abs(col("high") - prevClose), abs(col("low") - prevClose))), 4)
          .as("tr"))
      .select(col("event_type"), col("day"), col("high"), col("low"),
        col("close"), col("tr"),
        Num.r(when(count(col("tr")).over(w14) === 14, avg(col("tr")).over(w14)), 4)
          .as("atr_14"))
      .orderBy("event_type", "day")
  }

  private val atrSql = s"""
    WITH e AS (
      SELECT event_type, CAST(ts AS DATE) AS day, ts, event_id, value
      FROM $E),
    ranked AS (
      SELECT event_type, day, value,
             row_number() OVER (PARTITION BY event_type, day
                                ORDER BY ts DESC, event_id DESC) AS rl
      FROM e),
    bars AS (
      SELECT event_type, day,
             max(value) AS high, min(value) AS low,
             max(CASE WHEN rl = 1 THEN value END) AS close
      FROM ranked
      GROUP BY event_type, day),
    tr AS (
      SELECT event_type, day, high, low, close,
             round(CASE WHEN lag(close, 1) OVER wd IS NULL THEN high - low
                   ELSE greatest(high - low,
                                 abs(high - lag(close, 1) OVER wd),
                                 abs(low - lag(close, 1) OVER wd)) END
                   + 1e-9, 4) AS tr
      FROM bars
      WINDOW wd AS (PARTITION BY event_type ORDER BY day))
    SELECT event_type, day, high, low, close, tr,
           round(CASE WHEN count(tr) OVER w14 = 14
                 THEN avg(tr) OVER w14 END + 1e-9, 4) AS atr_14
    FROM tr
    WINDOW w14 AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    ORDER BY event_type, day"""

  /** Calendar gap-fill with carry-forward — the distributed form of the
    * reference's pandas resample/ffill habit: build each key's full date
    * spine (min..max day, generated per key from a 5-row bounds
    * aggregate, NOT a driver loop), left-join the sparse daily totals,
    * and forward-fill via `last(ignoreNulls)` over an unbounded-preceding
    * row frame. Scale shape: the spine explode is per-key row generation
    * (days, not events), the join is keyed on (type, day) — AQE
    * broadcasts the tiny daily side — and the fill is one in-partition
    * window pass per key. Gaps stay visible via `is_gap` + the nullable
    * raw total. */
  private def gapFill(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables(spark, dir, "events")
      .withColumn("day", to_date(col("ts")))
      .groupBy("event_type", "day")
      .agg(Num.r(sum("value"), 2).as("total"))
    val spine = daily.groupBy("event_type")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("event_type"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("event_type", "day"), "left")
      .withColumn("filled", last("total", ignoreNulls = true).over(w))
      .withColumn("is_gap", col("total").isNull)
      .select("event_type", "day", "total", "filled", "is_gap")
      .orderBy("event_type", "day")
  }

  private val gapFillSql = s"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             round(sum(value) + 1e-9, 2) AS total
      FROM $E GROUP BY 1, 2),
    bounds AS (
      SELECT event_type, min(day) AS d0, max(day) AS d1
      FROM daily GROUP BY 1),
    spine0 AS (
      SELECT event_type,
             unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                    CAST(d1 AS TIMESTAMP),
                                    INTERVAL 1 DAY)) AS dayts
      FROM bounds),
    spine AS (SELECT event_type, CAST(dayts AS DATE) AS day FROM spine0)
    SELECT s.event_type, s.day, d.total,
           last_value(d.total IGNORE NULLS)
             OVER (PARTITION BY s.event_type ORDER BY s.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS filled,
           (d.total IS NULL) AS is_gap
    FROM spine s LEFT JOIN daily d
      ON s.event_type = d.event_type AND s.day = d.day
    ORDER BY s.event_type, s.day"""

  /** Winsorized robust statistics: per-group p05/p95 bounds (exact
    * interpolated percentiles), values clipped to the ROUNDED bounds,
    * raw vs winsorized mean side by side plus the clip count — the
    * outlier-robust summary a feature pipeline reports before training.
    * Scale shape: the bounds table is group-cardinality-sized (5 rows)
    * and BROADCASTS back onto the fact for the clip pass; the fact is
    * scanned twice, shuffled only by the 5-key partial-agg aggregations.
    * Determinism: clipping and the clip-count compare raw data against
    * the 4-dp ROUNDED bounds, so both engines clip identical row sets. */
  private def winsorize(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables(spark, dir, "events")
    val bounds = events.groupBy("event_type").agg(
      Num.r(expr("percentile(value, 0.05)"), 4).as("p05"),
      Num.r(expr("percentile(value, 0.95)"), 4).as("p95"))
    events.join(broadcast(bounds), "event_type")
      .withColumn("clipped", least(greatest(col("value"), col("p05")), col("p95")))
      .groupBy("event_type")
      .agg(max("p05").as("p05"), max("p95").as("p95"),
        Num.r(avg("value"), 4).as("raw_mean"),
        Num.r(avg("clipped"), 4).as("wins_mean"),
        sum(when(col("value") < col("p05") || col("value") > col("p95"), 1L)
          .otherwise(0L)).cast("long").as("n_clipped"))
      .orderBy("event_type")
  }

  private val winsorizeSql = """
    WITH bounds AS (
      SELECT event_type,
             round(percentile_cont(0.05) WITHIN GROUP (ORDER BY value) + 1e-9, 4) AS p05,
             round(percentile_cont(0.95) WITHIN GROUP (ORDER BY value) + 1e-9, 4) AS p95
      FROM events GROUP BY event_type)
    SELECT e.event_type, b.p05, b.p95,
           round(avg(e.value) + 1e-9, 4) AS raw_mean,
           round(avg(least(greatest(e.value, b.p05), b.p95)) + 1e-9, 4) AS wins_mean,
           CAST(sum(CASE WHEN e.value < b.p05 OR e.value > b.p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
    FROM events e JOIN bounds b USING (event_type)
    GROUP BY e.event_type, b.p05, b.p95
    ORDER BY e.event_type"""

  private val percentilesSql = """
    SELECT event_type,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY value) + 1e-9, 4) AS p50,
           round(percentile_cont(0.9) WITHIN GROUP (ORDER BY value) + 1e-9, 4) AS p90,
           round(percentile_cont(0.99) WITHIN GROUP (ORDER BY value) + 1e-9, 4) AS p99
    FROM events
    GROUP BY event_type
    ORDER BY event_type"""

  /** Day-over-day retention: of the users active on day d, how many were
    * active again on d+1. */
  private def retention(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "events")
      .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
    daily.as("a")
      .join(daily.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.day") === date_add(col("a.day"), 1), "left")
      .groupBy(col("a.day").as("day"))
      .agg(count(lit(1)).as("active_users"),
        count(col("b.user_id")).as("retained_next_day"))
      .orderBy("day")
  }

  private val retentionSql = s"""
    WITH daily AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
    SELECT a.day AS day,
           count(*) AS active_users,
           count(b.user_id) AS retained_next_day
    FROM daily a
    LEFT JOIN daily b ON a.user_id = b.user_id AND b.day = a.day + 1
    GROUP BY a.day
    ORDER BY day"""

  /** View→purchase funnel: per user, did a purchase follow the first
    * view; global stage counts. */
  private def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val firstView = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("first_view"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    firstView.join(purchases,
        col("user_id") === col("p_user") && col("p_ts") >= col("first_view"),
        "left")
      .groupBy("user_id").agg(max(col("p_ts").isNotNull).as("converted"))
      .agg(count(lit(1)).as("n_view_users"),
        sum(when(col("converted"), 1L).otherwise(0L)).as("n_converted"))
  }

  private val funnelSql = s"""
    WITH first_view AS (
      SELECT user_id, min(ts) AS first_view
      FROM $E WHERE event_type = 'view' GROUP BY user_id),
    conv AS (
      SELECT f.user_id, max(p.ts IS NOT NULL) AS converted
      FROM first_view f
      LEFT JOIN (SELECT user_id, ts FROM $E WHERE event_type = 'purchase') p
        ON p.user_id = f.user_id AND p.ts >= f.first_view
      GROUP BY f.user_id)
    SELECT count(*) AS n_view_users,
           CAST(sum(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
    FROM conv"""

  /** Interval/range self-join, bucketed: pairs of orders by the same
    * customer placed within 7 days of each other. The naive plan is an
    * inequality join (`abs(datediff) <= 7`), which Spark can only execute
    * as a broadcast-nested-loop — quadratic per customer and a
    * non-starter at 100 TB. The scale shape here is the standard
    * bucketed range join: quantize time into W-day buckets, explode ONE
    * side to its bucket ±1 (3 rows), then a plain hash equi-join on
    * (customer, bucket) followed by the exact predicate. Any pair within
    * W days differs by at most one bucket, so the equi-join superset is
    * exact; each true pair matches exactly once (the probe side carries
    * one bucket), so no dedup pass is needed. Shuffle volume is 3×|A|+|B|
    * narrow rows instead of a per-key cross product. */
  private def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val W = 7
    val ord = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate"), lit("1970-01-01")).as("day"))
    val a = ord.select(col("o_orderkey").as("key_a"), col("o_custkey"),
      col("day").as("day_a"),
      explode(array(floor(col("day") / W) - 1, floor(col("day") / W),
        floor(col("day") / W) + 1)).as("bucket"))
    val b = ord.select(col("o_orderkey").as("key_b"), col("o_custkey"),
      col("day").as("day_b"), floor(col("day") / W).as("bucket"))
    a.join(b, Seq("o_custkey", "bucket"))
      .filter(col("key_a") < col("key_b") &&
        abs(col("day_b") - col("day_a")) <= W)
      .select(col("o_custkey"), col("key_a"), col("key_b"),
        (col("day_b") - col("day_a")).cast("long").as("day_diff"))
      .orderBy("o_custkey", "key_a", "key_b")
  }

  /** The oracle states the SEMANTICS (plain inequality join) — the
    * bucketing above is pure execution strategy and must not change the
    * result. */
  private val rangeJoinSql = """
    SELECT a.o_custkey AS o_custkey, a.o_orderkey AS key_a,
           b.o_orderkey AS key_b,
           CAST(date_diff('day', a.o_orderdate, b.o_orderdate) AS BIGINT)
             AS day_diff
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
     AND abs(date_diff('day', a.o_orderdate, b.o_orderdate)) <= 7
    ORDER BY o_custkey, key_a, key_b"""

  /** Gaps-and-islands: each user's longest run of CONSECUTIVE active
    * days. The classic trick — day − row_number() is constant within a
    * consecutive run — turns streak detection into a groupBy, so the
    * whole query is one shuffle on user_id, one in-partition window
    * pass, and two aggregates; no self-join, nothing global. The
    * per-user winner is a max_by (longest, ties → earliest start), an
    * aggregate rather than a second ranking window. */
  private def streaks(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "events")
      .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    val runs = daily
      .withColumn("grp", date_sub(col("day"), row_number().over(w)))
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("streak_days"),
        min("day").as("streak_start"), max("day").as("streak_end"))
    runs.groupBy("user_id")
      .agg(max_by(
        struct(col("streak_days"), col("streak_start"), col("streak_end")),
        struct(col("streak_days"),
          -datediff(col("streak_start"), lit("1970-01-01")))).as("r"))
      .select(col("user_id"), col("r.streak_days").as("streak_days"),
        col("r.streak_start").as("streak_start"),
        col("r.streak_end").as("streak_end"))
      .orderBy("user_id")
  }

  private val streaksSql = """
    WITH daily AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    runs AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (PARTITION BY user_id
                                           ORDER BY day) AS INTEGER) AS grp
      FROM daily),
    streaks AS (
      SELECT user_id, grp, CAST(count(*) AS BIGINT) AS streak_days,
             min(day) AS streak_start, max(day) AS streak_end
      FROM runs GROUP BY 1, 2)
    SELECT user_id, streak_days, streak_start, streak_end
    FROM streaks
    QUALIFY row_number() OVER (PARTITION BY user_id
                               ORDER BY streak_days DESC, streak_start) = 1
    ORDER BY user_id"""

  /** SCD2 historization — the dual of the reference's latest-per-key
    * upsert (data_warehouse.py:62-78 keeps only the newest row per
    * symbol; a warehouse that keeps HISTORY keeps type-2 rows instead).
    * Each user's event stream is read as observations of a mutable
    * attribute (event_type); output is one row per attribute CHANGE with
    * a [valid_from, valid_to) interval, the open-ended row flagged
    * is_current. Plan: one shuffle on user_id, then two in-partition
    * window passes (lag change-detect, lead interval-close) — no
    * self-join, no global sort before the output ORDER BY, so the shape
    * survives a 100 TB event table (state per task = one partition's
    * rows, and AQE splits skewed users' post-filter remainder is tiny). */
  private def scd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("valid_to", lead("ts", 1).over(w))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy("user_id", "valid_from", "event_id")
  }

  private val scd2Sql = s"""
    WITH obs AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM $E),
    changes AS (
      SELECT * FROM obs
      WHERE prev_type IS NULL OR prev_type <> event_type)
    SELECT user_id, event_id, event_type, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             AS is_current
    FROM changes
    ORDER BY user_id, valid_from, event_id"""

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_scd2", scd2, Some(scd2Sql)),
    QueryDef("q_range_join", rangeJoin, Some(rangeJoinSql)),
    QueryDef("q_streaks", streaks, Some(streaksSql)),
    QueryDef("q_asof_join", asofJoin, Some(asofJoinSql)),
    QueryDef("q_asof_exec", asofExec, Some(asofExecSql)),
    QueryDef("q_asof_forward", asofForward, Some(asofForwardSql)),
    QueryDef("q_asof_tolerance", asofTolerance, Some(asofToleranceSql)),
    QueryDef("q_pit_join", pitJoin, Some(pitJoinSql)),
    QueryDef("q_funnel_time", funnelTime, Some(funnelTimeSql)),
    QueryDef("q_abandonment", abandonment, Some(abandonmentSql)),
    QueryDef("q_active_users", activeUsers, Some(activeUsersSql)),
    QueryDef("q_cohort_ltv", cohortLtv, Some(cohortLtvSql)),
    QueryDef("q_transitions", transitions, Some(transitionsSql)),
    QueryDef("q_session_paths", sessionPaths, Some(sessionPathsSql)),
    QueryDef("q_sessionize", sessionize, Some(sessionizeSql)),
    QueryDef("q_rollup", rollupPricing, Some(rollupPricingSql)),
    QueryDef("q_percentiles", percentiles, Some(percentilesSql)),
    QueryDef("q_winsorize", winsorize, Some(winsorizeSql)),
    QueryDef("q_ohlc_daily", ohlcDaily, Some(ohlcDailySql)),
    QueryDef("q_atr", atr, Some(atrSql)),
    QueryDef("q_gap_fill", gapFill, Some(gapFillSql)),
    QueryDef("q_retention", retention, Some(retentionSql)),
    QueryDef("q_funnel", funnel, Some(funnelSql)),
  )
}
