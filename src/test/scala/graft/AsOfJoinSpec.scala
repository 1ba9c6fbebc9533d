package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.plans.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("backward as-of: latest right at-or-before each left, per key") {
    val trades = Seq(
      (1L, ts(10), "t1"), (1L, ts(20), "t2"), (1L, ts(5), "t0"),
      (2L, ts(15), "t3"), (3L, ts(40), "t4"))
      .toDF("k", "t", "trade")
    val quotes = Seq(
      (1L, ts(8), 1.0), (1L, ts(10), 2.0), (1L, ts(19), 3.0),
      (2L, ts(16), 4.0), (9L, ts(1), 9.9))
      .toDF("qk", "qt", "px")
    val out = AsOfJoin.backward(trades, quotes, "k", "qk", "t", "qt",
        Seq("qt", "px"))
      .select("trade", "px", "qt")
      .collect().map(r => (r.getString(0), Option(r.get(1)))).toMap
    assert(out == Map(
      "t0" -> None,              // no quote at/before ts 5
      "t1" -> Some(2.0),         // equal timestamps match (<=)
      "t2" -> Some(3.0),         // latest of the three, not just any
      "t3" -> None,              // quote for k=2 is AFTER the trade
      "t4" -> None))             // key 3 has no quotes at all
  }

  test("matches an independent window-based computation on random data") {
    val n = 2000
    val left = spark.range(n).select(
      (col("id") % 37).as("k"),
      (hash(col("id")) % 1000 + 1000).cast("long").as("t"),
      col("id").as("lid"))
    val right = spark.range(n).select(
      (col("id") % 41).as("rk"),
      (hash(col("id") + 7) % 1000 + 1000).cast("long").as("rt"),
      (col("id") * 2).as("payload"))
    // determinism: one row per (rk, rt)
    val rightU = right.groupBy("rk", "rt").agg(max("payload").as("payload"))
    val got = AsOfJoin.backward(left, rightU, "k", "rk", "t", "rt",
        Seq("payload"))
      .select("lid", "payload")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    // oracle: plain SQL greatest-rt-at-or-before via a join + argmax
    rightU.createOrReplaceTempView("asof_r")
    left.createOrReplaceTempView("asof_l")
    val want = spark.sql("""
      SELECT l.lid, max_by(r.payload, r.rt) AS payload
      FROM asof_l l LEFT JOIN asof_r r
        ON l.k = r.rk AND r.rt <= l.t
      GROUP BY l.lid""")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(got.size == n && got == want)
  }

  test("null keys and null times match nothing but left rows survive") {
    val left = Seq(
      (Some(1L), Some(10L), "a"), (None, Some(10L), "b"),
      (Some(1L), None, "c"))
      .toDF("k", "t", "tag")
    val right = Seq(
      (Some(1L), Some(5L), 1.0), (None, Some(1L), 7.0),
      (Some(1L), None.asInstanceOf[Option[Long]], 8.0))
      .toDF("rk", "rt", "px")
    val out = AsOfJoin.backward(left, right, "k", "rk", "t", "rt", Seq("px"))
      .select("tag", "px")
      .collect().map(r => (r.getString(0), Option(r.get(1)))).toMap
    assert(out == Map("a" -> Some(1.0), "b" -> None, "c" -> None))
  }

  test("plan: AsOfJoinExec with ONE exchange + sort per side, no union pad") {
    val left = spark.range(100).select((col("id") % 5).as("k"),
      col("id").as("t"), col("id").as("lv"))
    val right = spark.range(100).select((col("id") % 5).as("rk"),
      (col("id") + 1).as("rt"), col("id").as("rv"))
    val df = AsOfJoin.backward(left, right, "k", "rk", "t", "rt", Seq("rv"))
    assert(df.collect().length == 100)
    // AQE final plan only (executedPlan.toString appends the initial plan)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("AsOfJoin"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
    assert(!plan.toLowerCase.contains("union"), plan)
  }

  test("forward as-of: earliest right at-or-after each left, per key") {
    val trades = Seq(
      (1L, 10L, "t1"), (1L, 20L, "t2"), (1L, 25L, "t3"),
      (2L, 15L, "t4"), (3L, 40L, "t5"))
      .toDF("k", "t", "trade")
    val quotes = Seq(
      (1L, 10L, 1.0), (1L, 19L, 2.0), (1L, 22L, 3.0),
      (2L, 14L, 4.0), (9L, 1L, 9.9))
      .toDF("qk", "qt", "px")
    val out = AsOfJoin.forward(trades, quotes, "k", "qk", "t", "qt", Seq("px"))
      .select("trade", "px")
      .collect().map(r => (r.getString(0), Option(r.get(1)))).toMap
    assert(out == Map(
      "t1" -> Some(1.0),         // equal timestamps match (>=)
      "t2" -> Some(3.0),         // earliest at-or-after, skipping 19
      "t3" -> None,              // nothing after 25 for k=1
      "t4" -> None,              // quote for k=2 is BEFORE the trade
      "t5" -> None))             // key 3 has no quotes
  }

  test("forward matches an independent max_by computation on random data") {
    val n = 2000
    val left = spark.range(n).select(
      (col("id") % 37).as("k"),
      (hash(col("id")) % 1000 + 1000).cast("long").as("t"),
      col("id").as("lid"))
    val right = spark.range(n).select(
      (col("id") % 41).as("rk"),
      (hash(col("id") + 13) % 1000 + 1000).cast("long").as("rt"),
      (col("id") * 3).as("payload"))
    val rightU = right.groupBy("rk", "rt").agg(max("payload").as("payload"))
    val got = AsOfJoin.forward(left, rightU, "k", "rk", "t", "rt",
        Seq("payload"))
      .select("lid", "payload")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    rightU.createOrReplaceTempView("asoff_r")
    left.createOrReplaceTempView("asoff_l")
    val want = spark.sql("""
      SELECT l.lid, min_by(r.payload, r.rt) AS payload
      FROM asoff_l l LEFT JOIN asoff_r r
        ON l.k = r.rk AND r.rt >= l.t
      GROUP BY l.lid""")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(got.size == n && got == want)
  }

  test("tolerance bounds the match window in both directions") {
    val l = Seq((1L, 100L, "a"), (1L, 200L, "b")).toDF("k", "t", "tag")
    val r = Seq((1L, 90L, 1.0), (1L, 230L, 2.0)).toDF("rk", "rt", "px")
    def res(df: org.apache.spark.sql.DataFrame) =
      df.select("tag", "px").collect()
        .map(x => (x.getString(0), Option(x.get(1)))).toMap
    // backward: a matches 90 (gap 10), b's nearest-before is 90 (gap 110)
    assert(res(AsOfJoin.backward(l, r, "k", "rk", "t", "rt", Seq("px"),
      toleranceUnits = Some(50L))) == Map("a" -> Some(1.0), "b" -> None))
    // forward: a's nearest-after is 230 (gap 130), b matches 230 (gap 30)
    assert(res(AsOfJoin.forward(l, r, "k", "rk", "t", "rt", Seq("px"),
      toleranceUnits = Some(50L))) == Map("a" -> None, "b" -> Some(2.0)))
  }

  test("empty right side: every left row survives with null payload") {
    val l = Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "t", "tag")
    val r = Seq.empty[(Long, Long, Double)].toDF("rk", "rt", "px")
    Seq(
      AsOfJoin.backward(l, r, "k", "rk", "t", "rt", Seq("px")),
      AsOfJoin.forward(l, r, "k", "rk", "t", "rt", Seq("px"))
    ).foreach { df =>
      val rows = df.select("tag", "px").collect()
        .map(x => (x.getString(0), Option(x.get(1)))).toMap
      assert(rows == Map("a" -> None, "b" -> None))
    }
  }

  test("self-join without re-read is rejected eagerly") {
    val df = spark.range(10).select(col("id").as("k"), col("id").as("t"),
      col("id").as("v"))
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(df, df, "k", "k", "t", "t", Seq("v"))
    }
    assert(e.getMessage.contains("attribute ids"), e.getMessage)
  }
}
