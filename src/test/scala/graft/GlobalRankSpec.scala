package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.GlobalRank

/** The two-pass distributed rank/NTILE must equal the window forms
  * bit-for-bit — it is registered under the SAME oracle SQL as the
  * exact NTILE twins, so any divergence is a correctness bug, not a
  * tolerance question. Exercised across multiple partitions (the
  * single-partition case would not test the offset arithmetic) and at
  * the NTILE edge cases (N divisible by n, N mod n ≠ 0, N < n). */
class GlobalRankSpec extends SparkSpec {

  private def randomDf(n: Int) = {
    import spark.implicits._
    // collisions in `v` are intentional: ties must resolve via the id
    // tie-breaker exactly as the window form resolves them
    (0 until n).map(i => (i.toLong, (i * 2654435761L % 97).toDouble))
      .toDF("id", "v")
      .repartition(7) // misaligned input partitioning
  }

  test("withRank equals a global row_number window (ties broken by id)") {
    val df = randomDf(500)
    val w = Window.orderBy(col("v").desc, col("id"))
    val expect = df.withColumn("rnk", row_number().over(w).cast("long"))
      .select("id", "rnk").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    val (ranked, total) = GlobalRank.withRank(
      df, "rnk", Seq(col("v").desc, col("id")), parts = 5)
    assert(total == 500L)
    val got = ranked.select("id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expect)
  }

  test("withNtile equals ntile() at N mod n = 0, N mod n != 0, and N < n") {
    Seq(500 -> 10, 503 -> 10, 7 -> 10, 10 -> 10, 11 -> 10).foreach {
      case (n, bins) =>
        val df = randomDf(n)
        val w = Window.orderBy(col("v"), col("id"))
        val expect = df
          .withColumn("b", ntile(bins).over(w).cast("long"))
          .select("id", "b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toMap
        val got = GlobalRank.withNtile(
            df, "b", bins, Seq(col("v"), col("id")), parts = 5)
          .select("id", "b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(got == expect, s"ntile mismatch at N=$n bins=$bins")
    }
  }

  test("empty input: no rows, no crash") {
    val df = randomDf(0)
    val (ranked, total) = GlobalRank.withRank(
      df, "rnk", Seq(col("v"), col("id")), parts = 5)
    assert(total == 0L && ranked.count() == 0L)
    assert(GlobalRank.withNtile(
      df, "b", 10, Seq(col("v"), col("id")), parts = 5).count() == 0L)
  }

  test("plan carries no Window operator") {
    val df = randomDf(100)
    val ranked = GlobalRank.withNtile(
      df, "b", 10, Seq(col("v"), col("id")), parts = 5)
    ranked.count()
    val plan = ranked.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"GlobalRank must not plan a window:\n$plan")
  }
}
