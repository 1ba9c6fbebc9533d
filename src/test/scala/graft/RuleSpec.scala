package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.TopOneToMaxBy

/** The row_number=1 → max_by/min_by optimizer rule: rewrite fires on the
  * safe pattern, is inert on every unsafe variant, and preserves results
  * exactly. */
class RuleSpec extends SparkSpec {

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ TopOneToMaxBy
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq TopOneToMaxBy)
  }

  private def quotes: DataFrame = {
    import spark.implicits._
    Seq(
      ("A", 10L, 1.0), ("A", 30L, 3.0), ("A", 20L, 2.0),
      ("B", 5L, 9.0), ("B", 7L, 7.0),
      ("C", 1L, 4.0)).toDF("sym", "seq", "px")
  }

  private def hasWindow(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.nonEmpty

  test("rewrites row_number=1 over desc order to max_by, same result") {
    def build() = quotes
      .withColumn("rn", row_number().over(
        Window.partitionBy("sym").orderBy(col("seq").desc)))
      .filter(col("rn") === 1)
    val expected = build().collect().toSet // window plan, rule off
    withRule {
      // a QueryExecution memoizes its plans — build fresh under the rule
      val naive = build()
      assert(!hasWindow(naive), "Window survived the rewrite")
      val opt = naive.queryExecution.optimizedPlan.toString
      assert(opt.contains("max_by"), s"expected max_by aggregate:\n$opt")
      assert(naive.collect().toSet == expected)
      // rn column still present and equal to 1
      assert(naive.select("rn").distinct().collect().map(_.getInt(0)).toSeq
        == Seq(1))
    }
  }

  test("asc order (earliest per key) becomes min_by; multi-key order works") {
    withRule {
      val first = quotes
        .withColumn("rn", row_number().over(
          Window.partitionBy("sym").orderBy(col("seq"), col("px"))))
        .filter(col("rn") <= 1)
      assert(!hasWindow(first))
      assert(first.queryExecution.optimizedPlan.toString.contains("min_by"))
      assert(first.select("sym", "seq").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet ==
        Set(("A", 10L), ("B", 5L), ("C", 1L)))
    }
  }

  test("map-side partial aggregation replaces the shuffle-then-sort") {
    withRule {
      val naive = quotes
        .withColumn("rn", row_number().over(
          Window.partitionBy("sym").orderBy(col("seq").desc)))
        .filter(col("rn") === 1)
      naive.count()
      val physical = naive.queryExecution.executedPlan.toString
      assert(physical.contains("partial_max_by"),
        s"per-key collapse must happen before the exchange:\n$physical")
      assert(!physical.contains("Window"), physical)
    }
  }

  test("does NOT fire when the window has other expressions, rank>1, or mixed order") {
    withRule {
      val w = Window.partitionBy("sym").orderBy(col("seq").desc)
      // a second window output would be lost → must stay a Window
      val twoExprs = quotes
        .withColumn("rn", row_number().over(w))
        .withColumn("mx", max("px").over(Window.partitionBy("sym")))
        .filter(col("rn") === 1)
      assert(twoExprs.collect().length == 3)
      // rank 2 is not top-1
      val rankTwo = quotes
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 2)
      assert(hasWindow(rankTwo))
      assert(rankTwo.collect().map(_.getString(0)).toSet == Set("A", "B"))
      // mixed sort directions: struct comparison can't express it
      val mixed = quotes
        .withColumn("rn", row_number().over(
          Window.partitionBy("sym").orderBy(col("seq").desc, col("px").asc)))
        .filter(col("rn") === 1)
      assert(hasWindow(mixed))
      assert(mixed.collect().length == 3)
    }
  }

  test("property: rewrite ≡ window plan on seeded random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(421L)
    (1 to 6).foreach { _ =>
      // globally-unique seq → total order per key → both plans deterministic
      val seqs = rnd.shuffle((0L until 200L).toList)
      val rows = seqs.zipWithIndex.map { case (s, i) =>
        (s"K${rnd.nextInt(7)}", s, rnd.nextDouble(), i) }
      val desc = rnd.nextBoolean()
      def build() = {
        val order = if (desc) col("seq").desc else col("seq").asc
        rows.toDF("sym", "seq", "px", "tag")
          .withColumn("rn", row_number().over(
            Window.partitionBy("sym").orderBy(order)))
          .filter(col("rn") === 1)
      }
      val plain = build().collect().toSet
      withRule {
        val opt = build()
        assert(!hasWindow(opt))
        assert(opt.collect().toSet == plain)
      }
    }
  }

  test("global top-1 (no partitionBy) of an EMPTY input returns zero rows") {
    withRule {
      def globalTop1(df: DataFrame) = df
        .withColumn("rn", row_number().over(Window.orderBy(col("seq").desc)))
        .filter(col("rn") === 1)
      // empty after a selective filter — the ungrouped max_by returns one
      // null row that the rewrite must drop, not surface as all-null
      val empty = globalTop1(quotes.filter(col("px") > 1e9))
      assert(!hasWindow(empty), "global rewrite should still fire")
      assert(empty.collect().isEmpty,
        "empty input must yield zero rows, not a phantom all-null row")
      // and the non-empty global case keeps returning exactly the max row
      val top = globalTop1(quotes)
      assert(!hasWindow(top))
      val rows = top.collect()
      assert(rows.length == 1 && rows.head.getLong(1) == 30L)
    }
  }

  test("does NOT fire on a nullable order key (null-ranking divergence)") {
    import spark.implicits._
    withRule {
      val withNulls = Seq(("A", Some(10L)), ("A", None), ("B", None))
        .toDF("sym", "seq")
        .withColumn("rn", row_number().over(
          Window.partitionBy("sym").orderBy(col("seq"))))
        .filter(col("rn") === 1)
      assert(hasWindow(withNulls))
      // row_number ranks null keys (asc nulls first): B's only row survives
      assert(withNulls.collect().map(_.getString(0)).toSet == Set("A", "B"))
    }
  }
}
