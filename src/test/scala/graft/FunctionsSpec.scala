package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The custom-function surface: semantics of the native expressions and
  * the cluster-wide SparkSessionExtensions injection path. */
class FunctionsSpec extends SparkSpec {

  test("dot_product: strict left-to-right fold, length = min, null propagation") {
    import spark.implicits._
    val r = spark.sql(
      "SELECT dot_product(array(1D, 2D, 3D), array(4D, 5D, 6D))")
      .as[Double].head()
    assert(r == 32.0)
    // length = min(len(a), len(b)) — trailing elements ignored
    assert(spark.sql("SELECT dot_product(array(1D, 2D), array(3D, 4D, 99D))")
      .as[Double].head() == 11.0)
    // null array → null result (not an error, not zero)
    assert(spark.sql(
      "SELECT dot_product(CAST(NULL AS ARRAY<DOUBLE>), array(1D))")
      .head().isNullAt(0))
    // bit-equality with the built-in composition it replaces
    val both = spark.sql(
      """SELECT dot_product(a, b) AS fused,
                aggregate(zip_with(a, b, (x, y) -> x * y), 0D,
                          (acc, x) -> acc + x) AS composed
         FROM (SELECT array(0.1D, 0.2D, 0.7D) AS a,
                      array(0.3D, 0.9D, 0.11D) AS b)""").head()
    assert(both.getDouble(0) == both.getDouble(1)) // exact, not approx
  }

  test("product_agg: exact product over a window frame") {
    import spark.implicits._
    val out = Seq((1, 2.0), (2, 3.0), (3, 4.0)).toDF("i", "x")
      .selectExpr("i",
        """product_agg(x) OVER (ORDER BY i
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p""")
      .orderBy("i").select("p").as[Double].collect()
    assert(out.toSeq == Seq(2.0, 6.0, 24.0))
  }

  test("GraftExtensions: a session built with the extension resolves dot_product") {
    // The production wiring is spark.sql.extensions=graft.functions.
    // GraftExtensions on a fresh cluster. Same-JVM equivalent: build a
    // second SparkSession (sharing the SparkContext) through
    // withExtensions, WITHOUT the runtime register() call ensureConf
    // does — proving the injection alone makes the function resolvable.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.functions.GraftExtensions())
        .getOrCreate()
      val r = s2.sql("SELECT dot_product(array(1D, 2D), array(3D, 4D))")
        .head().getDouble(0)
      assert(r == 11.0)
      // do NOT stop s2: it shares the suite's SparkContext
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
