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

  test("dot_product: numeric coercion only — string arrays fail analysis, float/int/decimal coerce") {
    import spark.implicits._
    // float embeddings and int/decimal literal arrays coerce silently
    assert(spark.sql(
      "SELECT dot_product(CAST(array(1, 2) AS ARRAY<FLOAT>), array(3, 4))")
      .as[Double].head() == 11.0)
    assert(spark.sql("SELECT dot_product(array(-0.1, 0.2), array(1D, 1D))")
      .as[Double].head() == 0.1 - 0.0) // decimal literals → double
    // array<string> must FAIL ANALYSIS: with ANSI off a malformed element
    // would cast to a null slot that the fused loop reads as 0.0 — the
    // silent-wrong-answer path this guard closes
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT dot_product(array('a', 'b'), array(1D, 2D))")
        .collect()
    }
    assert(e.getMessage.contains("numeric array elements"))
    // …but an EXPLICIT user cast from strings is respected (the user took
    // responsibility for the conversion)
    assert(spark.sql(
      """SELECT dot_product(CAST(array('1', '2') AS ARRAY<DOUBLE>),
                            array(3D, 4D))""").as[Double].head() == 11.0)
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

  test("bloom_probe: no false negatives, null key → false, codegen'd") {
    import spark.implicits._
    val dimKeys = (0L until 2000L).filter(_ % 7 == 0)
    val dim = dimKeys.toDF("k")
    val bf = dim.stat.bloomFilter("k", 1000, 0.03)
    val baos = new java.io.ByteArrayOutputStream()
    bf.writeTo(baos)
    graft.functions.BloomProbe.register(spark)
    // spark.range, not a local Seq: ConvertToLocalRelation would fold a
    // filter over a LocalRelation away at plan time, hiding the probe
    val probed = spark.range(0, 2000).toDF("k")
      .withColumn("hit", call_function("bloom_probe",
        lit(baos.toByteArray), col("k")))
    val hits = probed.filter(col("hit")).select("k").as[Long].collect().toSet
    // every true member MUST pass (false negatives would drop join rows)
    assert(dimKeys.forall(hits.contains), "bloom false negative")
    // the sketch must actually prune: ~3% fpp on the 1714 non-members
    assert(hits.size < 600, s"no pruning happened: ${hits.size} hits")
    // null key probes to false, not null — safe directly under WHERE
    val nullProbe = Seq[Option[Long]](None).toDF("k")
      .withColumn("hit", call_function("bloom_probe",
        lit(baos.toByteArray), col("k")))
      .select("hit").collect()
    assert(nullProbe.head.getBoolean(0) == false)
    // whole-stage codegen keeps the probe in the generated code path
    val plan = probed.filter(col("hit")).queryExecution.executedPlan.toString
    assert(plan.contains("bloom_probe"), plan)
  }

  test("bloom_probe: string keys round-trip the same hash as the builder") {
    import spark.implicits._
    val dim = Seq("alpha", "beta", "gamma").toDF("s")
    val bf = dim.stat.bloomFilter("s", 100, 0.01)
    val baos = new java.io.ByteArrayOutputStream()
    bf.writeTo(baos)
    graft.functions.BloomProbe.register(spark)
    val hits = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
      .toDF("s")
      .filter(call_function("bloom_probe", lit(baos.toByteArray), col("s")))
      .as[String].collect().toSet
    assert(Set("alpha", "beta", "gamma").subsetOf(hits))
  }

  test("BloomJoin.semiJoin ≡ plain semi join, probe sits at the fact scan") {
    import spark.implicits._
    // range-backed fact so the probe survives as a physical Filter
    val fact = spark.range(0, 5000)
      .select(col("id").as("k"), (col("id") % 97).as("v"))
    val dim = (0L until 5000L by 13).toDF("dk")
    val pruned = graft.operators.BloomJoin
      .semiJoin(fact, "k", dim, "dk", expectedItems = 1000)
    val plain = fact.join(dim.select(col("dk").as("k")), Seq("k"), "left_semi")
    assert(pruned.collect().toSet == plain.collect().toSet)
    // the bloom filter must run BEFORE the exchange: in the physical plan
    // the probe appears below the semi-join, directly over the scan
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_probe"), plan)
  }

  test("BloomJoin.semiJoinAutoSized ≡ plain semi join (sketch sized from dim)") {
    import spark.implicits._
    val fact = spark.range(0, 5000)
      .select(col("id").as("k"), (col("id") % 97).as("v"))
    val dim = (0L until 5000L by 13).toDF("dk")
    val pruned = graft.operators.BloomJoin.semiJoinAutoSized(fact, "k", dim, "dk")
    val plain = fact.join(dim.select(col("dk").as("k")), Seq("k"), "left_semi")
    assert(pruned.collect().toSet == plain.collect().toSet)
  }

  test("bloom_probe: wrong arity fails analysis with WRONG_NUM_ARGS, not IOOBE") {
    graft.functions.BloomProbe.register(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(1).selectExpr("bloom_probe(id)").collect()
    }
    assert(e.getMessage.contains("bloom_probe"), e.getMessage)
    assert(e.getMessage.contains("2"), e.getMessage)
  }

  test("md5_60 equals the composed conv(substr(md5)) spelling on every input shape") {
    import spark.implicits._
    // deterministic mixed corpus: ascii, unicode (multi-byte utf-8),
    // empties, whitespace, long strings, digits — the fused digest-byte
    // path must match the hex-string-slice path bit-for-bit everywhere
    val rnd = new scala.util.Random(7)
    val rows = (Seq("", " ", "a", "café com leite", "日本語テキスト",
      "x" * 5000, "line\nbreak\ttab", "ß", "0123456789abcdef") ++
      Seq.fill(500)(rnd.alphanumeric.take(1 + rnd.nextInt(40)).mkString))
      .toDF("s")
    val diff = rows.selectExpr(
      "md5_60(s) AS fused",
      "cast(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT) AS composed")
      .filter(col("fused") =!= col("composed")).count()
    assert(diff == 0)
    // null in → null out, like md5
    val n = Seq((Option.empty[String])).toDF("s")
      .selectExpr("md5_60(s) AS h").head()
    assert(n.isNullAt(0))
    // non-negative by construction (60 bits < 63)
    val neg = rows.selectExpr("md5_60(s) AS h").filter(col("h") < 0).count()
    assert(neg == 0)
    // codegen path actually exercised: a local relation folds to
    // LocalTableScan, so force a real stage with a repartition
    val df = rows.repartition(2).selectExpr("md5_60(s)")
    df.collect() // drive THIS plan to execution so AQE finalizes it
    // AQE prints a codegen'd stage as the `*(n)` prefix on its operators
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(finalPlan.contains("*(1) Project"),
      s"md5_60 projection fell out of whole-stage codegen:\n$finalPlan")
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
