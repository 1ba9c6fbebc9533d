package graft

import org.apache.spark.sql.functions._

/** Semantics checks for the near-dup family on constructed corpora where
  * ground truth is known exactly. */
class DedupSpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Word-3-gram Jaccard of two texts, computed in plain Scala. */
  private def jaccard(a: String, b: String): Double = {
    def sh(s: String) = s.trim.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    val (sa, sb) = (sh(a), sh(b))
    sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  test("shingle jaccard pair join finds an exact duplicate at 1.0") {
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val df = docs(Seq((0L, t), (1L, t), (2L, "completely different words here entirely unrelated stuff")))
      .selectExpr("doc_id", "split(trim(text), '\\\\s+') AS t")
      .selectExpr("doc_id",
        """explode(array_distinct(transform(sequence(0, size(t) - 3),
             i -> concat_ws(' ', t[i], t[i+1], t[i+2])))) AS s""")
    val sizes = df.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = df.as("a").join(df.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("c"))
      .join(sizes.as("sa"), col("i") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("j") === col("sb.doc_id"))
      .select(col("i"), col("j"),
        (col("c") / (col("sa.n") + col("sb.n") - col("c"))).as("jc"))
      .collect()
    assert(pairs.length == 1)
    assert(pairs(0).getLong(0) == 0L && pairs(0).getLong(1) == 1L)
    assert(pairs(0).getDouble(2) == 1.0)
  }

  test("scala-side jaccard oracle agrees with itself on near-dup edit") {
    val a = "a b c d e f g h i j"
    val b = "a b c d e f g h i k" // one token changed
    // shingles: 8 each, 7 shared → 7/9
    assert(math.abs(jaccard(a, b) - 7.0 / 9.0) < 1e-12)
  }

  test("portable 60-bit hash is stable and collision-spread") {
    import spark.implicits._
    val hashes = (0 until 1000).map(i => s"token_$i").toDF("s")
      .selectExpr("cast(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT) AS h")
      .as[Long].collect()
    assert(hashes.distinct.length == 1000) // no collisions on 1k tokens
    assert(hashes.forall(h => h >= 0 && h < (1L << 60)))
  }

  test("simhash of identical token multisets is identical (hamming 0)") {
    import spark.implicits._
    val tok = Seq((0L, "x y z x"), (1L, "x y z x"), (2L, "p q r s t u v w"))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "explode(split(trim(text), '\\\\s+')) AS s")
      .selectExpr("doc_id",
        "cast(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT) AS h")
    val bitSums = (0 until 48).map(b =>
      expr(s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END)").as(s"bs$b"))
    val simExpr = (0 until 48).map(b =>
      s"(CASE WHEN bs$b >= 0 THEN ${1L << b}L ELSE 0L END)").mkString(" + ")
    val sigs = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .selectExpr("doc_id", s"cast($simExpr AS BIGINT) AS sh")
      .orderBy("doc_id").select("sh").as[Long].collect()
    assert(sigs(0) == sigs(1))
    assert(java.lang.Long.bitCount(sigs(0) ^ sigs(2)) > 3) // different docs far apart
  }
}
