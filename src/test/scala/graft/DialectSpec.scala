package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the DuckDB→Spark dialect rewriters in [[SqlCrossCheck]] (pure
  * string transforms) plus the row normalizer `norm` (needs the shared
  * test session). The cross-check main is the end-to-end proof, while
  * this spec pins the tricky token-scanner edges — and the two norm
  * collision classes (NULL vs '' and cell-boundary aliasing) — that a
  * future rewrite could silently regress. */
class DialectSpec extends AnyFunSuite {

  test("QUALIFY on a projected window alias becomes an outer WHERE") {
    val in = "SELECT a, row_number() OVER (ORDER BY a) AS rn FROM t QUALIFY rn <= 3 ORDER BY a"
    val out = SqlCrossCheck.rewriteQualify(in)
    assert(out.contains("WHERE rn <= 3"))
    assert(out.contains("SELECT * FROM (SELECT"))
    // the tail ORDER BY stays outside the subquery
    assert(out.endsWith("ORDER BY a"))
  }

  test("QUALIFY with an inline OVER projects the predicate then drops it") {
    val in = "SELECT a FROM t QUALIFY row_number() OVER (ORDER BY a) = 1"
    val out = SqlCrossCheck.rewriteQualify(in)
    assert(out.contains("EXCEPT (__qp)"))
    assert(out.contains("AS __qp"))
  }

  test("QUALIFY predicate-end scan requires whole-word ORDER/LIMIT") {
    // identifiers CONTAINING the keywords must not truncate the predicate
    val in = "SELECT a, row_number() OVER (ORDER BY a) AS rn FROM t " +
      "QUALIFY rn <= order_cap ORDER BY a"
    val out = SqlCrossCheck.rewriteQualify(in)
    assert(out.contains("WHERE rn <= order_cap"),
      s"predicate truncated mid-identifier:\n$out")
    assert(out.endsWith("ORDER BY a"))
    val in2 = "SELECT a, rank() OVER (ORDER BY a) AS rk FROM t " +
      "QUALIFY rk < limit_n"
    val out2 = SqlCrossCheck.rewriteQualify(in2)
    assert(out2.contains("WHERE rk < limit_n"),
      s"predicate truncated mid-identifier:\n$out2")
  }

  test("nested QUALIFY inside a CTE subquery rewrites at its own depth") {
    val in = "WITH c AS (SELECT a FROM t QUALIFY rank() OVER (ORDER BY a) <= 2) SELECT * FROM c"
    val out = SqlCrossCheck.rewriteQualify(in)
    assert(!out.toUpperCase.contains("QUALIFY"))
    // the CTE's closing paren survives the rewrite
    assert(out.count(_ == '(') == out.count(_ == ')'))
  }

  test("bracket literal vs 1-based postfix indexing vs slicing") {
    assert(SqlCrossCheck.rewriteBrackets("SELECT [1, 2, 3] AS xs") ==
      "SELECT array(1, 2, 3) AS xs")
    // index is cast to INT: Spark element_at rejects BIGINT indices
    // (the tokenizer oracles compute them)
    assert(SqlCrossCheck.rewriteBrackets("SELECT xs[2] FROM t") ==
      "SELECT element_at(xs, CAST((2) AS INT)) FROM t")
    assert(SqlCrossCheck.rewriteBrackets("SELECT f(x)[1] FROM t") ==
      "SELECT element_at(f(x), CAST((1) AS INT)) FROM t")
    // 1-based inclusive slice → slice(expr, a, b-a+1)
    assert(SqlCrossCheck.rewriteBrackets("SELECT xs[2:5] FROM t") ==
      "SELECT slice(xs, 2, (5) - (2) + 1) FROM t")
    // ELSE [] is a literal, not indexing into the keyword
    assert(SqlCrossCheck.rewriteBrackets("CASE WHEN p THEN xs ELSE [] END") ==
      "CASE WHEN p THEN xs ELSE array() END")
    // brackets inside string literals are untouched
    assert(SqlCrossCheck.rewriteBrackets("SELECT '[1]' AS s") ==
      "SELECT '[1]' AS s")
  }

  test("full dialect pass keeps regex literals verbatim") {
    // Spark escape-processes '\s+' to 's+'; the rewriter must double it
    val out = SqlCrossCheck.toSparkDialect("SELECT regexp_extract(x, '\\s+') FROM t")
    assert(out.contains("'\\\\s+'"))
    // and DuckDB's default group 0 is made explicit (Spark defaults to 1)
    assert(out.contains(", 0)"))
  }

  test("strftime, epoch, and len spellings map name-for-name") {
    val out = SqlCrossCheck.toSparkDialect(
      "SELECT strftime(ts, '%Y-%m-%d %H:%M'), epoch(ts), len(xs) FROM t")
    assert(out.contains("date_format(ts, 'yyyy-MM-dd HH:mm')"))
    assert(out.contains("unix_micros(ts) / 1e6"))
    assert(out.contains("size(xs)"))
  }

  test("range arities map to empty-safe sequences; MATERIALIZED hint is stripped") {
    // half-open range(n)/range(a,b) → slice-of-sequence, through real
    // paren matching (the 2-arg bound nests a comma-bearing call)
    val out = SqlCrossCheck.toSparkDialect(
      "SELECT unnest(range(256)) AS b, range(1, least(n, 8) + 1) FROM t")
    assert(out.contains(
      "explode(slice(sequence(0, greatest(0, (256) - 1)), 1, " +
        "CAST(greatest((256) - (0), 0) AS INT)))"), out)
    assert(out.contains("sequence(1, greatest(1, (least(n, 8) + 1) - 1))"),
      out)
    // the empty boundary: DuckDB range(1, n) with n <= 1 is EMPTY, and
    // Spark sequence alone never is (it would count DOWN) — the
    // rewritten expression must evaluate to zero rows, not phantom
    // descending positions (the short-document shingle-oracle case)
    val spark = TestSession.spark
    Seq(0, 1, 2).foreach { n =>
      val rewritten = SqlCrossCheck.toSparkDialect(
        s"SELECT x FROM v, unnest(range(1, $n)) AS u(x)")
      spark.range(1).toDF("id").createOrReplaceTempView("v")
      val rows = spark.sql(rewritten).collect()
        .map(_.get(0).toString.toLong).toSeq
      assert(rows == (1L until n.toLong).toSeq,
        s"range(1, $n) rewrote to $rows via:\n$rewritten")
    }
    // the CTE MATERIALIZED evaluation hint is DuckDB-only syntax
    val cte = SqlCrossCheck.toSparkDialect(
      "WITH e AS MATERIALIZED (SELECT 1 AS x) SELECT * FROM e")
    assert(cte.contains("WITH e AS (SELECT"), cte)
  }

  test("shift operators rewrite to shiftleft/shiftright (Spark lexer breaks >> after an earlier array( constructor)") {
    // the raw operator form is a live Spark 4 parser hazard: an array(
    // earlier in the statement flips the lexer into nested-type mode
    // and a later >> is a PARSE_SYNTAX_ERROR — the combined cross-modal
    // oracle hit exactly this
    val spark = TestSession.spark
    intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      spark.sql("WITH a AS (SELECT array(0,1) AS x), " +
        "b AS (SELECT (6 >> 1) AS y) SELECT 1")
    }
    // operand extraction: parenthesized groups, calls, ::TYPE chains
    assert(SqlCrossCheck.rewriteShifts("(fp >> 16) & 65535")
      == "(shiftright(fp, 16)) & 65535")
    assert(SqlCrossCheck.rewriteShifts("bit << (b - 32)")
      == "shiftleft(bit, (b - 32))")
    assert(SqlCrossCheck.rewriteShifts(
        "((zc % 256) << CAST(frame * 16 AS INT))")
      == "(shiftleft((zc % 256), CAST(frame * 16 AS INT)))")
    assert(SqlCrossCheck.rewriteShifts("sum(1::BIGINT << (56 - mreg))")
      == "sum(shiftleft(1::BIGINT, (56 - mreg)))")
    // non-shift angle operators and quoted literals pass through
    assert(SqlCrossCheck.rewriteShifts("a <> b AND x <= y AND p >= q")
      == "a <> b AND x <= y AND p >= q")
    assert(SqlCrossCheck.rewriteShifts("'s >> t' AS lit")
      == "'s >> t' AS lit")
    // arrow-like operator tokens whose `>>` is NOT a shift (JSON
    // extract) pass through untouched instead of crashing extraction
    assert(SqlCrossCheck.rewriteShifts("doc ->> 'k' AS v")
      == "doc ->> 'k' AS v")
    // an unparenthesized compound RIGHT operand would silently change
    // precedence under the function rewrite (DuckDB: x >> (n + 1),
    // rewrite would emit shiftright(x, n) + 1) — must fail loudly
    intercept[IllegalArgumentException] {
      SqlCrossCheck.rewriteShifts("SELECT x >> n + 1 FROM t")
    }
    // the rewritten statement parses AND computes the same values
    val rewritten = SqlCrossCheck.toSparkDialect(
      "WITH a AS (SELECT unnest([0, 1]) AS x) " +
        "SELECT x, (5 >> 1) AS r, (x << 2) AS l FROM a ORDER BY x")
    val rows = spark.sql(rewritten).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq
    assert(rows == Seq((0, 2, 0), (1, 2, 4)), s"$rewritten -> $rows")
  }

  test("norm distinguishes NULL from empty string (planted drift → DISAGREE)") {
    val spark = TestSession.spark
    // a real drift where one engine returns NULL and the other '' must
    // not normalize to the same row text — that would report AGREE
    val a = SqlCrossCheck.norm(spark.sql("SELECT CAST(NULL AS STRING) AS c, 'x' AS d"))
    val b = SqlCrossCheck.norm(spark.sql("SELECT '' AS c, 'x' AS d"))
    assert(a != b, s"NULL and '' collided under norm: $a")
    // and NULL must not collide with the literal string "null" either
    val c = SqlCrossCheck.norm(spark.sql("SELECT 'null' AS c, 'x' AS d"))
    assert(a != c, s"NULL and 'null' collided under norm: $a")
  }

  test("norm separator kills cell-boundary aliasing") {
    val spark = TestSession.spark
    // ("ab","c") vs ("a","bc"): distinct rows whose concatenation is
    // identical without a separator
    val a = SqlCrossCheck.norm(spark.sql("SELECT 'ab' AS c, 'c' AS d"))
    val b = SqlCrossCheck.norm(spark.sql("SELECT 'a' AS c, 'bc' AS d"))
    assert(a != b, s"boundary aliasing under norm: $a")
  }
}
