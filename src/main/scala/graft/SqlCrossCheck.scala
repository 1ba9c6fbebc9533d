package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.queries.SimilarityQueries

/** Third-engine opinion: re-execute each oracle's ANSI SQL through
  * `spark.sql` (where the dialect allows) and diff against the DataFrame
  * plan's rows. The driver's DuckDB compare can only FLAG Spark/DuckDB
  * drift via a hash mismatch; when DataFrame-Spark, SQL-Spark and DuckDB
  * all agree, a drift report localizes to the engine pair that broke.
  *
  * Dialect policy: the oracle SQL is written for DuckDB, so only
  * mechanical, semantics-preserving rewrites are applied before handing
  * it to Spark —
  *  - the shared events snippet (DuckDB `* REPLACE` ns→µs truncation)
  *    becomes the plain view name; the view itself is registered from
  *    [[Tables]], which applies the identical truncation;
  *  - `read_parquet('dir/….parquet')` becomes Spark's
  *    ``parquet.`dir` `` table syntax;
  *  - `list_dot_product` becomes the engine's registered `dot_product`
  *    (bit-identical by FunctionsSpec);
  *  - DuckDB's hex-string cast `CAST(concat('0x', x) AS BIGINT)` (or the
  *    `'0x' || x` spelling) becomes
  *    Spark's spelling of the same conversion, `CAST(conv(x, 16, 10) AS
  *    BIGINT)` (Spark casts '0x…' strings to NULL instead of parsing);
  *  - `AS VARCHAR)` becomes `AS STRING)` (same type, Spark rejects the
  *    unparameterized VARCHAR spelling).
  * Everything else must parse as-is or the query is reported
  * DIALECT-INCOMPATIBLE (DuckDB-only surface: QUALIFY, `::TYPE` casts,
  * list lambdas, unnest-with-alias, …). No result is ever "fixed up" —
  * rows either match exactly under the driver's own normalization
  * (columns sorted by name, floats to 9 significant digits, rows
  * sorted) or the query is a DISAGREE.
  *
  * Usage: `sbt "runMain graft.SqlCrossCheck /root/testdata/sf0.01 SQL_CROSSCHECK.md"`
  */
object SqlCrossCheck {

  private def norm(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    val proj = df.select(cols.map(c => col(s"`$c`")): _*)
    proj.collect().map { r =>
      cols.indices.map { i =>
        r.get(i) match {
          // control-char marker (U+0001): a NULL must not collide with a data string
          // "null" — that collision would mask a real drift as AGREE
          case null => ""
          case d: java.lang.Double => f"${d.doubleValue()}%.9g"
          case f: java.lang.Float => f"${f.floatValue()}%.9g"
          case x => x.toString
        }
      }.mkString("")
    }.sorted.toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outPath = if (args.length > 1) args(1) else "SQL_CROSSCHECK.md"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions.local(cpus)
    SimilarityQueries.trainIvfCentroids(spark, sfDir)
    SimilarityQueries.trainPqCodebooks(spark, sfDir)
    graft.queries.TextQueries.trainBpeMerges(spark, sfDir)
    // one view per testdata table, through the SAME read path as the
    // DataFrame queries (events ns→µs truncation included)
    Tables.names.foreach { n =>
      Tables(spark, sfDir, n).createOrReplaceTempView(n)
    }
    val eventsSnippet = graft.queries.OracleSources.events
    val readParquet = """read_parquet\('([^']+)/\*\.parquet'\)""".r
    // non-greedy to the FIRST ") AS BIGINT)" — the capture is the full
    // nested hex-producing expression; both DuckDB concat spellings.
    // CONSTRAINT: the captured expression must not itself contain an
    // "AS BIGINT)" cast (the capture would cut short and garble the
    // rewrite) — today every hex oracle nests only "AS VARCHAR" casts,
    // which the STRING rewrite above has already renamed
    val hexCast = """(?s)CAST\(concat\('0x', (.*?)\) AS BIGINT\)""".r
    val hexCast2 = """(?s)CAST\('0x' \|\| (.*?) AS BIGINT\)""".r
    var agree, differ, incompatible, planErr = 0
    val lines = SparkEntry.oracleSql.toSeq.sortBy(_._1).map {
      case (name, sql0) =>
        val sql = hexCast2.replaceAllIn(hexCast.replaceAllIn(
          readParquet.replaceAllIn(
            sql0.replace(eventsSnippet, "events")
              .replace(SimilarityQueries.IvfCentroidsToken,
                SimilarityQueries.ivfModelPath(sfDir))
              .replace(SimilarityQueries.PqCodebooksToken,
                SimilarityQueries.pqModelPath(sfDir))
              .replace(graft.queries.TextQueries.BpeMergesToken,
                graft.queries.TextQueries.bpeModelPath(sfDir))
              .replace("list_dot_product", "dot_product")
              .replace(" AS VARCHAR)", " AS STRING)"),
            m => s"parquet.`${m.group(1)}`"),
          m => s"CAST(conv(${java.util.regex.Matcher.quoteReplacement(m.group(1))}, 16, 10) AS BIGINT)"),
          m => s"CAST(conv(${java.util.regex.Matcher.quoteReplacement(m.group(1))}, 16, 10) AS BIGINT)")
        def firstLine(e: Throwable): String = {
          val m = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
          m.linesIterator.find(_.trim.nonEmpty).getOrElse("").take(120)
        }
        val planned =
          try Right(norm(SparkEntry.queries(name)(spark, sfDir)))
          catch { case e: Throwable => Left(firstLine(e)) }
        val viaSql =
          try Right(norm(spark.sql(sql)))
          catch { case e: Throwable => Left(firstLine(e)) }
        (planned, viaSql) match {
          case (Left(e), _) =>
            planErr += 1
            s"| $name | PLAN-ERROR | $e |"
          case (_, Left(e)) =>
            incompatible += 1
            s"| $name | DIALECT-INCOMPATIBLE | $e |"
          case (Right(a), Right(b)) if a == b =>
            agree += 1
            s"| $name | AGREE | ${a.size} rows |"
          case (Right(a), Right(b)) =>
            differ += 1
            val diff = a.zip(b).indexWhere { case (x, y) => x != y }
            val where =
              if (diff >= 0) s"first diff at sorted row $diff"
              else "common prefix equal; row-count difference"
            s"| $name | **DISAGREE** | df=${a.size} sql=${b.size} rows, $where |"
        }
    }
    val total = agree + differ + incompatible + planErr
    val report = new StringBuilder
    report.append("# SQL dialect cross-check\n\n")
    report.append(s"sf dir: `$sfDir` — each oracle's SQL re-run through " +
      "`spark.sql` and diffed against the DataFrame plan (third engine " +
      "opinion next to the driver's DuckDB compare).\n\n")
    report.append(s"**$agree/$total agree; $differ disagree; " +
      s"$incompatible DuckDB-only dialect (not runnable on Spark); " +
      s"$planErr plan errors.**\n\n")
    report.append("A DISAGREE here with a green DuckDB hash would mean " +
      "DataFrame-Spark and DuckDB agree but SQL-Spark differs — a Spark " +
      "SQL dialect gap, not an engine bug; the reverse localizes a real " +
      "drift." + (if (differ == 0) " Current state: zero disagreements."
                  else s" Current state: $differ DISAGREE — investigate.") +
      "\n\n")
    report.append("| query | status | detail |\n|---|---|---|\n")
    lines.foreach(l => report.append(l).append('\n'))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
      report.toString)
    println(s"[crosscheck] $agree agree / $differ disagree / " +
      s"$incompatible incompatible / $planErr plan errors → $outPath")
    spark.stop()
    if (differ + planErr > 0) sys.exit(1)
  }
}
