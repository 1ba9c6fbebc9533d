package graft

import org.apache.spark.sql.functions._
import graft.queries.Registry

/** Semantics checks for the event-analytics operators against complete
  * Scala-side recomputations (a second, engine-free oracle beside the
  * driver's DuckDB compare). */
class AnalyticsSpec extends SparkSpec {

  test("q_scd2 matches a full Scala-side run-collapse of the event stream") {
    val dir = "/root/testdata/sf0.001"
    val got = Registry.byName("q_scd2").fn(spark, dir)
      .select("user_id", "event_id", "event_type", "valid_from", "valid_to",
        "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getBoolean(5)))
      .toSeq

    // Independent oracle: collect raw events, sort per user by
    // (ts, event_id), collapse consecutive same-type runs, close each
    // interval with the next change's ts.
    val raw = Tables(spark, dir, "events")
      .select("user_id", "ts", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val expected = raw.groupBy(_._1).toSeq.flatMap { case (user, evs) =>
      val sorted = evs.sortBy(e => (e._2.getTime, e._3))
      val changes = sorted.zip(Option.empty[String] +: sorted.map(e => Some(e._4)))
        .collect { case (e, prev) if !prev.contains(e._4) => e }
      changes.zip(changes.drop(1).map(c => Some(c._2)) :+ None).map {
        case ((u, ts, id, tpe), nextTs) =>
          (u, id, tpe, ts, nextTs, nextTs.isEmpty)
      }
    }.sortBy(t => (t._1, t._4.getTime, t._2))

    assert(got.size == expected.size)
    assert(got == expected)
    // structural SCD2 invariants: per user exactly one open row, and
    // intervals tile (each valid_to equals the next valid_from)
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.count(_._6) == 1)
      rows.sliding(2).foreach {
        case Seq(a, b) => assert(a._5.contains(b._4))
        case _ => ()
      }
    }
  }

  test("q_decontaminate hit counts match string-shingle set intersection") {
    val dir = "/root/testdata/sf0.001"
    val got = Registry.byName("q_decontaminate").fn(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .map { case (id, hits, n) => id -> ((hits, n)) }
      .toMap

    // Independent oracle on RAW 3-gram strings (no hashing): the query
    // matches on 60-bit shingle hashes, so agreement here also certifies
    // the hash path introduced no collisions on this corpus.
    def shingles(text: String): Set[String] = {
      val t = text.trim.split("\\s+")
      if (t.length < 3) Set.empty
      else t.sliding(3).map(_.mkString(" ")).toSet
    }
    val docs = Tables(spark, dir, "documents")
      .withColumn("src_num", expr("cast(substring(source, 4, 8) AS INT)"))
      .select("doc_id", "text", "src_num")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val benchSet = docs.filter(_._3 >= 18).flatMap(d => shingles(d._2)).toSet
    val expected = docs.filter(_._3 < 18).flatMap { case (id, text, _) =>
      val sh = shingles(text)
      val hits = sh.count(benchSet.contains)
      if (hits >= 3) Some(id -> ((hits.toLong, sh.size.toLong))) else None
    }.toMap

    assert(got == expected)
    assert(got.nonEmpty) // the testdata plants cross-source duplicates
    // flagged docs are corpus-side only, ratios well-formed
    got.foreach { case (_, (hits, n)) => assert(hits >= 3 && hits <= n) }
  }
}
