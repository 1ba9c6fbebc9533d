package graft

import graft.queries.Registry

/** Contract checks on the driver-facing registry: names unique, every
  * query declared with an oracle, flagship entry wired, and every query
  * executable end-to-end at the smallest SF with deterministic output. */
class RegistrySpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    super.beforeAll()
    // q_ann_ivf / q_ann_pq fail fast without their trained models
    // (training is an explicit setup step, never part of a query) —
    // mirror Bench/Verify.
    graft.queries.SimilarityQueries.trainIvfCentroids(spark, sf)
    graft.queries.SimilarityQueries.trainIvfAssignments(spark, sf)
    graft.queries.SimilarityQueries.trainPqCodebooks(spark, sf)
    graft.queries.TextQueries.trainBpeMerges(spark, sf)
    graft.queries.TextQueries.trainUnigramPieces(spark, sf)
    graft.queries.DedupQueries.trainClusterLabels(spark, sf)
    graft.queries.MultimodalQueries.trainMediaClusterLabels(spark, sf)
  }

  test("query names are unique and non-empty") {
    val names = Registry.all.map(_.name)
    assert(names.nonEmpty && names.distinct.size == names.size)
  }

  test("every query has an oracle (t2 gate requires both)") {
    val missing = Registry.all.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("SparkEntry.entry returns rows at sf0.001 (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query runs and is deterministic across two runs") {
    Registry.all.foreach { q =>
      val a = q.fn(spark, sf)
      val n = a.count()
      withClue(s"${q.name}: ") {
        assert(n >= 0)
        // re-run → identical multiset of rows (no wall-clock/nondeterminism)
        val again = q.fn(spark, sf)
        assert(a.collect().toSeq.map(_.toString).sorted ==
          again.collect().toSeq.map(_.toString).sorted)
      }
    }
  }

  test("oracle column aliases match Spark result columns") {
    // The driver sorts columns by name before hashing — a name drift is an
    // automatic mismatch even with identical values. Cheap structural guard:
    // every Spark result column name must appear in the oracle SQL text.
    Registry.all.foreach { q =>
      val cols = q.fn(spark, sf).columns
      val sql = q.oracle.get.toLowerCase
      val missing = cols.filterNot(c => sql.contains(c.toLowerCase))
      withClue(s"${q.name}: columns missing from oracle SQL: ") {
        assert(missing.isEmpty, missing.mkString(","))
      }
    }
  }

  test("OPERATORS.md is the current render of the registry (regenerate on drift)") {
    // the manual is generated, but generated files still drift if the
    // regen step is forgotten — sbt runs tests from the repo root, so
    // render against the same sources and compare bytes
    val committed = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("OPERATORS.md")), "UTF-8")
    assert(OperatorManual.render(".") == committed,
      "OPERATORS.md is stale — run `sbt \"runMain graft.OperatorManual\"`")
  }
}
