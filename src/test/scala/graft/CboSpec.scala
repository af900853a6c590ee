package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{GraftSession, QueryEngine}

/** CBO statistics harvest (≙ reference statistics_manager.cpp): catalog
  * tables + ANALYZE give the plan tree real row estimates.
  */
class CboSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("analyzed catalog yields rowCount estimates in the plan tree") {
    GraftSession.ensureAnalyzedCatalog(spark, TestSpark.sfDir)
    // temp views (registered by other suites) would shadow the catalog tables
    Seq("nation", "region").foreach(spark.catalog.dropTempView(_))
    val rep = QueryEngine.run(spark,
      "EXPLAIN SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey")
    assert(rep.planTree.contains("rows=25"), rep.planTree)
    assert(!rep.planTree.split("\n").exists(_.contains("rows=?")), rep.planTree)
  }

  test("embeddings is a stats-backed catalog table (scalar columns analyzed)") {
    GraftSession.ensureAnalyzedCatalog(spark, TestSpark.sfDir)
    if (spark.catalog.tableExists("embeddings") &&
        spark.sessionState.catalog.getTempView("embeddings").isDefined)
      spark.catalog.dropTempView("embeddings")
    val stats = spark.table("default.embeddings")
      .queryExecution.optimizedPlan.stats
    assert(stats.rowCount.exists(_.toLong > 0), s"embeddings rowCount missing: $stats")
    val df = spark.sql(
      "SELECT e.vec_id FROM embeddings e JOIN embeddings f ON e.vec_id = f.vec_id WHERE e.label = 0")
    val joinStats = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j.stats
    }
    assert(joinStats.nonEmpty && joinStats.head.rowCount.isDefined,
      s"embeddings self-join should carry a CBO row estimate, got $joinStats")
  }

  test("events is a stats-backed catalog table serving µs timestamps") {
    GraftSession.ensureAnalyzedCatalog(spark, TestSpark.sfDir)
    val events = spark.table("default.events")
    val stats = events.queryExecution.optimizedPlan.stats
    assert(stats.rowCount.exists(_.toLong > 0), s"events rowCount missing: $stats")
    // the CTAS copy must carry the ns→µs conversion, not raw BIGINT nanos
    assert(events.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    val fromCatalog = spark.sql("SELECT MIN(ts) AS m FROM default.events").head.getTimestamp(0)
    val fromReader = GraftSession.table(spark, TestSpark.sfDir, "events")
      .agg(org.apache.spark.sql.functions.min("ts").as("m")).head.getTimestamp(0)
    assert(fromCatalog == fromReader, "catalog events diverged from the read-side conversion")
  }

  test("ensureAnalyzedCatalog re-points tables when the data dir changes") {
    GraftSession.ensureAnalyzedCatalog(spark, TestSpark.sfDir)
    // a same-named TEMP VIEW must neither shadow the staleness check nor
    // get dropped in the catalog table's place (unqualified DROP TABLE
    // resolves temp-view-first)
    GraftSession.table(spark, TestSpark.sfDir, "customer").createOrReplaceTempView("customer")
    val n1 = spark.sql("SELECT COUNT(*) AS n FROM default.customer").collect()(0).getLong(0)
    // point the catalog at a different scale factor: the stale table must
    // be dropped and recreated, not silently served from the old location
    GraftSession.ensureAnalyzedCatalog(spark, "/root/testdata/sf0.01")
    val n2 = spark.sql("SELECT COUNT(*) AS n FROM default.customer").collect()(0).getLong(0)
    assert(n2 > n1, s"sf0.01 customer ($n2) must exceed sf0.001 ($n1)")
    assert(spark.catalog.tableExists("customer"), "temp view must survive the re-point")
    spark.catalog.dropTempView("customer")
    // second call with the SAME dir is a no-op (no re-analyze churn)
    GraftSession.ensureAnalyzedCatalog(spark, "/root/testdata/sf0.01")
    // restore for other suites
    GraftSession.ensureAnalyzedCatalog(spark, TestSpark.sfDir)
  }

  test("startup catalog listing renders every table with row count and sorted typed columns") {
    GraftSession.ensureAnalyzedCatalog(spark, TestSpark.sfDir)
    val listing = GraftSession.catalogListing(spark)
    assert(listing.startsWith("Loaded tables:"), listing.take(80))
    // all 10 tables present, each with an ANALYZEd (numeric) row count
    GraftSession.tableNames.foreach { n =>
      assert(s"(?m)^  $n \\(rows: \\d+\\)$$".r.findFirstIn(listing).isDefined,
        s"missing or stats-less table $n in:\n$listing")
    }
    // known-cardinality dims: exact counts, independent of scale factor
    assert(listing.contains("  nation (rows: 25)"), listing)
    assert(listing.contains("  region (rows: 5)"), listing)
    // columns are name-sorted with types
    assert(listing.contains("    - n_name (string)"))
    assert(listing.contains("    - ts (timestamp)"), "events must list the µs-converted ts")
    val nationCols = listing.linesIterator.dropWhile(!_.startsWith("  nation "))
      .drop(1).takeWhile(_.startsWith("    - ")).toSeq
    assert(nationCols == nationCols.sorted, s"nation columns not sorted: $nationCols")
  }

  test("CBO join estimation produces a row estimate for the join node") {
    GraftSession.ensureAnalyzedCatalog(spark, TestSpark.sfDir)
    Seq("customer", "orders").foreach(v => if (spark.catalog.tableExists(v))
      spark.catalog.dropTempView(v))
    val df = spark.sql(
      "SELECT c.c_name FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey WHERE c.c_acctbal > 0")
    val joinStats = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j.stats
    }
    assert(joinStats.nonEmpty && joinStats.head.rowCount.isDefined,
      s"join should have a CBO row estimate, got $joinStats")
  }
}
