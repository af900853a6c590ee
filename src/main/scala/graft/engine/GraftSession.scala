package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session + catalog bootstrap (SURVEY.md §7 step 1).
  *
  * Mirrors the reference's startup stats harvest
  * (`engine/src/statistics_manager.cpp:9-142`: SHOW TABLES + COUNT(*) +
  * DESCRIBE + SHOW INDEX against live MySQL) with Spark's native
  * equivalents: parquet-footer schemas and Catalyst CBO statistics.
  *
  * Scale design: every conf here is chosen for a real cluster, tested on
  * local[32]. AQE handles runtime re-planning (skew joins, partition
  * coalescing); CBO + join reorder replicates the reference's DP join
  * enumeration (`sqlopt.cpp:607-670`) natively.
  */
object GraftSession {

  /** All driver testdata tables (TESTDATA.md). */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at any scale factor. */
  val broadcastableDims: Set[String] = Set("region", "nation")

  def build(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.sql.statistics.histogram.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Read one testdata table. Filters/projections compose lazily on top, so
    * Catalyst pushes them into the parquet scan (PushedFilters/ReadSchema).
    *
    * `events.ts` is TIMESTAMP(NANOS) in parquet, which Spark's vectorized
    * reader rejects; read it as a long and truncate to microseconds — the
    * same ns→us truncation DuckDB applies when casting to TIMESTAMP.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // integral `div`, NOT `/`: ns-since-epoch exceeds 2^53, so double
      // division would round the microsecond (off-by-1µs vs DuckDB)
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view so `spark.sql` queries resolve —
    * the Spark analog of the reference's catalog bootstrap.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    tableNames.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
