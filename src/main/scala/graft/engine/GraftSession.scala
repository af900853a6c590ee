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

  /** SPARK_GRAFT_CPUS parsed with a message naming the env var (the
    * SPARK_GRAFT_SUBSET discipline): a malformed value fails loudly and
    * actionably instead of surfacing as a bare NumberFormatException
    * from deep inside a main.
    */
  def envCpus(default: Int): Int = sys.env.get("SPARK_GRAFT_CPUS") match {
    case None => default
    case Some(v) =>
      val t = v.trim
      require(t.nonEmpty && t.length <= 4 && t.forall(_.isDigit) && t.toInt >= 1,
        s"SPARK_GRAFT_CPUS: expected a positive integer, got '$v'")
      t.toInt
  }

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
      // whole-stage-codegen class cache sized for this workload (round 19):
      // the default 100 entries is smaller than one sweep of the query
      // suite, so by the time the sf1 section re-runs an entry its
      // generated classes are evicted and the "steady-state" measurement
      // pays compile+JIT again — measured on d05: 281k ms task evicted-cold
      // vs 103k warm, three rounds of false `regressed` stamps. A static
      // conf, so it must be set before the session exists.
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      // reliable-checkpoint files (dedup pair materialization, CC rounds)
      // are written per call; without this they live until the app dies —
      // with it, the ContextCleaner removes a checkpoint's files once its
      // RDD is garbage-collected, so a long-running session stays bounded
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // a reliable checkpoint location makes Dedup.connectedComponents /
    // dedupCorpus default to fault-tolerant lineage truncation (an executor
    // loss under localCheckpoint kills an iterative job on a real cluster).
    // Honor an externally-set dir (spark.graft.checkpoint.dir, or a dir a
    // caller already set); otherwise a per-app temp dir — on a cluster this
    // conf would point at DFS
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      val external = spark.conf.getOption("spark.graft.checkpoint.dir")
      val dir = external.getOrElse {
        val tmp = java.nio.file.Files.createTempDirectory("graft-ckpt-")
        // WE created this scratch dir, so we also remove it at JVM exit
        // (the cleaner conf above bounds it DURING the session; this stops
        // repeated sessions littering /tmp). An externally-configured dir
        // is the caller's to manage.
        Runtime.getRuntime.addShutdownHook(new Thread(() =>
          try {
            java.nio.file.Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
              .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
          } catch { case _: Exception => () }))
        tmp.toString
      }
      spark.sparkContext.setCheckpointDir(dir)
    }
    spark
  }

  /** Read one testdata table. Filters/projections compose lazily on top, so
    * Catalyst pushes them into the parquet scan (PushedFilters/ReadSchema).
    *
    * `events.ts` has shipped as two physical types across driver testdata
    * generations — TIMESTAMP(NANOS) (which Spark's vectorized reader
    * rejects; `nanosAsLong` surfaces it as a raw ns long) and plain
    * TIMESTAMP(MICROS) without UTC adjustment (which Spark reads as
    * TIMESTAMP_NTZ). [[eventsTsToMicros]] normalizes EITHER to a
    * session-zone (UTC) microsecond timestamp, so every consumer sees one
    * ts type regardless of which generation is on disk.
    */
  /** Normalize `ts` to a microsecond TIMESTAMP, branching on the type the
    * scan produced:
    *  - ns-since-epoch LONG (nanos parquet under `nanosAsLong`): integral
    *    `div` 1000, NOT `/` — ns-since-epoch exceeds 2^53, so double
    *    division would round the microsecond (off-by-1µs vs DuckDB);
    *  - TIMESTAMP_NTZ (micros parquet, isAdjustedToUTC=false): cast to the
    *    session zone, which is pinned UTC in [[build]] — the same instant
    *    DuckDB's naive TIMESTAMP read yields;
    *  - TIMESTAMP: already normalized.
    * The single definition both the batch reader and
    * [[graft.streaming.StreamingOps.eventsStream]] apply, so batch and
    * stream cannot drift apart.
    */
  private[graft] def eventsTsToMicros(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Deterministic doc-subset replay mode (round 14, dev-only — the
    * driver never sets it): `SPARK_GRAFT_SUBSET=documents:16,embeddings:16`
    * thins the named tables to `key % N = 0` at the scan. Living HERE —
    * not in SparkEntry's t() — means every path to a table is covered
    * uniformly: DataFrame entries, SQL-text entries (registerFor's temp
    * views), and the dynamic ANN oracle generators. `check_oracle.py`'s
    * matching 4th argument applies the identical filter to its DuckDB
    * views. Bench warns and stamps env.subset when this is exported.
    */
  private val subsetKey = Map("documents" -> "doc_id", "embeddings" -> "vec_id")
  // eager validation: a malformed spec must fail loudly naming the env
  // var, and N must be >= 1 — pmod by zero yields NULL, which the filter
  // would silently drop to an EMPTY table (entries "pass" on no rows)
  private def subsetMod(table: String): Option[Long] =
    sys.env.get("SPARK_GRAFT_SUBSET").toSeq
      .flatMap(_.split(','))
      .filter(_.trim.nonEmpty)
      .map { part =>
        part.trim.split(':').map(_.trim) match {
          case Array(t, m) if m.nonEmpty && m.length <= 18 &&
              m.forall(_.isDigit) && m.toLong >= 1 =>
            (t, m.toLong)
          case _ => throw new IllegalArgumentException(
            s"SPARK_GRAFT_SUBSET: malformed part '$part' — expected table:N with N >= 1 " +
              "(e.g. documents:16,embeddings:16)")
        }
      }
      .collectFirst { case (t, m) if t == table => m }

  /** Apply the subset filter to ANY frame of the named table — shared by
    * [[table]] and callers that scan a table outside it (file streams).
    */
  def applySubset(name: String, df: DataFrame): DataFrame =
    (subsetMod(name), subsetKey.get(name)) match {
      case (Some(m), Some(key)) =>
        df.filter(org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.col(key),
          org.apache.spark.sql.functions.lit(m)) === 0)
      case _ => df
    }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val base =
      if (name == "events") {
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        eventsTsToMicros(spark.read.parquet(s"$dir/events.parquet"))
      } else spark.read.parquet(s"$dir/$name.parquet")
    applySubset(name, base)
  }

  /** Register every table as a temp view so `spark.sql` queries resolve —
    * the Spark analog of the reference's catalog bootstrap.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    tableNames.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))

  /** Register only the tables a SQL text references (word match) — avoids
    * paying footer reads for all 10 tables on every ad-hoc statement.
    */
  def registerFor(spark: SparkSession, dir: String, sql: String): Unit = {
    val lower = sql.toLowerCase
    tableNames.filter(n => s"\\b$n\\b".r.findFirstIn(lower).isDefined)
      .foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
  }

  /** Expose graft's native expressions to SQL users:
    * `minhash_signature(hashes, k)`, `dot_product(a, b)`,
    * `rolling_minhash(text, window)` become callable from any `spark.sql`
    * text and the CLI.
    */
  /** The native-function catalog shared by [[registerFunctions]] (per-
    * session temp registration) and [[GraftExtensions]] (the
    * `spark.sql.extensions` injection path a library user configures at
    * session build).
    */
  private[engine] val nativeFunctions: Seq[(String,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)] = {
    import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
    def arity(fn: String, es: Seq[Expression], n: Int): Unit =
      if (es.length != n) throw new IllegalArgumentException(
        s"$fn expects $n arguments, got ${es.length}")
    // positive, at analysis time: a non-positive k/window reaches the
    // expressions' per-row loops as a negative array size or index and
    // would crash EXECUTOR-side on the first row — the codebase rule is
    // that bad inputs fail at analysis, not at runtime
    def intArg(fn: String, e: Expression): Int = e match {
      case Literal(v: Int, _) =>
        if (v < 1) throw new IllegalArgumentException(s"$fn: expected a positive int, got $v")
        v
      case other => throw new IllegalArgumentException(s"$fn: expected int literal, got $other")
    }
    Seq(
      "minhash_signature" -> ((es: Seq[Expression]) => { arity("minhash_signature", es, 2)
        graft.functions.MinHashSignatureExpr(es.head, intArg("minhash_signature", es(1))) }),
      "dot_product" -> ((es: Seq[Expression]) => { arity("dot_product", es, 2)
        graft.functions.DotProductExpr(es.head, es(1)) }),
      "rolling_minhash" -> ((es: Seq[Expression]) => { arity("rolling_minhash", es, 2)
        graft.functions.RollingMinHashExpr(es.head, intArg("rolling_minhash", es(1))) }),
      "simhash" -> ((es: Seq[Expression]) => { arity("simhash", es, 1)
        graft.functions.SimHashTextExpr(es.head) }),
      "unit_norm" -> ((es: Seq[Expression]) => { arity("unit_norm", es, 1)
        graft.functions.UnitNormExpr(es.head) }),
      "match_fraction" -> ((es: Seq[Expression]) => { arity("match_fraction", es, 2)
        graft.functions.MatchFractionExpr(es.head, es(1)) }))
  }

  def registerFunctions(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    nativeFunctions.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }

  /** Tables safe to ANALYZE … FOR ALL COLUMNS (no array/ns-timestamp cols). */
  private val analyzableTables = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem", "documents")

  /** Create in-memory-catalog tables over the parquet files and harvest CBO
    * statistics — the direct analog of the reference's startup stats
    * harvest (`statistics_manager.cpp:9-142`: COUNT(*), COUNT(DISTINCT),
    * MIN/MAX, histograms). Populates `rowCount`/`ColumnStat` so plan trees
    * show real row estimates and CostBasedJoinReorder has numbers to work
    * with. Every table ends up stats-backed: embeddings takes scalar-column
    * stats only (the array column has none), and events is materialized
    * once per sfDir as a µs-timestamp managed table (its raw
    * TIMESTAMP(NANOS) parquet needs [[eventsTsToMicros]], so a
    * LOCATION-mapped table can't serve it).
    */
  def ensureAnalyzedCatalog(spark: SparkSession, dir: String): Unit = {
    // a table left over from a DIFFERENT sfDir must not survive: silently
    // serving the first directory's data (and stats) to a session that
    // asked for another is a wrong-results bug, not a cache hit.
    // Everything here is database-qualified — unqualified DROP/EXISTS
    // resolve to a same-named TEMP VIEW first (registerAll creates those),
    // which would drop the wrong object and keep the stale table alive
    def existsInCatalog(n: String) =
      spark.sessionState.catalog.tableExists(
        org.apache.spark.sql.catalyst.TableIdentifier(n, Some("default")))
    def ensure(n: String, analyzeSql: String): Unit = {
      if (existsInCatalog(n) && !tableAt(spark, n, s"$dir/$n.parquet"))
        spark.sql(s"DROP TABLE default.$n")
      if (!existsInCatalog(n)) {
        spark.sql(s"CREATE TABLE default.$n USING parquet LOCATION '$dir/$n.parquet'")
        spark.sql(analyzeSql)
      }
    }
    analyzableTables.foreach(n =>
      ensure(n, s"ANALYZE TABLE default.$n COMPUTE STATISTICS FOR ALL COLUMNS"))
    // embeddings: the array column takes no column stats, but vec_id/label
    // NDV+min/max and the table rowCount still feed CostBasedJoinReorder —
    // SQL over embeddings no longer plans stats-blind
    ensure("embeddings",
      "ANALYZE TABLE default.embeddings COMPUTE STATISTICS FOR COLUMNS vec_id, label")
    // events: materialize the ns→µs-converted frame as a MANAGED table
    // (CTAS into the warehouse) and ANALYZE it — the one table whose
    // catalog copy cannot just point at the source parquet. Staleness is
    // tracked via a table property carrying the source dir (tableAt's
    // location compare sees the warehouse path, not the sfDir).
    val srcProp = "graft.src.dir"
    def eventsFresh = existsInCatalog("events") &&
      (try spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("events", Some("default")))
        .properties.get(srcProp).contains(dir)
      catch { case _: Exception => false })
    if (existsInCatalog("events") && !eventsFresh) spark.sql("DROP TABLE default.events")
    if (!existsInCatalog("events")) {
      // the in-memory catalog forgets tables at session end but the
      // warehouse directory survives, and CTAS refuses a non-empty managed
      // location (LOCATION_ALREADY_EXISTS) — remove the previous session's
      // leftover files first
      val leftover = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), "events")
      val fs = leftover.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(leftover)) fs.delete(leftover, true)
      table(spark, dir, "events").write.saveAsTable("default.events")
      spark.sql(s"ALTER TABLE default.events SET TBLPROPERTIES ('$srcProp' = '$dir')")
      spark.sql("ANALYZE TABLE default.events COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    // registerAll/registerFor may have left same-named TEMP VIEWS for the
    // two tables whose catalog copies carry what the views lack (events'
    // µs conversion is in the CTAS data; embeddings' stats): a view would
    // silently shadow the stats-backed table for every SQL consumer. The
    // analyzable 8 keep user temp views untouched — same data either way,
    // and a caller's deliberate view (e.g. over a different dir) is theirs.
    Seq("events", "embeddings").foreach { n =>
      if (spark.sessionState.catalog.getTempView(n).isDefined)
        spark.catalog.dropTempView(n)
    }
  }

  /** Startup catalog listing — parity with the reference CLI's table dump
    * (`engine/src/cli.cpp:167-188`: every table with its row count and its
    * columns SORTED by name with types). Row counts come from the ANALYZEd
    * catalog ([[ensureAnalyzedCatalog]] must have run); the reference's
    * per-table index list has no Spark analog (parquet min/max + bloom
    * skipping replaces indexes), so no "Indexes:" block is printed.
    */
  def catalogListing(spark: SparkSession): String = {
    val cat = spark.sessionState.catalog
    val sb = new StringBuilder("Loaded tables:\n")
    cat.listTables("default").map(_.table).sorted.foreach { n =>
      val meta = cat.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(n, Some("default")))
      val rows = meta.stats.flatMap(_.rowCount).map(_.toString).getOrElse("?")
      sb.append(s"  $n (rows: $rows)\n")
      meta.schema.fields.sortBy(_.name).foreach(f =>
        sb.append(s"    - ${f.name} (${f.dataType.simpleString})\n"))
    }
    sb.toString
  }

  /** Does catalog table `n` point at `location`? (path compare, scheme- and
    * trailing-slash-insensitive)
    */
  private def tableAt(spark: SparkSession, n: String, location: String): Boolean = {
    def canon(p: String): String =
      p.stripPrefix("file:").replaceAll("/+$", "")
    try {
      val meta = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(n, Some("default")))
      meta.storage.locationUri.exists(u => canon(u.getPath) == canon(location))
    } catch { case _: Exception => false }
  }
}
