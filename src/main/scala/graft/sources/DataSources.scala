package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File source/sink surface. The reference reads MySQL tables and prints to
  * stdout (SURVEY.md §2c: no file formats); a Spark-native engine gets the
  * full columnar/row format family. Parquet is the primary format (columnar,
  * predicate+projection pushdown, min/max skipping); ORC shares those
  * properties; CSV/JSON are interchange formats (schema-on-read, no
  * pushdown beyond partition pruning — keep them at the edges of a
  * pipeline, never in the middle).
  */
object DataSources {

  val formats: Seq[String] = Seq("parquet", "orc", "json", "csv")

  /** @param mode save mode; the default "error" (errorIfExists) makes
    *        clobbering an existing path an explicit caller decision
    *        (`mode = "overwrite"`), never a silent data loss
    */
  def write(df: DataFrame, path: String, format: String,
      partitionBy: Seq[String] = Nil, mode: String = "error"): Unit = {
    var w = df.write.mode(mode).format(format)
    if (format == "csv") w = w.option("header", "true")
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    w.save(path)
  }

  /** Read with an explicit schema where the format needs one (CSV/JSON
    * schema inference costs an extra full pass at 100 TB — never rely on it
    * in production paths).
    */
  def read(spark: SparkSession, path: String, format: String,
      schema: Option[StructType] = None): DataFrame = {
    var r = spark.read.format(format)
    if (format == "csv") r = r.option("header", "true")
    schema.foreach(s => r = r.schema(s))
    r.load(path)
  }

  /** Raw text-line corpus: one row per line (`value` string column) — the
    * ingestion format of plain-text LLM corpora. `wholetext = true` reads
    * one row per FILE instead (document-per-file layouts); at 100 TB
    * prefer line-oriented files, which split across tasks — a wholetext
    * file is one task no matter its size.
    */
  def readText(spark: SparkSession, path: String, wholetext: Boolean = false): DataFrame =
    spark.read.option("wholetext", wholetext.toString).text(path)

  /** Binary-file ingestion for multimodal corpora: one row per file with
    * (path, modificationTime, length, content) via Spark's `binaryFile`
    * source — the 100 TB path from image/audio files on disk into
    * [[graft.operators.Multimodal]]. `glob` prunes at LISTING time (e.g.
    * "*.png" — pruned files are never opened, unlike a post-read filter);
    * nested directory layouts are walked recursively. Each file must fit
    * in one row (`spark.sql.sources.binaryFile.maxLength`, default 2 GiB)
    * — shard larger media at write time.
    */
  def readBinaryFiles(spark: SparkSession, path: String,
      glob: Option[String] = None): DataFrame = {
    var r = spark.read.format("binaryFile")
    glob.foreach(g => r = r.option("pathGlobFilter", g))
    r.option("recursiveFileLookup", "true").load(path)
  }

  /** JSONL corpus ingestion with corrupt-record QUARANTINE — the web-crawl
    * reality at 100 TB: a few malformed lines per shard must neither kill
    * the job (FAILFAST) nor vanish silently (DROPMALFORMED loses data with
    * no ledger). PERMISSIVE mode parses what it can and lands the raw text
    * of each bad line in `corrupt` (NULL for good rows), so the pipeline
    * routes rows with one filter: `corrupt IS NULL` onward,
    * `corrupt IS NOT NULL` to a quarantine sink with the evidence intact.
    *
    * The schema is required, never inferred (inference is a full extra
    * pass, and a corrupt line would poison the inferred types).
    *
    * Known engine gotcha, handled here: Spark refuses a query that
    * references ONLY the corrupt column of a JSON scan (the parser would
    * have nothing to fail on — SPARK-21610), so quarantine counts must
    * ride a frame that also touches a real field; keep a data column in
    * any corrupt-only aggregation, as the spec demonstrates.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
      corruptCol: String = "corrupt"): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema already has a `$corruptCol` column — pick another corruptCol name")
    spark.read
      .schema(schema.add(corruptCol, org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
  }
}
