package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out join patterns: key salting for skew and bucketing for
  * shuffle-free co-located joins. On local[32] these are exercised for
  * correctness and plan shape; on a 1000-executor cluster they are the
  * difference between a straggler-bound job and an even one.
  */
object ScaleOps {

  /** Equi-join where `skewed`'s key distribution is heavily skewed: spread
    * each hot key over `saltFactor` sub-keys and replicate the (small) dim
    * side per salt, so one executor no longer owns an entire hot key.
    * (AQE's skew-join split handles sort-merge cases adaptively; explicit
    * salting also covers hash aggregations and pre-AQE plans.)
    */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, skewedKey: String,
      dimKey: String, saltFactor: Int): DataFrame = {
    // pmod(x, 0) is NULL (not an error) in non-ANSI contexts and
    // sequence(0, -1) DESCENDS — a non-positive factor would silently
    // return an empty join instead of failing
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    // salt must be DETERMINISTIC per row: a nondeterministic source
    // (monotonically_increasing_id, rand) re-evaluates differently when a
    // lost map task reruns, while surviving reducers keep rows fetched
    // under the old values — the SPARK-23207 duplicate/loss class. Hash of
    // the row's own columns is stable across retries; rows identical in
    // every column co-locate on one salt, which is fine (they are
    // indistinguishable anyway).
    // xxhash64 rejects MapType inputs at analysis (map iteration order is
    // undefined): hash only the hashable columns. If every column is a
    // map, fall back to the join key — constant per hot key, so salting
    // degrades to a plain join (correct, just unmitigated) instead of
    // failing a pipeline the un-salted join would have run.
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val hashCols = skewed.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64((if (hashCols.nonEmpty) hashCols else Array(col(skewedKey))): _*),
        lit(saltFactor)).cast("int"))
    val dimExp = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(dimExp,
        salted(skewedKey) === dimExp(dimKey) && salted("__salt") === dimExp("__salt"))
      .drop("__salt")
  }

  /** Persist `df` as a bucketed+sorted catalog table. Two tables bucketed
    * on their join keys with the same bucket count join WITHOUT a shuffle —
    * the co-located-join layout for repeatedly-joined 100 TB fact tables.
    *
    * @param warehouseDir parent directory for the table data; production
    *        deployments pass a durable (DFS) location — the default is a
    *        local scratch path suited to tests only
    */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
      numBuckets: Int, warehouseDir: String = "/tmp/graft-warehouse"): Unit = {
    // a '/' in the name would escape warehouseDir via the path concat
    require(!tableName.contains("/"), s"tableName must not contain '/': $tableName")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCol).sortBy(bucketCol)
      .option("path", s"$warehouseDir/$tableName")
      .saveAsTable(tableName)
  }

  /** Write partitioned by a low-cardinality column — the layout that turns
    * partition-key filters into directory pruning (no data read at all).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
}
