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
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val dimExp = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(dimExp,
        salted(skewedKey) === dimExp(dimKey) && salted("__salt") === dimExp("__salt"))
      .drop("__salt")
  }

  /** Persist `df` as a bucketed+sorted catalog table. Two tables bucketed
    * on their join keys with the same bucket count join WITHOUT a shuffle —
    * the co-located-join layout for repeatedly-joined 100 TB fact tables.
    */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
      numBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCol).sortBy(bucketCol)
      .option("path", s"/tmp/graft-warehouse/$tableName")
      .saveAsTable(tableName)

  /** Write partitioned by a low-cardinality column — the layout that turns
    * partition-key filters into directory pruning (no data read at all).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
}
