package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and splitting for training-data pipelines.
  *
  * Everything is keyed on a hash of a stable id — never `rand()` — so
  * splits are reproducible run-to-run, stable under repartitioning, and
  * consistent when the same id reappears (late data, retries). All
  * per-row projections; zero shuffles except where a groupBy is the point.
  */
object SampleOps {

  /** Bucket 0..99 from a stable id — the split primitive. */
  def hashBucket(id: Column): Column = pmod(xxhash64(id), lit(100L))

  /** Add a `split` column: "train" for `trainPct`% of rows, else "test",
    * decided by id hash (clustered/sequential ids still split uniformly).
    */
  def deterministicSplit(df: DataFrame, idCol: String, trainPct: Int): DataFrame =
    df.withColumn("split",
      when(hashBucket(col(idCol)) < trainPct, "train").otherwise("test"))

  /** Keep ~`pct`% of rows, deterministically by id hash. */
  def hashSample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(idCol)) < pct)

  /** Deterministic stratified cap: at most `perStratum` rows per stratum,
    * chosen by id-hash order (not arrival order) so the sample is stable.
    * One shuffle on the stratum key — the groupBy-top-k shape, which AQE
    * skew-splits if a stratum is hot.
    */
  def stratifiedCap(df: DataFrame, stratumCol: String, idCol: String,
      perStratum: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(xxhash64(col(idCol)).asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perStratum)
      .drop("__rn")
  }
}
