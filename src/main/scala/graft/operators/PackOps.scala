package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: lay documents out in a
  * deterministic concatenated token stream and chunk it into fixed
  * `tokenBudget` training sequences (the GPT-style concat-and-chunk step
  * between dedup and the trainer).
  *
  * Scale design: a single global ordering would funnel the whole corpus
  * through ONE window partition — the classic driver-shaped bottleneck.
  * Instead docs are hash-sharded and each shard packs independently
  * (window per shard), so 100 TB packs with `shards`-way parallelism and
  * one shuffle; a sequence is identified by (shard, seq_no). Chunk
  * boundaries fall mid-document exactly as in real pretraining pipelines —
  * the op reports each doc's STARTING (sequence, offset) in its shard's
  * stream; the consumer slicing the token stream carries the remainder
  * into the next sequence.
  */
object PackOps {

  /** Assign every doc its (shard, seq_no, seq_offset) in the packed layout.
    *
    * Deterministic: order within a shard is (orderHash(id), id) — stable
    * under repartitioning and re-runs, never arrival order. Docs with NULL
    * text pack as zero-length (they occupy no budget but keep their slot,
    * so ids never silently vanish from the layout).
    *
    * @param tokenBudget tokens per training sequence (e.g. 2048)
    * @param shards      independent packing streams; at scale set to
    *                    O(cluster parallelism) — each shard is one window
    *                    partition
    * @param orderHash   id→order-key hash (xxhash64 default;
    *                    [[SampleOps.md5OrderHash]] for oracle-replayable
    *                    layouts)
    * @return (idCol, shard, seq_no, seq_offset, n_tokens)
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      tokenBudget: Int, shards: Int = 256,
      orderHash: Column => Column = xxhash64(_)): DataFrame = {
    require(tokenBudget >= 1, s"tokenBudget must be >= 1, got $tokenBudget")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__oh").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(idCol), col(textCol))
      .withColumn("__oh", orderHash(col(idCol)))
      .withColumn("shard", pmod(col("__oh"), lit(shards.toLong)).cast("int"))
      .withColumn("n_tokens",
        when(col(textCol).isNotNull, size(TextOps.tokens(col(textCol)))).otherwise(0))
      .withColumn("__off", coalesce(sum(col("n_tokens").cast("long")).over(w), lit(0L)))
      // integral div/mod, never double division: shard offsets at 100 TB
      // exceed the 2^53 range where a double quotient silently rounds
      .select(col(idCol), col("shard"),
        expr(s"__off div $tokenBudget").as("seq_no"),
        pmod(col("__off"), lit(tokenBudget.toLong)).as("seq_offset"),
        col("n_tokens"))
  }
}
