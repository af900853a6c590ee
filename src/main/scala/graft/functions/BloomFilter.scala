package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Deterministic Bloom filter over 64-bit keys: distributed build as a
  * typed [[Aggregator]] (partial bit-arrays OR-merge — map-side combine
  * applies, the shuffle carries one `m/64`-word array per partition, never
  * rows), probe as a codegen'd Catalyst expression over the broadcast
  * word array.
  *
  * This is the sketch behind web-scale decontamination/dedup pipelines
  * (Dolma, RedPajama, CCNet): build the filter once from the SMALL side
  * (an eval benchmark's n-grams), ship its few MBs to every executor, and
  * prune the 100 TB train-side stream BEFORE it reaches any shuffle. The
  * filter's one-sided error makes the composition exact: "not contained"
  * is certain, so rows it drops can never be true matches, and the false
  * positives that survive are removed by the exact confirm join that
  * follows ([[graft.operators.Dedup.bloomNgramContamination]]).
  *
  * Hashing is double hashing from two splitmix64 finalizers
  * (h_i = h1 + i·h2, h2 forced odd so the stride walks every residue of
  * the power-of-two bit space) — the standard Kirsch–Mitzenmacher
  * construction, deterministic across JVMs/partitionings, so a filter
  * built on one cluster replays bit-identically anywhere.
  */
object BloomHash {

  /** splitmix64 finalizer with the seed folded in — two different seeds
    * give the two independent hash streams double hashing needs.
    */
  private def mix(key: Long, seed: Long): Long = {
    var z = key + seed
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def h1(key: Long): Long = mix(key, 0x9E3779B97F4A7C15L)

  /** Forced odd: for power-of-two `m` an even stride would only ever touch
    * half the bit positions.
    */
  def h2(key: Long): Long = mix(key, 0xC2B2AE3D27D4EB4FL) | 1L

  /** Set key's k bits. `words.length * 64` must be a power of two. */
  def set(words: Array[Long], numHashes: Int, key: Long): Unit = {
    val mask = words.length.toLong * 64L - 1L
    val a = h1(key); val b = h2(key)
    var i = 0
    while (i < numHashes) {
      val bit = (a + i.toLong * b) & mask
      words((bit >>> 6).toInt) |= (1L << (bit & 63L))
      i += 1
    }
  }

  /** Probe key's k bits — false is CERTAIN absence, true may be a false
    * positive. Called from generated code ([[BloomMightContainExpr]]).
    */
  def mightContain(words: Array[Long], numHashes: Int, key: Long): Boolean = {
    val mask = words.length.toLong * 64L - 1L
    val a = h1(key); val b = h2(key)
    var i = 0
    while (i < numHashes) {
      val bit = (a + i.toLong * b) & mask
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63L))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Distributed Bloom build: `reduce` sets bits per input key, `merge` ORs
  * partial word arrays. Registered through [[functions.udaf]], it runs as
  * an ObjectHashAggregate with map-side partials — the shuffle moves one
  * bit-array per partition, so build cost is one scan of the keyed input
  * plus a constant-size merge, independent of row count.
  *
  * @param numBits filter width m; must be a power of two >= 64. Size by
  *   the standard identity m ≈ -n·ln(p)/(ln 2)², e.g. 1e9 distinct grams
  *   at 1% FP → ~1.2 GB; an eval benchmark's ~1e6 grams at 0.1% → ~1.8 MB.
  * @param numHashes k; optimal k = (m/n)·ln 2 (sizing table in scaladoc
  *   above — 5–10 covers the practical range).
  */
class BloomAggregator(numBits: Long, numHashes: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
    s"numBits must be a power of two >= 64, got $numBits")
  require(numBits / 64 <= Int.MaxValue.toLong, s"numBits too large for one array: $numBits")
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def zero: Array[Long] = new Array[Long]((numBits / 64).toInt)

  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    BloomHash.set(buf, numHashes, key); buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** `might_contain(key)` over a driver-held word array, codegen'd to two
  * multiplies and k masked loads per row — the train-side 100 TB stream
  * pays this instead of a shuffle. The array rides the generated class as
  * a reference object (one copy per executor via the closure broadcast,
  * not per row).
  */
case class BloomMightContainExpr(child: Expression, words: Array[Long], numHashes: Int)
    extends UnaryExpression {
  require(words.nonEmpty && (words.length & (words.length - 1)) == 0,
    s"words.length must be a power of two >= 1, got ${words.length}")
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects a BIGINT key, got ${other.simpleString}")
    }

  override def nullSafeEval(key: Any): Any =
    BloomHash.mightContain(words, numHashes, key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = BloomHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val wordsRef = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.mightContain($wordsRef, $numHashes, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomFilterOps {

  /** Build a Bloom filter from a BIGINT key column and return its word
    * array on the driver. The array is SMALL by construction (numBits/8
    * bytes — the whole point of the sketch); collecting it is the same
    * bounded driver hop as collecting a broadcast-join build side.
    */
  def buildBloom(df: DataFrame, keyCol: Column, numBits: Long, numHashes: Int): Array[Long] = {
    val agg = udaf(new BloomAggregator(numBits, numHashes), Encoders.scalaLong)
    val row = df.select(agg(keyCol)).head()
    row.getSeq[Long](0).toArray
  }

  def bloomMightContain(words: Array[Long], numHashes: Int, key: Column): Column =
    ColumnBridge.column(BloomMightContainExpr(ColumnBridge.expression(key), words, numHashes))

  /** Persisted Bloom shard state: the shard's filter as (idx, word) rows —
    * numBits/64 rows however large the shard, the
    * [[graft.operators.Profile.numericProfileState]] discipline applied to
    * the membership sketch. BIT-EXACT mergeable, not just
    * guarantee-preserving: each key's set bits are a deterministic
    * function of the key alone and OR is associative/commutative/
    * idempotent, so [[mergeBloomStates]] over any sharding, order, tree
    * shape — or overlapping shards — equals the filter built from the
    * unioned keys bit for bit (BloomSpec pins it; the p21 entry pins the
    * composed decontamination under the driver gate). A decontamination
    * pipeline persists one state per eval-benchmark revision: adding a
    * benchmark sketches ITS keys only, and the union filter is one
    * numBits/64-row aggregate away — no re-scan of the other benchmarks.
    *
    * Every row carries the filter geometry (`num_bits`, `num_hashes`) as
    * provenance (round 16): a state built with a different geometry would
    * OR bits at WRONG positions and probe as silent false negatives — the
    * one error the word arrays alone cannot self-detect — so
    * [[mergeBloomStates]] and [[wordsFromState]] check the stamp and turn
    * that silence into a loud error.
    */
  def bloomState(df: DataFrame, keyCol: Column, numBits: Long, numHashes: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, posexplode}
    val agg = udaf(new BloomAggregator(numBits, numHashes), Encoders.scalaLong)
    df.select(agg(keyCol).as("__w"))
      .select(posexplode(col("__w")).as(Seq("idx", "word")),
        lit(numBits).as("num_bits"), lit(numHashes).as("num_hashes"))
  }

  /** OR-fold any number of [[bloomState]] frames built with the SAME
    * (numBits, numHashes) — one word-keyed aggregate over numBits/64-row
    * slivers, never the keyed data. Mixed geometries fail LOUDLY on the
    * first action (one 1-row provenance aggregate broadcast back — the
    * scalar-stats idiom) instead of merging into silent false negatives;
    * the merged frame carries the shared stamp forward so chained merges
    * and [[wordsFromState]] stay checkable.
    */
  def mergeBloomStates(states: DataFrame*): DataFrame = {
    import org.apache.spark.sql.functions._
    require(states.nonEmpty, "mergeBloomStates needs at least one state")
    val all = states.reduce(_.unionByName(_))
    val prov = all.agg(
      min(col("num_bits")).as("__bmin"), max(col("num_bits")).as("__bmax"),
      min(col("num_hashes")).as("__hmin"), max(col("num_hashes")).as("__hmax"))
    all.groupBy(col("idx")).agg(expr("bit_or(word)").as("word"))
      // assert_true inside a FILTER: a dropped check column would be
      // pruned away unevaluated, a filter cannot be
      .crossJoin(broadcast(prov))
      .filter(assert_true(
        col("__bmin") === col("__bmax") && col("__hmin") === col("__hmax"),
        concat(lit("mergeBloomStates: mixed filter geometry — num_bits ["),
          col("__bmin"), lit(", "), col("__bmax"), lit("], num_hashes ["),
          col("__hmin"), lit(", "), col("__hmax"),
          lit("]; merging would probe as silent false negatives"))).isNull)
      .select(col("idx"), col("word"),
        col("__bmax").as("num_bits"), col("__hmax").as("num_hashes"))
  }

  /** Migration shim for pre-stamp persisted states: stamp a legacy
    * (idx, word)-only frame with a CALLER-SUPPLIED geometry so it flows
    * through the checked [[mergeBloomStates]]/[[wordsFromState]] paths.
    * The caller asserts the geometry — it is provenance the legacy frame
    * never recorded, so it can only come from the pipeline that built
    * it. A frame that already carries a stamp is rejected rather than
    * silently re-stamped (overwriting real provenance with a wrong
    * claim is exactly the silent-false-negative hole the stamp closed).
    */
  def stampLegacyBloomState(state: DataFrame, numBits: Long, numHashes: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
      s"numBits must be a power of two >= 64, got $numBits")
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    val cols = state.columns.toSet
    require(!cols.contains("num_bits") && !cols.contains("num_hashes"),
      "state already carries a (num_bits, num_hashes) stamp — re-stamping would " +
        "overwrite recorded provenance; use the frame as-is")
    require(cols.contains("idx") && cols.contains("word"),
      s"legacy state needs (idx, word) columns, got ${state.columns.mkString(", ")}")
    state.select(col("idx"), col("word"),
      lit(numBits).as("num_bits"), lit(numHashes).as("num_hashes"))
  }

  /** The (numBits, numHashes) geometry stamped on a state frame — for
    * probe sites that need to match their `numHashes` argument to the
    * build's (a mismatch drops true matches silently).
    */
  def bloomStateParams(state: DataFrame): (Long, Int) = {
    import org.apache.spark.sql.functions.col
    val rows = state.select(col("num_bits").cast("long"),
      col("num_hashes").cast("int")).distinct().collect()
    require(rows.length == 1,
      s"state carries ${rows.length} distinct (num_bits, num_hashes) stamps — expected exactly 1")
    (rows(0).getLong(0), rows(0).getInt(1))
  }

  /** Rehydrate a state frame into the probe-side word array — the same
    * bounded driver hop as [[buildBloom]]'s (numBits/8 bytes, the sketch's
    * whole point). Rows absent from the state read as zero words, so a
    * state thinned of empty words rehydrates identically. The state's
    * stamped `num_bits` must equal the requested size: rehydrating a
    * smaller-geometry state into a larger array would place every bit at
    * a wrong position and probe as silent false negatives.
    */
  def wordsFromState(state: DataFrame, numBits: Long): Array[Long] = {
    import org.apache.spark.sql.functions.col
    require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
      s"numBits must be a power of two >= 64, got $numBits")
    require(numBits / 64 <= (1L << 27),
      s"numBits=$numBits rehydrates over 1 GiB on the driver — too large for a probe array")
    val words = new Array[Long]((numBits / 64).toInt)
    state.select(col("idx").cast("int"), col("word").cast("long"),
        col("num_bits").cast("long")).collect()
      .foreach { r =>
        require(r.getLong(2) == numBits,
          s"state was built with num_bits=${r.getLong(2)} but is being rehydrated at " +
            s"$numBits — bits would land at wrong positions (silent false negatives)")
        words(r.getInt(0)) = r.getLong(1)
      }
    words
  }
}
