package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BloomFilterOps, BloomHash}
import graft.operators.Dedup

class BloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def keys(n: Int, seed: Long): Seq[Long] =
    (0 until n).map(i => BloomHash.h1(i.toLong + seed))

  test("no false negatives, ever: every inserted key probes true") {
    val ks = keys(2000, seed = 11L)
    val words = BloomFilterOps.buildBloom(
      ks.toDF("h").repartition(8), col("h"), numBits = 1L << 16, numHashes = 7)
    assert(ks.forall(BloomHash.mightContain(words, 7, _)))
  }

  test("false-positive rate lands near the sizing identity") {
    // n=2000 keys in m=2^16 bits, k=7: p = (1 - e^(-kn/m))^7 ~ 0.1%.
    // 20k probes of non-inserted keys should see well under 1%.
    val ks = keys(2000, seed = 11L)
    val words = BloomFilterOps.buildBloom(
      ks.toDF("h"), col("h"), numBits = 1L << 16, numHashes = 7)
    val fp = keys(20000, seed = 999999L).count(BloomHash.mightContain(words, 7, _))
    assert(fp < 200, s"FP rate too high: $fp / 20000")
  }

  test("partitioning-invariant build: OR-merge makes the bit array exact") {
    val ks = keys(500, seed = 3L)
    val one = BloomFilterOps.buildBloom(
      ks.toDF("h").coalesce(1), col("h"), numBits = 1L << 12, numHashes = 5)
    val many = BloomFilterOps.buildBloom(
      ks.toDF("h").repartition(16), col("h"), numBits = 1L << 12, numHashes = 5)
    assert(one.sameElements(many))
  }

  test("probe expression: codegen'd filter agrees with the driver-side probe") {
    val inserted = keys(300, seed = 7L)
    val words = BloomFilterOps.buildBloom(
      inserted.toDF("h"), col("h"), numBits = 1L << 14, numHashes = 6)
    val probes = (inserted ++ keys(3000, seed = 424242L)).distinct
    val sparkSide = probes.toDF("h")
      .filter(BloomFilterOps.bloomMightContain(words, 6, col("h")))
      .as[Long].collect().toSet
    val driverSide = probes.filter(BloomHash.mightContain(words, 6, _)).toSet
    assert(sparkSide == driverSide)
    assert(inserted.toSet.subsetOf(sparkSide)) // one-sided error
  }

  test("null keys probe to null, not a crash or a match") {
    val words = BloomFilterOps.buildBloom(
      keys(10, 1L).toDF("h"), col("h"), numBits = 1L << 10, numHashes = 4)
    val out = Seq[java.lang.Long](1L, null).toDF("h")
      .select(BloomFilterOps.bloomMightContain(words, 4, col("h")).as("m"))
      .collect()
    assert(out.length == 2 && out(1).isNullAt(0))
  }

  test("bloomNgramContamination is output-identical to the unfiltered exact join") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta different tail"),
      (3L, "totally unrelated words about storage engines here"),
      (7L, "alpha beta gamma delta epsilon zeta eta IOTA"),   // eval (id%7==0)
      (14L, "no overlap with anything else in this corpus at all")
    ).toDF("doc_id", "text")
    val train = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
    val eval = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val exact = canon(Dedup.exactNgramContamination(train, eval, "doc_id", "text", n = 4))
    val bloom = canon(Dedup.bloomNgramContamination(train, eval, "doc_id", "text", n = 4,
      numBits = 1L << 12, numHashes = 5))
    assert(exact.nonEmpty && bloom == exact)
  }

  test("a deliberately tiny filter still loses nothing (FPs confirm-joined away)") {
    // 64 bits for dozens of grams: nearly everything probes true, the
    // confirm join must still produce the exact answer
    val docs = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (7L, "three four five six seven eight extra words here now")
    ).toDF("doc_id", "text")
    val train = docs.filter(col("doc_id") === 1L)
    val eval = docs.filter(col("doc_id") === 7L)
    val exact = Dedup.exactNgramContamination(train, eval, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val bloom = Dedup.bloomNgramContamination(train, eval, "doc_id", "text", n = 3,
      numBits = 64L, numHashes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(bloom == exact)
  }

  test("bloom states merge bit-exactly: any sharding/order/overlap rehydrates the from-scratch filter") {
    import graft.functions.BloomFilterOps
    val bits = 1L << 10
    val k = 5
    val keys = (1L to 300L).map(_ * 0x9E3779B97F4A7C15L).toDF("h")
    val whole = BloomFilterOps.buildBloom(keys, col("h"), bits, k).toSeq
    // 3-way shard, reversed order, and an OVERLAPPING shard (idempotent
    // OR): all rehydrate the identical word array
    val plain = (0 until 3).map(i =>
      BloomFilterOps.bloomState(keys.filter(pmod(col("h"), lit(3)) === i), col("h"), bits, k))
    Seq(plain, plain.reverse).foreach { order =>
      val words = BloomFilterOps.wordsFromState(
        BloomFilterOps.mergeBloomStates(order: _*), bits).toSeq
      assert(words == whole, "merged shard states != from-scratch filter")
    }
    val overlap = BloomFilterOps.mergeBloomStates(
      plain(0), plain(1), plain(2),
      BloomFilterOps.bloomState(keys.limit(50), col("h"), bits, k))
    assert(BloomFilterOps.wordsFromState(overlap, bits).toSeq == whole,
      "overlapping shard must be absorbed by idempotent OR")
    // decontamination through merged states equals the one-shot pipeline
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (5L, "gamma delta epsilon zeta unrelated tail words here"),
      (10L, "totally different text with no shared grams at all")
    ).toDF("doc_id", "text")
    val train = docs.filter(col("doc_id") === 1L)
    val eval = docs.filter(col("doc_id") =!= 1L)
    val st = Seq(5L, 10L).map(id => Dedup.bloomGramState(
      docs.filter(col("doc_id") === id), "doc_id", "text", n = 3, bits, k))
    val viaState = Dedup.bloomNgramContaminationWithFilter(
        train, eval, "doc_id", "text", n = 3, minShared = 1,
        BloomFilterOps.wordsFromState(BloomFilterOps.mergeBloomStates(st: _*), bits), k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val oneShot = Dedup.bloomNgramContamination(train, eval, "doc_id", "text",
        n = 3, numBits = bits, numHashes = k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(viaState.nonEmpty && viaState == oneShot)
  }

  test("mixed-geometry bloom states fail loudly instead of probing wrong") {
    import graft.functions.BloomFilterOps
    val keys = (1L to 100L).map(_ * 0x9E3779B97F4A7C15L).toDF("h")
    val a = BloomFilterOps.bloomState(keys, col("h"), 1L << 10, 5)
    val bBits = BloomFilterOps.bloomState(keys, col("h"), 1L << 12, 5)
    val bHashes = BloomFilterOps.bloomState(keys, col("h"), 1L << 10, 3)
    // the stamp is readable provenance
    assert(BloomFilterOps.bloomStateParams(a) == ((1L << 10, 5)))
    // merge across different num_bits or num_hashes must throw on action
    for (bad <- Seq(bBits, bHashes)) {
      val e = intercept[Exception] {
        BloomFilterOps.mergeBloomStates(a, bad).collect()
      }
      assert(e.getMessage != null, "expected a loud geometry-mismatch error")
    }
    // rehydrating at the wrong size must throw, not misplace bits
    val e2 = intercept[IllegalArgumentException] {
      BloomFilterOps.wordsFromState(a, 1L << 12)
    }
    assert(e2.getMessage.contains("num_bits"))
    // the merged frame carries the stamp forward
    assert(BloomFilterOps.bloomStateParams(
      BloomFilterOps.mergeBloomStates(a, a)) == ((1L << 10, 5)))
  }

  test("legacy (idx, word) states re-stamp and flow through the checked paths") {
    import graft.functions.BloomFilterOps
    val bits = 1L << 10
    val k = 5
    val keys = (1L to 200L).map(_ * 0x9E3779B97F4A7C15L).toDF("h")
    val stamped = BloomFilterOps.bloomState(keys, col("h"), bits, k)
    // simulate a pre-round-16 persisted frame: stamp columns absent
    val legacy = stamped.select(col("idx"), col("word"))
    val restamped = BloomFilterOps.stampLegacyBloomState(legacy, bits, k)
    assert(BloomFilterOps.bloomStateParams(restamped) == ((bits, k)))
    // the re-stamped frame merges with a native-stamped frame and
    // rehydrates the identical word array
    assert(BloomFilterOps.wordsFromState(
      BloomFilterOps.mergeBloomStates(restamped, stamped), bits).toSeq ==
      BloomFilterOps.buildBloom(keys, col("h"), bits, k).toSeq)
    // an already-stamped frame must NOT be silently re-stamped
    val e = intercept[IllegalArgumentException] {
      BloomFilterOps.stampLegacyBloomState(stamped, bits, k)
    }
    assert(e.getMessage.contains("already carries"))
    // a frame missing the word columns is rejected
    val e2 = intercept[IllegalArgumentException] {
      BloomFilterOps.stampLegacyBloomState(keys, bits, k)
    }
    assert(e2.getMessage.contains("idx"))
  }
}
