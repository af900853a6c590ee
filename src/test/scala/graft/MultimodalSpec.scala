package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = Seq((1L, "abcdefghij"), (2L, "xy"), (3L, "")).toDF("doc_id", "text")

  test("attachBinary round-trips the payload bytes with metadata") {
    val rows = Multimodal.attachBinary(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> new String(r.getAs[Array[Byte]](1), "UTF-8")).toMap
    assert(rows(1L) == "abcdefghij" && rows(3L) == "")
  }

  test("decode extracts deterministic byte features (fallback path)") {
    val feats = Multimodal.featurize(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(feats(1L) == 10 && feats(2L) == 2 && feats(3L) == 0)
  }

  test("featurize carries metadata through the decode pass: one scan, zero joins") {
    val feats = Multimodal.featurize(docs, "doc_id", "text")
    assert(!feats.queryExecution.executedPlan.toString.contains("Join"),
      "featurize must not join back for metadata")
    val r1 = feats.filter(col("doc_id") === 1L).collect().head
    assert(r1.getInt(4) == 2 && r1.getInt(5) == 2) // width = 1%640+1, height = 1%480+1
  }

  test("resize fallback caps metadata at the target and thins the payload") {
    val out = Multimodal.resize(
        Multimodal.attachBinary(docs, "doc_id", "text"), 2, 2)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Array[Byte]](1).length, r.getInt(2), r.getInt(3))).toMap
    val (len1, w1, h1) = out(1L)
    assert(w1 <= 2 && h1 <= 2 && len1 >= 1 && len1 <= 10)
    assert(out(3L)._1 == 0) // empty payload: take(1) of nothing stays empty
  }

  test("frameSample slices fixed-stride frames and keeps every Nth") {
    val frames = Multimodal.frameSample(
        Multimodal.attachBinary(docs, "doc_id", "text"), 4, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        new String(r.getAs[Array[Byte]](3), "UTF-8")))
    // doc 1: 10 bytes -> frames 0,1,2 (4,4,2 bytes); keep 0 and 2
    assert(frames.toSet == Set((1L, 0, "abcd"), (1L, 2, "ij"), (2L, 0, "xy")))
  }

  test("frameSample rejects non-positive stride/step instead of returning empty") {
    val wb = Multimodal.attachBinary(docs, "doc_id", "text")
    // frameBytes = 0: length/0 -> Infinity -> int cast wraps negative ->
    // every row filtered; everyN = 0: pmod NULL filters every row — both
    // must fail loudly, not produce a silent zero-frame result
    intercept[IllegalArgumentException](Multimodal.frameSample(wb, 0, 2))
    intercept[IllegalArgumentException](Multimodal.frameSample(wb, 4, 0))
  }

  test("attachBinary normalizes an int id to the long the decode schema declares") {
    val intId = Seq((1, "abc"), (2, "de")).toDF("doc_id", "text")
    val feats = Multimodal.featurize(intId, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(feats == Map(1L -> 3, 2L -> 2))
  }

  test("real PNG decode end-to-end: readBinaryFiles -> fromBinaryFiles -> decode") {
    // two generated PNGs: a 8x5 solid (40,80,120) and a 3x7 gray ramp —
    // written through javax.imageio (lossless), read back through the full
    // binary-ingestion pipeline; dimensions and mean pixel must be
    // pixel-true, not the metadata zeros fromBinaryFiles carries
    val dir = java.nio.file.Files.createTempDirectory("graft-png-").toFile
    def writePng(name: String, w: Int, h: Int, rgb: (Int, Int, Int) => Int): Unit = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y, 0))
      javax.imageio.ImageIO.write(img, "png", new java.io.File(dir, name))
    }
    writePng("solid.png", 8, 5, (_, _, _) => (40 << 16) | (80 << 8) | 120)
    writePng("ramp.png", 3, 7, (x, y, _) => { val g = 10 * (x + y); (g << 16) | (g << 8) | g })
    // a non-image payload with an image extension must FALL BACK, not fail
    java.nio.file.Files.write(new java.io.File(dir, "broken.png").toPath,
      "not a png at all".getBytes("UTF-8"))
    try {
      val feats = Multimodal.decode(Multimodal.fromBinaryFiles(
          graft.sources.DataSources.readBinaryFiles(spark, dir.getAbsolutePath,
            glob = Some("*.png"))))
        .collect().map(r => r.getInt(4) -> r).toMap // keyed by width
      val solid = feats(8)
      assert(solid.getInt(5) == 5, "solid height")
      assert(solid.getDouble(6) == 80.0, s"solid mean pixel: ${solid.getDouble(6)}")
      val ramp = feats(3)
      assert(ramp.getInt(5) == 7, "ramp height")
      // mean gray of 10*(x+y) over 3x7 = 10 * (mean x + mean y) = 10 * (1 + 3)
      assert(ramp.getDouble(6) == 40.0, s"ramp mean pixel: ${ramp.getDouble(6)}")
      val broken = feats(0) // fallback keeps meta width 0
      assert(broken.isNullAt(6), "undecodable bytes must fall back to NULL mean_pixel")
      assert(broken.getInt(1) == 16, "byte stats still computed on the fallback path")

      // real resize: bilinear downscale of the 8x5 solid to 4x4 — output
      // payload must be a decodable PNG with the target dims and the solid
      // color intact (bilinear of a constant field is the constant)
      val resized = Multimodal.resize(Multimodal.fromBinaryFiles(
          graft.sources.DataSources.readBinaryFiles(spark, dir.getAbsolutePath,
            glob = Some("solid.png"))), 4, 4)
        .collect().head
      assert(resized.getInt(2) == 4 && resized.getInt(3) == 4,
        s"resize dims: ${resized.getInt(2)}x${resized.getInt(3)}")
      val thumb = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(resized.getAs[Array[Byte]](1)))
      assert(thumb != null && thumb.getWidth == 4 && thumb.getHeight == 4,
        "resized payload must be a real decodable PNG")
      assert((thumb.getRGB(2, 2) & 0xFFFFFF) == ((40 << 16) | (80 << 8) | 120),
        "solid color must survive bilinear resampling")
    } finally {
      dir.listFiles.foreach(_.delete()); dir.delete()
    }
  }

  test("perceptualHash: aHash near for a re-encoded copy, far for the inverse, md5 fallback") {
    def png(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    // left-half dark / right-half bright; a resized copy keeps the
    // structure (and the aHash); the inverse flips every bit
    def half(dark: Int, bright: Int)(w: Int): (Int, Int) => Int =
      (x, _) => if (x < w / 2) (dark << 16) | (dark << 8) | dark
                else (bright << 16) | (bright << 8) | bright
    val base = png(64, 64, half(20, 220)(64))
    val copy = png(32, 32, half(20, 220)(32)) // re-encoded at half size
    val inverse = png(64, 64, half(220, 20)(64))
    val fake = "not an image".getBytes("UTF-8")
    val rows = Seq((1L, base, "png"), (2L, copy, "png"), (3L, inverse, "png"),
      (4L, fake, "fake/rgb8"), (5L, null.asInstanceOf[Array[Byte]], "png"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, b, f) =>
        org.apache.spark.sql.Row(id, b,
          org.apache.spark.sql.Row(Int.box(0), Int.box(0), f)) }),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.types.StructField("meta", org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("width", org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("height", org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("format", org.apache.spark.sql.types.StringType)))))))
    val got = Multimodal.perceptualHash(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val (h1, h2, h3) = (got(1L).getLong(1), got(2L).getLong(1), got(3L).getLong(1))
    assert(got(1L).getBoolean(2) && got(2L).getBoolean(2) && got(3L).getBoolean(2))
    assert(ham(h1, h2) <= 3, s"re-encoded copy must hash near: ${ham(h1, h2)}")
    assert(ham(h1, h3) >= 32, s"inverse must hash far: ${ham(h1, h3)}")
    // fallback: md5-hex-prefix 60-bit, the DuckDB-replayable stand-in
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(fake).take(8).map(b => f"${b & 0xff}%02x").mkString
    assert(!got(4L).getBoolean(2) &&
      got(4L).getLong(1) == java.lang.Long.parseLong(hex.substring(0, 15), 16))
    assert(got(5L).isNullAt(1) && got(5L).isNullAt(2), "null payload propagates nulls")
  }

  test("audioFrameEnergy: hand-computed u8 energies, ragged tail, empty clip") {
    // "ab" as u8 PCM: (97-128)² + (98-128)² = 961 + 900 = 1861
    val clips = Seq((1L, "ab"), (2L, "abcd"), (3L, "")).toDF("doc_id", "text")
    val got = Multimodal.audioFrameEnergy(
        Multimodal.attachBinary(clips, "doc_id", "text"),
        frameLen = 2, silenceThreshold = 1000L)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(got((1L, 0)) == ((1861L, false)))
    // doc 2 frame 1 = "cd": (99-128)² + (100-128)² = 841 + 784 = 1625
    assert(got((2L, 1)) == ((1625L, false)))
    assert(!got.keys.exists(_._1 == 3L), "zero-length clip emits zero frames")
    // ragged tail: frameLen 3 over 4 bytes -> frame 1 is just "d" = 784, silent
    val ragged = Multimodal.audioFrameEnergy(
        Multimodal.attachBinary(clips.filter(col("doc_id") === 2L), "doc_id", "text"),
        frameLen = 3, silenceThreshold = 1000L)
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(ragged(1) == ((784L, true)), ragged)
  }

  test("audioFrameEnergy composes to silence trim as one groupBy") {
    // '~' = 126 sits next to the u8 midpoint: a "~~~" frame has energy
    // 3·(126-128)² = 12 (silence); "abc" = 961+900+841 = 2702 (voiced)
    val clips = Seq((1L, "~~~abc~~~")).toDF("doc_id", "text")
    val trim = Multimodal.audioFrameEnergy(
        Multimodal.attachBinary(clips, "doc_id", "text"),
        frameLen = 3, silenceThreshold = 1000L)
      .filter(!col("silent"))
      .groupBy(col("doc_id"))
      .agg(min(col("frame_no")).as("first_voiced"), max(col("frame_no")).as("last_voiced"))
      .collect().head
    assert(trim.getInt(1) == 1 && trim.getInt(2) == 1)
  }

  test("sceneCuts: hand-computed SSDs, ragged tail pair, short clips emit no rows") {
    // frameBytes=2 over "aacc": pair (aa,cc) SSD = 2·(99-97)² = 8
    val clips = Seq((1L, "aacc"), (2L, "aaaz"), (3L, "ab"), (4L, ""))
      .toDF("doc_id", "text")
    val got = Multimodal.sceneCuts(
        Multimodal.attachBinary(clips, "doc_id", "text"),
        frameBytes = 2, cutThreshold = 100L)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(got((1L, 1)) == ((8L, false)), got.toString)
    // "aaaz": pair (aa, az) SSD = 0 + (122-97)² = 625 > 100 -> cut
    assert(got((2L, 1)) == ((625L, true)))
    assert(!got.keys.exists(k => k._1 == 3L || k._1 == 4L),
      "single-frame and empty clips have no pairs")
    // ragged tail: frameBytes=3 over "abcd" -> pair (abc, d): (100-97)² = 9,
    // only the overlapping byte is compared
    val ragged = Multimodal.sceneCuts(
        Multimodal.attachBinary(clips.filter(col("doc_id") === 1L)
          .select(col("doc_id"), lit("abcd").as("text")), "doc_id", "text"),
        frameBytes = 3, cutThreshold = 100L)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(ragged == Map(1 -> 9L), ragged)
    // scenes-per-clip composes as 1 + sum(cut)
    val scenes = Multimodal.sceneCuts(
        Multimodal.attachBinary(Seq((7L, "aazzaazz")).toDF("doc_id", "text"),
          "doc_id", "text"),
        frameBytes = 2, cutThreshold = 100L)
      .groupBy(col("doc_id"))
      .agg((lit(1L) + sum(col("cut").cast("long"))).as("n_scenes"))
      .collect().head
    assert(scenes.getLong(1) == 4L, "three cuts over aa|zz|aa|zz -> 4 scenes")
  }

  test("speechSegments: islands of voiced frames, silence split, all-silent empty") {
    // frameLen=3 over "~~~abc~~~abc~~~": '~'=126 -> energy 12 (silent);
    // "abc" -> 2702 (voiced). Voiced frames 1 and 3 are separate islands
    val clips = Seq((1L, "~~~abc~~~abc~~~"), (2L, "abcdef"), (3L, "~~~~~~"))
      .toDF("doc_id", "text")
    val got = Multimodal.speechSegments(
        Multimodal.attachBinary(clips, "doc_id", "text"),
        frameLen = 3, silenceThreshold = 1000L)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getInt(2), r.getInt(3), r.getLong(4)))).toMap
    assert(got((1L, 1)) == ((1, 1, 1L)) && got((1L, 2)) == ((3, 3, 1L)), got.toString)
    // fully voiced clip: one segment spanning both frames
    assert(got((2L, 1)) == ((0, 1, 2L)), got.toString)
    assert(!got.keys.exists(_._1 == 3L), "all-silent clip has no segments")
    assert(got.size == 3)
  }

  test("videoNearDupPairs: planted full twin found at overlap 1.0, partial overlap exact, distinct-frame counting, guards") {
    import org.apache.spark.sql.functions.col
    // three "videos" as ASCII payloads, 4-byte frames, every frame kept:
    //   v1: ABCD|EFGH|IJKL   (3 frames)
    //   v2: ABCD|EFGH|IJKL   (full twin of v1)
    //   v3: ABCD|ABCD|ZZZZ   (shares ONE distinct frame with v1/v2, twice)
    val docs = Seq(
      (1L, "ABCDEFGHIJKL"), (2L, "ABCDEFGHIJKL"), (3L, "ABCDABCDZZZZ"))
      .toDF("doc_id", "text")
    val sigs = Multimodal.videoFrameSignatures(
      Multimodal.attachBinary(docs, "doc_id", "text"), frameBytes = 4, everyN = 1)
    assert(sigs.count() == 9)
    val got = Multimodal.videoNearDupPairs(sigs, maxHamming = 0, blockBits = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    // full twin: 3 matched pairs, all 3 frames on both sides, overlap 1.0
    assert(got((1L, 2L)) == ((3L, 3L, 3L, 1.0, 1.0)), got.toString)
    // v3 vs v1: v1's ABCD matches v3's frames 0 AND 1 -> 2 pairs, but
    // DISTINCT frames: 1 of v1's 3 (1/3), 2 of v3's 3 (2/3)
    assert(got((1L, 3L)) == ((2L, 1L, 2L, 1.0 / 3.0, 2.0 / 3.0)), got.toString)
    assert(got((2L, 3L)) == ((2L, 1L, 2L, 1.0 / 3.0, 2.0 / 3.0)))
    assert(got.size == 3)
    // packing guard: an out-of-range frame_no fails loudly
    val bad = sigs.withColumn("frame_no", col("frame_no") + 2000000L)
    val e = intercept[Exception](
      Multimodal.videoNearDupPairs(bad, 0, 15).collect())
    assert(e.getMessage != null && e.getMessage.contains("packing range"))
  }

  test("videoNearDupPairsBudgeted: allowed branch identical, guard on constant frames exact, fail loud") {
    // allowed branch on the planted-twin fixture above: bit-identical to
    // the ungated operator
    val docs = Seq(
      (1L, "ABCDEFGHIJKL"), (2L, "ABCDEFGHIJKL"), (3L, "ABCDABCDZZZZ"))
      .toDF("doc_id", "text")
    val sigs = Multimodal.videoFrameSignatures(
      Multimodal.attachBinary(docs, "doc_id", "text"), frameBytes = 4, everyN = 1)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))).toSet
    assert(rows(Multimodal.videoNearDupPairsBudgeted(sigs, 0, 15,
        maxCandidates = 1000000L)) ==
      rows(Multimodal.videoNearDupPairs(sigs, 0, 15)))
    // degenerate: every video the same single frame -> each pigeonhole
    // block collapses to ONE bucket of 6 -> bound = 4*C(6,2) = 60
    val still = (1L to 6L).map(i => (i, "SAMEFRAME")).toSeq.toDF("doc_id", "text")
    val stillSigs = Multimodal.videoFrameSignatures(
      Multimodal.attachBinary(still, "doc_id", "text"), frameBytes = 16, everyN = 1)
    val guard = Multimodal.videoNearDupPairsBudgeted(stillSigs, 2, 15,
      maxCandidates = 59L, onExceed = "guard")
    assert(guard.columns.toSeq == Seq("candidate_pairs", "max_bucket_n", "budget"))
    val g = guard.head()
    assert((g.getLong(0), g.getLong(1), g.getLong(2)) == ((60L, 6L, 59L)), g.toString)
    val e = intercept[IllegalStateException](
      Multimodal.videoNearDupPairsBudgeted(stillSigs, 2, 15, maxCandidates = 59L))
    assert(e.getMessage.contains("band-skewed"))
    // budget above the bound: the gated degenerate join still runs and
    // matches the ungated pairs (all 15 video pairs at overlap 1.0)
    val allowed = Multimodal.videoNearDupPairsBudgeted(stillSigs, 2, 15,
      maxCandidates = 60L)
    assert(rows(allowed) == rows(Multimodal.videoNearDupPairs(stillSigs, 2, 15))
      && allowed.count() == 15)
  }

  test("videoNearDupPairs: NEGATIVE in-band doc_ids unpack exactly (floor-consistent div)") {
    import org.apache.spark.sql.functions.col
    // truncating div mis-attributed frames for negative ids (e.g.
    // fid(-2, 3) unpacked to video -1); the subtract-pmod-first unpack
    // must keep the planted twin pair at (-3, -2), never touch -1
    val docs = Seq(
      (-2L, "ABCDEFGHIJKL"), (-3L, "ABCDEFGHIJKL"), (-1L, "WWWWXXXXYYYY"))
      .toDF("doc_id", "text")
    val sigs = Multimodal.videoFrameSignatures(
      Multimodal.attachBinary(docs, "doc_id", "text"), frameBytes = 4, everyN = 1)
    val got = Multimodal.videoNearDupPairs(sigs, maxHamming = 0, blockBits = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(5), r.getDouble(6)))).toMap
    assert(got == Map((-3L, -2L) -> ((3L, 1.0, 1.0))), got.toString)
  }

  test("videoNearDupPairs: out-of-band doc_id (xxhash64-scale) fails loudly, never wraps") {
    import org.apache.spark.sql.functions.{col, lit}
    val docs = Seq((1L, "ABCDEFGH"), (2L, "ABCDEFGH")).toDF("doc_id", "text")
    val sigs = Multimodal.videoFrameSignatures(
      Multimodal.attachBinary(docs, "doc_id", "text"), frameBytes = 4, everyN = 1)
      .withColumn("doc_id", col("doc_id") * lit(1000000000000000L)) // 1e15 > band
    // two loud paths, zero silent ones: under ANSI (this session's
    // default) the packing multiply itself throws ARITHMETIC_OVERFLOW;
    // with ANSI off the multiply would WRAP silently and the range
    // assert is what fires — either way the call errors, never returns
    // wrapped fids that merge distinct videos
    val e = intercept[Exception](
      Multimodal.videoNearDupPairs(sigs, 0, 15).collect())
    assert(e.getMessage != null && (e.getMessage.contains("packing range")
      || e.getMessage.toLowerCase.contains("overflow")), e.getMessage)
  }

  test("pairAudit: per-group pair rates, orphan media row, duplicate-free counts") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "source")
    val media = Seq(1L, 3L, 99L).toDF("vec_id")
    val got = Multimodal.pairAudit(docs, "doc_id", "source", media, "vec_id")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(got("a") == ((2L, 1L, Some(0.5))), got.toString)
    assert(got("b") == ((1L, 1L, Some(1.0))), got.toString)
    assert(got("(orphan media)") == ((1L, 0L, None)), got.toString)
    assert(got.size == 3)
  }
}
