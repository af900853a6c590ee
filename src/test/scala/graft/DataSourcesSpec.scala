package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.GraftSession
import graft.sources.DataSources

class DataSourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("round-trips every supported format") {
    val src = GraftSession.table(spark, TestSpark.sfDir, "nation")
    DataSources.formats.foreach { fmt =>
      val path = s"/tmp/graft-ds-roundtrip-$fmt"
      DataSources.write(src, path, fmt, mode = "overwrite")
      val back = DataSources.read(spark, path, fmt, Some(src.schema))
      assert(back.count() == 25, fmt)
      val sums = back.agg(sum(col("n_nationkey"))).collect()(0).getLong(0)
      assert(sums == (0 to 24).sum, fmt)
    }
  }

  test("readText: line-oriented and wholetext corpus layouts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-text").toFile
    java.nio.file.Files.writeString(
      new java.io.File(dir, "a.txt").toPath, "line one\nline two\n")
    java.nio.file.Files.writeString(
      new java.io.File(dir, "b.txt").toPath, "line three\n")
    val lines = DataSources.readText(spark, dir.getAbsolutePath)
      .collect().map(_.getString(0)).toSet
    assert(lines == Set("line one", "line two", "line three"))
    val whole = DataSources.readText(spark, dir.getAbsolutePath, wholetext = true)
    assert(whole.count() == 2)
    assert(whole.collect().map(_.getString(0)).toSet
      == Set("line one\nline two\n", "line three\n"))
  }

  test("readBinaryFiles: glob prunes at listing time, bytes survive, multimodal adapter runs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bin").toFile
    val payload = Array[Byte](1, 2, 3, -1, 0, 42)
    java.nio.file.Files.write(new java.io.File(dir, "x.img").toPath, payload)
    java.nio.file.Files.writeString(new java.io.File(dir, "skip.txt").toPath, "nope")
    val files = DataSources.readBinaryFiles(spark, dir.getAbsolutePath, glob = Some("*.img"))
    val rows = files.collect()
    assert(rows.length == 1, "glob must exclude skip.txt")
    assert(rows(0).getAs[Array[Byte]]("content").toSeq == payload.toSeq)
    // binaryFile -> adapter -> stub decode, end-to-end
    val feats = graft.operators.Multimodal.decode(
        graft.operators.Multimodal.fromBinaryFiles(files))
      .collect()
    assert(feats.length == 1 && feats(0).getInt(1) == payload.length)
  }

  test("readJsonl: corrupt lines quarantined with evidence, good rows parse, schema guard") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toFile
    dir.deleteOnExit()
    java.nio.file.Files.writeString(new java.io.File(dir, "part0.jsonl").toPath,
      """{"id": 1, "text": "good"}
        |{"id": 2 "text": "missing comma"}
        |{"id": 3, "text": "also good"}
        |not json at all
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val df = DataSources.readJsonl(spark, dir.getAbsolutePath, schema)
    val good = df.filter(col("corrupt").isNull)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(good == Set((1L, "good"), (3L, "also good")), good.toString)
    // corrupt rows keep the raw line as evidence; the aggregation touches
    // a data column alongside the corrupt one (SPARK-21610 — a
    // corrupt-only projection over a JSON scan is refused by the engine)
    val bad = df.filter(col("corrupt").isNotNull)
      .select(col("id"), col("corrupt")).collect().map(_.getString(1)).toSet
    assert(bad.exists(_.contains("missing comma")) && bad.exists(_.contains("not json")),
      bad.toString)
    assert(bad.size == 2)
    intercept[IllegalArgumentException](DataSources.readJsonl(
      spark, dir.getAbsolutePath, schema.add("corrupt", StringType)))
  }
}
