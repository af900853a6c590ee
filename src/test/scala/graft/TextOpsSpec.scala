package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("langId picks marker languages, falls back to und") {
    val df = Seq(
      (1L, "das ist der grosse test und die sache"),
      (2L, "le chat et la maison les arbres"),
      (3L, "el perro y los gatos las casas es bueno"),
      (4L, "the quick fox and a dog of note"),
      (5L, "xyzzy qwerty")
    ).toDF("id", "text")
    val m = df.select(col("id"), TextOps.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(1L -> "de", 2L -> "fr", 3L -> "es", 4L -> "en", 5L -> "und"))
  }

  test("quality columns compute exact counts and ratios") {
    val df = Seq((1L, "the cat sat, on a mat!")).toDF("id", "text")
    val r = df.select(col("id") +: TextOps.qualityColumns(col("text")): _*).collect()(0)
    assert(r.getInt(1) == 22)           // n_chars
    assert(r.getInt(2) == 6)            // n_tokens
    assert(r.getInt(4) == 2)            // n_punct (, !)
    assert(math.abs(r.getDouble(5) - 2.0 / 6.0) < 1e-12) // the, a
  }

  test("qualityFilter: reasons bitmask matches hand-derived rules, multi-violation docs sum bits") {
    val ok = ("the " + (1 to 24).map(i => f"word$i%03d").mkString(" "))  // 25 toks, 1 stopword
    val short = "the abc def ghi jkl mno pqr stu vwx yza"                // 10 toks -> bit 0
    val long = ("the " + (1 to 94).map(i => f"tok$i%03d").mkString(" ")) // 95 toks -> bit 1
    val junk = Seq.fill(30)("x").mkString(" ")  // mean len 1 (bit 2), no stopword (bit 3), dup (bit 4)
    val df = Seq((1L, ok), (2L, short), (3L, long), (4L, junk), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextOps.qualityFilter(df, "text", minTokens = 20, maxTokens = 90,
        minMeanTokLen = 2.0, maxMeanTokLen = 12.0,
        minStopwordRatio = 0.01, maxDupTokenFrac = 0.6)
      .select(col("doc_id"), col("reasons"), col("keep"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    assert(got == Map(
      1L -> ((0, true)),
      2L -> ((1, false)),
      3L -> ((2, false)),
      4L -> ((4 + 8 + 16, false)),
      5L -> ((1, false))), got) // NULL text: bit 0 only — absent signals never fire
  }

  test("qualityFilter rejects inputs already carrying emitted column names") {
    val df = Seq((1L, "some text", 5)).toDF("doc_id", "text", "n_tokens")
    val e = intercept[IllegalArgumentException](TextOps.qualityFilter(df, "text"))
    assert(e.getMessage.contains("n_tokens"))
  }

  test("qualityFilter keeps original columns and the signal columns in one pass") {
    val df = Seq((1L, "src", "the plain words here keep flowing along nicely")).toDF("doc_id", "source", "text")
    val row = TextOps.qualityFilter(df, "text", minTokens = 3).collect()(0)
    val fields = row.schema.fieldNames.toSeq
    assert(Seq("doc_id", "source", "text", "n_tokens", "mean_tok_len",
      "stopword_ratio", "dup_token_frac", "reasons", "keep").forall(fields.contains), fields)
    assert(row.getAs[Boolean]("keep"))
  }

  test("quality columns: token-less docs score NULL ratios, never ANSI divide-by-zero") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "ok")).toDF("id", "text")
    val rows = df.select(col("id") +: TextOps.qualityColumns(col("text")): _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    Seq(1L, 2L).foreach { id =>
      assert(rows(id).getInt(2) == 0, s"doc $id n_tokens")
      assert(rows(id).isNullAt(3) && rows(id).isNullAt(5), s"doc $id ratios must be NULL")
    }
    assert(rows(3L).getInt(2) == 1 && !rows(3L).isNullAt(3))
  }

  test("repetitionColumns: exact duplicate n-gram fractions, NULL/short-doc discipline") {
    val df = Seq(
      (1L, "a a a b"),        // 1grams 4/2 dup -> .5; 2grams [aa,aa,ab] -> 1/3; 3grams [aaa,aab] -> 0
      (2L, "x"),              // single token: no duplicates, no higher grams
      (3L, ""),               // token-less: 0.0 everywhere, never divide-by-zero
      (4L, null)              // absent content scores NULL, not "no repetition"
    ).toDF("doc_id", "text")
    val rows = df.select(col("doc_id") +: TextOps.repetitionColumns(col("text")): _*)
      .collect().map(r => r.getLong(0) ->
        (0 to 2).map(i => if (r.isNullAt(i + 1)) None else Some(r.getDouble(i + 1)))).toMap
    assert(rows(1L) == Seq(Some(0.5), Some(1.0 - 2.0 / 3), Some(0.0)), rows(1L))
    assert(rows(2L) == Seq(Some(0.0), Some(0.0), Some(0.0)))
    assert(rows(3L) == Seq(Some(0.0), Some(0.0), Some(0.0)))
    assert(rows(4L) == Seq(None, None, None))
  }

  test("tokenCounts: whitespace vs BPE-ish") {
    val df = Seq((1L, "hello world42 x-y")).toDF("id", "text")
    val r = df.select(col("id") +: TextOps.tokenCounts(col("text")): _*).collect()(0)
    assert(r.getInt(1) == 3)  // ws tokens
    assert(r.getInt(2) == 6)  // hello, world, 42, x, -, y
  }

  test("fingerprint invariant to case and whitespace runs") {
    val df = Seq((1L, "Hello   World"), (2L, "  hello world "), (3L, "hello worlds"))
      .toDF("id", "text")
    val fps = df.select(TextOps.fingerprint(col("text"))).collect().map(_.getString(0))
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("rollingFingerprintMd5 native equals column-algebra twin on real corpus docs") {
    import org.apache.spark.sql.functions._
    val docs = graft.engine.GraftSession.table(spark, TestSpark.sfDir, "documents")
    val mismatch = docs.select(
        TextOps.rollingFingerprintMd5(col("text"), 16).as("a"),
        TextOps.rollingFingerprintMd5Algebra(col("text"), 16).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(mismatch == 0)
  }

  test("redactPii: every class redacted, counts exact, NULL stays NULL") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, Some("mail a.b@x.co and c@y.org from 10.0.0.1 ssn 123-45-6789 call 555-867-5309")),
      (2L, Some("clean text, no pii at all")),
      (3L, Option.empty[String]))
      .toDF("doc_id", "text")
    val got = TextOps.piiRedact(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getString(1) ==
      "mail <EMAIL> and <EMAIL> from <IP> ssn <SSN> call <PHONE>", got(1L).getString(1))
    assert((2 to 5).map(got(1L).getInt) == Seq(2, 1, 1, 1)) // email, ip, ssn, phone
    assert(got(2L).getString(1) == "clean text, no pii at all" &&
      (2 to 5).forall(got(2L).getInt(_) == 0))
    assert(got(3L).isNullAt(1) && (2 to 5).forall(got(3L).isNullAt))
  }

  test("redactPii: SSN and phone shapes never steal each other's matches") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "a 123-45-6789 b 123-456-7890 c")).toDF("doc_id", "text")
    val r = TextOps.piiRedact(df, "doc_id", "text").collect()(0)
    assert(r.getString(1) == "a <SSN> b <PHONE> c", r.getString(1))
    assert(r.getInt(4) == 1 && r.getInt(5) == 1)
  }

  test("removeBoilerplateLines: frequent lines drop, unique bodies and order survive") {
    import org.apache.spark.sql.functions._
    val header = "subscribe now"
    val docs = (1 to 10).map(i =>
      (i.toLong, s"$header\nbody line $i\nsecond body $i" +
        (if (i % 2 == 0) "\npromo footer" else ""))) :+ (99L, null.asInstanceOf[String])
    val df = docs.toDF("doc_id", "text")
    val got = TextOps.removeBoilerplateLines(df, "doc_id", "text",
      maxDocFrac = 0.3, minDocs = 2).collect().map(r => r.getLong(0) -> r).toMap
    (1 to 10).foreach { i =>
      val r = got(i.toLong)
      assert(r.getString(1) == s"body line $i\nsecond body $i", s"doc $i: ${r.getString(1)}")
      assert(r.getInt(2) == (if (i % 2 == 0) 2 else 1), s"doc $i n_removed")
    }
    assert(got(99L).isNullAt(1) && got(99L).isNullAt(2), "NULL text stays NULL")
  }

  test("removeBoilerplateLines: minDocs floor keeps a 2-doc corpus's shared line when minDocs=3") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "shared\na"), (2L, "shared\nb")).toDF("doc_id", "text")
    val kept = TextOps.removeBoilerplateLines(df, "doc_id", "text",
      maxDocFrac = 0.3, minDocs = 3).collect().map(r => r.getString(1)).toSet
    assert(kept == Set("shared\na", "shared\nb"), kept)
    intercept[IllegalArgumentException](
      TextOps.removeBoilerplateLines(df, "doc_id", "text", maxDocFrac = 0.0))
  }

  test("tfidfKeywords: hand-computed scores, rare tokens outrank stopwords, ties by token") {
    import org.apache.spark.sql.functions._
    // 4 docs; "the" in all (idf = ln(1) = 0), "rare" in one
    val df = Seq(
      (1L, "the rare rare word"),
      (2L, "the common word"),
      (3L, "the common thing"),
      (4L, "the thing")).toDF("doc_id", "text")
    val got = TextOps.tfidfKeywords(df, "doc_id", "text", k = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getDouble(3))).toMap
    def sc(tf: Int, dfq: Int): Double =
      BigDecimal(tf * math.log(4.0 / dfq)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1: rare tf=2 df=1 -> 2ln4; word tf=1 df=2 -> ln2; the -> 0
    assert(got((1L, 1)) == ("rare", sc(2, 1)), got((1L, 1)))
    assert(got((1L, 2)) == ("word", sc(1, 2)), got((1L, 2)))
    // doc 4: thing ln2 top; "the" scores 0 but still ranks 2nd of its 2 tokens
    assert(got((4L, 1)) == ("thing", sc(1, 2)))
    assert(got((4L, 2)) == ("the", 0.0))
    // doc 2: common and word both tf=1 df=2 -> equal score, tie by token asc
    assert(got((2L, 1))._1 == "common" && got((2L, 2))._1 == "word")
    intercept[IllegalArgumentException](TextOps.tfidfKeywords(df, "doc_id", "text", 0))
  }

  test("rollingFingerprintMd5 handles short and empty text like the algebra twin") {
    import org.apache.spark.sql.functions._
    val edge = Seq((1L, ""), (2L, "short"), (3L, "exactly sixteen!"), (4L, "x" * 17))
      .toDF("doc_id", "text")
    val rows = edge.select(
        TextOps.rollingFingerprintMd5(col("text"), 16).as("a"),
        TextOps.rollingFingerprintMd5Algebra(col("text"), 16).as("b"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }
}
