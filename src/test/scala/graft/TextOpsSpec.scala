package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("canonicalizeUrl: case/www/ports/fragment/tracking/sort/slash rules, non-default ports kept, malformed -> NULL") {
    val cases = Seq(
      // scheme+host lowercased, path case preserved
      ("HTTP://ExAmPlE.org/CaSe/Path", "http://example.org/CaSe/Path"),
      // www + https default port + trailing slashes
      ("https://www.example.org:443/a//", "https://example.org/a"),
      // http default port strips; http on 443 is NOT default — kept
      ("http://example.org:80/a", "http://example.org/a"),
      ("http://example.org:443/a", "http://example.org:443/a"),
      ("https://example.org:8080/a", "https://example.org:8080/a"),
      // fragment dropped, tracking params removed, empty query dropped
      ("https://example.org/a?utm_source=x&fbclid=z#frag", "https://example.org/a"),
      // surviving params sorted; tracking removed from the middle
      ("https://example.org/a?b=2&utm_campaign=c&a=1", "https://example.org/a?a=1&b=2"),
      // root URL: trailing slash strips to bare host
      ("https://example.org/", "https://example.org"),
      // malformed: no scheme, or empty host
      ("example.org/a", null),
      ("https:///a", null))
    val got = cases.map(_._1).zipWithIndex.map { case (u, i) => (i, u) }
      .toDF("i", "u")
      .select(col("i"), TextOps.canonicalizeUrl(col("u")).as("c"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
      .toMap
    cases.zipWithIndex.foreach { case ((u, want), i) =>
      assert(got(i) == want, s"canonicalizeUrl($u) = ${got(i)}, want $want") }
    // groups: collapsed raw forms counted, first-seen keeper is the min id
    val raw = Seq(
      (10L, "https://www.example.org:443/a/"),
      (3L, "https://example.org/a?utm_source=x"),
      (7L, "HTTPS://EXAMPLE.ORG/a"),
      (5L, "https://other.org/b"),
      (6L, null.asInstanceOf[String])).toDF("doc_id", "url")
    val g = TextOps.canonicalUrlGroups(raw, "doc_id", "url")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(g("https://example.org/a") == ((3L, 3L, 3L)), g.toString)
    assert(g("https://other.org/b") == ((1L, 1L, 5L)))
    assert(g.size == 2, "NULL url must not form a group")
  }

  test("vocabularyGrowth: curve matches brute force, monotone, endpoints exact, Heaps beta sub-linear on Zipf corpus") {
    import graft.operators.SampleOps
    val rnd = new scala.util.Random(41)
    // Zipf-ish corpus: token t_j drawn with weight ~ 1/(j+1) from an
    // unbounded id space — vocabulary grows with the corpus (Heaps), so
    // types must grow SUB-linearly in tokens
    val docs = (0 until 400).map { i =>
      val n = 5 + rnd.nextInt(15)
      val toks = Seq.fill(n) {
        val r = rnd.nextDouble()
        val j = math.min((math.exp(r * 7.0) - 1.0).toInt, 1500)
        s"w$j"
      }
      (i.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val cuts = Seq(0, 3, 15, 63, 99)
    val got = TextOps.vocabularyGrowth(docs, "doc_id", "text", cuts)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == cuts)
    // brute force: replay buckets via the same md5Bucket column, then
    // compute each prefix's exact doc/token/type counts in plain Scala
    val rows = docs.select(SampleOps.md5Bucket(col("doc_id")).cast("int").as("b"),
        col("text")).collect().map(r => (r.getInt(0), r.getString(1).split(" ").toSeq))
    cuts.zip(got).foreach { case (cut, (_, nDocs, nToks, nTypes)) =>
      val pre = rows.filter(_._1 <= cut)
      assert(nDocs == pre.length.toLong, s"cut=$cut docs")
      assert(nToks == pre.map(_._2.size).sum.toLong, s"cut=$cut tokens")
      assert(nTypes == pre.flatMap(_._2).distinct.size.toLong, s"cut=$cut types")
    }
    // monotone non-decreasing in every measure
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._2 && a._3 <= b._3 && a._4 <= b._4, s"$a !<= $b") }
    // final cut = whole corpus
    assert(got.last._2 == 400L)
    // Heaps: between the 15 and 99 cuts, types grow sub-linearly in
    // tokens (beta < 1) but DO grow (beta > 0) — the property the PPJoin
    // scale analysis assumes of real corpora
    val lo = got.find(_._1 == 15).get
    val hi = got.last
    val beta = math.log(hi._4.toDouble / lo._4) / math.log(hi._3.toDouble / lo._3)
    assert(beta > 0.05 && beta < 0.95, s"Heaps beta $beta outside (0.05, 0.95)")
    // NULL text excluded, not counted
    val withNull = docs.unionAll(Seq((9999L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    assert(TextOps.vocabularyGrowth(withNull, "doc_id", "text", Seq(99))
      .collect()(0).getLong(1) == 400L)
    // guard: unsorted / out-of-range cuts refused
    intercept[IllegalArgumentException](
      TextOps.vocabularyGrowth(docs, "doc_id", "text", Seq(5, 3)))
    intercept[IllegalArgumentException](
      TextOps.vocabularyGrowth(docs, "doc_id", "text", Seq(100)))
  }

  test("normalizeText: accent-fold, control strip, space collapse, case, idempotence") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "  Héllo\tWORLD\u0001  tied\u0000up  "),
      (2L, "Él CAFÉ über naïve mañana Çç"),
      (3L, "already normal text"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        graft.operators.TextOps.normalizeText(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got(1L) == "hello world tied up", got(1L))
    assert(got(2L) == "el cafe uber naive manana cc", got(2L))
    assert(got(3L) == "already normal text")
    assert(got(4L) == null, "NULL text must stay NULL")
    // idempotent: a second pass is the identity on normalized output
    val twice = df.filter(col("text").isNotNull).select(
      graft.operators.TextOps.normalizeText(
        graft.operators.TextOps.normalizeText(col("text"))).as("n2"),
      graft.operators.TextOps.normalizeText(col("text")).as("n1"))
      .collect()
    twice.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

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

  test("topNgramShare: most frequent 2-gram wins, ties break to the smaller gram") {
    val df = Seq(
      (1L, "a b a b c"),            // grams: "a b"x2, "b a", "b c" -> top "a b" 2/4
      (2L, "x y z w"),              // all grams unique -> tie, smallest wins: "x y"
      (3L, "solo"),                 // < 2 tokens -> NULL
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextOps.topNgramShare(df, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1),
         if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toMap
    assert(got(1L) == ("a b", 0.5), got(1L))
    assert(got(2L) == ("x y", 1.0 / 3.0), got(2L))
    assert(got(3L) == (null, -1.0))
    assert(got(4L) == (null, -1.0))
    intercept[IllegalArgumentException](TextOps.topNgramShare(df, "doc_id", "text", 0))
  }

  test("topKNgrams: counts across docs, deterministic boundary, k past vocab") {
    val df = Seq(
      (1L, "a b c a b c"),  // "a b c"x2? grams: "a b c","b c a","c a b","a b c" -> "a b c"x2
      (2L, "a b c d"))      // "a b c", "b c d"
      .toDF("doc_id", "text")
    val got = TextOps.topKNgrams(df, "text", n = 3, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a b c", 3L), ("b c a", 1L)), got.toSeq) // tie at 1 -> gram asc
    val all = TextOps.topKNgrams(df, "text", n = 3, k = 100).collect()
    assert(all.length == 4, all.toSeq) // k beyond vocabulary returns the vocabulary
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

  test("sentenceStats: splitting, punctuation-free fallback, NULL handling, mean") {
    val df = Seq(
      (1L, "en", "One two. Three four five! Six?"),   // 3 sentences, chars 7+15+3 = 25
      (2L, "en", "no punctuation at all"),            // 1 sentence, 21 chars
      (3L, "en", null.asInstanceOf[String]),          // excluded
      (4L, "de", "...!!!"))                           // 0 sentences
      .toDF("doc_id", "lang", "text")
    val got = TextOps.sentenceStats(df, "lang", "text").collect()
      .map(r => r.getString(0) -> r).toMap
    val en = got("en")
    assert(en.getLong(1) == 2L && en.getLong(2) == 4L, en.toString)
    assert(en.getInt(3) == 3, en.toString)
    assert(math.abs(en.getDouble(4) - 46.0 / 4) < 1e-12, en.toString)
    val de = got("de")
    assert(de.getLong(1) == 1L && de.getLong(2) == 0L, de.toString)
    assert(de.isNullAt(4), "all-sentence-free group must get NULL mean, not 0/0")
  }

  test("urlDomainStats: extraction, lowercasing, www strip, per-doc dedup") {
    val df = Seq(
      (1L, "read https://Example.COM/a and https://example.com/b plus http://www.other.org/x"),
      (2L, "again https://example.com/c"),
      (3L, "no links here"))
      .toDF("doc_id", "text")
    val got = TextOps.urlDomainStats(df, "doc_id", "text").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("example.com") == ((3L, 2L)), got.toString) // 3 urls across 2 docs
    assert(got("other.org") == ((1L, 1L)), got.toString)   // www. stripped
    assert(got.size == 2)
  }

  test("readability: hand-computed Flesch, sentence floor, wordless NULL") {
    val df = Seq(
      (1L, "the cat sat here. it was happy!"), // 7 words, 2 sentences, runs: e,a,a,e,e,i,a,a,y = 9
      (2L, "no punctuation here"),             // 3 words, 1 sentence (floored)
      (3L, "... !!!"))                         // punctuation-only: 1 token? no - split on ' ' gives ['...','!!!'] -> 2 words
      .toDF("doc_id", "text")
    val got = TextOps.readability(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    assert(r1.getInt(1) == 7 && r1.getInt(2) == 2, r1.toString)
    assert(r1.getInt(3) == 9, "vowel runs: " + r1)
    val expected = 206.835 - 1.015 * (7.0 / 2) - 84.6 * (9.0 / 7)
    assert(r1.getDouble(4) == expected, s"bit-exact IEEE tree: ${r1.getDouble(4)} vs $expected")
    assert(got(2L).getInt(2) == 1, "punctuation-free text is one sentence")
    assert(got(3L).getInt(3) == 0 && !got(3L).isNullAt(4),
      "tokens exist ('...' counts as a word), zero syllables: " + got(3L))
  }

  test("codeDetect: integer gate flags code, prose stays clean") {
    val df = Seq(
      ("a", "int f(int x) { return x; } int g() { return 0; }"), // braces 4, semis 2
      ("a", "plain prose with no structure at all"),
      ("b", "x = 1; y = 2; still prose { half signal"))          // braces 1 -> not code
      .toDF("source", "text")
    val got = TextOps.codeDetect(df, "source", "text").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("a").getLong(2) == 1L, got("a").toString)
    assert(got("a").getLong(3) == 4L && got("a").getLong(4) == 2L, got("a").toString)
    assert(got("b").getLong(2) == 0L, got("b").toString)
    assert(got("b").getLong(5) == 2L, "two assignments counted: " + got("b"))
  }

  test("encodingProfile: artifact counts, ratio, tab/newline not control-flagged") {
    import spark.implicits._
    val df = Seq(
      (1L, "plain ascii text"),
      (2L, "bad \uFFFD byte"),                  // one replacement char
      (3L, "caf\u00C3\u00A9 double-encoded"),  // moji lead + 2 non-ascii
      (4L, "bell\u0007 and tab\t newline\n"), // only BEL is a control hit
      (5L, ""),                                  // empty: NULL ratio, clean
      (6L, null.asInstanceOf[String]))           // dropped
      .toDF("doc_id", "text")
    val got = TextOps.encodingProfile(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.size == 5 && !got.contains(6L))
    assert(got(1L).getInt(2) == 0 && got(1L).getInt(3) == 0 && got(1L).getInt(4) == 0)
    assert(!got(1L).getBoolean(7))
    assert(got(2L).getInt(2) == 1 && got(2L).getBoolean(7), got(2L).toString)
    assert(got(3L).getInt(4) == 1, "one mojibake lead: " + got(3L))
    assert(got(3L).getInt(5) == 2, "A-tilde and copyright are both non-ascii: " + got(3L))
    assert(got(4L).getInt(3) == 1, "BEL flagged, tab/newline exempt: " + got(4L))
    assert(got(5L).getInt(1) == 0 && got(5L).isNullAt(6), "empty doc: NULL ratio, no 0/0")
    val ratio3 = got(3L).getDouble(6)
    assert(ratio3 == 2.0 / got(3L).getInt(1), got(3L).toString)
  }

  test("lexicalRichness: types vs tokens, degenerate loop scores low, empty doc NULL ttr") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c a b a"),        // 6 tokens, 3 types
      (2L, "spam spam spam spam"),// 4 tokens, 1 type
      (3L, ""),                   // token-less: NULL ttr
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextOps.lexicalRichness(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.size == 3 && !got.contains(4L))
    assert(got(1L).getInt(1) == 6 && got(1L).getInt(2) == 3 &&
      got(1L).getDouble(3) == 0.5, got(1L).toString)
    assert(got(2L).getDouble(3) == 0.25, got(2L).toString)
    assert(got(3L).getInt(1) == 0 && got(3L).isNullAt(3), got(3L).toString)
  }

  test("vocabCoverage: (count desc, token) order, cumulative share, k cap, NULL text") {
    val docs = Seq((1L, "a b a"), (2L, "b a c"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    // counts: a=3, b=2, c=1; total 6; top-2 = a then b
    val got = TextOps.vocabCoverage(docs, "text", k = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1, "a", 3L, 3L, 0.5),
      (2, "b", 2L, 5L, 5.0 / 6)), got.mkString("; "))
    // ties break on token ASC deterministically
    val tie = Seq((1L, "z y")).toDF("doc_id", "text")
    val t2 = TextOps.vocabCoverage(tie, "text", k = 2)
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(t2.toSeq == Seq((1, "y"), (2, "z")), t2.mkString("; "))
  }

  test("lmQualityScore: hand-built add-one bigram model, short docs, exact decimal reduction") {
    val docs = Seq(
      (1L, "a b a b"), // bigrams: "a b" x2, "b a"
      (2L, "a b c"),   // "a b", "b c"
      (3L, "x"),       // 1 token: 0 bigrams, NULL xent
      (4L, ""))        // token-less: 0 bigrams, NULL xent
      .toDF("doc_id", "text")
    // model: C(a b)=3, C(b a)=1, C(b c)=1; contexts C(a.)=3, C(b.)=2;
    // V = |{b, a, c}| = 3. The expected values replay the operator's own
    // determinism recipe: per-bigram -ln rounded to 9 dp, exact sum, one
    // final division.
    def lp(c12: Long, c1: Long): BigDecimal =
      BigDecimal(-math.log((c12 + 1).toDouble / (c1 + 3)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val ab = lp(3, 3); val ba = lp(1, 2); val bc = lp(1, 2)
    val got = TextOps.lmQualityScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.size == 4)
    assert(got(1L).getLong(1) == 3L &&
      got(1L).getDouble(2) == (ab * 2 + ba).toDouble / 3, got(1L).toString)
    assert(got(2L).getLong(1) == 2L &&
      got(2L).getDouble(2) == (ab + bc).toDouble / 2, got(2L).toString)
    assert(got(3L).getLong(1) == 0L && got(3L).isNullAt(2), got(3L).toString)
    assert(got(4L).getLong(1) == 0L && got(4L).isNullAt(2), got(4L).toString)
  }

  test("corpusReport: volumes, dup surplus, gate pass rate, dominant language per source") {
    val good = "the cat sat on a mat and the dog ran to the park with a ball " +
      "near the tree by a lake under the sun" // 25 tokens, passes every gate
    val tiny = "the tiny doc"                  // 3 tokens: fails minTokens
    val docs = Seq(
      (1L, tiny, "A"), (2L, tiny, "A"),        // exact dups of each other
      (3L, good, "A"),
      (4L, "der hund und die katze der nicht", "B"),
      (5L, null.asInstanceOf[String], "A"),    // no report position
      (6L, good, null.asInstanceOf[String]))
      .toDF("doc_id", "text", "source")
    val got = TextOps.corpusReport(docs, "doc_id", "text", "source")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("A", "B"))
    val a = got("A")
    assert(a.getLong(1) == 3L, "n_docs")
    assert(a.getLong(2) == (2 * tiny.length + good.length).toLong, "n_chars")
    assert(a.getLong(3) == (3 + 3 + 25).toLong, "n_tokens")
    assert(a.getLong(4) == 1L && a.getDouble(5) == 1.0 / 3, "one exact dup")
    assert(a.getLong(6) == 1L && a.getDouble(7) == 1.0 / 3, "one gate pass")
    assert(a.getString(8) == "en" && a.getDouble(9) == 1.0, "dominant lang")
    val b = got("B")
    assert(b.getLong(1) == 1L && b.getLong(4) == 0L && b.getLong(6) == 0L)
    assert(b.getString(8) == "de" && b.getDouble(9) == 1.0)
  }

  test("oovRate: occurrence-counted OOV, vocab hit zero, token-less NULL rate") {
    val docs = Seq(
      (1L, "a b a b zz"),   // 5 tokens, zz OOV once -> 0.2
      (2L, "zz zz zz"),     // all OOV, REPEATED: occurrences count -> 1.0
      (3L, "a b"),          // fully in-vocab -> 0.0
      (4L, ""),             // token-less: (0, 0, NULL)
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val vocab = Seq("a", "b", "c").toDF("token")
    val got = TextOps.oovRate(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(got(1L) == ((5L, 1L, Some(0.2))), got.toString)
    assert(got(2L) == ((3L, 3L, Some(1.0))))
    assert(got(3L) == ((2L, 0L, Some(0.0))))
    assert(got(4L) == ((0L, 0L, None)), "token-less doc keeps its row")
    assert(!got.contains(5L), "NULL text is out of scope")
    intercept[IllegalArgumentException](
      TextOps.oovRate(docs, "doc_id", "text", vocab.withColumnRenamed("token", "t")))
  }

  test("luhnValidCards: checksum separates real PANs from lookalike digit runs") {
    // independent reference implementation
    def luhn(s: String): Boolean = {
      val sum = s.reverse.zipWithIndex.map { case (ch, i) =>
        val d = ch - '0'
        if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum
      sum % 10 == 0
    }
    assert(luhn("4532015112830366") && !luhn("4532015112830367"), "reference sanity")
    val thirteen = "1234567890123"
    val docs = Seq(
      (1L, "pay with 4532015112830366 thanks"),       // one valid
      (2L, "ref 4532015112830367 and 4532015112830366"), // one of two
      (3L, s"num $thirteen"),                          // 13-digit run
      (4L, "short 123456789012 run"),                  // 12 digits: no candidate
      (5L, "no digits at all"))
      .toDF("doc_id", "text")
    val got = TextOps.luhnValidCards(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(got(1L) == ((1, 1)), got.toString)
    assert(got(2L) == ((2, 1)), got.toString)
    assert(got(3L) == ((1, if (luhn(thirteen)) 1 else 0)), got.toString)
    assert(got(4L) == ((0, 0)) && got(5L) == ((0, 0)))
  }

  test("sentenceChunks: budget-crossing starts a chunk, sentences never split, order preserved") {
    // sentences of 3 tokens each; budget 6: chunk starts when the running
    // PRE-sum crosses a multiple of 6 -> two sentences per chunk
    val doc1 = "a b c. d e f. g h i. j k l."
    // one long 8-token sentence then a short one: the long sentence stays
    // whole (chunk 0 = 8 tokens > budget 6), the short one opens chunk 1
    val doc2 = "one two three four five six seven eight. tail words."
    val docs = Seq((1L, doc1), (2L, doc2), (3L, "")).toDF("doc_id", "text")
    val got = TextOps.sentenceChunks(docs, "doc_id", "text", budgetTokens = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got((1L, 0L)) == ((2L, 6L, "a b c. d e f")), got.toString)
    assert(got((1L, 1L)) == ((2L, 6L, "g h i. j k l")), got.toString)
    assert(got((2L, 0L)) ==
      ((1L, 8L, "one two three four five six seven eight")), got.toString)
    assert(got((2L, 1L)) == ((1L, 2L, "tail words")), got.toString)
    assert(!got.keys.exists(_._1 == 3L), "sentence-less doc has no chunks")
    intercept[IllegalArgumentException](
      TextOps.sentenceChunks(docs, "doc_id", "text", budgetTokens = 0))
  }

  test("casingColumns: allcaps/capitalized/digit ratios, shouting gate, NULL and empty discipline") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "BUY NOW limited OFFER today"),      // 3/5 allcaps (>0.3), 3/5 capitalized
      (2L, "I am a normal sentence"),           // "I" is 1 char — not allcaps; 1/5 capitalized
      (3L, "room 404 on floor 12"),             // digits 5 of 16 non-ws chars
      (4L, ""),                                 // token-less: NULL ratios, not shouty
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"), col("text"),
        TextOps.tokens(col("text")).as("__toks"))
      .select(col("doc_id") +: TextOps.casingColumnsFromTokens(col("text"), col("__toks")): _*)
      .collect().map { r =>
        r.getLong(0) -> ((if (r.isNullAt(1)) -1 else r.getInt(1),
          if (r.isNullAt(2)) null else Double.box(r.getDouble(2)),
          if (r.isNullAt(3)) null else Double.box(r.getDouble(3)),
          if (r.isNullAt(4)) null else Double.box(r.getDouble(4)),
          if (r.isNullAt(5)) null else Boolean.box(r.getBoolean(5))))
      }.toMap
    assert(got(1L) == ((5, Double.box(0.6), Double.box(0.6), Double.box(0.0), Boolean.box(true))), got(1L).toString)
    assert(got(2L) == ((5, Double.box(0.0), Double.box(0.2), Double.box(0.0), Boolean.box(false))), got(2L).toString)
    assert(got(3L)._4 == Double.box(5.0 / 16.0) && got(3L)._5 == Boolean.box(false), got(3L).toString)
    assert(got(4L) == ((0, null, null, null, Boolean.box(false))), got(4L).toString)
    assert(got(5L) == ((-1, null, null, null, null)), got(5L).toString)
  }
}
