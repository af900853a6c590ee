package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (north-star
  * extensions, BASELINE.json): language-ID heuristic, quality scoring,
  * token counting, document fingerprinting.
  *
  * All pure `org.apache.spark.sql.functions` column expressions — no UDFs —
  * so every operator stays inside whole-stage codegen and scales linearly
  * with input splits (no shuffle except where a groupBy is the point).
  */
object TextOps {

  /** Whitespace tokens, empties dropped (split on single space matches the
    * DuckDB oracle's string_split exactly).
    */
  def tokens(text: Column): Column =
    filter(split(text, " "), w => w =!= "")

  /** Stopword-hit language ID: first-match CASE chain over language-marker
    * words. A real pipeline would use char-n-gram profiles; the operator
    * shape (single pass, codegen'd CASE) is what matters at 100 TB.
    */
  def langId(text: Column): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    def anyOf(words: Seq[String]): Column =
      words.map(w => padded.like(s"% $w %")).reduce(_ || _)
    when(anyOf(Seq("der", "und", "die", "nicht")), "de")
      .when(anyOf(Seq("le", "la", "et", "les")), "fr")
      .when(anyOf(Seq("el", "los", "las", "es")), "es")
      .when(anyOf(Seq("the", "a", "and", "of")), "en")
      .otherwise("und")
  }

  private val stopwords = Seq("the", "a", "and", "of", "to", "in")

  /** Quality-signal columns: length, token count, mean token length,
    * punctuation count, stopword ratio. Ratios are single fp divisions of
    * exact integers → bit-identical across engines.
    *
    * Inline form — every signal re-derives the token array from `text`.
    * Fine for a one-signal projection; for the full signal set, tokenize
    * ONCE into a column in your own projection and use
    * [[qualityColumnsFromTokens]] (32× on the t06-shaped repetition pass:
    * CollapseProject keeps a multiply-referenced non-cheap expression in
    * its own stage, so the split runs once per doc instead of per signal).
    */
  def qualityColumns(text: Column): Seq[Column] =
    qualityColumnsFromTokens(text, tokens(text))

  /** [[qualityColumns]] over a pre-tokenized array column. `toks` must be
    * `tokens(text)` (NULL for NULL text) — pass a bound column reference,
    * not an expression, to get the tokenize-once plan.
    */
  def qualityColumnsFromTokens(text: Column, toks: Column): Seq[Column] = {
    // nullif: a token-less (empty/whitespace-only) doc must score NULL
    // ratios — under Spark 4's default ANSI mode a bare x/0 THROWS and
    // would kill the whole scoring job on one empty document
    val nTok = nullif(size(toks), lit(0))
    val nStop = size(filter(toks, w => w.isin(stopwords: _*)))
    Seq(
      length(text).as("n_chars"),
      size(toks).as("n_tokens"),
      (length(regexp_replace(text, "\\s+", "")).cast("double") / nTok).as("mean_tok_len"),
      (length(text) - length(regexp_replace(text, "[.!?,;:]", ""))).as("n_punct"),
      (nStop.cast("double") / nTok).as("stopword_ratio"))
  }

  /** Casing/digit composition signals — the Gopher-family symbol rules
    * [[qualityColumnsFromTokens]] does not cover: ALL-CAPS token share
    * (shouting / scraped-header detection; single capital letters like
    * "I" and "A" are legitimate English and excluded by the {2,} bound),
    * Capitalized-token share (prose headline-ness), digit share of
    * non-whitespace characters (table/log dumps masquerading as text),
    * and a shouting verdict at the conventional 30% ALL-CAPS gate.
    *
    * Pure per-row column algebra (one regex pass per signal, codegen'd,
    * zero shuffles added to whatever projection hosts it); ratios are
    * exact-integer-over-exact-integer single divisions, so both engines
    * produce identical doubles. NULL text yields NULL everywhere;
    * token-less docs yield NULL ratios (nullif guards ANSI ÷0).
    *
    * Regexes are pinned to the engine-agnostic subset: `\\A`/`\\z`
    * anchors (Java's `$` matches BEFORE a trailing newline, RE2's does
    * not — a token "HELLO\n" would count ALL-CAPS on one engine only)
    * and an explicit whitespace class (Java `\\s` includes `\\x0B`,
    * RE2's does not), so the DuckDB replay agrees character-for-
    * character on any input, not just newline-free fixtures.
    */
  def casingColumnsFromTokens(text: Column, toks: Column): Seq[Column] = {
    val ws = "[ \\t\\n\\x0B\\f\\r]+"
    val nTok = nullif(size(toks), lit(0))
    val nonWs = length(regexp_replace(text, ws, ""))
    val allcaps = size(filter(toks, w => w.rlike("\\A[A-Z]{2,}\\z")))
    val capitalized = size(filter(toks, w => w.rlike("\\A[A-Z]")))
    val digits = nonWs - length(regexp_replace(regexp_replace(text, ws, ""), "[0-9]", ""))
    Seq(
      size(toks).as("n_tokens"),
      (allcaps.cast("double") / nTok).as("allcaps_ratio"),
      (capitalized.cast("double") / nTok).as("capitalized_ratio"),
      (digits.cast("double") / nullif(nonWs, lit(0))).as("digit_ratio"),
      when(toks.isNull, lit(null).cast("boolean"))
        .otherwise(coalesce(allcaps.cast("double") / nTok > 0.3, lit(false)))
        .as("is_shouty"))
  }

  /** Within-document repetition signals (the Gopher-family quality rules
    * every corpus filter applies): the fraction of duplicate n-grams for
    * n = 1, 2, 3 — `1 − distinct/total` over the doc's n-gram stream.
    * Highly repetitive (boilerplate, scraped-menu, degenerate-generation)
    * docs score near 1. Pure column algebra, single codegen'd pass; NULL
    * text scores NULL (absent content is not "zero repetition"); a doc
    * with fewer than n tokens scores 0.0 for that n.
    */
  def repetitionColumns(text: Column): Seq[Column] =
    repetitionColumnsFromTokens(tokens(text))

  /** [[repetitionColumns]] over a pre-tokenized array column (see
    * [[qualityColumnsFromTokens]] for why: tokenize once, reference many
    * times). NULL tokens (= NULL text) score NULL fractions.
    */
  def repetitionColumnsFromTokens(toks: Column): Seq[Column] = {
    def ngrams(n: Int): Column = wordNgrams(toks, n)
    def dupFrac(n: Int): Column = {
      // the n-gram TOTAL is arithmetic (|toks| − n + 1), so the n-gram
      // array is constructed exactly once per n (for the distinct count) —
      // a size(g)-based guard would build it three times per row
      val total = size(toks) - n + 1
      when(toks.isNull, lit(null).cast("double"))
        .when(total > 0,
          lit(1.0) - size(array_distinct(ngrams(n))).cast("double") / total)
        .otherwise(0.0)
    }
    Seq(dupFrac(1).as("dup_token_frac"),
      dupFrac(2).as("dup_2gram_frac"),
      dupFrac(3).as("dup_3gram_frac"))
  }

  /** BPE-ish subword count: letter runs, digit runs, and single
    * non-alphanumeric marks — the standard pre-tokenizer regex shape.
    */
  def tokenCounts(text: Column): Seq[Column] = Seq(
    size(tokens(text)).as("ws_tokens"),
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("bpe_tokens"))

  /** Composite quality gate — the C4/Gopher-style rule filter every corpus
    * pipeline runs between ingestion and dedup: each document gets its
    * signal columns, a `reasons` bitmask of the rules it violates, and a
    * `keep` verdict (`reasons == 0`). Keeping the rejected rows WITH their
    * reasons (instead of filtering them away) is deliberate: at 100 TB the
    * drop report is as much a product as the kept corpus, and the caller
    * chooses `filter($"keep")` or the audit view from one pass.
    *
    * Bits: 0 = fewer than `minTokens` tokens (NULL text lands here),
    * 1 = more than `maxTokens`, 2 = mean token length outside
    * [`minMeanTokLen`, `maxMeanTokLen`], 3 = stopword ratio below
    * `minStopwordRatio` (gibberish / non-language), 4 = duplicate-token
    * fraction above `maxDupTokenFrac` (repetition). Signals a token-less
    * doc cannot have (mean length, ratios) never fire their bits — bit 0
    * already owns that rejection.
    *
    * Pure column algebra over [[qualityColumns]] + [[repetitionColumns]]:
    * one codegen'd pass, no shuffle, no UDF.
    */
  def qualityFilter(df: DataFrame, textCol: String,
      minTokens: Int = 20, maxTokens: Int = 100000,
      minMeanTokLen: Double = 2.0, maxMeanTokLen: Double = 12.0,
      minStopwordRatio: Double = 0.0, maxDupTokenFrac: Double = 1.0): DataFrame = {
    // emitted columns must not already exist: a duplicate signal name makes
    // the flag references ambiguous, and a pre-existing reasons/keep would
    // be silently overwritten — fail at plan time instead
    val reserved = Seq("n_chars", "n_tokens", "mean_tok_len", "n_punct",
      "stopword_ratio", "dup_token_frac", "dup_2gram_frac", "dup_3gram_frac",
      "reasons", "keep", "__toks")
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"qualityFilter emits columns the input already has: $clash — rename or drop them first")
    // tokenize ONCE in its own projection; the 8 signal columns reference
    // the bound array column, not the split expression
    val signals = df.withColumn("__toks", tokens(col(textCol)))
      .select((col("*") +: (qualityColumnsFromTokens(col(textCol), col("__toks"))
        ++ repetitionColumnsFromTokens(col("__toks")))): _*)
      .drop("__toks")
    val flags: Seq[(Int, Column)] = Seq(
      0 -> (coalesce(col("n_tokens"), lit(0)) < minTokens),
      1 -> (col("n_tokens") > maxTokens),
      2 -> (col("mean_tok_len") < minMeanTokLen || col("mean_tok_len") > maxMeanTokLen),
      3 -> (col("stopword_ratio") < minStopwordRatio),
      4 -> (col("dup_token_frac") > maxDupTokenFrac))
    val reasons = flags.map { case (bit, c) =>
      when(coalesce(c, lit(false)), lit(1 << bit)).otherwise(lit(0))
    }.reduce(_ + _)
    signals.withColumn("reasons", reasons)
      .withColumn("keep", col("reasons") === 0)
  }

  /** PII classes redacted by [[redactPii]]/[[piiRedact]], in application
    * order: (class name, pattern, replacement token). Patterns restrict
    * themselves to the regex subset Java and RE2 implement identically
    * (char classes, bounded repetition, \b word boundaries — NO
    * lookarounds), so the DuckDB oracle replays them verbatim. Email must
    * apply before IP (a domain's dots would otherwise be eligible once the
    * local part is rewritten); SSN and phone shapes are disjoint
    * (3-2-4 vs 3-3-4 digit groups).
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("phone", "\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>"))

  /** Accent-fold table: position i of `accentFrom` maps to position i of
    * `accentTo` — an EXPLICIT character map (not a library NFD pass) so any
    * replaying engine with a `translate()` applies the identical fold.
    */
  private[operators] val accentFrom =
    "ÁÀÂÄáàâäÉÈÊËéèêëÍÌÎÏíìîïÓÒÔÖóòôöÚÙÛÜúùûüÑñÇç"
  private[operators] val accentTo =
    "AAAAaaaaEEEEeeeeIIIIiiiiOOOOooooUUUUuuuuNnCc"

  /** Deterministic text canonicalization — the normalize-before-hash pass
    * a corpus pipeline runs ahead of exact dedup / fingerprinting:
    * accent-fold (explicit map), control characters → space, whitespace
    * runs collapsed, trimmed, lowercased. Pure codegen'd column algebra;
    * engine-portable by construction (the control class is spelled
    * `[\x00-\x1F\x7F]` rather than `\s` because RE2's `\s` excludes
    * vertical tab while Java's includes it — the one place the two regex
    * dialects disagree on whitespace). Idempotent: applying it twice is
    * the identity on its own output. NULL stays NULL.
    */
  def normalizeText(text: Column): Column =
    lower(trim(regexp_replace(
      regexp_replace(translate(text, accentFrom, accentTo),
        "[\\x00-\\x1F\\x7F]", " "),
      " +", " ")))

  /** Text with every [[piiPatterns]] class replaced by its token — a
    * chained codegen'd regexp_replace, one pass, no shuffle, no UDF.
    * The pre-training scrub every large corpus runs before anything else.
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (t, (_, re, tok)) => regexp_replace(t, re, tok) }

  /** Per-class hit counts on the ORIGINAL text (counted before any
    * replacement, so classes can't steal each other's matches).
    */
  def piiCounts(text: Column): Seq[Column] =
    piiPatterns.map { case (name, re, _) =>
      regexp_count(text, lit(re)).as(s"n_$name") }

  /** (id, redacted text, per-class counts) — the DataFrame form of the
    * scrub, keeping the audit trail (counts) a compliance pass needs.
    * NULL text stays NULL with NULL counts (nothing to scrub ≠ clean).
    */
  def piiRedact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol) +: (redactPii(col(textCol)).as("text") +:
      piiCounts(col(textCol))): _*)

  /** Boilerplate line removal, RefinedWeb/CCNet-style: a line appearing in
    * more than `maxDocFrac` of documents (and at least `minDocs` of them)
    * is template chrome — headers, nav, cookie banners — not content, and
    * is dropped from every document. Returns (id, text, n_removed).
    *
    * Scale shape: ONE explode computes line → document-frequency
    * (array_distinct first, so a line repeated inside one doc counts that
    * doc once) with map-side partial aggregation; the boilerplate SET is
    * then at most lines-per-doc / maxDocFrac distinct lines — bounded by
    * construction, independent of corpus size — so it collects into a
    * single broadcast row and each document filters its own line array in
    * place (order preserved natively, no positional reassembly shuffle).
    * NULL text stays NULL. At 100 TB: one aggregation shuffle of distinct
    * (doc, line) pairs + a broadcast — no second pass over the corpus.
    */
  def removeBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
      maxDocFrac: Double = 0.05, minDocs: Long = 2): DataFrame = {
    require(maxDocFrac > 0.0 && maxDocFrac <= 1.0,
      s"maxDocFrac must be in (0, 1], got $maxDocFrac")
    require(minDocs >= 1, s"minDocs must be >= 1, got $minDocs")
    val lines = df.select(explode(array_distinct(split(col(textCol), "\n"))).as("__line"))
    val nDocs = df.select(count(lit(1)).as("__n"))
    val bp = lines.groupBy(col("__line")).agg(count(lit(1)).as("__df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("__df") >= minDocs && col("__df") >= col("__n") * maxDocFrac)
      .agg(collect_set(col("__line")).as("__bp")) // bounded: <= linesPerDoc/maxDocFrac
    df.crossJoin(broadcast(bp))
      .withColumn("__lines", split(col(textCol), "\n"))
      .withColumn("__kept", filter(col("__lines"), l => !array_contains(col("__bp"), l)))
      .select(col(idCol), array_join(col("__kept"), "\n").as("text"),
        (size(col("__lines")) - size(col("__kept"))).as("n_removed"))
  }

  /** Per-document TF-IDF keyword extraction: top-`k` tokens by
    * `tf · ln(N / df)`, rank ties broken by token — the corpus-analysis
    * primitive behind keyword tagging, topic drift monitoring, and
    * quality-by-vocabulary dashboards.
    *
    * Scale shape: (doc, token) term frequencies in one keyed aggregation
    * (map-side partials), document frequency as a COUNT over that frame
    * (one row per (doc, token), so no second distinct pass over the
    * corpus), the scalar N broadcast, a vocabulary-keyed join (shuffle on
    * token — vocabulary-sized, never corpus²), and a per-document top-k
    * window. Every shuffle is keyed; nothing is all-pairs.
    *
    * Cross-engine determinism: the score is ROUNDED to 9 decimals before
    * ranking and output. Mathematically-equal scores reached by different
    * ln() routes (e.g. 2·ln(N/a) vs ln(N²/a²)) can differ in their last
    * bits between libm implementations; rounding collapses them so the
    * token tie-break decides identically on every engine, and genuinely
    * different scores (gap ≥ 1e-9) keep their order.
    */
  def tfidfKeywords(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("__id"), explode(tokens(col(textCol))).as("tok"))
    val tf = toks.groupBy(col("__id"), col("tok")).agg(count(lit(1)).as("tf"))
    // NOT count(lit(1)): Catalyst prunes aggregate functions per consumer,
    // and a docFreq branch that ignores the tf column strips partial_count
    // from the (doc, tok) aggregate — forking its exchange into a SECOND
    // corpus scan (measured: 5 exchanges instead of 4). count(col("tf"))
    // alone doesn't survive either (CountOfNonNullableChild folds it back
    // to count(1)); the always-true `when` keeps the reference nullable so
    // both branches need the same aggregate and ReuseExchange applies.
    // tf >= 1 by construction, so the value is exactly the document count.
    val docFreq = tf.groupBy(col("tok"))
      .agg(count(when(col("tf") >= 1, col("tf"))).as("df"))
    val nDocs = df.agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col("__id")).orderBy(col("score").desc, col("tok").asc)
    tf.join(docFreq, "tok").crossJoin(broadcast(nDocs))
      .withColumn("score", round(col("tf") * log(col("__n") / col("df")), 9))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("__id").as(idCol), col("rank"), col("tok").as("keyword"), col("score"))
  }

  /** Word n-gram array built by CHAINED `zip_with` against shifted slices
    * of the token array — each of the n−1 zips is one linear pass, so the
    * whole construction is O(n·k) per doc. The `transform(sequence, i =>
    * slice(toks, i+1, n))` formulation is O(k²) (a fresh n-element slice
    * allocation per position) — measured 1.9 s vs 0.67 s building sf0.1's
    * bigram arrays. `zip_with` PADS its shorter input with NULLs (it
    * does not truncate), so padding positions concat to NULL grams and
    * one final linear filter drops them — a doc with fewer than n tokens
    * ends as []; a NULL token array stays NULL throughout.
    */
  private[operators] def wordNgrams(toks: Column, n: Int): Column = {
    val chained = (1 until n).foldLeft(toks)((g, j) =>
      zip_with(g, slice(toks, lit(j + 1), size(toks)),
        (a, b) => concat(a, lit(" "), b)))
    if (n == 1) chained else filter(chained, x => x.isNotNull)
  }

  /** Most-frequent word n-gram per document and the share of the doc's
    * n-gram stream it occupies — the "top n-gram character share" family
    * of Gopher's repetition rules (the dup-fraction family is
    * [[repetitionColumnsFromTokens]]). Ties break toward the
    * lexicographically smallest gram, so the winner is deterministic.
    *
    * Runs ENTIRELY per-row (higher-order functions over the token array),
    * ZERO shuffles at any corpus size — the explode→groupBy alternative
    * shuffles one row per gram occurrence (the whole tokenized corpus).
    * The mode is a run-length fold over the SORTED gram array — O(k log
    * k) per doc — that also carries the gram count, so the gram array is
    * CONSUMED ONCE: a separate `size(grams)` reference would re-evaluate
    * the whole tokenize→gram chain beside the fold (measured 2×).
    * Ascending sort makes the tie-break structural: on equal counts the
    * FIRST maximal run wins — the lexicographically smallest gram.
    *
    * @return (idCol, top_gram, top_n, top_share); NULL text or a doc
    *         shorter than n tokens yields NULL gram/count/share
    */
  def topNgramShare(df: DataFrame, idCol: String, textCol: String,
      n: Int = 2): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    // acc = (prev, current run, best count, best gram, total grams); the
    // fold walks the sorted array directly (element_at-style indexing
    // would re-evaluate the gram chain per access once CollapseProject
    // inlines it); run extends on equality with prev, best updates on
    // strictly longer runs only
    val best = aggregate(array_sort(wordNgrams(tokens(col(textCol)), n)),
      struct(lit(null).cast("string").as("prev"), lit(0).as("run"),
        lit(0).as("c"), lit(null).cast("string").as("g"), lit(0).as("tot")),
      (acc, x) => {
        val run = when(x <=> acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        val tot = (acc.getField("tot") + 1).as("tot")
        when(run > acc.getField("c"),
          struct(x.as("prev"), run.as("run"), run.as("c"), x.as("g"), tot))
          .otherwise(struct(x.as("prev"), run.as("run"),
            acc.getField("c").as("c"), acc.getField("g").as("g"), tot))
      })
    df.select(col(idCol), best.as("__best"))
      .select(col(idCol),
        col("__best.g").as("top_gram"),
        when(col("__best.tot") > 0, col("__best.c").cast("long")).as("top_n"),
        when(col("__best.tot") > 0,
          col("__best.c").cast("double") / col("__best.tot")).as("top_share"))
  }

  /** Corpus-level top-k word n-grams by occurrence count (the vocabulary
    * audit ahead of tokenizer training / contamination triage). One
    * explode → one hash aggregate with map-side partials → a distributed
    * top-k (`TakeOrderedAndProject`: each partition keeps k, the driver
    * merges k·partitions rows — never a global sort). Total order
    * (count DESC, gram ASC) makes the boundary of k deterministic.
    */
  def topKNgrams(df: DataFrame, textCol: String, n: Int = 3,
      k: Int = 20): DataFrame = {
    require(n >= 1 && k >= 1, s"need n >= 1 and k >= 1, got n=$n k=$k")
    df.select(explode(wordNgrams(tokens(col(textCol)), n)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram").asc)
      .limit(k)
  }

  /** Vocabulary coverage curve: the top-k tokens by corpus frequency with
    * rank, count, running count, and cumulative share of ALL token
    * occurrences — the "how large must the tokenizer vocabulary be to
    * cover X% of the corpus" audit run before vocab training.
    *
    * Scale shape: the corpus-wide work is one explode + one hash
    * aggregate with map-side partials, then a DISTRIBUTED top-k
    * (`TakeOrderedAndProject` — never a global sort of the vocabulary).
    * The rank/cumulative window runs on the top-k RESULT (k rows, one
    * task) — bounded by construction, unlike a corpus-wide global window;
    * the grand total is a broadcast scalar. Total order (count DESC,
    * token ASC) pins the k boundary and the running sum deterministically.
    *
    * @return (rank, token, n, cum_n, coverage), k rows
    */
  def vocabCoverage(df: DataFrame, textCol: String, k: Int = 1000): DataFrame = {
    require(k >= 1, s"need k >= 1, got k=$k")
    import org.apache.spark.sql.expressions.Window
    val counts = df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__total"))
    val ord = Seq(col("n").desc, col("token").asc)
    val w = Window.orderBy(ord: _*)
    counts.orderBy(ord: _*).limit(k)
      .crossJoin(broadcast(total))
      .select(
        row_number().over(w).as("rank"),
        col("token"), col("n"),
        sum(col("n")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("cum_n"),
        col("__total"))
      .select(col("rank"), col("token"), col("n"), col("cum_n"),
        (col("cum_n").cast("double") / col("__total")).as("coverage"))
  }

  /** Content fingerprint: md5 over whitespace-normalized, lowercased text.
    * Identical on any engine; the dedup key for exact-after-normalization.
    * Collapse BEFORE trim: trim() only strips spaces, so an edge tab or
    * newline would otherwise survive the collapse as an edge space and
    * split a cluster ("foo\n" vs "foo").
    */
  def fingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))))

  /** Rolling-window fingerprint, oracle-replayable variant: the minimum
    * [[graft.operators.Dedup.md5Hash60]] over every `window`-char substring
    * (the whole text when shorter) — the same min-over-windows semantics as
    * [[graft.functions.RollingMinHashExpr]] (which stays the production
    * path: O(n)/doc rolling hash vs O(n·window) md5 calls here; this twin
    * exists so DuckDB can replay the fingerprint).
    */
  def rollingFingerprintMd5(text: Column, window: Int = 16): Column =
    graft.functions.Md5RollingMinExpr.md5RollingMin(text, window)

  /** Column-algebra form of [[rollingFingerprintMd5]] — the executable
    * definition (TextOpsSpec asserts it equals the fused native form).
    */
  def rollingFingerprintMd5Algebra(text: Column, window: Int = 16): Column =
    array_min(transform(
      sequence(lit(1), greatest(lit(1), length(text) - (window - 1))),
      i => graft.operators.Dedup.md5Hash60(text.substr(i, lit(window)), 0)))

  /** Trimmed, non-empty sentences: text split on terminal-punctuation runs
    * `[.!?]+` (a regex subset Java and RE2 treat identically — char class
    * plus `+`, no boundaries). Punctuation-free text is one sentence.
    */
  def sentences(text: Column): Column =
    filter(transform(split(text, "[.!?]+"), s => trim(s)), s => length(s) > 0)

  /** Per-group sentence statistics — the length-profile half of a corpus
    * readability audit (C4 drops lines under 3 words; sentence-length
    * distributions are how that threshold gets picked). Per row: sentence
    * count and total trimmed-sentence chars, both integers; the group
    * mean is ONE fp division of exact integer sums at the very end
    * (IEEE-identical on any engine — the p05/s01 discipline). A group
    * whose docs are all sentence-free gets a NULL mean, not a 0/0.
    *
    * Scale shape: sentence splitting is per-row column algebra on the
    * scan; the only shuffle is the final group aggregate with map-side
    * partials. Group cardinality (languages) is tiny at any corpus size.
    */
  def sentenceStats(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val sents = sentences(col(textCol))
    df.filter(col(textCol).isNotNull)
      .select(col(groupCol),
        size(sents).as("__ns"),
        coalesce(aggregate(sents, lit(0L), (a, s) => a + length(s)), lit(0L)).as("__chars"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__ns")).as("n_sentences"),
        max(col("__ns")).as("max_doc_sentences"),
        when(sum(col("__ns")) > 0,
          sum(col("__chars")).cast("double") / sum(col("__ns")))
          .as("mean_sentence_chars"))
  }

  /** URL hosts extracted from free text: every `http(s)://host` match,
    * lowercased, leading `www.` stripped — the provenance signal behind
    * per-domain corpus curation (domain blocklists, source weighting,
    * citation density). One capture-group extract-all (identical in Java
    * and RE2: char classes only), one explode, one count aggregate with
    * map-side partials; n_docs dedupes per document via a two-level
    * aggregate, never a distinct over the exploded stream.
    *
    * @return (domain, n_urls, n_docs)
    */
  def urlDomainStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("__id"),
        explode(regexp_extract_all(col(textCol),
          lit("https?://([A-Za-z0-9.-]+)"), lit(1))).as("__host"))
      .select(col("__id"), regexp_replace(lower(col("__host")), "^www\\.", "").as("domain"))
      .groupBy(col("domain"), col("__id")).agg(count(lit(1)).as("__n"))
      .groupBy(col("domain"))
      .agg(sum(col("__n")).as("n_urls"), count(lit(1)).as("n_docs"))

  /** Canonical form of a URL (round 17) — the normalization a crawl
    * pipeline applies BEFORE url-level dedup, so `http://WWW.Site.org:80/a/`
    * and `http://site.org/a?utm_source=x` stop counting as distinct
    * provenance: scheme and host lowercased (path case PRESERVED — it is
    * significant), leading `www.` and the scheme's default port stripped,
    * fragment dropped, tracking params (`utm_*`, `gclid`, `fbclid`)
    * removed, remaining query params SORTED (param order is almost never
    * semantic), trailing path slashes stripped. Pure per-row column
    * algebra — char-class regexes identical in Java and RE2, split/filter/
    * sort/join array ops with engine-identical semantics — so the DuckDB
    * oracle replays it exactly. Malformed input (no scheme or host)
    * canonicalizes to NULL rather than a half-normalized string.
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val host0 = regexp_replace(hostPort, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    val rest = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1)
    val path0 = regexp_extract(rest, "^([^?]*)", 1)
    val path = regexp_replace(path0, "/+$", "")
    val q0 = regexp_extract(rest, "\\?(.*)$", 1)
    val keep = filter(split(q0, "&"),
      p => !(p === "" || p.rlike("^(utm_[A-Za-z]+|gclid|fbclid)=")))
    val qs = array_join(array_sort(keep), "&")
    val qPart = when(q0 === "" || qs === "", lit("")).otherwise(concat(lit("?"), qs))
    when(scheme === "" || host === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, path, qPart))
  }

  /** URL-level dedup accounting over [[canonicalizeUrl]]: one row per
    * canonical URL with how many raw rows and distinct raw FORMS collapsed
    * into it, plus the first-seen doc (the keeper a dedup pass would
    * retain). One canonical-key aggregate with map-side partials — the
    * shuffle carries canonical strings, never document text.
    *
    * @return (canonical_url, n_urls, n_raw_forms, first_doc)
    */
  def canonicalUrlGroups(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.filter(col(s"`$urlCol`").isNotNull)
      .select(col(s"`$idCol`").as("__id"), col(s"`$urlCol`").as("__u"),
        canonicalizeUrl(col(s"`$urlCol`")).as("canonical_url"))
      .filter(col("canonical_url").isNotNull)
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("__u")).as("n_raw_forms"),
        min(col("__id")).as("first_doc"))

  /** Occurrences of the single character `ch` in `text`, by length
    * difference against a translate-erase — pure codegen'd string algebra
    * any engine replays as `len(t) - len(replace(t, ch, ''))`.
    */
  def charCount(text: Column, ch: String): Column = {
    require(ch.length == 1, s"charCount wants one character, got '$ch'")
    length(text) - length(translate(text, ch, ""))
  }

  /** Per-document Flesch reading-ease: `206.835 − 1.015·(words/sentences)
    * − 84.6·(syllables/words)` with vowel-run count (`[aeiouy]+`) as the
    * syllable proxy — the readability gate a corpus pipeline uses to
    * route text by audience level (and the classic quality co-signal:
    * machine-generated spam scores implausibly high or low).
    *
    * Deterministic by construction: words/sentences/syllable-runs are
    * integers from engine-identical regex splits, the constants are
    * decimal literals (both engines parse them to the same double), and
    * the formula is a fixed left-associated tree of IEEE ops on exact
    * operands — no libm, so the score hashes identically everywhere.
    * Sentence count is floored at 1 (punctuation-free text is one
    * sentence); wordless text gets a NULL score, not a division blow-up.
    * Pure per-row column algebra on the scan — zero shuffles.
    *
    * @return (id, n_words, n_sentences, n_syllables, flesch)
    */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val w = size(toks)
    val sct = greatest(lit(1), size(sentences(col(textCol))))
    val syl = regexp_count(lower(col(textCol)), lit("[aeiouy]+"))
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), w.as("n_words"), sct.as("n_sentences"), syl.as("n_syllables"),
        when(w > 0,
          lit(206.835) - lit(1.015) * (w.cast("double") / sct) -
            lit(84.6) * (syl.cast("double") / w)).as("flesch"))
  }

  /** Per-document lexical richness: token count, distinct-token (type)
    * count, and type-token ratio — the vocabulary-collapse signal that
    * catches template spam and degenerate generation loops (a 400-token
    * doc cycling 12 words scores TTR 0.03 while its n-gram repetition can
    * still look moderate). Complements [[repetitionColumns]]: TTR sees
    * global vocabulary reuse, n-gram dup-fraction sees local structure.
    *
    * Pure per-row array algebra (`array_distinct` inside the projection),
    * zero shuffles; the ratio is one fp division of exact integers.
    * Token-less docs get NULL ttr (no vocabulary to judge), NULL text is
    * dropped.
    *
    * @return (id, n_tokens, n_types, ttr)
    */
  def lexicalRichness(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("n_types"))
      .withColumn("ttr",
        col("n_types").cast("double") / nullif(col("n_tokens"), lit(0)))
  }

  /** Per-document encoding-health signals — the mojibake/corruption gate a
    * web-scrape pipeline runs before any text model sees a byte:
    *  - `n_replacement`: U+FFFD replacement characters (a decoder already
    *    gave up on those bytes — the strongest corruption signal);
    *  - `n_ctrl`: C0 control characters excluding tab/newline/CR (binary
    *    junk that leaked through text extraction);
    *  - `n_moji_lead`: 'Ã' (U+00C3) occurrences — the classic
    *    UTF-8-read-as-Latin-1 double-encoding artifact (é→Ã©, ü→Ã¼: the
    *    lead byte 0xC3 of most Latin-1-range UTF-8 sequences surfaces as
    *    this exact character);
    *  - `n_non_ascii` and `non_ascii_ratio`: volume context so the flags
    *    read differently for an English corpus vs a naturally non-ASCII
    *    one.
    * `is_suspect` is a pure integer gate (any hard-artifact count > 0) —
    * bit-identical on every engine. All counts are length-difference /
    * regex-erase string algebra (no UDF), one codegen'd pass on the scan,
    * zero shuffles; the ratio is one fp division of exact integers.
    *
    * @return (id, n_chars, n_replacement, n_ctrl, n_moji_lead,
    *         n_non_ascii, non_ascii_ratio, is_suspect)
    */
  def encodingProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nRepl = charCount(t, "�")
    val nCtrl = length(t) - length(regexp_replace(t, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", ""))
    val nMoji = charCount(t, "Ã")
    val nNonAscii = length(regexp_replace(t, "[\\x00-\\x7F]", ""))
    df.filter(t.isNotNull)
      .select(col(idCol), length(t).as("n_chars"), nRepl.as("n_replacement"),
        nCtrl.as("n_ctrl"), nMoji.as("n_moji_lead"), nNonAscii.as("n_non_ascii"))
      .withColumn("non_ascii_ratio",
        col("n_non_ascii").cast("double") / nullif(col("n_chars"), lit(0)))
      .withColumn("is_suspect",
        (col("n_replacement") + col("n_ctrl") + col("n_moji_lead")) > 0)
  }

  /** Code-vs-prose detection on structural signals — brace, semicolon and
    * assignment density (the fastText-free heuristic a corpus pipeline
    * runs to route code into its own pile before prose-quality gating;
    * same family as the Gopher symbol-ratio rules). The flag is a pure
    * INTEGER gate (`n_braces >= minBraces AND n_semis >= minSemis`), so
    * the decision is bit-identical on every engine. Per-row column
    * algebra on the scan + one group aggregate with map-side partials.
    *
    * @return (group, n_docs, n_code_docs, n_braces, n_semis, n_assigns)
    */
  def codeDetect(df: DataFrame, groupCol: String, textCol: String,
      minBraces: Int = 2, minSemis: Int = 2): DataFrame = {
    require(minBraces >= 1 && minSemis >= 1,
      s"thresholds must be >= 1, got minBraces=$minBraces minSemis=$minSemis")
    val t = col(textCol)
    val braces = charCount(t, "{") + charCount(t, "}")
    val semis = charCount(t, ";")
    val assigns = charCount(t, "=")
    df.filter(t.isNotNull)
      .select(col(groupCol), braces.as("__b"), semis.as("__s"), assigns.as("__a"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__b") >= minBraces && col("__s") >= minSemis, 1L)
          .otherwise(0L)).as("n_code_docs"),
        sum(col("__b")).cast("long").as("n_braces"),
        sum(col("__s")).cast("long").as("n_semis"),
        sum(col("__a")).cast("long").as("n_assigns"))
  }

  /** Sentence-aware chunking — the RAG/long-context splitter that never
    * cuts mid-sentence: sentences ([[sentences]]' terminal-punctuation
    * rule) pack into chunks that BEGIN whenever the running token count
    * crosses a `budgetTokens` multiple, so a chunk may exceed the budget
    * by at most its last sentence rather than truncating it — retrieval
    * quality's preferred failure mode. The fixed-window complement
    * ([[graft.operators.PackOps.chunkDocuments]]) slices exactly at
    * budget with overlap; this one trades size variance for boundary
    * sanity. Reassembly is offset-sorted, the x05 discipline.
    *
    * Scale shape: posexplode to sentence rows, then ONE doc-key exchange
    * drives the running-sum window and the per-chunk regroup
    * (HashPartitioning(doc) satisfies (doc, chunk) clustering).
    *
    * @return (idCol, chunk_id, n_sentences, chunk_tokens, chunk_text)
    */
  def sentenceChunks(docs: DataFrame, idCol: String, textCol: String,
      budgetTokens: Int): DataFrame = {
    require(budgetTokens >= 1, s"budgetTokens must be >= 1, got $budgetTokens")
    import org.apache.spark.sql.expressions.Window
    val sents = docs.filter(col(s"`$idCol`").isNotNull && col(s"`$textCol`").isNotNull)
      .select(col(s"`$idCol`").as(idCol),
        posexplode(sentences(col(s"`$textCol`"))).as(Seq("__pos", "__sent")))
      .withColumn("__nt", size(tokens(col("__sent"))).cast("long"))
    val before = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    sents
      .withColumn("__before", coalesce(sum(col("__nt")).over(before), lit(0L)))
      .withColumn("chunk_id", expr(s"__before div ${budgetTokens}L"))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(count(lit(1)).as("n_sentences"),
        sum(col("__nt")).as("chunk_tokens"),
        concat_ws(". ", transform(
          array_sort(collect_list(struct(col("__pos"), col("__sent")))),
          x => x.getField("__sent"))).as("chunk_text"))
  }

  /** Luhn-checksum validation of card-number candidates — the
    * false-positive killer the [[piiRedact]] pattern family cannot
    * express in a regex: a 13-19 digit run is only a REAL card number if
    * its Luhn checksum closes (double every second digit from the right,
    * subtract 9 above 9, total ≡ 0 mod 10 — the check all issuers
    * enforce), so `n_valid < n_candidates` separates actual leaked PANs
    * from order ids and timestamps that merely look like them. Pure
    * higher-order column algebra (transform over a position sequence +
    * aggregate) — codegen'd, no UDF, engine-replayable digit for digit.
    *
    * @return (idCol, n_candidates, n_valid) per document
    */
  def luhnValidCards(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    def luhnOk(s: Column): Column = {
      val rev = reverse(s)
      val total = aggregate(
        transform(sequence(lit(1), length(s)), i => {
          val dig = rev.substr(i, lit(1)).cast("int")
          when(pmod(i, lit(2)) === 0,
            when(dig * 2 > 9, dig * 2 - 9).otherwise(dig * 2)).otherwise(dig)
        }),
        lit(0), (acc, x) => acc + x)
      pmod(total, lit(10)) === 0
    }
    docs.filter(col(s"`$idCol`").isNotNull && col(s"`$textCol`").isNotNull)
      .select(col(s"`$idCol`").as(idCol),
        regexp_extract_all(col(s"`$textCol`"), lit("[0-9]{13,19}"), lit(0)).as("__c"))
      .select(col(idCol), size(col("__c")).as("n_candidates"),
        size(filter(col("__c"), c => luhnOk(c))).as("n_valid"))
  }

  /** Out-of-vocabulary rate per document against a supplied vocabulary
    * frame (one `token` column — typically [[vocabCoverage]]'s top-k, a
    * tokenizer's vocab export, or an allowlist): the OOV gate run before
    * committing a corpus to a FIXED tokenizer, where every OOV token
    * becomes byte-fallback pieces (inflating sequence length) or
    * `<unk>`. Counts OCCURRENCES, not types — a doc repeating one OOV
    * token 50 times really does pay 50 times.
    *
    * Scale shape: one explode + a broadcast (vocab-sized) left join + a
    * per-doc aggregate with map-side partials. Token-less docs emit
    * (0, 0, NULL) rather than vanishing.
    *
    * @return (idCol, n_tokens, n_oov, oov_rate)
    */
  def oovRate(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    require(vocab.columns.contains("token"),
      s"vocab frame needs a `token` column, got ${vocab.columns.mkString(", ")}")
    val v = broadcast(vocab.select(col("token")).distinct()
      .withColumn("__in", lit(true)))
    docs.filter(col(s"`$idCol`").isNotNull && col(s"`$textCol`").isNotNull)
      .select(col(s"`$idCol`").as("__id"),
        explode_outer(tokens(col(s"`$textCol`"))).as("token"))
      .join(v, Seq("token"), "left")
      .groupBy(col("__id"))
      .agg(count(col("token")).as("n_tokens"),
        count(when(col("token").isNotNull && col("__in").isNull, lit(1))).as("n_oov"))
      .select(col("__id").as(idCol), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / when(col("n_tokens") > 0, col("n_tokens")))
          .as("oov_rate"))
  }

  /** Per-source corpus report card — the one-frame deliverable a data
    * pipeline hands its consumers: for each source, volume (docs, chars,
    * tokens), exact-duplicate surplus and rate (md5 fingerprints),
    * quality-gate pass count and rate ([[qualityFilter]], the t08
    * thresholds), and the dominant predicted language with its share
    * ([[langId]]). Every rate is one fp division of exact integer counts;
    * the dominant-language tie breaks (count desc, lang asc) via the
    * min-of-(−count, lang)-struct idiom, so the report is deterministic
    * and engine-replayable end to end.
    *
    * Scale shape: one signals projection per doc (tokenize once — the
    * gate, fingerprint, and language share it), one per-source aggregate
    * (the countDistinct fingerprint adds the usual expand), one
    * languages-bounded (source, lang) roll-up, and a source-keyed join of
    * the two tiny report frames. NULL text or NULL group rows are out of
    * scope (no report position).
    *
    * @return (groupCol, n_docs, n_chars, n_tokens, n_exact_dups,
    *         dup_rate, n_quality_pass, quality_pass_rate, top_lang,
    *         top_lang_share)
    */
  def corpusReport(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String): DataFrame = {
    val gated = qualityFilter(
      docs.filter(col(textCol).isNotNull && col(groupCol).isNotNull)
        .select(col(idCol).as("__id"), col(groupCol).as("grp"),
          col(textCol).as("__text")),
      "__text", minTokens = 20, maxTokens = 90, minMeanTokLen = 2.0,
      maxMeanTokLen = 12.0, minStopwordRatio = 0.01, maxDupTokenFrac = 0.6)
      .withColumn("__fp", md5(col("__text")))
      .withColumn("__lang", langId(col("__text")))
    val perGroup = gated.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("long")).as("n_chars"),
        sum(col("n_tokens").cast("long")).as("n_tokens"),
        countDistinct(col("__fp")).as("__nfp"),
        count(when(col("keep"), lit(1))).as("n_quality_pass"))
    val langTop = gated.groupBy(col("grp"), col("__lang"))
      .agg(count(lit(1)).as("__ln"))
      .groupBy(col("grp"))
      .agg(min(struct((-col("__ln")).as("nn"), col("__lang").as("l"))).as("__top"))
      .select(col("grp"), col("__top.l").as("top_lang"), (-col("__top.nn")).as("__topn"))
    perGroup.join(langTop, "grp")
      .select(col("grp").as(groupCol), col("n_docs"), col("n_chars"), col("n_tokens"),
        (col("n_docs") - col("__nfp")).as("n_exact_dups"),
        ((col("n_docs") - col("__nfp")).cast("double") / col("n_docs")).as("dup_rate"),
        col("n_quality_pass"),
        (col("n_quality_pass").cast("double") / col("n_docs")).as("quality_pass_rate"),
        col("top_lang"),
        (col("__topn").cast("double") / col("n_docs")).as("top_lang_share"))
  }

  /** Bigram language-model cross-entropy per document — the KenLM-style
    * "perplexity filter" quality signal (CCNet/Gopher lineage): train
    * add-one-smoothed bigram statistics on the corpus itself, then score
    * each document by the mean negative log-probability of its bigrams.
    * High cross-entropy = text the corpus's own statistics find
    * improbable (gibberish, boilerplate soup, wrong-language fragments);
    * the score feeds a threshold or stratified-sampling curation stage.
    *
    * Model: P(w2|w1) = (C(w1,w2) + 1) / (C(w1·) + V) with context counts
    * C(w1·) = Σ_w2 C(w1,w2) and V = |distinct successor vocabulary| — a
    * self-contained estimate derivable from ONE bigram-count aggregation
    * (no separate unigram pass; last tokens of documents never pad the
    * context, keeping the train and score streams identical).
    *
    * Scale shape: the corpus reduces to a vocab²-bounded (in practice
    * Zipf-tiny) bigram-count model in one map-side-partial aggregate +
    * one context roll-up; scoring is two EQUI-joins of the gram stream
    * against those model frames (broadcast at dim size, shuffle-hash
    * beyond — never a window, never all-pairs) and V rides a broadcast
    * scalar. Determinism discipline (the p05/t12 recipe): each bigram's
    * −ln P is computed from exact integer operands and immediately
    * rounded to 9 dp, the per-doc reduction is an EXACT DECIMAL(28,9)
    * sum (order-independent — a raw double Σln would hash-diverge under
    * Spark's nondeterministic reduce order), and the final score is one
    * fp division of exact operands.
    *
    * @return (idCol, n_bigrams, xent) — xent in nats/bigram; a doc with
    *         fewer than 2 tokens has n_bigrams = 0 and NULL xent
    */
  def lmQualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val g = df.select(col(idCol), wordNgrams(tokens(col(textCol)), 2).as("__g"))
    val tot = g.select(col(idCol), size(col("__g")).cast("long").as("n_bigrams"))
    val e = g.select(col(idCol), explode(col("__g")).as("__gram"))
    val c12 = e.groupBy(col("__gram")).agg(count(lit(1)).as("__c12"))
    val ctx = c12.groupBy(substring_index(col("__gram"), " ", 1).as("__w1"))
      .agg(sum(col("__c12")).as("__c1"))
    val v = c12.agg(
      countDistinct(substring_index(col("__gram"), " ", -1)).as("__v"))
    val scored = e
      .join(c12, "__gram")
      .withColumn("__w1", substring_index(col("__gram"), " ", 1))
      .join(ctx, "__w1")
      .crossJoin(broadcast(v))
      .select(col(idCol),
        round(-log((col("__c12") + 1).cast("double") / (col("__c1") + col("__v"))), 9)
          .cast(DecimalType(28, 9)).as("__lp"))
    tot.join(scored.groupBy(col(idCol)).agg(sum(col("__lp")).as("__s")),
        Seq(idCol), "left")
      .select(col(idCol), col("n_bigrams"),
        (col("__s").cast("double") / col("n_bigrams")).as("xent"))
  }

  /** Vocabulary-growth (Heaps-law) curve (round 17): distinct-type count
    * vs cumulative token count at hash-ordered corpus prefixes — the
    * measured form of the "real corpora grow vocabulary" property the
    * dedup prefix-filter analysis leans on (BENCH_NOTES sf10 section):
    * a corpus whose types plateau while tokens grow is the PPJoin
    * worst case; Heaps-like sub-linear growth (V ∝ N^β, β < 1) is what
    * the candidate-pruning story assumes. One frame answers both.
    *
    * Prefixes are md5-order buckets ([[graft.operators.SampleOps
    * .md5Bucket]], the engine-replayable split family): cut b = all docs
    * whose bucket ≤ b, so the curve is deterministic and any engine
    * replays it. The exact-count trick that keeps this ONE pass: types
    * at cut b = tokens whose FIRST-OCCURRENCE bucket ≤ b, so one
    * groupBy(token).min(bucket) aggregate + a ≤100-row histogram answers
    * every cut — never a per-cut distinct scan.
    *
    * Scale shape: the token explode + groupBy(token) is the only
    * data-sized exchange; doc/token mass and the first-seen histogram
    * are ≤100-row slivers broadcast onto the cut frame.
    *
    * @return (cut_bucket, n_docs, n_tokens, n_types), one row per cut
    */
  def vocabularyGrowth(docs: DataFrame, idCol: String, textCol: String,
      cuts: Seq[Int] = Seq(0, 1, 3, 7, 15, 31, 63, 99)): DataFrame = {
    require(cuts.nonEmpty && cuts == cuts.sorted &&
      cuts.distinct.size == cuts.size && cuts.forall(c => c >= 0 && c <= 99),
      s"cuts must be sorted, distinct, in [0, 99]; got $cuts")
    val spark = docs.sparkSession
    import spark.implicits._
    val bucketed = docs.filter(col(s"`$textCol`").isNotNull)
      .select(SampleOps.md5Bucket(col(s"`$idCol`")).cast("int").as("b"),
        tokens(col(s"`$textCol`")).as("__w"))
    val mass = bucketed.groupBy(col("b"))
      .agg(count(lit(1)).as("docs"), sum(size(col("__w"))).cast("long").as("toks"))
    val firstSeen = bucketed.select(col("b"), explode(col("__w")).as("tok"))
      .groupBy(col("tok")).agg(min(col("b")).as("fb"))
    val typeHist = firstSeen.groupBy(col("fb")).agg(count(lit(1)).as("types"))
    val cutsDf = cuts.toDF("cut_bucket")
    val m2 = cutsDf.join(broadcast(mass), col("b") <= col("cut_bucket"), "left")
      .groupBy(col("cut_bucket"))
      .agg(coalesce(sum(col("docs")), lit(0L)).cast("long").as("n_docs"),
        coalesce(sum(col("toks")), lit(0L)).cast("long").as("n_tokens"))
    val t2 = cutsDf.join(broadcast(typeHist), col("fb") <= col("cut_bucket"), "left")
      .groupBy(col("cut_bucket"))
      .agg(coalesce(sum(col("types")), lit(0L)).cast("long").as("n_types"))
    m2.join(t2, Seq("cut_bucket"))
  }
}
