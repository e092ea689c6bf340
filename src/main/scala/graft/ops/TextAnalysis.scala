package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Text analysis for training-data pipelines — language ID, quality
 * scoring, token counting, fingerprinting. All pure Catalyst expressions
 * (codegen'd, no UDFs): at 100 TB these run inside the parquet scan's
 * whole-stage-codegen span with zero extra passes.
 */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(split(text, " "))

  /** BPE-ish subword proxy: word-pieces + punctuation as separate tokens —
    * the standard `\w+|[^\w\s]` pre-tokenizer regex. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("""\w+|[^\w\s]"""), lit(0)))

  /**
   * Token-window chunking with overlap — the standard RAG / training
   * ingest step before embedding. Chunk i covers tokens
   * [i·step, i·step + chunkTokens) with step = chunkTokens − overlap;
   * every document yields ≥ 1 chunk and every token is covered. Pure
   * Catalyst (transform + slice over one split), so at 100 TB it runs
   * inside the scan with no extra pass and no UDF.
   */
  def chunks(text: Column, chunkTokens: Int, overlap: Int): Column = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      "need 0 <= overlap < chunkTokens")
    val step = chunkTokens - overlap
    val toks = split(text, " ")
    val nChunks = greatest(
      ceil((size(toks) - overlap).cast("double") / step).cast("int"), lit(1))
    transform(
      sequence(lit(0), nChunks - 1),
      i => concat_ws(" ", slice(toks, i * step + 1, lit(chunkTokens))))
  }

  /** One row per chunk: (idCol, chunk_idx, chunk). */
  def explodeChunks(
      df: DataFrame,
      textCol: String,
      idCol: String,
      chunkTokens: Int,
      overlap: Int): DataFrame =
    df.select(col(idCol),
        posexplode(chunks(col(textCol), chunkTokens, overlap)))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk")

  /** Quality features in one projection: char length, token count, mean
    * word length, punctuation ratio, whitespace ratio, stopword ratio,
    * all-caps-word ratio. */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = split(t, " ")
    val n = length(t).cast("double")
    df.withColumn("n_chars_q", length(t))
      .withColumn("n_tokens", size(toks))
      .withColumn("mean_word_len",
        round(length(regexp_replace(t, " ", "")).cast("double") / size(toks), 4))
      .withColumn("punct_ratio",
        round(length(regexp_replace(t, """[\w\s]""", "")).cast("double") / n, 4))
      .withColumn("space_ratio",
        round((n - length(regexp_replace(t, " ", ""))) / n, 4))
      .withColumn("stopword_ratio", round(stopwordRatio(t), 4))
      .withColumn("caps_word_ratio",
        round(size(filter(toks, w => w.rlike("^[A-Z]{2,}$"))).cast("double") / size(toks), 4))
  }

  /** The eight "required" stopwords of the Gopher quality filter
    * (Rae et al. 2021, "Scaling Language Models", table A1). */
  private[graft] val GopherStopwords =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /**
   * Gopher document-quality rules (Rae et al. 2021 §A1.1, as reused by
   * MassiveText / RefinedWeb / Dolma): word-count bounds, mean word
   * length 3–10, symbol-to-word ratio ≤ 0.1 for the hash symbol AND
   * for the ellipsis SEPARATELY (the paper removes a document when
   * EITHER symbol's own ratio exceeds 0.1 — a round-13 audit
   * follow-up found kernel + oracle summing the two counts into one
   * ratio, failing docs the paper keeps, e.g. hash 0.06 + ellipsis
   * 0.06), ≤90% of lines bullet-led (the paper removes only near-pure
   * bullet LISTS — the same r13 audit found this rule inverted at
   * ≤10%, rejecting any normally-bulleted document), ≤30% of lines
   * ellipsis-terminated, ≥80% of words containing an alphabetic
   * character, and ≥2 of the eight required stopwords present.
   *
   * Every rule is emitted twice: the raw integer counter (auditable,
   * aggregable across a corpus) and the boolean verdict. Verdicts are
   * decided by integer cross-multiplication (e.g. symbol ratio ≤ 1/10
   * ⇔ 10·n_hash_symbols ≤ n_words) — no floating-point ratio ever decides a
   * flag, so results are bit-stable across engines and partitionings.
   * All counters are codegen'd expressions over the scan — at 100 TB
   * this is one map-only pass with zero shuffles.
   *
   * Regex portability: `[ \t]` instead of `\s` (Java's `\s` includes
   * vertical tab, RE2's does not), no backreferences — the same
   * patterns replay exactly in the DuckDB oracle.
   */
  def gopherRules(
      df: DataFrame,
      textCol: String,
      minWords: Int = 50,
      maxWords: Int = 100000): DataFrame = {
    val t = col(textCol)
    val toks = split(t, " ")
    val low = split(lower(t), " ")
    val lines = split(t, "\n")
    val nWords = size(toks).cast("long")
    val nLines = size(lines).cast("long")
    // non-overlapping occurrence counts via length deltas (both engines
    // replace left-to-right, non-overlapping)
    def occurrences(needle: String): Column =
      ((length(t) - length(replace(t, lit(needle), lit("")))) /
        lit(needle.length)).cast("long")
    val nHash = occurrences("#")
    val nEllipsisSym = occurrences("...") + occurrences("…")
    val nBullet = size(filter(lines, l => l.rlike("^[ \t]*[-*•]"))).cast("long")
    val nEllipsis =
      size(filter(lines, l => l.rlike("(\\.\\.\\.|…)[ \t]*$"))).cast("long")
    val nAlpha = size(filter(toks, w => w.rlike("[A-Za-z]"))).cast("long")
    val nStop = GopherStopwords
      .map(s => when(array_contains(low, s), 1L).otherwise(0L))
      .reduce(_ + _)
    val sumWordChars = length(regexp_replace(t, " ", "")).cast("long")
    df.withColumn("n_words", nWords)
      .withColumn("sum_word_chars", sumWordChars)
      .withColumn("n_hash_symbols", nHash)
      .withColumn("n_ellipsis_symbols", nEllipsisSym)
      .withColumn("n_lines", nLines)
      .withColumn("n_bullet_lines", nBullet)
      .withColumn("n_ellipsis_lines", nEllipsis)
      .withColumn("n_alpha_words", nAlpha)
      .withColumn("n_stopword_hits", nStop)
      .withColumn("pass_word_count",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("pass_mean_word_len",
        col("sum_word_chars") >= lit(3L) * col("n_words") &&
          col("sum_word_chars") <= lit(10L) * col("n_words"))
      .withColumn("pass_symbol_ratio", // EITHER symbol's own ratio > 0.1 fails
        lit(10L) * col("n_hash_symbols") <= col("n_words") &&
          lit(10L) * col("n_ellipsis_symbols") <= col("n_words"))
      .withColumn("pass_bullet", // ≤90%: 10·n_bullet ≤ 9·n_lines
        lit(10L) * col("n_bullet_lines") <= lit(9L) * col("n_lines"))
      .withColumn("pass_ellipsis",
        lit(10L) * col("n_ellipsis_lines") <= lit(3L) * col("n_lines"))
      .withColumn("pass_alpha",
        lit(10L) * col("n_alpha_words") >= lit(8L) * col("n_words"))
      .withColumn("pass_stopwords", col("n_stopword_hits") >= 2L)
      .withColumn("pass_gopher",
        col("pass_word_count") && col("pass_mean_word_len") &&
          col("pass_symbol_ratio") && col("pass_bullet") &&
          col("pass_ellipsis") && col("pass_alpha") && col("pass_stopwords"))
  }

  /**
   * C4 cleaning rules (Raffel et al. 2020 §2.2, the heuristics behind
   * the C4 corpus): keep only lines that end in a terminal punctuation
   * mark, contain ≥ `minWordsPerLine` words, and don't mention
   * "javascript"; then drop any page with fewer than `minSentences`
   * sentences across its kept lines, any page containing "lorem ipsum",
   * and any page containing a curly brace.
   *
   * Like [[gopherRules]], every rule surfaces as an exact integer
   * counter plus a boolean verdict (no floating-point decisions), and
   * `kept_text` carries the line-filtered page for downstream reuse —
   * all computed in one map-only pass over the scan, zero shuffles at
   * any scale. Sentences are counted as occurrences of `.`/`!`/`?` in
   * the kept text (an approximation: a kept line terminated by a bare
   * end quote contributes none).
   *
   * Regex portability (Java ⇄ RE2/DuckDB): `[ \t]` not `\s`, explicit
   * character classes, no backreferences.
   */
  def c4Rules(
      df: DataFrame,
      textCol: String,
      minSentences: Int = 5,
      minWordsPerLine: Int = 3): DataFrame = {
    val lines = split(col(textCol), "\n")
    // C4's reference implementation keeps a line that ends with any of
    // `.` `?` `!` `"` — an END QUOTATION MARK ALONE is terminal (the
    // paper lists it as one of the terminal punctuation marks; dialogue
    // lines end this way). A r13 audit follow-up found both this kernel
    // and its oracle requiring [.!?] before the quote, dropping lines
    // C4 keeps. `'` is non-terminal EVERYWHERE (apostrophe ≠ end
    // quote): r14 removed it from the optional after-punctuation class
    // too — C4's endswith check sees only the last character, so
    // "word.'" ends with `'` and is dropped; keeping it here
    // contradicted this same rule's own apostrophe convention
    // (ADVICE r13).
    val keptLines = filter(lines, l =>
      l.rlike("([.!?][\"”]?|[\"”])[ \t]*$") &&
        size(filter(split(l, " "), w => w =!= "")) >= minWordsPerLine &&
        !lower(l).contains("javascript"))
    val keptText = concat_ws("\n", keptLines)
    def occ(c: Column, needle: String): Column =
      ((length(c) - length(replace(c, lit(needle), lit("")))) /
        lit(needle.length)).cast("long")
    df.withColumn("n_lines", size(lines).cast("long"))
      .withColumn("kept_text", keptText)
      .withColumn("n_kept_lines", size(keptLines).cast("long"))
      .withColumn("n_sentences",
        occ(col("kept_text"), ".") + occ(col("kept_text"), "!") +
          occ(col("kept_text"), "?"))
      .withColumn("has_lorem",
        lower(col(textCol)).contains("lorem ipsum"))
      .withColumn("has_brace", col(textCol).contains("{"))
      .withColumn("pass_c4",
        col("n_sentences") >= minSentences.toLong &&
          !col("has_lorem") && !col("has_brace"))
  }

  /** Gopher §A1.2 top-n-gram caps: fraction of characters attributable
    * to the single most frequent word n-gram, per cent (n → max %). */
  private[graft] val TopNgramCapsPct = Map(2 -> 20, 3 -> 18, 4 -> 16)

  /**
   * Gopher repetition filter, exact tier (Rae et al. 2021 §A1.2): for
   * each n in `ns`, the most frequent word n-gram of every document and
   * the fraction of the document's characters it accounts for
   * (`top_count · length(top_gram)` vs `length(text)`). Documents whose
   * top n-gram exceeds the Gopher cap (20%/18%/16% for n=2/3/4) are
   * flagged. Complements [[repetitionFeatures]] (duplicate lines) and
   * `dedup_spans` (cross-document substring dups).
   *
   * Determinism: ties on count break to the lexicographically smallest
   * gram inside the per-row kernel. Verdicts are integer
   * cross-multiplication (`100·gram_chars ≤ cap·total_chars`). Docs
   * shorter than n tokens keep their (doc, n) row with a null gram and
   * zero counts (profile-key joins see nulls, not holes).
   *
   * Scale shape: a per-DOCUMENT statistic, computed per document — one
   * scan, one codegen projection calling [[graft.functions.NgramStats]]
   * once per (doc, n), ZERO exchanges. The previous formulation
   * (explode every gram → two corpus-wide aggregates) shuffled
   * O(tokens·|ns|) rows per doc and paid interpreted HOF evaluation per
   * gram — ~5× slower at sf0.1 and a needless shuffle at any scale.
   */
  def topNgramRepetition(
      df: DataFrame,
      textCol: String,
      idCol: String,
      ns: Seq[Int] = Seq(2, 3, 4)): DataFrame = {
    require(ns.nonEmpty && ns.forall(n => TopNgramCapsPct.contains(n)),
      s"ns must be among ${TopNgramCapsPct.keys.toSeq.sorted}")
    val base = df.select(col(idCol).as("doc_id"),
      length(col(textCol)).cast("long").as("total_chars"),
      split(col(textCol), " ").as("__toks"))
    val withN = base.select(col("doc_id"), col("total_chars"), col("__toks"),
      explode(array(ns.map(n => lit(n)): _*)).as("n"))
    val capPct = ns.map(n => (lit(n), lit(TopNgramCapsPct(n))))
      .foldLeft(lit(null).cast("int")) { case (acc, (n, cap)) =>
        when(col("n") === n, cap).otherwise(acc) }
    withN
      .withColumn("t",
        graft.functions.NgramStats.top_ngram_stats(col("__toks"), col("n")))
      .withColumn("top_gram", col("t.gram"))
      .withColumn("top_count", coalesce(col("t.cnt"), lit(0L)))
      .withColumn("gram_chars",
        coalesce(col("top_count") * length(col("top_gram")).cast("long"), lit(0L)))
      .withColumn("pass_top_ngram",
        lit(100L) * col("gram_chars") <= capPct.cast("long") * col("total_chars"))
      .select(col("doc_id"), col("n"), col("top_gram"), col("top_count"),
        col("gram_chars"), col("total_chars"), col("pass_top_ngram"))
  }

  /** Gopher §A1.2 duplicate-n-gram caps: max % of characters inside
    * n-grams that repeat within the document (n → max %). */
  private[graft] val DupNgramCapsPct =
    Map(5 -> 15, 6 -> 14, 7 -> 13, 8 -> 12, 9 -> 11, 10 -> 10)

  /**
   * Gopher repetition filter, coverage tier (Rae et al. 2021 §A1.2,
   * second family): the fraction of a document covered by word n-grams
   * that occur MORE THAN ONCE in that document — the union of their
   * spans, so overlapping repeats are not double-counted. Coverage is
   * measured over token positions and token characters (separator
   * spaces excluded), which keeps every number an exact integer; caps
   * are the Gopher thresholds 15/14/13/12/11/10% for n=5…10, decided by
   * cross-multiplication. Complements [[topNgramRepetition]] (the
   * single-most-frequent-gram family).
   *
   * Shape: a per-DOCUMENT statistic, computed per document — one scan,
   * one codegen projection calling [[graft.functions.NgramStats]] once
   * per row (count grams, mark spans of the duplicated ones, union,
   * tally), ZERO exchanges. The previous formulation exploded positions
   * AND grams into three corpus-wide aggregates plus two joins — every
   * one of those exchanges keyed by (doc, …) for state that never
   * leaves the document. Docs shorter than n tokens keep their row with
   * zero coverage.
   */
  def dupNgramCoverage(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int): DataFrame = {
    require(DupNgramCapsPct.contains(n),
      s"n must be among ${DupNgramCapsPct.keys.toSeq.sorted}")
    val capPct = DupNgramCapsPct(n)
    df.select(col(idCol).as("doc_id"),
        graft.functions.NgramStats.dup_ngram_stats(
          split(col(textCol), " "), lit(n)).as("s"))
      .select(col("doc_id"), lit(n).as("n"),
        col("s.n_tokens").as("n_tokens"),
        col("s.covered_tokens").as("covered_tokens"),
        col("s.covered_chars").as("covered_chars"),
        col("s.token_chars").as("token_chars"),
        (lit(100L) * col("s.covered_chars")
          <= lit(capPct.toLong) * col("s.token_chars")).as("pass_dup_ngram"))
  }

  /**
   * Corpus datasheet: the per-slice counters a dataset card reports —
   * document/word/char totals and Gopher-quality pass counts, grouped
   * by the given slice columns (source, language, …). Pure integer
   * aggregates over the [[gopherRules]] frame: one scan, one map-side-
   * combined aggregate whose exchange is bounded by the slice
   * cardinality — the cheapest possible shape at any corpus size.
   * Rates are left to the consumer (n_pass_gopher / n_docs) so the
   * published numbers stay exact.
   */
  def corpusDatasheet(
      df: DataFrame,
      textCol: String,
      sliceCols: Seq[String]): DataFrame = {
    require(sliceCols.nonEmpty, "at least one slice column")
    gopherRules(df, textCol)
      .groupBy(sliceCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("total_words"),
        sum(length(col(textCol)).cast("long")).as("total_chars"),
        sum(col("n_alpha_words")).as("total_alpha_words"),
        sum(when(col("pass_gopher"), 1L).otherwise(0L)).as("n_pass_gopher"))
  }

  /** English stopword hit ratio over whitespace tokens. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val toks = split(lower(text), " ")
    size(filter(toks, w => w.isInCollection(stopwords))).cast("double") / size(toks)
  }

  /** Compact quality score in [0,1]: penalizes too-short/too-long docs,
    * high punctuation, and stopword-free (= non-linguistic) text. */
  def qualityScore(text: Column): Column = {
    val toks = split(text, " ")
    val nTok = size(toks).cast("double")
    val lenScore = least(nTok / lit(16.0), lit(1.0)) *
      least(lit(2048.0) / greatest(nTok, lit(1.0)), lit(1.0))
    val punct = length(regexp_replace(text, """[\w\s]""", "")).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))
    val punctScore = lit(1.0) - least(punct * lit(4.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) * lit(4.0), lit(1.0))
    round(lenScore * punctScore * (lit(0.5) + stopScore * lit(0.5)), 4)
  }

  /**
   * N-gram language ID heuristic: vote by per-language marker words /
   * character patterns; returns the best-scoring language code or "und".
   * (A real model is out of scope — the reference has no language ID; this
   * is the training-pipeline heuristic tier: cheap, vectorized, codegen'd.)
   */
  def langId(text: Column): Column = {
    val toks = split(lower(text), " ")
    def hits(words: Seq[String]): Column =
      size(filter(toks, w => w.isInCollection(words))).cast("double") / greatest(size(toks).cast("double"), lit(1.0))
    val scores: Seq[(String, Column)] = Seq(
      "en" -> hits(Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "was")),
      "de" -> hits(Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von")),
      "es" -> hits(Seq("el", "la", "los", "las", "es", "y", "de", "que", "en", "por")),
      "fr" -> hits(Seq("le", "la", "les", "et", "est", "que", "des", "une", "dans", "pour")),
      "zh" -> (length(regexp_replace(text, "[^\\u4e00-\\u9fff]", "")).cast("double") /
        greatest(length(text).cast("double"), lit(1.0))))
    // Tie-break rule (shared with FastLangId): FIRST language in the list
    // wins equal scores — encoded as a descending priority field so
    // greatest(struct) can't fall through to lexicographic code order.
    val best = scores.zipWithIndex.map { case ((lang, s), i) =>
      struct(s.as("s"), lit(scores.length - i).as("p"), lit(lang).as("l"))
    }
    val top = greatest(best: _*)
    when(top.getField("s") > 0, top.getField("l")).otherwise(lit("und"))
  }

  // PII patterns kept to the portable regex subset (identical semantics
  // under Java regex and RE2): email, IPv4, long digit runs (phone-ish).
  private[graft] val EmailPattern =
    """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  private[graft] val Ipv4Pattern =
    """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
  private[graft] val PhonePattern =
    """\+?\d[\d\-. ]{7,}\d"""

  /**
   * HTML → text extraction: the first step of any web-crawl ingest
   * pipeline. Strips script/style blocks, comments, and tags (tags
   * become word boundaries), decodes the six ubiquitous entities, and
   * collapses whitespace. A chain of codegen'd regexp_replace/replace —
   * runs inside the scan like the other text kernels, no parse tree, no
   * UDF.
   *
   * Portability discipline: patterns avoid backreferences and `\s`
   * (Java regex and DuckDB's RE2 disagree on both — `\s` includes
   * vertical tab in Java only), so the exact chain replays in the
   * DuckDB oracle. `&amp;` decodes LAST: `&amp;lt;` must yield the
   * literal text `&lt;`, not `<`.
   */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    trim(regexp_replace(decoded, "[ \t\n\r\f]+", " "))
  }

  /**
   * URL host extraction — scheme, userinfo, port, path, query stripped;
   * lowercased; leading `www.` dropped. Web-corpus curation is organized
   * around the source host (per-domain caps, domain blocklists, domain
   * mixing weights — `capPerGroup`/`downsample` take the result as their
   * group column). Single codegen'd regex, RE2-safe for the oracle.
   */
  def urlHost(url: Column): Column = {
    val host = regexp_extract(url,
      "^(?:[A-Za-z][A-Za-z0-9+.-]*://)?(?:[^/?#@]*@)?([^/:?#]+)", 1)
    regexp_replace(lower(host), "^www\\.", "")
  }

  /** Registrable-domain heuristic: the last two dot-labels of the host
    * (`cdn3.example.org` → `example.org`). Deliberately suffix-list-free
    * (a real PSL lookup is a broadcast-join against the public list);
    * documented approximation for grouping, not ownership. */
  def registeredDomain(url: Column): Column =
    regexp_extract(urlHost(url), "([^.]+\\.[^.]+)$", 1)

  /** PII redaction — the standard pre-training scrub. Three chained
    * codegen'd regexp_replace calls, in-scan, no extra pass. Order
    * matters: emails first (their digits must not be phone-matched),
    * then IPs (dotted digits), then phone-ish digit runs. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /**
   * Within-document repetition metrics (Gopher-style quality signals):
   * fraction of duplicate lines and fraction of characters inside
   * duplicate lines. High values ⇒ boilerplate/template pages that
   * depress model quality. Pure Catalyst over one split("\n").
   */
  def repetitionFeatures(df: DataFrame, textCol: String): DataFrame = {
    val lines = split(col(textCol), "\n")
    val nLines = size(lines).cast("double")
    val nDistinct = size(array_distinct(lines)).cast("double")
    val totChars = aggregate(lines, lit(0L),
      (acc, l) => acc + length(l)).cast("double")
    val distinctChars = aggregate(array_distinct(lines), lit(0L),
      (acc, l) => acc + length(l)).cast("double")
    df.withColumn("dup_line_frac",
        round((nLines - nDistinct) / greatest(nLines, lit(1.0)), 4))
      .withColumn("dup_char_frac",
        round((totChars - distinctChars) / greatest(totChars, lit(1.0)), 4))
  }

  // Control characters except \t (09), \n (0a), \r (0d) — the strip set
  // is shared (same \x escapes) between Java regex and RE2.
  private[graft] val ControlCharPattern = """[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"""

  /**
   * Canonical text normalization before hashing/dedup: Unicode NFC
   * (composed form — decomposed "e◌́" ⇒ "é", so byte-identical text
   * fingerprints identically) followed by a control-character strip
   * (everything below 0x20 except tab/newline/CR, plus DEL). Both steps
   * are in-scan: a codegen'd kernel with an already-normalized fast path
   * and one codegen'd regexp_replace.
   */
  def normalizeText(text: Column): Column =
    regexp_replace(graft.functions.NormalizeFunctions.nfc(text),
      ControlCharPattern, "")

  /** Stable content fingerprint (md5 hex — portable across engines). */
  def fingerprint(text: Column): Column = md5(text)

  /** Order-sensitive rolling hash over tokens: a double-modulus Horner
    * chain (M=31/131 mod two ~2^30 primes, combined into one ~60-bit
    * value) over 60-bit md5-derived token hashes. Distinguishes
    * permutations that set-based fingerprints collapse. Every step is
    * engine-portable (md5 + hex-slice + modular Horner — DuckDB replays it
    * with list_reduce, unlike xxhash64) and the modular arithmetic never
    * exceeds 2^63, so it is ANSI-overflow-safe. Pure Catalyst: one
    * transform + two folds inside the scan, no UDF. This is the
    * order-SENSITIVE checksum tier; `fingerprint` (full md5) remains the
    * collision-resistant content digest. */
  def rollingHash(text: Column): Column = {
    val (p1, p2) = (1000000007L, 998244353L)
    val (m1, m2) = (31L, 131L)
    val hashes = transform(split(text, " "),
      t => conv(substring(md5(t), 1, 15), 16, 10).cast("long"))
    val f1 = aggregate(hashes, lit(0L), (acc, h) => (acc * m1 + h % p1) % p1)
    val f2 = aggregate(hashes, lit(0L), (acc, h) => (acc * m2 + h % p2) % p2)
    f1 * lit(p2) + f2
  }

  /**
   * Corpus vocabulary: the `topK` most frequent whitespace tokens with
   * counts — the frequency table a tokenizer-training / frequency-filter
   * step consumes. One explode into a partial+final hash aggregate
   * (map-side combine shrinks the token shuffle to distinct-tokens per
   * partition) and a bounded TakeOrderedAndProject top-k — no full sort,
   * no window. Ties at the cutoff break by token ascending, so the
   * result is deterministic (and oracle-checkable).
   */
  def vocabulary(df: DataFrame, textCol: String, topK: Int): DataFrame = {
    require(topK > 0, "topK must be > 0")
    df.select(explode(split(col(textCol), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), asc("token"))
      .limit(topK)
  }

  /**
   * Vocabulary coverage curve: the top-k tokens with each prefix's
   * cumulative share of ALL token occurrences — the Zipf/coverage signal
   * behind vocabulary-size decisions ("how many types cover 95% of the
   * corpus?") and OOV-rate estimates for a candidate tokenizer.
   *
   * Scale shape: the corpus pays the one vocabulary aggregate (and a
   * count reusing the same scan shape); the window cumsum runs over the
   * k-row top table only — never the corpus. Coverage is an exact
   * integer ratio divided once (order-stable, SQL-replayable).
   */
  def vocabularyCoverage(df: DataFrame, textCol: String, topK: Int): DataFrame = {
    val toks = df.select(explode(split(col(textCol), " ")).as("token"))
    val total = toks.agg(count(lit(1)).as("__total"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("freq"), asc("token"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    vocabulary(df, textCol, topK)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(desc("freq"), asc("token"))).cast("long"))
      .withColumn("__cum", sum("freq").over(w))
      .crossJoin(broadcast(total))
      .select(col("rank"), col("token"), col("freq"),
        round(col("__cum").cast("double") / col("__total"), 6).as("coverage"))
  }

  /**
   * Per-group characteristic terms: for each group (source, domain,
   * language...), the tokens most over-represented vs the whole corpus,
   * ranked by frequency LIFT — P(token|group) / P(token) — the
   * "what makes this slice different" signal behind corpus audits and
   * domain-mixing decisions.
   *
   * Determinism: lift is computed as one integer floor division
   * (tf_g · T · 1e6) quot (tf · T_g) — exact, engine-portable, no
   * floating log-odds whose last-ulp libm differences could flip ranks.
   * `minCount` suppresses the noise floor (rare tokens trivially reach
   * huge lift). Ties: (lift DESC, token ASC).
   *
   * Scale shape: two token aggregates (per-group and global — both
   * vocabulary-bounded outputs with map-side combine) joined on token,
   * then the bounded-heap top-k per group: the exchange after the counts
   * carries ≤ partitions × groups × k rows, never a full sort.
   */
  /**
   * Per-document characteristic terms by exact-integer TF-IDF: for each
   * document, the k tokens ranked by tf · idf where idf is the RATIONAL
   * inverse document frequency N/df (monotone in the usual log idf for
   * fixed tf, and — unlike a floating log — exactly portable across
   * engines). Score = (tf · N · 1e6) quot df, one truncating integral
   * divide over DECIMAL(38) intermediates; ties (score DESC, term ASC).
   * This is the per-doc keyword/salience signal behind snippet selection,
   * sparse retrieval pruning, and topic tagging of training slices.
   *
   * Scale shape: tokens explode map-side into a (doc, term) hash
   * aggregate (map-side combined — the only data-sized exchange), which
   * materializes ONCE (eager localCheckpoint) so the two consumers —
   * the vocabulary-bounded df aggregate and the scoring join — share
   * one corpus pass instead of Catalyst re-deriving the explode+agg per
   * branch (a second full text scan at 100 TB; locally the checkpoint
   * costs ~0.2 s at sf0.1, the price of scan-once semantics). The doc
   * count joins as a broadcast 1-row frame; the per-doc top-k is the
   * bounded-heap aggregate, so the final exchange carries ≤ partitions
   * × docs-per-partition × k rows — never a window sort over all
   * (doc, term) pairs.
   */
  def tfidfTopTerms(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val toks = df
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
    // materialize tf ONCE (eager, ContextCleaner-owned like Dedup's
    // signature caches): both the df aggregate and the scoring join
    // consume it — without this Catalyst re-derives the whole
    // explode+aggregate from the scan on each branch (two corpus passes)
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).as("n"))
    val scored = tf
      .join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        expr("CAST(tf AS DECIMAL(38,0)) * n * 1000000 DIV " +
          "CAST(df AS DECIMAL(38,0))").as("tfidf_e6"))
    scored
      .groupBy("doc_id")
      .agg(graft.functions.TopKAggregate.topk_rows(
        struct(col("tfidf_e6"), col("term"), col("tf"), col("df")), k)
        .as("__top"))
      .select(col("doc_id"), posexplode(col("__top")).as(Seq("__r", "__e")))
      .select(col("doc_id"), (col("__r") + 1).cast("long").as("rank"),
        col("__e").getField("term").as("term"),
        col("__e").getField("tfidf_e6").as("tfidf_e6"),
        col("__e").getField("tf").as("tf"),
        col("__e").getField("df").as("df"))
  }

  def groupKeywords(
      df: DataFrame,
      textCol: String,
      groupCol: String,
      k: Int,
      minCount: Long = 5L): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val toks = df.select(col(groupCol).as("g"),
      explode(split(col(textCol), " ")).as("token"))
    // ONE corpus explode: perGroup is materialized (its size is
    // groups × vocabulary, corpus-independent) and every other
    // statistic is exactly a rollup of it — global token counts are the
    // sum over groups, group totals the sum over tokens, the grand
    // total the sum of everything. Deriving global/total from `toks`
    // directly re-ran the full text explode+aggregate per consuming
    // branch (the tfidfTopTerms localCheckpoint lesson, same file).
    val perGroup = toks.groupBy("g", "token").agg(count(lit(1)).as("tf_g"))
      .localCheckpoint(true)
    val global = perGroup.groupBy("token").agg(sum("tf_g").as("tf"))
    val groupTotals = perGroup.groupBy("g").agg(sum("tf_g").as("tg"))
    val total = global.agg(sum("tf").as("t"))
    val lifted = perGroup
      .join(global, Seq("token"))
      .join(broadcast(groupTotals), Seq("g"))
      .crossJoin(broadcast(total))
      .filter(col("tf_g") >= minCount)
      // DECIMAL(38) intermediates: count products overflow long at real
      // corpus scales (T² · 1e6 passes 2^63 near 3M tokens); integral
      // divide truncates toward zero in both engines and the quotient
      // (≤ 1e6 · corpus/group ratio) fits BIGINT
      .select(col("g"), col("token"), col("tf_g"),
        expr("CAST(tf_g AS DECIMAL(38,0)) * t * 1000000 DIV " +
          "(CAST(tf AS DECIMAL(38,0)) * tg)").as("lift"))
    lifted
      .groupBy("g")
      .agg(graft.functions.TopKAggregate.topk_rows(
        struct(col("lift"), col("token"), col("tf_g")), k).as("__top"))
      .select(col("g").as(groupCol),
        posexplode(col("__top")).as(Seq("__r", "__e")))
      .select(col(groupCol), (col("__r") + 1).cast("long").as("rank"),
        col("__e").getField("token").as("token"),
        col("__e").getField("lift").as("lift"),
        col("__e").getField("tf_g").as("tf_g"))
  }

  /**
   * Collocation / phrase mining: adjacent word pairs that co-occur far
   * more than chance — the word2phrase step (Mikolov et al. 2013) that
   * induces a phrase vocabulary ("new york", "machine learning") before
   * tokenizer/embedding training.
   *
   * Scored by the same exact-integer lift discipline as
   * [[groupKeywords]]: lift ≈ PMI's ratio c_ab·T / (c_a·c_b), scaled
   * ×1e6 and computed as ONE truncating integral divide over
   * DECIMAL(38) products — no floating log whose libm last-ulp could
   * flip ranks between engines. `minCount` is word2phrase's discount
   * knob (rare pairs trivially reach huge lift).
   *
   * Scale shape: bigram and unigram counts are map-only explodes into
   * vocabulary-bounded aggregates (map-side combined); the join keys on
   * words; the final top-k is the bounded heap — no full sort anywhere.
   */
  def collocations(
      df: DataFrame,
      textCol: String,
      k: Int,
      minCount: Long = 5L): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val toks = df.select(split(col(textCol), " ").as("__t"))
    val bigrams = toks
      .select(explode(when(size(col("__t")) < 2,
          array().cast("array<struct<w1:string,w2:string>>"))
        .otherwise(transform(sequence(lit(1), size(col("__t")) - 1),
          i => struct(element_at(col("__t"), i).as("w1"),
            element_at(col("__t"), i + 1).as("w2"))))).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("c_ab"))
    val unigrams = toks.select(explode(col("__t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val total = unigrams.agg(sum("c").as("t"))
    bigrams
      .join(unigrams.select(col("w").as("w1"), col("c").as("c_a")), Seq("w1"))
      .join(unigrams.select(col("w").as("w2"), col("c").as("c_b")), Seq("w2"))
      .crossJoin(broadcast(total))
      .filter(col("c_ab") >= minCount)
      .select(col("w1"), col("w2"), col("c_ab"),
        expr("CAST(c_ab AS DECIMAL(38,0)) * t * 1000000 DIV " +
          "(CAST(c_a AS DECIMAL(38,0)) * c_b)").as("lift"),
        concat(col("w1"), lit(" "), col("w2")).as("__tie"))
      .orderBy(desc("lift"), asc("__tie"))
      .limit(k)
      .select(col("w1"), col("w2"), col("c_ab"), col("lift"))
  }

  /**
   * Corpus character-n-gram language-model score — the CCNet-style
   * "how typical is this document of the corpus" quality signal, computed
   * from the corpus's own statistics (no external model): each document
   * scores the mean log-frequency of its character n-grams, plus the
   * fraction of n-grams rarer than `rareBelow` (an OOV-rate analog).
   * Atypical documents (mojibake, random IDs, foreign scripts in a
   * monolingual corpus) sit in the low tail of `avg_nats` / high tail of
   * `rare_frac`.
   *
   * Scale shape: n-gram counting is a partial+final hash aggregate whose
   * output is VOCABULARY-bounded (≤ charset^n rows, independent of corpus
   * size), so the count table broadcasts; scoring re-explodes the text
   * map-side, joins the broadcast counts (no shuffle of exploded rows),
   * and the per-doc rollup's map-side combine collapses each document
   * back to one row before the only data-sized exchange.
   *
   * Determinism: log-counts quantize to integer milli-nats
   * (floor(ln(cnt)·1000)) BEFORE summation — integer sums are
   * order-independent, so the score is bit-stable under any partitioning
   * (a float mean of raw ln values would not be).
   */
  def lmScore(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      rareBelow: Long = 5L): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val grams = df
      .select(col(idCol), lower(col(textCol)).as("__t"))
      .filter(length(col("__t")) >= n)
      .select(col(idCol), explode(transform(
        sequence(lit(1), length(col("__t")) - (n - 1)),
        i => col("__t").substr(i, lit(n)))).as("__g"))
    val counts = grams.groupBy(col("__g")).agg(count(lit(1)).as("__cnt"))
    grams.join(boundedBroadcast(counts, "lmScore"), Seq("__g"))
      .groupBy(col(idCol))
      .agg(
        (sum(floor(log(col("__cnt")) * 1000).cast("long")) /
          (lit(1000.0) * count(lit(1)))).as("avg_nats"),
        (sum(when(col("__cnt") < rareBelow, 1L).otherwise(0L)) /
          count(lit(1)).cast("double")).as("rare_frac"),
        count(lit(1)).as("n_grams"),
        // exact integer accumulators — the scores above are these three
        // divided out; downstream equality checks (and the correctness
        // gate) compare THESE, because a rounded double quotient can
        // land on a 5e-5 tie and round differently across engines
        sum(floor(log(col("__cnt")) * 1000).cast("long")).as("sum_millinats"),
        sum(when(col("__cnt") < rareBelow, 1L).otherwise(0L)).as("n_rare"))
  }

  /** Gram-count table prepared for the probe join: eagerly
    * checkpointed (the guard count and the join then read the same
    * materialized blocks — no recompute), and broadcast only while the
    * vocabulary is small enough to ship. A FORCED broadcast hint
    * overrides the planner's size check, and a large-charset corpus
    * (CJK character trigrams) can push the table to multi-GB — an
    * executor OOM with an opaque failure where lmScoreFast fails
    * cleanly via its maxVocab bound. Over the bound, fall back to a
    * shuffled join loudly. */
  private def boundedBroadcast(counts: DataFrame, op: String,
      maxRows: Long = 4000000L): DataFrame = {
    val mat = counts.localCheckpoint(true)
    val n = mat.count()
    if (n <= maxRows) broadcast(mat)
    else {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"$op: gram vocabulary has $n rows (> $maxRows); using a " +
          "shuffled join instead of a forced broadcast")
      mat
    }
  }

  /**
   * CROSS-corpus LM scoring — the CCNet deployment shape (Wenzek et
   * al. 2020): train character-n-gram statistics on a REFERENCE corpus
   * (Wikipedia, curated text) and score a candidate corpus against
   * them, instead of [[lmScore]]'s self-scoring. Per evaluated
   * document: gram count, exact integer milli-nat sum under the
   * training counts (unseen grams score ln(1)=0 and are counted as
   * OOV), and `oov_e6 = ⌊10⁶·n_oov/n_grams⌋` — the two quality axes
   * (typicality under the reference, out-of-vocabulary mass) as pure
   * integers, SQL-replayable.
   *
   * Scale shape: training counts are a vocabulary-bounded aggregate
   * (≤ charset^n rows regardless of corpus size) and BROADCAST; the
   * candidate side explodes grams map-side, probes the broadcast, and
   * collapses back to one row per doc in the partial aggregate — the
   * only exchange carries per-doc count rows. The 100 TB candidate
   * corpus never shuffles text.
   */
  def lmScoreCross(
      train: DataFrame,
      evalDf: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3): DataFrame = {
    require(n >= 1, "n must be >= 1")
    def grams(df: DataFrame) = df
      .select(col(idCol), lower(col(textCol)).as("__t"))
      .filter(length(col("__t")) >= n)
      .select(col(idCol), explode(transform(
        sequence(lit(1), length(col("__t")) - (n - 1)),
        i => col("__t").substr(i, lit(n)))).as("__g"))
    val counts = grams(train).groupBy(col("__g"))
      .agg(count(lit(1)).as("__cnt"))
    grams(evalDf).join(boundedBroadcast(counts, "lmScoreCross"), Seq("__g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(floor(log(coalesce(col("__cnt"), lit(1L))) * 1000).cast("long"))
          .as("sum_millinats"),
        sum(when(col("__cnt").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col(idCol), col("n_grams"), col("sum_millinats"), col("n_oov"),
        expr("n_oov * 1000000 DIV n_grams").as("oov_e6"))
  }

  /**
   * Collects a vocabulary-bounded aggregate SAFELY: the row count is
   * checked with a fully-distributed `count()` job BEFORE the collect
   * (the driver receives one long, not the vocabulary), so a
   * pathological alphabet raises the `maxVocab` require cleanly instead
   * of OOMing the driver mid-collect. Costs one extra vocab-aggregate
   * job in the happy path — the price of the guard actually guarding
   * (same probe-before-collect discipline as [[Bpe]]'s
   * `limit(maxLocalVocab + 1)` vocabulary probe).
   */
  private def collectBoundedVocab(
      vocabAgg: DataFrame, maxVocab: Int, caller: String): Array[Row] = {
    // materialize ONCE (the boundedBroadcast discipline): count() then
    // collect() on the raw plan re-ran the corpus-sized trigram
    // explode+aggregate a second time — a full redundant corpus scan
    // per call at 100 TB. localCheckpoint pins the vocab-sized result;
    // eager (true) so the guard count reads the materialized blocks,
    // which the ContextCleaner reclaims once this frame goes out of
    // scope (the caller keeps only driver-side arrays).
    val pinned = vocabAgg.localCheckpoint(true)
    val n = pinned.count()
    require(n <= maxVocab,
      s"trigram vocabulary $n exceeds maxVocab=$maxVocab — " +
        s"use the declarative $caller for unbounded alphabets")
    pinned.collect()
  }

  /**
   * Kernel tier of [[lmScoreCross]] for the trigram case — bit-identical
   * output, same two-pass shape as [[lmScoreFast]]: the TRAIN corpus's
   * packed-long trigram counts aggregate (8-byte shuffle keys,
   * vocabulary-bounded output), the vocabulary collects to the driver
   * (`maxVocab` guard) and ships inside ONE codegen expression that
   * scores each candidate document in a single call — binary-search
   * probes, no explode, no join. Unlike `lm_doc_score`, a vocabulary
   * miss here is DATA (the vocab came from a different corpus): it
   * scores 0 milli-nats and increments the OOV counter.
   */
  def lmScoreCrossFast(
      train: DataFrame,
      evalDf: DataFrame,
      textCol: String,
      idCol: String,
      maxVocab: Int = 8 * 1000 * 1000): DataFrame = {
    import graft.functions.LmFunctions
    def lowered(df: DataFrame) = df
      .select(col(idCol), lower(col(textCol)).as("__t"))
      .filter(length(col("__t")) >= 3)
    val vocab = collectBoundedVocab(
      lowered(train)
        .select(explode(LmFunctions.trigram_keys(col("__t"))).as("__k"))
        .groupBy(col("__k")).agg(count(lit(1)).as("__cnt")),
      maxVocab, "lmScoreCross")
    val sorted = vocab.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val keys = sorted.map(_._1)
    val millinats = sorted.map { case (_, cnt) =>
      // StrictMath, not Math: the declarative tier's Spark log() lowers
      // to StrictMath.log, and the platform-intrinsic Math.log may
      // differ by 1 ulp — enough to flip floor(ln·1000) on a boundary
      // count and break the documented bit-identical-tiers contract
      // (the KeywordSearch.idf lesson)
      math.floor(StrictMath.log(cnt.toDouble) * 1000).toLong }
    lowered(evalDf)
      .select(col(idCol),
        LmFunctions.lm_doc_cross_score(col("__t"), keys, millinats).as("__s"))
      .select(col(idCol),
        col("__s.n_grams").as("n_grams"),
        col("__s.sum_millinats").as("sum_millinats"),
        col("__s.n_oov").as("n_oov"))
      .withColumn("oov_e6", expr("n_oov * 1000000 DIV n_grams"))
  }

  /**
   * Kernel tier of [[lmScore]] for the trigram case — bit-identical
   * output, two corpus passes instead of three logical ones, and neither
   * pass shuffles anything document-sized:
   *
   *  1. counts: trigrams travel as PACKED LONGS (3 codepoints × 21 bits,
   *     `functions.LmKernels.trigramKeys`) through one partial+final
   *     aggregate — no per-gram string allocation, 8-byte shuffle keys,
   *     output vocabulary-bounded.
   *  2. the vocabulary collects to the driver (bounded: ≤ charset³ and in
   *     practice ~1e5 for natural text — same envelope as IVF centroid
   *     training; `maxVocab` guards the degenerate case) and ships inside
   *     a codegen'd expression that scores each document in ONE call:
   *     binary-search probes of a sorted long array, no explode, no join.
   *
   * Quantization (floor(ln·1000) milli-nats) is shared with the
   * declarative tier, so both produce identical integers; `lmScore`
   * remains the no-driver-state path and the n ≠ 3 generalization.
   *
   * Contract: the scoring expression is TOTAL only over the training
   * corpus (unknown trigrams fail loudly rather than skew scores). If
   * `df` is a lazily-filtered subset, materialize it (localCheckpoint)
   * before calling — Catalyst may reorder a downstream score-based
   * predicate ahead of the admission filter and evaluate the kernel on
   * rows outside the vocabulary.
   */
  def lmScoreFast(
      df: DataFrame,
      textCol: String,
      idCol: String,
      rareBelow: Long = 5L,
      maxVocab: Int = 8 * 1000 * 1000): DataFrame = {
    import graft.functions.LmFunctions
    val lowered = df
      .select(col(idCol), lower(col(textCol)).as("__t"))
      .filter(length(col("__t")) >= 3)
    val vocab = collectBoundedVocab(
      lowered
        .select(explode(LmFunctions.trigram_keys(col("__t"))).as("__k"))
        .groupBy(col("__k")).agg(count(lit(1)).as("__cnt")),
      maxVocab, "lmScore")
    val sorted = vocab.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val keys = sorted.map(_._1)
    val packed = sorted.map { case (_, cnt) =>
      // StrictMath for tier parity — see lmScoreCrossFast above
      val millinats = math.floor(StrictMath.log(cnt.toDouble) * 1000).toLong
      (millinats << 1) | (if (cnt < rareBelow) 1L else 0L)
    }
    lowered
      .select(col(idCol),
        LmFunctions.lm_doc_score(col("__t"), keys, packed).as("__s"))
      .select(col(idCol),
        (col("__s.sum_millinats") / (lit(1000.0) * col("__s.n_grams")))
          .as("avg_nats"),
        (col("__s.n_rare") / col("__s.n_grams").cast("double")).as("rare_frac"),
        col("__s.n_grams").as("n_grams"),
        col("__s.sum_millinats").as("sum_millinats"),
        col("__s.n_rare").as("n_rare"))
  }

  private val EnglishStopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "by", "at", "it", "that", "this", "be")

  /**
   * Per-document lexical-diversity profile: token count, distinct
   * (type) count, hapax-legomenon count, and the type-token ratio as
   * `ttr_e6 = ⌊10⁶·distinct/tokens⌋` (integer division — no float
   * decides the value). Low TTR / low hapax flag templated or
   * machine-generated text; the counters aggregate cleanly per slice.
   *
   * Scale shape: ONE codegen projection calling the per-row
   * [[graft.functions.NgramStats.lexical_stats]] hash-count kernel —
   * zero exchanges, same envelope as the Gopher per-doc kernels
   * (whitespace tokens, the text_vocab convention: not lowercased).
   */
  def lexicalDiversity(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
        graft.functions.NgramStats.lexical_stats(split(col(textCol), " "))
          .as("__l"))
      .select(col(idCol),
        col("__l.n_tokens").as("n_tokens"),
        col("__l.n_distinct").as("n_distinct"),
        col("__l.n_hapax").as("n_hapax"),
        when(col("__l.n_tokens") === 0L, 0L)
          .otherwise(expr("(__l.n_distinct * 1000000) div __l.n_tokens"))
          .as("ttr_e6"))
}
