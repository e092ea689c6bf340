package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  test("token counts: whitespace and BPE-ish") {
    val df = Seq(
      (1, "hello world"),
      (2, "one, two; three!"),
      (3, "single")).toDF("id", "text")
    val r = df.select($"id",
        TextAnalysis.tokenCount($"text").as("ws"),
        TextAnalysis.bpeishTokenCount($"text").as("bpe"))
      .collect().map(x => (x.getInt(0), x.getInt(1), x.getInt(2))).sortBy(_._1)
    assert(r(0) === ((1, 2, 2)))
    assert(r(1) === ((2, 3, 6))) // one , two ; three !
    assert(r(2) === ((3, 1, 1)))
  }

  test("gopher rules: each rule fires on its targeted pathology, good doc passes all") {
    val good = (Seq.fill(6)("the data and model that have with training corpus tokens")
      .mkString(" "))                                   // 60 words, all rules green
    val short = "the data and model that have with"     // 7 words < 50
    val symbols = Seq.fill(60)("x#").mkString(" ")      // 60 '#' > 60/10 words
    // the paper caps EACH symbol's ratio at 0.1 SEPARATELY (r13 audit
    // follow-up: the old combined sum failed splitSymbols — 3 hashes +
    // 3 ellipses over 50 words is 0.06 per symbol, inside the paper's
    // cap, but 0.12 combined) while a single symbol past its own cap
    // (6 ellipses / 50 words = 0.12) must still fail
    val splitSymbols = (Seq.fill(44)("the") ++ Seq.fill(3)("tag#") ++
      Seq.fill(3)("off...")).mkString(" ")               // 50 words, 3 #, 3 ...
    val manyEllipsis = (Seq.fill(44)("the") ++
      Seq.fill(6)("off...")).mkString(" ")               // 6 ... > 50/10 words
    // Gopher removes only near-pure bullet LISTS (>90% of lines) — a
    // r13 audit found the rule inverted at ≤10%; pin both sides of the
    // corrected boundary
    val bullets = (Seq("the data and that have") ++
      Seq.fill(10)("- bullet line")).mkString("\n")     // 10/11 lines > 90%
    val fewBullets = (Seq.fill(8)("the data and that have") ++
      Seq("- bullet one", "- bullet two")).mkString("\n")   // 2/10 ≤ 90% passes
    val ellipsis = (Seq.fill(6)("the data and that have") ++
      Seq.fill(4)("trailing off...")).mkString("\n")        // 4/10 lines > 30%
    val longWords = Seq.fill(60)("aaaaaaaaaaaaaaaa").mkString(" ") // mean 16 > 10
    val numeric = Seq.fill(60)("12345").mkString(" ")   // 0% alpha words
    val noStop = Seq.fill(60)("spark").mkString(" ")    // 0 required stopwords
    val df = Seq((1L, good), (2L, short), (3L, symbols), (4L, bullets),
      (5L, ellipsis), (6L, longWords), (7L, numeric), (8L, noStop),
      (9L, fewBullets), (10L, splitSymbols), (11L, manyEllipsis))
      .toDF("id", "text")
    val r = TextAnalysis.gopherRules(df, "text").collect()
      .map(x => x.getLong(0) -> x).toMap
    def flag(id: Long, name: String): Boolean =
      r(id).getBoolean(r(id).fieldIndex(name))
    assert(flag(1L, "pass_gopher"), "good doc must pass every rule")
    assert(!flag(2L, "pass_word_count") && flag(2L, "pass_mean_word_len"))
    assert(!flag(3L, "pass_symbol_ratio"))
    assert(flag(10L, "pass_symbol_ratio"),
      "each symbol at 0.06 must pass the paper's per-symbol 0.1 cap")
    assert(!flag(11L, "pass_symbol_ratio"),
      "one symbol past its own cap must fail")
    assert(!flag(4L, "pass_bullet") && flag(4L, "pass_ellipsis"))
    assert(flag(9L, "pass_bullet"), "a normally-bulleted doc must pass the 90% rule")
    assert(!flag(5L, "pass_ellipsis") && flag(5L, "pass_bullet"))
    assert(!flag(6L, "pass_mean_word_len"))
    assert(!flag(7L, "pass_alpha"))
    assert(!flag(8L, "pass_stopwords"))
    (2L to 8L).foreach(id => assert(!flag(id, "pass_gopher"), s"doc $id"))
    // counters are exact integers
    val g = r(1L)
    assert(g.getLong(g.fieldIndex("n_words")) === 60L)
    assert(g.getLong(g.fieldIndex("n_stopword_hits")) === 5L)
    assert(g.getLong(g.fieldIndex("n_hash_symbols")) === 0L)
    assert(g.getLong(g.fieldIndex("n_ellipsis_symbols")) === 0L)
    assert(r(10L).getLong(r(10L).fieldIndex("n_hash_symbols")) === 3L)
    assert(r(10L).getLong(r(10L).fieldIndex("n_ellipsis_symbols")) === 3L)
    assert(r(5L).getLong(r(5L).fieldIndex("n_ellipsis_lines")) === 4L)
    assert(r(4L).getLong(r(4L).fieldIndex("n_bullet_lines")) === 10L)
    assert(r(9L).getLong(r(9L).fieldIndex("n_bullet_lines")) === 2L)
  }

  test("c4 rules: line filter keeps punctuated prose, page verdicts fire per pathology") {
    val good = (1 to 6).map(i => s"this is sentence number $i of the page.").mkString("\n")
    val unpunct = Seq.fill(6)("no terminal punctuation here").mkString("\n")
    val short = Seq.fill(6)("too short.").mkString("\n")    // 2 words < 3
    val js = (1 to 6).map(i => s"enable javascript to view item $i.").mkString("\n")
    val few = "one good sentence stands alone."             // 1 sentence < 5
    val lorem = good + "\nlorem ipsum dolor sit amet."
    val brace = good + "\nif (x) { return; }"
    // C4's reference keeps a line ending in a BARE end quote (its
    // terminal set is . ? ! ") — pinned after the r13 audit follow-up
    // found the old regex demanding [.!?] before the quote
    val quote = "and then she said \"no more\"\nhe answered \"fine”"
    val df = Seq((1L, good), (2L, unpunct), (3L, short), (4L, js),
      (5L, few), (6L, lorem), (7L, brace), (8L, quote)).toDF("id", "text")
    val r = TextAnalysis.c4Rules(df, "text").collect()
      .map(x => x.getLong(0) -> x).toMap
    def f(id: Long, name: String) = r(id).getBoolean(r(id).fieldIndex(name))
    def n(id: Long, name: String) = r(id).getLong(r(id).fieldIndex(name))
    assert(f(1L, "pass_c4") && n(1L, "n_kept_lines") === 6L
      && n(1L, "n_sentences") === 6L)
    assert(n(2L, "n_kept_lines") === 0L && !f(2L, "pass_c4"))
    assert(n(3L, "n_kept_lines") === 0L, "2-word lines dropped")
    assert(n(4L, "n_kept_lines") === 0L, "javascript lines dropped")
    assert(n(5L, "n_kept_lines") === 1L && !f(5L, "pass_c4"), "<5 sentences")
    assert(f(6L, "has_lorem") && !f(6L, "pass_c4"))
    assert(f(7L, "has_brace") && !f(7L, "pass_c4"))
    assert(n(8L, "n_kept_lines") === 2L,
      "bare end-quote (ASCII and typographic) terminates a line")
    // r14 (ADVICE r13): apostrophe is non-terminal even AFTER terminal
    // punctuation — C4's endswith sees only the last char, so "word.'"
    // ends with ' and is dropped; "word.”" keeps (end quote terminal)
    val apos = TextAnalysis.c4Rules(
      Seq((9L, "she finished the sentence.'\nhe finished the sentence.”"))
        .toDF("id", "text"), "text").collect().head
    assert(apos.getLong(apos.fieldIndex("n_kept_lines")) === 1L,
      "apostrophe after punctuation must not terminate a line")
    // kept_text carries only the surviving lines
    val kept5 = r(5L).getString(r(5L).fieldIndex("kept_text"))
    assert(kept5 === "one good sentence stands alone.")
  }

  test("top n-gram repetition: exact counts, smallest-gram tie-break, short-doc null rows") {
    val loopy = Seq.fill(10)("buy now").mkString(" ")       // "now buy" x9, "buy now" x10
    val clean = "the quick brown fox jumps over the lazy dog today"
    val short = "hi"                                        // 1 token: null rows for n=2..4
    val df = Seq((1L, loopy), (2L, clean), (3L, short)).toDF("id", "text")
    val r = TextAnalysis.topNgramRepetition(df, "text", "id").collect()
      .map(x => (x.getLong(0), x.getInt(1)) -> x).toMap
    assert(r.size === 9, "3 docs x 3 ns, short doc keeps its rows")
    val l2 = r((1L, 2))
    assert(l2.getString(2) === "buy now" && l2.getLong(3) === 10L)
    assert(l2.getLong(4) === 70L && !l2.getBoolean(6), "70 of 79 chars > 20%")
    // clean doc: every 2-gram count 1; tie-break picks smallest gram
    val c2 = r((2L, 2))
    assert(c2.getLong(3) === 1L && c2.getString(2) === "brown fox")
    assert(c2.getBoolean(6))
    for (n <- 2 to 4) {
      val s = r((3L, n))
      assert(s.isNullAt(2) && s.getLong(3) === 0L && s.getLong(4) === 0L)
      assert(s.getBoolean(6), "no repetition = pass")
    }
  }

  test("duplicate n-gram coverage: span union, overlap merge, short docs zero") {
    // doc 1 with n=5: "x1..x5" appears twice with a gap token between;
    // covered indices = 0..4 and 6..10 => 10 of 11 tokens
    val rep = "x1 x2 x3 x4 x5 gap x1 x2 x3 x4 x5"
    // doc 2: overlapping repeats "a a a a a a" — every 5-gram is "a a a a a"
    // (x2) => all 6 positions covered exactly once despite overlap
    val aaa = "a a a a a a"
    val clean = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"   // all 5-grams unique
    val short = "t1 t2 t3"                          // < 5 tokens
    val df = Seq((1L, rep), (2L, aaa), (3L, clean), (4L, short))
      .toDF("id", "text")
    val r = TextAnalysis.dupNgramCoverage(df, "text", "id", 5).collect()
      .map(x => x.getLong(0) -> x).toMap
    def g(id: Long, f: String) = r(id).getLong(r(id).fieldIndex(f))
    assert(r.size === 4)
    assert(g(1L, "n_tokens") === 11L && g(1L, "covered_tokens") === 10L)
    assert(g(1L, "covered_chars") === 20L)   // ten 2-char tokens, gap excluded
    assert(!r(1L).getBoolean(r(1L).fieldIndex("pass_dup_ngram")),
      "20/23 chars covered > 15%")
    assert(g(2L, "covered_tokens") === 6L && g(2L, "covered_chars") === 6L,
      "overlapping repeats cover each position once")
    assert(g(3L, "covered_tokens") === 0L
      && r(3L).getBoolean(r(3L).fieldIndex("pass_dup_ngram")))
    assert(g(4L, "n_tokens") === 3L && g(4L, "covered_tokens") === 0L,
      "short docs keep a zero-coverage row")
  }

  test("duplicate n-gram coverage ≡ brute force on random repeat-heavy docs") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("aa", "b", "ccc", "dd")  // tiny vocab forces repeats
    val rows = (1L to 40L).map { i =>
      val len = 3 + rnd.nextInt(30)
      val body = Seq.fill(len)(vocab(rnd.nextInt(vocab.size)))
      // plant a long verbatim repeat in some docs so every tested n has
      // non-degenerate coverage (random 4-symbol text rarely repeats 7-grams)
      val planted = if (i % 5 == 0) {
        val phrase = Seq.fill(8)(vocab(rnd.nextInt(vocab.size)))
        body ++ phrase ++ Seq(vocab(rnd.nextInt(vocab.size))) ++ phrase
      } else body
      (i, planted.mkString(" "))
    }
    for (n <- Seq(5, 7)) {
      val expected = rows.map { case (id, text) =>
        val toks = text.split(" ", -1)
        val grams = toks.sliding(n).map(_.mkString(" ")).toVector
        val dup = grams.groupBy(identity).filter(_._2.size >= 2).keySet
        val covered = grams.zipWithIndex.collect {
          case (g, i) if dup(g) => (i until i + n)
        }.flatten.toSet
        (id, toks.length.toLong, covered.size.toLong,
          covered.toSeq.map(j => toks(j).length.toLong).sum,
          toks.map(_.length.toLong).sum)
      }.toSet
      val got = TextAnalysis.dupNgramCoverage(
          rows.toDF("id", "text"), "text", "id", n).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toSet
      assert(got === expected, s"n=$n")
      assert(expected.exists(_._3 > 0), s"degenerate corpus at n=$n")
    }
  }

  test("corpus datasheet aggregates exact per-slice counters") {
    val good = Seq.fill(6)("the data and model that have with training corpus tokens")
      .mkString(" ")                                     // passes gopher
    val short = "the data"                               // fails word count
    val df = Seq(
      ("web", "en", good), ("web", "en", short),
      ("web", "de", good), ("books", "en", good)
    ).toDF("source", "lang", "text")
    val r = TextAnalysis.corpusDatasheet(df, "text", Seq("source", "lang"))
      .collect().map(x => (x.getString(0), x.getString(1)) -> x).toMap
    assert(r.size === 3)
    val webEn = r(("web", "en"))
    assert(webEn.getLong(webEn.fieldIndex("n_docs")) === 2L)
    assert(webEn.getLong(webEn.fieldIndex("total_words")) === 62L)
    assert(webEn.getLong(webEn.fieldIndex("n_pass_gopher")) === 1L)
    val books = r(("books", "en"))
    assert(books.getLong(books.fieldIndex("n_docs")) === 1L)
    assert(books.getLong(books.fieldIndex("n_pass_gopher")) === 1L)
    assert(books.getLong(books.fieldIndex("total_chars")) === good.length.toLong)
  }

  test("langId picks marker-word languages and CJK by script") {
    val df = Seq(
      (1, "the cat sat on the mat and it was happy"),
      (2, "der hund ist nicht mit der katze"),
      (3, "el perro es muy grande y la casa es blanca"),
      (4, "le chien est dans les montagnes et la mer"),
      (5, "你好世界这是中文文本"),
      (6, "xyzzy plugh qwerty")).toDF("id", "text")
    val r = df.select($"id", TextAnalysis.langId($"text").as("l"))
      .collect().map(x => (x.getInt(0), x.getString(1))).toMap
    assert(r(1) === "en"); assert(r(2) === "de"); assert(r(3) === "es")
    assert(r(4) === "fr"); assert(r(5) === "zh"); assert(r(6) === "und")
  }

  test("fast_lang_id single-pass expression agrees with the Catalyst version") {
    val df = Seq(
      (1, "the cat sat on the mat and it was happy"),
      (2, "der hund ist nicht mit der katze"),
      (3, "el perro es muy grande y la casa es blanca"),
      (4, "le chien est dans les montagnes et la mer"),
      (5, "你好世界这是中文文本"),
      (6, "xyzzy plugh qwerty"),
      // tie-inducing rows: equal marker-hit ratios across languages must
      // resolve by ARRAY ORDER (en > de > es > fr > zh), both paths
      (7, "la la"), // es and fr both score 1.0 ⇒ es (earlier in the list)
      (8, "the der el le"), // one hit each ⇒ en
      (9, "es 中"), // marker tie vs cjk ratio
      (10, "und la the")).toDF("id", "text")
    val r = df.select($"id",
        graft.functions.LangIdExpression.fast_lang_id($"text").as("f"),
        TextAnalysis.langId($"text").as("c"))
      .collect().map(x => (x.getInt(0), x.getString(1), x.getString(2)))
    r.foreach { case (i, f, c) => assert(f === c, s"row $i: fast=$f catalyst=$c") }
    assert(r.find(_._1 == 7).get._2 === "es")
    assert(r.find(_._1 == 8).get._2 === "en")
  }

  test("fast_lang_id honors nullable=false: null text classifies as 'und'") {
    // the UnaryExpression nullSafeEval default would null-PROPAGATE and
    // hand downstream generated code a null it was told can't happen
    // (groupBy on the result then NPEs in UnsafeRowWriter)
    val df = Seq((1, "the cat and the dog"), (2, null: String))
      .toDF("id", "text")
    val vals = df.select($"id",
        graft.functions.LangIdExpression.fast_lang_id($"text").as("f"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toMap
    assert(vals(1) === "en")
    assert(vals(2) === "und")
    // grouping on the expression must survive null inputs
    val counts = df.groupBy(
        graft.functions.LangIdExpression.fast_lang_id($"text").as("f"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("en" -> 1L, "und" -> 1L))
  }

  test("fast_lang_id agrees with the Catalyst version over the documents corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val disagree = docs.select(
        graft.functions.LangIdExpression.fast_lang_id($"text").as("f"),
        TextAnalysis.langId($"text").as("c"))
      .filter($"f" =!= $"c").count()
    assert(disagree === 0L)
  }

  test("chunking covers every token with the requested overlap") {
    val text = (1 to 67).map(i => s"t$i").mkString(" ")
    val df = Seq((1, text)).toDF("id", "text")
    val rows = TextAnalysis.explodeChunks(df, "text", "id",
        chunkTokens = 30, overlap = 5)
      .orderBy($"chunk_idx").collect()
    // 67 tokens, step 25 ⇒ ceil(62/25) = 3 chunks
    assert(rows.length === 3)
    val chunks = rows.map(_.getAs[String]("chunk").split(" ").toSeq)
    assert(chunks(0) === (1 to 30).map(i => s"t$i"))
    assert(chunks(1) === (26 to 55).map(i => s"t$i")) // 5-token overlap
    assert(chunks(2) === (51 to 67).map(i => s"t$i")) // final partial chunk
    // short docs still yield exactly one chunk
    val one = TextAnalysis.explodeChunks(
      Seq((1, "a b c")).toDF("id", "text"), "text", "id", 30, 5).collect()
    assert(one.length === 1 && one.head.getAs[String]("chunk") === "a b c")
  }

  test("urlHost strips scheme/userinfo/port/path/www and lowercases") {
    val df = Seq(
      (1, "https://user:pw@WWW.Example.COM:8443/a/b?q=1#f"),
      (2, "http://cdn3.static.example.org/x"),
      (3, "example.net/path"), // scheme-less
      (4, "ftp://files.example.io")).toDF("id", "url")
    val r = df.select($"id",
        TextAnalysis.urlHost($"url").as("h"),
        TextAnalysis.registeredDomain($"url").as("d"))
      .collect().map(x => x.getInt(0) -> ((x.getString(1), x.getString(2)))).toMap
    assert(r(1) === (("example.com", "example.com")))
    assert(r(2) === (("cdn3.static.example.org", "example.org")))
    assert(r(3) === (("example.net", "example.net")))
    assert(r(4) === (("files.example.io", "example.io")))
  }

  test("stripHtml drops script/style/comments/tags, decodes entities, collapses space") {
    val df = Seq(
      (1, "<html><head><script>if (a < b) alert('x');</script>" +
        "<style>p { a: 1; }</style></head><body>\n<h1>Title</h1>" +
        "<p>Hello <b>world</b> &amp; friends</p><!-- hidden --></body></html>"),
      (2, "no markup at all"),
      (3, "<div>a&nbsp;b &lt;tag&gt; &quot;q&quot; &#39;s&#39; &amp;lt;</div>"))
      .toDF("id", "text")
    val r = df.select($"id", TextAnalysis.stripHtml($"text").as("c"))
      .collect().map(x => x.getInt(0) -> x.getString(1)).toMap
    assert(r(1) === "Title Hello world & friends")
    assert(r(2) === "no markup at all")
    // &amp;lt; must decode to the LITERAL &lt;, not <
    assert(r(3) === "a b <tag> \"q\" 's' &lt;")
  }

  test("PII redaction scrubs emails, IPs, and phone-ish digit runs") {
    val df = Seq(
      (1, "mail a.b+c@ex-ample.org now"),
      (2, "host 192.168.0.1 up"),
      (3, "call +49 30 1234-5678 today"),
      (4, "clean text with numbers 42 and 3.14")).toDF("id", "text")
    val r = df.select($"id", TextAnalysis.redactPii($"text").as("c"))
      .collect().map(x => x.getInt(0) -> x.getString(1)).toMap
    assert(r(1) === "mail <EMAIL> now")
    assert(r(2) === "host <IP> up")
    assert(r(3) === "call <PHONE> today")
    assert(r(4) === "clean text with numbers 42 and 3.14")
  }

  test("repetition features flag duplicate lines") {
    val df = Seq(
      (1, "a\nb\nc"),
      (2, "spam line\nspam line\nspam line\nreal"),
      (3, "")).toDF("id", "text")
    val r = TextAnalysis.repetitionFeatures(df, "text")
      .select($"id", $"dup_line_frac", $"dup_char_frac")
      .collect().map(x => x.getInt(0) -> ((x.getDouble(1), x.getDouble(2)))).toMap
    assert(r(1) === ((0.0, 0.0)))
    assert(r(2)._1 === 0.5) // 2 of 4 lines are repeats
    assert(r(2)._2 > 0.5) // repeated lines carry most characters
    assert(r(3) === ((0.0, 0.0)))
  }

  test("vocabulary ranks tokens by frequency with token tie-break") {
    val df = Seq(
      (1, "b b b a a c"),
      (2, "a d d")).toDF("id", "text")
    val v = TextAnalysis.vocabulary(df, "text", 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // a:3, b:3 (tie → 'a' first), d:2, c:1
    assert(v === Seq(("a", 3L), ("b", 3L), ("d", 2L)))
  }

  test("groupKeywords ranks tokens by exact integer frequency lift") {
    val df = Seq(
      ("a", "x x x x x y"),
      ("a", "x x x x y z"),
      ("b", "y y y y y y z z z w w w")).toDF("src", "text")
    val r = TextAnalysis.groupKeywords(df, "text", "src", 2, minCount = 3L)
      .collect()
      .map(x => (x.getString(0), x.getLong(1)) -> ((x.getString(2), x.getLong(3))))
      .toMap
    // totals: T=24; group a: tg=12, x:9 (global 9) → lift = 9*24e6/(9*12) = 2e6
    assert(r(("a", 1L)) === (("x", 2000000L)))
    // group b: tg=12, y appears 6 of global 8 → 6*24e6/(8*12) = 1.5e6;
    // w: 3 of 3 → 3*24e6/(3*12) = 2e6; z: 3 of 4 → 1.5e6 → top2 = w, then
    // tie y/z at 1.5e6 → 'y' by token asc
    assert(r(("b", 1L)) === (("w", 2000000L)))
    assert(r(("b", 2L)) === (("y", 1500000L)))
  }

  test("collocations rank sticky adjacent pairs by exact lift") {
    // "new york" always adjacent; "the the" frequent but independent
    val df = Seq.fill(6)("visit new york today").zipWithIndex
      .map { case (t, i) => (i.toLong, t + " the the the") }
      .toDF("id", "text")
    val r = TextAnalysis.collocations(df, "text", 3, minCount = 3L)
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2),
        x.getLong(3)))
    // T=42; (new,york): 6*42e6/(6*6)=7e6 — top; (the,the): c_ab=12,
    // c=18 each → 12*42e6/(18*18)≈1.55e6
    assert(r.head._1 === "new" && r.head._2 === "york" && r.head._4 === 7000000L)
    val lifts = r.map(_._4)
    assert(lifts === lifts.sorted.reverse)
  }

  test("vocabularyCoverage: cumulative share of all token occurrences") {
    val df = Seq(
      (1, "b b b a a c"),
      (2, "a d d")).toDF("id", "text")
    val v = TextAnalysis.vocabularyCoverage(df, "text", 3)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    // 9 tokens total: a(3) → 3/9, b(3) → 6/9, d(2) → 8/9
    assert(v === Seq(
      (1L, "a", 3L, 0.333333), (2L, "b", 3L, 0.666667), (3L, "d", 2L, 0.888889)))
  }

  test("rollingHash is order-sensitive, md5 fingerprint is content-stable") {
    val df = Seq(
      (1, "alpha beta gamma"),
      (2, "gamma beta alpha"),
      (3, "alpha beta gamma")).toDF("id", "text")
    val r = df.select($"id",
        TextAnalysis.rollingHash($"text").as("rh"),
        TextAnalysis.fingerprint($"text").as("fp"))
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getString(2))).sortBy(_._1)
    assert(r(0)._2 === r(2)._2 && r(0)._3 === r(2)._3)
    assert(r(0)._2 !== r(1)._2, "permutation must change the rolling hash")
  }

  test("rollingHash equals a driver-side md5/Horner reference (150 cases)") {
    // the operator's portability claim is that any engine with md5 can
    // replay the documented algorithm (60-bit md5-prefix token hashes
    // through a double-modulus Horner fold); pin the DEFINITION with an
    // independent reference built from java.security.MessageDigest —
    // empty tokens (consecutive spaces) and non-ASCII included
    val rnd = new scala.util.Random(1212)
    val vocab = Seq("alpha", "beta", "Gamma", "délta", "e1", "", "x")
    val docs = (1 to 150).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }
    val got = docs.toDF("id", "text")
      .select($"id", TextAnalysis.rollingHash($"text").as("rh"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val (p1, p2) = (1000000007L, 998244353L)
    def ref(text: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      var f1 = 0L; var f2 = 0L
      // limit -1: Spark's split KEEPS trailing empty tokens
      text.split(" ", -1).foreach { tok =>
        val hex = md.digest(tok.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString.take(15)
        val h = java.lang.Long.parseLong(hex, 16) // 60 bits, fits a long
        f1 = (f1 * 31L + h % p1) % p1
        f2 = (f2 * 131L + h % p2) % p2
      }
      f1 * p2 + f2
    }
    docs.foreach { case (i, t) =>
      assert(got(i) === ref(t), s"doc $i '$t'")
    }
  }

  test("urlHost agrees with java.net.URI on well-formed URLs (200 cases)") {
    // the single-regex extraction's reference semantics: for URLs URI
    // can parse, urlHost must equal URI.getHost lowercased with a
    // leading www. stripped
    val rnd = new scala.util.Random(1313)
    val schemes = Seq("http", "https", "ftp")
    val labels = Seq("Example", "cdn3", "WWW", "static", "api", "x9")
    val tlds = Seq("com", "org", "io")
    val paths = Seq("", "/", "/a/b", "/x?q=1", "/p#frag")
    val urls = (1 to 200).map { i =>
      val host = (Seq.fill(1 + rnd.nextInt(2))(labels(rnd.nextInt(labels.size)))
        :+ tlds(rnd.nextInt(tlds.size))).mkString(".")
      val user = if (rnd.nextBoolean()) "u:pw@" else ""
      val port = if (rnd.nextBoolean()) s":${1 + rnd.nextInt(65000)}" else ""
      (i, s"${schemes(rnd.nextInt(schemes.size))}://$user$host$port${
        paths(rnd.nextInt(paths.size))}")
    }
    val got = urls.toDF("id", "url")
      .select($"id", TextAnalysis.urlHost($"url").as("h"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    urls.foreach { case (i, u) =>
      val want = new java.net.URI(u).getHost
        .toLowerCase(java.util.Locale.ROOT).replaceFirst("^www\\.", "")
      assert(got(i) === want, s"url $u")
    }
  }

  test("qualityScore rewards normal prose, penalizes punctuation soup") {
    val df = Seq(
      (1, "the quick brown fox jumps over the lazy dog and runs through the quiet field for a while"),
      (2, "@#$% !!! ### $$$ %%% ^^^ &&& *** ((( )))"),
      (3, "a")).toDF("id", "text")
    val r = df.select($"id", TextAnalysis.qualityScore($"text").as("q"))
      .collect().map(x => (x.getInt(0), x.getDouble(1))).toMap
    assert(r(1) > 0.5, s"prose scored ${r(1)}")
    assert(r(2) < 0.1, s"punctuation soup scored ${r(2)}")
    assert(r(3) < 0.2, s"single char scored ${r(3)}")
  }

  test("qualityFeatures computes consistent ratios") {
    val df = Seq((1, "Hello WORLD and ALL people")).toDF("id", "text")
    val row = TextAnalysis.qualityFeatures(df, "text").collect().head
    assert(row.getAs[Int]("n_tokens") === 5)
    assert(row.getAs[Int]("n_chars_q") === 26)
    assert(row.getAs[Double]("caps_word_ratio") === 0.4) // WORLD, ALL
  }

  test("normalizeText composes NFC and strips control chars") {
    val df = Seq(
      (1, "cafe\u0301"),            // e + combining acute → é (composed)
      (2, "café"),             // already composed — unchanged
      (3, "a\u0007b\u001fc"),       // BEL / unit-separator stripped
      (4, "keep\ttabs\nand\rCR"),   // whitelisted controls survive
      (5, "plain ascii")
    ).toDF("id", "text")
    val r = df.select(col("id"),
        TextAnalysis.normalizeText(col("text")).as("t"))
      .collect().map(x => x.getInt(0) -> x.getString(1)).toMap
    assert(r(1) === "caf\u00e9")
    assert(r(1) === r(2), "decomposed and composed must normalize equal")
    assert(r(3) === "abc")
    assert(r(4) === "keep\ttabs\nand\rCR")
    assert(r(5) === "plain ascii")
    // the dedup consequence: identical after normalization ⇒ same md5
    val fps = df.select(md5(TextAnalysis.normalizeText(col("text"))))
      .collect().map(_.getString(0))
    assert(fps(0) === fps(1))
  }

  test("lmScore ranks corpus-typical text above mojibake") {
    // 20 near-identical prose docs share trigrams; one junk doc does not.
    val prose = (1 to 20).map(i => (i, s"the cat sat on the mat number $i"))
    val junk = Seq((99, "qzxjv wkqzp zzxqj vvqkz"))
    val df = (prose ++ junk).toDF("id", "text")
    val r = TextAnalysis.lmScore(df, "text", "id")
      .collect().map(x => x.getInt(0) -> (x.getDouble(1), x.getDouble(2))).toMap
    val proseAvg = prose.map(p => r(p._1)._1).sum / prose.size
    assert(proseAvg > r(99)._1, "junk doc must have lower avg_nats")
    assert(r(99)._2 > 0.9, s"junk doc rare_frac ${r(99)._2} should be ~1")
    assert(r(1)._2 < 0.5, "prose docs share most trigrams")
  }

  test("lmScore n_grams counts len-n+1 grams and skips short docs") {
    val df = Seq((1, "abcdef"), (2, "ab")).toDF("id", "text")
    val r = TextAnalysis.lmScore(df, "text", "id").collect()
    assert(r.length === 1, "docs shorter than n are excluded")
    assert(r.head.getAs[Long]("n_grams") === 4L) // abc bcd cde def
  }

  test("lmScoreFast is bit-identical to the declarative tier") {
    val df = Seq(
      (1, "the cat sat on the mat"),
      (2, "the dog sat on the rug"),
      (3, "qzxjv wkqzp"),
      (4, "MIXED Case And UPPER"),
      (5, "café con café"),
      (6, "emoji 😀 pair 😀 twice"), // astral codepoints
      (7, "ab")                                          // excluded (< 3)
    ).toDF("id", "text")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Int]("id"), r.getAs[Long]("sum_millinats"),
        r.getAs[Long]("n_rare"), r.getAs[Long]("n_grams"),
        r.getAs[Double]("avg_nats"), r.getAs[Double]("rare_frac"))
    val slow = TextAnalysis.lmScore(df, "text", "id").collect().map(key).toSet
    val fast = TextAnalysis.lmScoreFast(df, "text", "id").collect().map(key).toSet
    assert(fast === slow)
    assert(slow.size === 6, "the 2-char doc is excluded by both tiers")
    // vocab guard trips on a tiny cap
    intercept[IllegalArgumentException] {
      TextAnalysis.lmScoreFast(df, "text", "id", maxVocab = 2)
    }
  }

  test("LM vocab guards raise via the pre-collect count, with the true size") {
    // The guard must fire from a distributed count BEFORE any driver
    // collect (an over-vocab corpus must raise, never OOM the driver);
    // the message carries the exact vocabulary size as evidence the
    // count ran. 26 distinct trigrams: a 26-letter pangram-ish string.
    val train = Seq((1, "abcdefghijklmnopqrstuvwxyzab")).toDF("id", "text")
    val e1 = intercept[IllegalArgumentException] {
      TextAnalysis.lmScoreFast(train, "text", "id", maxVocab = 5)
    }
    assert(e1.getMessage.contains("vocabulary 26"), e1.getMessage)
    assert(e1.getMessage.contains("maxVocab=5"))
    val e2 = intercept[IllegalArgumentException] {
      TextAnalysis.lmScoreCrossFast(train, train, "text", "id", maxVocab = 5)
    }
    assert(e2.getMessage.contains("vocabulary 26"), e2.getMessage)
    assert(e2.getMessage.contains("lmScoreCross"))
  }

  test("lexicalDiversity counts tokens, types, hapax, and integer TTR") {
    val df = Seq(
      (1L, "a b a c a b"),    // 6 tokens, 3 types {a,b,c}, hapax {c}
      (2L, "x"),              // 1 token, 1 type, 1 hapax, TTR 1.0
      (3L, "t t t t")         // 4 tokens, 1 type, 0 hapax
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lexicalDiversity(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) === ((6L, 3L, 1L, 500000L)))
    assert(got(2L) === ((1L, 1L, 1L, 1000000L)))
    assert(got(3L) === ((4L, 1L, 0L, 250000L)))
  }

  test("tfidfTopTerms ranks by exact rational tf-idf with term tie-break") {
    val df = Seq(
      (1L, "apple apple banana common"),
      (2L, "banana cherry common"),
      (3L, "cherry cherry cherry common")
    ).toDF("doc_id", "text")
    // N=3; df: apple 1, banana 2, cherry 2, common 3
    val got = TextAnalysis.tfidfTopTerms(df, "text", "doc_id", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3)))).toMap
    // doc1: apple tf2 score 2*3e6/1=6e6; banana tf1 1.5e6; common tf1 1e6
    assert(got((1L, 1L)) === (("apple", 6000000L)))
    assert(got((1L, 2L)) === (("banana", 1500000L)))
    // doc3: cherry tf3 score 3*3e6/2=4.5e6; common 1e6
    assert(got((3L, 1L)) === (("cherry", 4500000L)))
    assert(got((3L, 2L)) === (("common", 1000000L)))
    // doc2: banana and cherry tie at 1.5e6 — term ASC puts banana first
    assert(got((2L, 1L)) === (("banana", 1500000L)))
    assert(got((2L, 2L)) === (("cherry", 1500000L)))
  }

  test("tfidfTopTerms is partitioning-invariant") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def run(d: org.apache.spark.sql.DataFrame) =
      TextAnalysis.tfidfTopTerms(d, "text", "doc_id", 3)
        .orderBy("doc_id", "rank").collect().toSeq
    assert(run(df) === run(df.repartition(7)))
  }

  test("lmScoreCross scores eval docs under TRAIN counts with OOV mass") {
    val train = Seq((1L, "aaab"), (2L, "aaa")).toDF("doc_id", "text")
    // train trigrams: aaa×2 (one per doc), aab×1
    val eval_ = Seq((10L, "aaab"), (11L, "xyz")).toDF("doc_id", "text")
    val got = TextAnalysis.lmScoreCross(train, eval_, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val m2 = math.floor(math.log(2.0) * 1000).toLong // aaa count 2
    // doc 10: grams aaa (693), aab (ln(1)=0, seen once → 0 millinats)
    assert(got(10L) === ((2L, m2, 0L, 0L)))
    // doc 11: xyz unseen → OOV, 0 millinats, oov_e6 = 1e6
    assert(got(11L) === ((1L, 0L, 1L, 1000000L)))
  }

  test("lmScoreCrossFast is bit-identical to the declarative cross tier") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val train = docs.filter($"doc_id" % 5 =!= 0)
    val eval_ = docs.filter($"doc_id" % 5 === 0)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "n_grams", "sum_millinats", "n_oov", "oov_e6")
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val slow = key(TextAnalysis.lmScoreCross(train, eval_, "text", "doc_id"))
    val fast = key(TextAnalysis.lmScoreCrossFast(train, eval_, "text", "doc_id"))
    assert(fast === slow)
    assert(fast.nonEmpty)
  }

  test("lexicalDiversity is map-only (zero exchanges)") {
    // parquet-backed input: a local Seq relation constant-folds into
    // LocalTableScan and hides the projection
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p = withLogLevel {
      TextAnalysis.lexicalDiversity(df, "text", "doc_id")
        .queryExecution.executedPlan.toString
    }
    assert(!p.contains("Exchange"), s"per-doc kernel must not shuffle:\n$p")
    assert(p.contains("lexical_stats"), p)
  }
}
