package graft

import graft.ops.Bpe

class BpeSpec extends SparkSuite {
  import spark.implicits._

  test("learnMerges finds the classic most-frequent pairs in order") {
    // vocabulary: low ×5, lower ×2, newest ×6, widest ×3  (Sennrich-style)
    val docs = withLogLevel(Seq(
      (1L, ("low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3).trim)
    ).toDF("doc_id", "text"))
    val m = Bpe.learnMerges(docs, "text", 3)
    // pair counts r1: (e,s) 6+3=9, (s,t) 9, (w,e) 2+6+3=11 ... argmax (w,e)=11?
    // chars: l o w (5+2), l o w e r (2), n e w e s t (6), w i d e s t (3)
    // (w,e): lower 2 + newest 6 = 8; (e,s): 6+3=9; (s,t): 9; (e,w): 6
    // (l,o): 7; (o,w): 7; tie (e,s) vs (s,t) at 9 → lexicographic: (e,s)
    assert(m(0).left === "e" && m(0).right === "s" && m(0).freq === 9L)
    // after merge 1: n e w es t, w i d es t → (es,t): 9 wins
    assert(m(1).left === "es" && m(1).right === "t" && m(1).freq === 9L)
    // after merge 2: n e w est, w i d est → (l,o)=7, (o,w)=7, (w,est)=6,
    // (n,e)=6, (e,w)=6 ... tie (l,o)/(o,w) at 7 → (l,o)
    assert(m(2).left === "l" && m(2).right === "o" && m(2).freq === 7L)
  }

  test("back-to-back and overlapping pairs merge greedily left-to-right") {
    // "abab": pairs (a,b)=2·f, (b,a)=f → merge (a,b) twice in one pass
    val docs = withLogLevel(Seq((1L, "abab abab")).toDF("doc_id", "text"))
    val m = Bpe.learnMerges(docs, "text", 2)
    assert(m(0).left === "a" && m(0).right === "b" && m(0).freq === 4L)
    // next round operates on "ab ab": pair (ab,ab) freq 2
    assert(m(1).left === "ab" && m(1).right === "ab" && m(1).freq === 2L)
  }

  test("local and distributed tiers learn identical merges") {
    val docs = withLogLevel(Seq(
      (1L, "low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3),
      (2L, "abab abab banana bandana low lowest")).toDF("doc_id", "text"))
    val local = Bpe.learnMerges(docs, "text", 4)
    val dist = Bpe.learnMerges(docs, "text", 4, maxLocalVocab = 0)
    assert(local === dist)
  }

  test("segment applies merges in rank order") {
    val docs = withLogLevel(Seq((1L, "lowest lowest low")).toDF("doc_id", "text"))
    val merges = Bpe.learnMerges(docs, "text", 2)
    val segs = Bpe.segment(
        Bpe.vocabulary(docs, "text").select($"word"), "word", merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    // merges: (l,o)=3 → (lo,w)=3; "low" → ["low"], "lowest" → ["low","e","s","t"]
    assert(segs("low") === Seq("low"))
    assert(segs("lowest") === Seq("low", "e", "s", "t"))
  }

  test("non-alpha tokens are excluded from the vocabulary") {
    val docs = withLogLevel(Seq((1L, "aaa 123 a-b aaa")).toDF("doc_id", "text"))
    val v = Bpe.vocabulary(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v === Map("aaa" -> 2L))
  }

  // driver-side reference of the shared encode semantics: canonical
  // two-space symbol string, merges in rank order, String.replace's
  // left-to-right non-overlapping scan
  private def encRef(word: String, merges: Seq[Bpe.Merge]): Seq[String] = {
    var s = " " + word.map(_.toString).mkString("  ") + " "
    merges.foreach(m =>
      s = s.replace(s" ${m.left}  ${m.right} ", s" ${m.left}${m.right} "))
    s.trim.split("  ").toSeq
  }

  test("encodeDocs matches a driver-side reference and partitions each word") {
    val merges = Seq(Bpe.Merge(1, "t", "h", 0L), Bpe.Merge(2, "th", "e", 0L),
      Bpe.Merge(3, "i", "n", 0L))
    val docs = withLogLevel(Seq(
      (1L, "The thin thing in there"),
      (2L, "nothing matches 123 a-b here"),
      (3L, "")).toDF("doc_id", "text"))
    val got = Bpe.encodeDocs(docs, "text", "doc_id", merges)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    Seq(1L -> "The thin thing in there", 2L -> "nothing matches 123 a-b here",
        3L -> "").foreach { case (id, text) =>
      val ws = text.toLowerCase.split(" ").filter(_.matches("^[a-z]+$")).toSeq
      val subs = ws.flatMap(encRef(_, merges))
      // every word's subwords concatenate back to the word (partition)
      ws.foreach(w => assert(encRef(w, merges).mkString === w))
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(subs.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(got(id) === ((ws.size.toLong, subs.size.toLong, md5)),
        s"doc $id: got ${got(id)}")
    }
  }

  test("encodeDocs composes with learned merges and never shuffles") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Bpe.learnMerges(docs, "text", 3)
    val out = Bpe.encodeDocs(docs, "text", "doc_id", merges)
    val p = withLogLevel(out.queryExecution.executedPlan.toString)
    assert(!p.contains("Exchange"), s"tokenizer apply must be map-only:\n$p")
    val rows = out.collect()
    assert(rows.nonEmpty)
    // merges only ever REDUCE token count vs characters-per-word
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), "at least one subword per word")
    }
  }
}
