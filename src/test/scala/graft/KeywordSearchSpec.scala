package graft

import org.apache.spark.sql.functions._

import graft.ops.KeywordSearch

class KeywordSearchSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = withLogLevel(Seq(
    (1L, "spark spark spark runs fast"),
    (2L, "spark is a query engine"),
    (3L, "vector search inside a query engine"),
    (4L, "nothing relevant here at all"),
    (5L, "spark")
  ).toDF("doc_id", "text"))

  test("corpusStats: one aggregate yields N, avgdl, and per-term df") {
    val s = KeywordSearch.corpusStats(docs, "text", Seq("spark", "query", "absent"))
    assert(s.nDocs === 5L)
    assert(s.avgDl === (5 + 5 + 6 + 5 + 1).toDouble / 5)
    assert(s.docFreq === Map("spark" -> 3L, "query" -> 2L, "absent" -> 0L))
  }

  test("idf: rarer terms score higher; +1 floor keeps it positive") {
    assert(KeywordSearch.idf(100, 1) > KeywordSearch.idf(100, 50))
    assert(KeywordSearch.idf(100, 100) > 0.0) // term in every doc still > 0
    // the scan/index bit-identity contract: the driver constant must come
    // from the same libm as Spark SQL's log() (StrictMath, not Math)
    assert(KeywordSearch.idf(100, 3) ===
      StrictMath.log(1.0 + (100 - 3 + 0.5) / (3 + 0.5)))
  }

  test("corpusStats fails loudly on an empty corpus") {
    val e = intercept[IllegalArgumentException] {
      KeywordSearch.corpusStats(docs.filter(col("doc_id") < 0), "text",
        Seq("spark"))
    }
    assert(e.getMessage.contains("empty corpus"))
  }

  test("bm25TopK: docs without any query term are excluded") {
    val r = KeywordSearch.bm25TopK(docs, "text", "doc_id",
      Seq("spark", "query"), k = 10).select("doc_id").as[Long].collect().toSet
    assert(r === Set(1L, 2L, 3L, 5L))
  }

  test("bm25TopK: term repetition ranks above single mention at equal length") {
    // doc 1 has tf(spark)=3 at dl=5; doc 2 has tf=1 at dl=5
    val r = KeywordSearch.bm25TopK(docs, "text", "doc_id", Seq("spark"), k = 10)
      .select("doc_id").as[Long].collect()
    assert(r.indexOf(1L) < r.indexOf(2L))
  }

  test("bm25TopK: shorter docs rank above longer at equal tf (length norm)") {
    // doc 5 (dl=1) vs doc 2 (dl=5), both tf(spark)=1
    val r = KeywordSearch.bm25TopK(docs, "text", "doc_id", Seq("spark"), k = 10)
      .select("doc_id").as[Long].collect()
    assert(r.indexOf(5L) < r.indexOf(2L))
  }

  test("bm25Score matches a hand-computed Okapi value") {
    val stats = KeywordSearch.corpusStats(docs, "text", Seq("query"))
    val score = docs.filter(col("doc_id") === 2)
      .select(KeywordSearch.bm25Score(col("text"), Seq("query"), stats,
        k1 = 1.5, b = 0.75))
      .head().getDouble(0)
    val idf = math.log(1.0 + (5 - 2 + 0.5) / (2 + 0.5))
    val (tf, dl, avgdl) = (1.0, 5.0, 22.0 / 5)
    val expected = idf * (tf * 2.5) / (tf + 1.5 * (0.25 + 0.75 * dl / avgdl))
    assert(score === expected)
  }

  test("rrfFuse: doc present in both rankings beats single-list docs") {
    val a = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val b = Seq((2L, 1), (3L, 2)).toDF("id", "rank")
    val r = KeywordSearch.rrfFuse(Seq(a, b), "id").collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(2L) === 1.0 / 62 + 1.0 / 61)
    assert(r(1L) === 1.0 / 61)
    assert(r(3L) === 1.0 / 62)
    assert(r(2L) > r(1L) && r(1L) > r(3L))
  }

  test("hybridTopK fuses lexical and semantic evidence") {
    // doc 1 is the lexical hit (term "spark" repeated), doc 3 is the
    // semantic hit (vector aligned with the query); both must fuse in.
    val vecs = Seq(
      (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.6f, 0.8f)),
      (3L, Array(1.0f, 0.0f)),
      (4L, Array(0.8f, 0.6f)),
      (5L, Array(0.0f, -1.0f))
    ).toDF("doc_id", "embedding")
    val r = KeywordSearch.hybridTopK(docs, "text", vecs, "embedding",
      "doc_id", Seq("spark"), Array(1.0f, 0.0f), k = 3, fetchK = 5)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.contains(1L))
    // Hand-computed RRF: lexical ranks (1st: doc1, 2nd: doc5, 3rd: doc2),
    // semantic ranks (3,4,2,1,5) ⇒ fused scores doc1: 1/61+1/64 ≈ .03202,
    // doc2: 1/63+1/63 ≈ .03175, doc5: 1/62+1/65 ≈ .03151 — docs with BOTH
    // kinds of evidence outrank the pure semantic winner 3 (1/61 alone).
    val order = KeywordSearch.hybridTopK(docs, "text", vecs, "embedding",
      "doc_id", Seq("spark"), Array(1.0f, 0.0f), k = 3, fetchK = 5)
      .select("doc_id").as[Long].collect().toSeq
    assert(order === Seq(1L, 2L, 5L))
  }

  test("hybridTopK is deterministic across runs") {
    val vecs = Seq(
      (1L, Array(0.0f, 1.0f)), (2L, Array(0.6f, 0.8f)),
      (3L, Array(1.0f, 0.0f)), (4L, Array(0.8f, 0.6f)),
      (5L, Array(0.0f, -1.0f))).toDF("doc_id", "embedding")
    def run() = KeywordSearch.hybridTopK(docs, "text", vecs, "embedding",
      "doc_id", Seq("spark", "query"), Array(1.0f, 0.0f), k = 5, fetchK = 5)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
    assert(run() === run())
  }
}
