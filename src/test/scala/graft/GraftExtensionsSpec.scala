package graft

class GraftExtensionsSpec extends SparkSuite {

  test("vector kernels are callable from SQL after registration") {
    withLogLevel(GraftExtensions.register(spark))
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb")
    val top = spark.sql(
      """SELECT e.vec_id,
        |  dot_f32(e.embedding, (SELECT embedding FROM emb WHERE vec_id = 0)) AS sim
        |FROM emb e ORDER BY sim DESC, vec_id LIMIT 3""".stripMargin).collect()
    assert(top.head.getLong(0) === 0L)
    assert(math.abs(top.head.getFloat(1) - 1f) < 1e-5)

    val norms = spark.sql(
      "SELECT count(*) FROM emb WHERE is_normalized(embedding)").head().getLong(0)
    assert(norms === spark.table("emb").count())

    val nrm = spark.sql(
      "SELECT l2_norm(normalize_f32(array(3.0F, 4.0F)))").head().getDouble(0)
    assert(math.abs(nrm - 1.0) < 1e-6)

    val sh = spark.sql(
      "SELECT simhash64(array('a','b')), simhash64(array('b','a'))").head()
    assert(sh.getLong(0) === sh.getLong(1), "simhash is order-insensitive")
  }

  test("text/dedup kernels are callable from SQL") {
    GraftExtensions.register(spark)
    val lang = spark.sql(
      "SELECT fast_lang_id('the cat and the dog was here')").head().getString(0)
    assert(lang === "en")
    val j = spark.sql(
      """SELECT jaccard_sorted(
        |  shingle_hashes(split('a b c d', ' '), 2),
        |  shingle_hashes(split('a b c e', ' '), 2))""".stripMargin).head().getDouble(0)
    assert(j === 0.5) // shingles {ab,bc,cd} vs {ab,bc,ce}: 2 of 4
    val sig = spark.sql(
      "SELECT minhash_signature(split('x y z', ' '), 8, 2)").head().getSeq[Long](0)
    assert(sig.length === 8)
    val e = intercept[Exception](spark.sql(
      "SELECT shingle_hashes(split('a', ' '), 1 + 1)").collect())
    assert(e.getMessage.contains("integer literal"))
    val nfc = spark.sql("SELECT nfc_normalize('cafe\u0301')").head().getString(0)
    assert(nfc === "caf\u00e9")
  }

  test("arity errors are clear") {
    GraftExtensions.register(spark)
    val e = intercept[Exception](spark.sql("SELECT l2_norm()").collect())
    assert(e.getMessage.contains("l2_norm") || e.getMessage.contains("argument"))
  }
}
