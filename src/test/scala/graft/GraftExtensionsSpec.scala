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

  test("arity errors are clear") {
    GraftExtensions.register(spark)
    val e = intercept[Exception](spark.sql("SELECT l2_norm()").collect())
    assert(e.getMessage.contains("l2_norm") || e.getMessage.contains("argument"))
  }
}
