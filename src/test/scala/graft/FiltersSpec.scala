package graft

import graft.core.{DB, Document}
import graft.embed.ConstEmbeddingFunc

/**
 * The reference's table-driven filter semantics (query_test.go:10-109):
 * two docs, 9 cases, order-insensitive result compare.
 */
class FiltersSpec extends SparkSuite {

  private lazy val coll = withLogLevel {
    val db = DB.inMemory(spark, ConstEmbeddingFunc.stub())
    val c = db.createCollection("filter-test")
    c.addDocuments(Seq(
      Document("1", Map("language" -> "en"), Array(0.1f, 0.2f, 0.3f), "hello world"),
      Document("2", Map("language" -> "de"), Array(0.2f, 0.3f, 0.4f), "hallo welt")))
    c
  }

  private def ids(
      where: Map[String, String],
      whereDocument: Map[String, String]): Set[String] =
    coll.queryDF(Array(0.1f, 0.2f, 0.3f), 2, where, whereDocument)
      .select("id").collect().map(_.getString(0)).toSet

  private val cases = Seq(
    ("metadata match en", Map("language" -> "en"), Map.empty[String, String], Set("1")),
    ("metadata match de", Map("language" -> "de"), Map.empty[String, String], Set("2")),
    ("metadata no match", Map("language" -> "fr"), Map.empty[String, String], Set.empty[String]),
    ("contains all", Map.empty[String, String], Map("$contains" -> "llo"), Set("1", "2")),
    ("contains one", Map.empty[String, String], Map("$contains" -> "hello"), Set("1")),
    ("contains none", Map.empty[String, String], Map("$contains" -> "bonjour"), Set.empty[String]),
    ("not_contains all", Map.empty[String, String], Map("$not_contains" -> "bonjour"), Set("1", "2")),
    ("not_contains one", Map.empty[String, String], Map("$not_contains" -> "hello"), Set("2")),
    ("combined", Map("language" -> "de"), Map("$contains" -> "hallo", "$not_contains" -> "hello"), Set("2")))

  cases.foreach { case (name, where, whereDoc, expected) =>
    test(s"filter: $name") {
      assert(ids(where, whereDoc) === expected)
    }
  }

  test("missing metadata key behaves as empty string (query.go:136-138)") {
    // where {missing: ""} matches docs WITHOUT the key
    assert(ids(Map("missing" -> ""), Map.empty) === Set("1", "2"))
    // where {missing: "x"} matches nothing
    assert(ids(Map("missing" -> "x"), Map.empty) === Set.empty)
  }

  test("$and/$or/$not clause combinators (roadmap extension)") {
    import graft.core.Filters._
    def q(c: Clause): Set[String] =
      coll.queryEmbeddingWhere(Array(0.1f, 0.2f, 0.3f), 2, c).map(_.id).toSet
    assert(q(Or(Seq(MetaEq("language", "en"), MetaEq("language", "de")))) === Set("1", "2"))
    assert(q(And(Seq(MetaEq("language", "en"), ContentContains("hello")))) === Set("1"))
    assert(q(And(Seq(MetaEq("language", "en"), ContentContains("hallo")))) === Set.empty)
    assert(q(Not(MetaEq("language", "en"))) === Set("2"))
    assert(q(Or(Seq(ContentContains("bonjour"), ContentNotContains("welt")))) === Set("1"))
    assert(q(Or(Seq.empty)) === Set.empty)
    assert(q(And(Seq.empty)) === Set("1", "2"))
  }

  test("unsupported whereDocument operator rejected (collection.go:513-518)") {
    val e = intercept[IllegalArgumentException] {
      coll.queryEmbedding(Array(0.1f, 0.2f, 0.3f), 1,
        whereDocument = Map("$regex" -> "x"))
    }
    assert(e.getMessage === "unsupported operator")
  }

  test("null where keys/values are rejected loudly, not a silent empty result (r12)") {
    // lit(null) nulls the whole AND-fold — the filter would silently
    // return zero rows; in the Go reference a nil map value is
    // unrepresentable, so loud rejection is the faithful port
    intercept[IllegalArgumentException] {
      graft.core.Filters.metadataPredicate(Map("k" -> null))
    }
    intercept[IllegalArgumentException] {
      graft.core.Filters.metadataPredicate(Map(null.asInstanceOf[String] -> "v"))
    }
    intercept[IllegalArgumentException] {
      graft.core.Filters.contentPredicate(Map("$contains" -> null))
    }
  }
}
