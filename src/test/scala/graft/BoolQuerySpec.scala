package graft

import graft.operators.Bm25
import graft.operators.Bm25.QueryNode._

/** Boolean FTS query parsing + evaluation, pinned to the reference
  * validator's cases (crates/validator/src/fts.rs:248-315 — and/or/not —
  * and 561-599 — grouped booleans; parser entry at
  * crates/vector-store/src/fts_index/tantivy.rs:237-246). */
class BoolQuerySpec extends SparkSpec {
  import spark.implicits._

  // fts.rs boolean fixtures (bm25_boolean_*_query)
  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "a slow turtle walks through the garden"),
    (3L, "the fox runs across the meadow"))
    .toDF("doc_id", "text")

  // fts.rs:561-599 grouped fixture (doc 2 walks through the *meadow*)
  private lazy val groupedDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "a slow turtle walks through the meadow"),
    (3L, "the fox runs across the meadow"))
    .toDF("doc_id", "text")

  private def pks(d: org.apache.spark.sql.DataFrame, q: String): Seq[Long] =
    Bm25.searchParsed(d, "doc_id", "text", q, 10)
      .select("doc_id").as[Long].collect().toSeq

  // ---- parser shape ---------------------------------------------------------

  test("parse: AND / OR / NOT / grouping / precedence") {
    assert(Bm25.parseQuery("fox AND meadow") ==
      Some(And(Seq(Term("fox"), Term("meadow")))))
    assert(Bm25.parseQuery("fox OR turtle") ==
      Some(Or(Seq(Term("fox"), Term("turtle")))))
    assert(Bm25.parseQuery("fox NOT meadow") ==
      Some(And(Seq(Term("fox"), Not(Term("meadow"))))))
    assert(Bm25.parseQuery("(fox OR turtle) AND meadow") ==
      Some(And(Seq(Or(Seq(Term("fox"), Term("turtle"))), Term("meadow")))))
    // AND binds tighter than OR / adjacency
    assert(Bm25.parseQuery("fox AND meadow OR turtle") ==
      Some(Or(Seq(And(Seq(Term("fox"), Term("meadow"))), Term("turtle")))))
    // bare adjacency is OR (tantivy's default conjunction)
    assert(Bm25.parseQuery("fox turtle") ==
      Some(Or(Seq(Term("fox"), Term("turtle")))))
  }

  test("parse: analyzer prunes stopword clauses like tantivy's chain") {
    assert(Bm25.parseQuery("fox AND the") == Some(Term("fox")))
    assert(Bm25.parseQuery("the AND of") == None)
    assert(Bm25.parseQuery("\"the fox\"") == Some(Term("fox"))) // 1-term phrase
    assert(Bm25.parseQuery("\"quick brown fox\"") ==
      Some(Phrase(Seq("quick", "brown", "fox"))))
    // terms are lowercased (operators stay upper-case keywords)
    assert(Bm25.parseQuery("Fox AND Meadow") ==
      Some(And(Seq(Term("fox"), Term("meadow")))))
  }

  test("parse: malformed input raises") {
    intercept[IllegalArgumentException](Bm25.parseQuery("(fox OR turtle"))
    intercept[IllegalArgumentException](Bm25.parseQuery("fox)"))
    intercept[IllegalArgumentException](Bm25.parseQuery("\"unterminated"))
  }

  // ---- evaluation, pinned to the validator's assertions ---------------------

  test("bm25_boolean_and_query (fts.rs:248-265)") {
    assert(pks(docs, "fox AND meadow") == Seq(3L))
  }

  test("bm25_boolean_or_query (fts.rs:268-293)") {
    assert(pks(docs, "fox OR turtle").toSet == Set(1L, 2L, 3L))
  }

  test("bm25_boolean_not_query (fts.rs:296-315)") {
    assert(pks(docs, "fox NOT meadow") == Seq(1L))
  }

  test("bm25_grouped_boolean_query (fts.rs:561-599)") {
    val r = pks(groupedDocs, "(fox OR turtle) AND meadow")
    assert(r.toSet == Set(2L, 3L))
    assert(!r.contains(1L))
  }

  test("bare NOT matches nothing") {
    assert(pks(docs, "NOT fox").isEmpty)
  }

  test("NOT under OR lifts to MustNot on the enclosing boolean (tantivy)") {
    // doc 4 contains BOTH turtle and fox: tantivy's QueryParser lifts the
    // NOT to a MustNot on the whole boolean, so it is excluded even though
    // its turtle clause matches.
    val withBoth = docs.union(Seq((4L, "a turtle raced a fox")).toDF("doc_id", "text"))
    assert(pks(withBoth, "turtle OR NOT fox") == Seq(2L))
    assert(pks(docs, "turtle OR NOT fox") == Seq(2L))
  }

  test("bare word analyzing to multiple tokens becomes a phrase (tantivy)") {
    assert(Bm25.parseQuery("quick-brown") ==
      Some(Phrase(Seq("quick", "brown"))))
    // matches only the doc where the tokens are adjacent in order
    assert(pks(docs, "quick-brown") == Seq(1L))
    assert(pks(docs, "brown-quick").isEmpty)
    // and composes with boolean structure
    assert(pks(docs, "quick-brown OR turtle").toSet == Set(1L, 2L))
  }

  test("phrases participate in boolean structure") {
    assert(pks(docs, "\"quick brown fox\" OR turtle").toSet == Set(1L, 2L))
    assert(pks(docs, "\"quick brown fox\" AND dog") == Seq(1L))
    assert(pks(docs, "\"brown quick fox\" OR turtle") == Seq(2L)) // wrong order ⇒ no phrase match
  }

  test("AND score is the sum of the clause scores") {
    val idx = Bm25.buildIndex(docs, "doc_id", "text")
    val both = Bm25.scoreBoolean(idx, () => fail("no phrases here"), "fox AND meadow")
      .as[(Long, Double)].collect().toMap
    val fox = Bm25.scoreAll(idx, "fox").as[(Long, Double)].collect().toMap
    val meadow = Bm25.scoreAll(idx, "meadow").as[(Long, Double)].collect().toMap
    assert(both.keySet == Set(3L))
    assert(math.abs(both(3L) - (fox(3L) + meadow(3L))) < 1e-12)
  }

  test("empty-query scoreAll keeps the index's id column type") {
    val idx = Bm25.buildIndex(docs.select(col("doc_id").cast("string").as("doc_id"),
      col("text")), "doc_id", "text")
    val empty = Bm25.scoreAll(idx, "the and of")
    assert(empty.schema("doc_id").dataType == org.apache.spark.sql.types.StringType)
    assert(empty.count() == 0)
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
