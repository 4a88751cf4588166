package graft

import graft.operators.Bm25
import org.apache.spark.sql.functions._

/** Tokenizer + BM25 semantics vs reference tantivy behavior
  * (tantivy.rs:162-169 analyzer, 855-893 tokenizer tests, 237-274 search). */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def toks(s: String): Seq[String] =
    Seq(s).toDF("t").select(Bm25.tokenize(col("t"))).head.getSeq[String](0)

  test("tokenize splits on punctuation (tantivy.rs:855-861)") {
    assert(toks("hello,world!rust.programming") ==
      Seq("hello", "world", "rust", "programming"))
  }

  test("tokenize removes english stop words (tantivy.rs:864-870)") {
    assert(toks("the quick brown fox and a lazy dog") ==
      Seq("quick", "brown", "fox", "lazy", "dog"))
  }

  test("tokenize preserves unicode alphanumerics (tantivy.rs:873-878)") {
    assert(toks("Café Über Naïve Straße") == Seq("café", "über", "naïve", "straße"))
  }

  test("tokenize of empty / whitespace / punctuation-only is empty") {
    assert(toks("").isEmpty)
    assert(toks("   \t\n  ").isEmpty)
    assert(toks("!@#$ ,.;:").isEmpty)
  }

  private lazy val docs = Seq(
    (0L, "spark engine builds fast index"),
    (1L, "spark spark spark everywhere"),
    (2L, "index scan and merge join"),
    (3L, "the and of to")) // only stopwords ⇒ zero tokens
    .toDF("doc_id", "text")

  test("single-term search: tf matters, higher tf ranks higher") {
    val res = Bm25.search(docs, "doc_id", "text", "spark", 10)
      .as[(Long, Double)].collect()
    assert(res.map(_._1).toSeq == Seq(1L, 0L)) // doc 1 has tf=3
    assert(res.forall(_._2 > 0))
  }

  test("multi-term is disjunctive (tantivy QueryParser default)") {
    val res = Bm25.search(docs, "doc_id", "text", "spark merge", 10)
      .as[(Long, Double)].collect()
    assert(res.map(_._1).toSet == Set(0L, 1L, 2L)) // any term matches
  }

  test("scores match hand-computed BM25 (k1=1.2, b=0.75)") {
    val res = Bm25.search(docs, "doc_id", "text", "index", 10)
      .as[(Long, Double)].collect().toMap
    // corpus: N=4 docs, dls = 5,4,4,0 ⇒ avgdl=13/4; 'index' df=2
    val n = 4.0; val df = 2.0; val avgdl = 13.0 / 4.0
    val idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    def s(tf: Double, dl: Double) =
      idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    assert(math.abs(res(0L) - s(1, 5)) < 1e-12)
    assert(math.abs(res(2L) - s(1, 4)) < 1e-12)
  }

  test("no-match and stopword-only queries return empty") {
    assert(Bm25.search(docs, "doc_id", "text", "nonexistent", 10).count() == 0)
    assert(Bm25.search(docs, "doc_id", "text", "the and", 10).count() == 0)
  }

  test("limit is respected with deterministic tiebreak") {
    val res = Bm25.search(docs, "doc_id", "text", "spark index merge", 2)
    assert(res.count() == 2)
  }

  test("batched multi-query search equals per-query search") {
    val idx = Bm25.buildIndex(docs, "doc_id", "text")
    val queries = Seq((0L, "spark"), (1L, "index merge"), (2L, "nonexistent"))
    val batch = Bm25.searchIndexBatch(idx, queries, k = 5)
      .as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(r => (r._2, r._3)).toSeq).toMap
    queries.foreach { case (qid, q) =>
      val single = Bm25.searchIndex(idx, q, 5)
        .as[(Long, Double)].collect().toSeq
      assert(batch.getOrElse(qid, Seq.empty) == single, s"query $qid '$q'")
    }
  }

  test("stats: num_docs and total tokens") {
    val idx = Bm25.buildIndex(docs, "doc_id", "text")
    val (n, total) = Bm25.stats(idx).as[(Long, Long)].head()
    assert(n == 4 && total == 13)
  }
}
