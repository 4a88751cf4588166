package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 full-text search as declarative Spark plans (SURVEY §2 T3/A5/F10/F11).
  *
  * Reference: `crates/vector-store/src/fts_index/tantivy.rs` — analyzer =
  * SimpleTokenizer + LowerCaser + English stopwords (tantivy.rs:162-169),
  * postings `WithFreqsAndPositions` (172-175), search = QueryParser over
  * `body` + `TopDocs::with_limit(k).order_by_score()` (237-274), scores are
  * BM25 with the usual Lucene constants k1=1.2, b=0.75.
  *
  * Differences vs tantivy, by design:
  *  - field-length norms are exact token counts (tantivy/Lucene quantize them
  *    to 1 byte); scores are the textbook formula, rankings near-identical;
  *  - multi-term queries are disjunctive term sums (tantivy QueryParser
  *    default); phrase/boolean operators are not parsed yet.
  *
  * Scale design: [[buildIndex]] materializes the postings/doc-length tables
  * once (the expensive tokenize+explode+shuffle); [[searchIndex]] then only
  * touches `postings.filter(term IN queryTerms)` — a selective predicate that
  * prunes to a handful of terms (partition/bucket postings by term at write
  * time and the scan is surgical), followed by a broadcast of per-term DF
  * stats and a TakeOrderedAndProject top-k. No full-corpus pass per query.
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75

  /** Tantivy's English stopword set (StopWordFilter::new(Language::English),
    * tantivy.rs:163; behavior pinned by the reference test
    * `tokenize_removes_english_stop_words`, tantivy.rs:864-870). */
  val EnglishStopwords: Seq[String] = Seq(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if", "in",
    "into", "is", "it", "no", "not", "of", "on", "or", "such", "that", "the",
    "their", "then", "there", "these", "they", "this", "to", "was", "will",
    "with")

  /** SimpleTokenizer + LowerCaser + stopword removal: split on runs of
    * non-alphanumeric (unicode-aware, tantivy.rs:855-877 tests), drop empties
    * and stopwords. Duplicates preserved (needed for term frequencies).
    * Native single-pass expression; regex formulation kept as its spec. */
  def tokenize(text: Column): Column =
    graft.functions.TokenizeExpr.tokens(text, EnglishStopwords)

  private[graft] def tokenizeRegex(text: Column): Column = {
    val toks = split(lower(text), "[^\\p{L}\\p{N}]+")
    filter(toks, t => length(t) > 0 && !t.isInCollection(EnglishStopwords))
  }

  /** Tokenize a query string on the driver with the same analyzer semantics
    * (distinct terms — a disjunctive BM25 query scores each term once). */
  def tokenizeQuery(query: String): Seq[String] =
    query.toLowerCase.split("[^\\p{L}\\p{N}]+").toSeq
      .filter(t => t.nonEmpty && !EnglishStopwords.contains(t)).distinct

  /** The materialized FTS index: postings + per-doc lengths + corpus stats. */
  final case class Index(
      postings: DataFrame, // (doc_id, term, tf)
      docLens: DataFrame, // (doc_id, dl)
      idCol: String)

  /** Build the index tables from a document DataFrame. */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String): Index = {
    val toks = docs
      .select(col(idCol), explode(tokenize(col(textCol))).as("term"))
    val postings = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docLens = docs
      .select(col(idCol), size(tokenize(col(textCol))).as("dl"))
    Index(postings, docLens, idCol)
  }

  /** BM25 top-k over a built index.
    *
    * idf = ln(1 + (N - df + 0.5)/(df + 0.5));
    * score(doc) = Σ_terms idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
    */
  def searchIndex(index: Index, query: String, k: Int): DataFrame =
    scoreAll(index, query)
      .orderBy(col("score").desc, col(index.idCol).asc)
      .limit(k)

  /** All matching documents with their BM25 scores, unranked — callers pick
    * their own ordering/rounding (the oracle queries order on rounded scores
    * so cross-engine float ulps can't flip the k-boundary). */
  def scoreAll(index: Index, query: String): DataFrame = {
    val terms = tokenizeQuery(query)
    if (terms.isEmpty)
      return index.docLens.sparkSession.emptyDataFrame
        .withColumn(index.idCol, lit(null).cast("long"))
        .withColumn("score", lit(null).cast("double"))

    // corpus stats: one tiny row, broadcast everywhere
    val stats = index.docLens.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))

    val matched = index.postings.filter(col("term").isInCollection(terms))
    // per-term document frequency computed on the pruned postings only
    val dfs = matched.groupBy("term").agg(count(lit(1)).cast("double").as("df"))

    val idf = log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val tfNorm = (col("tf") * (K1 + 1.0)) /
      (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl")))

    matched
      .join(broadcast(dfs), "term")
      .join(index.docLens, index.idCol)
      .crossJoin(broadcast(stats))
      .withColumn("term_score", idf * tfNorm)
      .groupBy(col(index.idCol))
      .agg(sum(col("term_score")).as("score"))
  }

  // ---- phrase queries (F11) ------------------------------------------------

  /** Positional postings (tantivy indexes WithFreqsAndPositions,
    * tantivy.rs:172-175): (id, term, tf, positions sorted asc). */
  final case class PosIndex(postings: DataFrame, docLens: DataFrame, idCol: String)

  def buildPositionalIndex(docs: DataFrame, idCol: String, textCol: String): PosIndex = {
    val toks = docs.select(col(idCol),
      posexplode(tokenize(col(textCol))).as(Seq("pos", "term")))
    val postings = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"), sort_array(collect_list(col("pos"))).as("positions"))
    val docLens = docs.select(col(idCol), size(tokenize(col(textCol))).as("dl"))
    PosIndex(postings, docLens, idCol)
  }

  /** Exact phrase search: documents where the phrase terms occur at
    * consecutive positions. Scored like tantivy's PhraseQuery — BM25 with
    * tf = phrase frequency (number of aligned starts) and df = number of
    * documents containing the phrase. */
  def searchPhrase(index: PosIndex, phrase: String, k: Int): DataFrame = {
    val terms = phrase.toLowerCase.split("[^\\p{L}\\p{N}]+").toSeq
      .filter(t => t.nonEmpty && !EnglishStopwords.contains(t))
    require(terms.nonEmpty, "phrase has no indexable terms")

    // per term i: positions shifted by -i; phrase starts = intersection
    val aligned = terms.zipWithIndex.map { case (t, i) =>
      index.postings.filter(col("term") === t)
        .select(col(index.idCol),
          transform(col("positions"), p => p - i).as(s"_p$i"))
    }.reduce((a, b) => a.join(b, index.idCol))
    val starts = (0 until terms.length).map(i => col(s"_p$i"))
      .reduce((a, b) => array_intersect(a, b))
    val matches = aligned
      .withColumn("ptf", size(starts))
      .filter(col("ptf") > 0)
      .select(col(index.idCol), col("ptf"))

    val stats = index.docLens.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val dfPhrase = matches.agg(count(lit(1)).cast("double").as("df"))

    val idf = log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val tfNorm = (col("ptf") * (K1 + 1.0)) /
      (col("ptf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl")))
    matches
      .join(index.docLens, index.idCol)
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(dfPhrase))
      .withColumn("score", idf * tfNorm)
      .select(col(index.idCol), col("score"))
      .orderBy(col("score").desc, col(index.idCol).asc)
      .limit(k)
  }

  /** Minimal QueryParser (tantivy QueryParser subset, tantivy.rs:237-246):
    * double-quoted segments are phrases, bare words are disjunctive terms;
    * total score = sum of term and phrase scores per document. */
  def searchParsed(docs: DataFrame, idCol: String, textCol: String,
      query: String, k: Int): DataFrame = {
    val phraseRe = "\"([^\"]+)\"".r
    val phrases = phraseRe.findAllMatchIn(query).map(_.group(1)).toSeq
    val remainder = phraseRe.replaceAllIn(query, " ")
    val scores = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (tokenizeQuery(remainder).nonEmpty) {
      val idx = buildIndex(docs, idCol, textCol)
      scores += scoreAll(idx, remainder).select(col(idCol), col("score"))
    }
    if (phrases.nonEmpty) {
      val pidx = buildPositionalIndex(docs, idCol, textCol)
      phrases.foreach { p =>
        scores += searchPhrase(pidx, p, Int.MaxValue).select(col(idCol), col("score"))
      }
    }
    require(scores.nonEmpty, "query has no indexable terms")
    scores.reduce(_ unionByName _)
      .groupBy(col(idCol)).agg(sum(col("score")).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Batched multi-query BM25: a whole query set evaluated in one plan —
    * the postings are touched once for the union of all query terms; per
    * (query, doc) scores aggregate map-side; top-k per query goes through
    * the WindowGroupLimit partial-top-k optimization (same shape as batched
    * ANN). At corpus scale this beats issuing queries one at a time by the
    * number of queries.
    *
    * @param queries (query_id, query_text) — the small side, broadcast */
  def searchIndexBatch(index: Index, queries: Seq[(Long, String)], k: Int): DataFrame = {
    val spark = index.postings.sparkSession
    import spark.implicits._
    val queryTerms = queries
      .flatMap { case (qid, q) => tokenizeQuery(q).map(t => (qid, t)) }
      .toDF("query_id", "term")
    val allTerms = queryTerms.select("term").distinct()

    val stats = index.docLens.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val matched = index.postings.join(broadcast(allTerms), "term")
    val dfs = matched.groupBy("term").agg(count(lit(1)).cast("double").as("df"))

    val idf = log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val tfNorm = (col("tf") * (K1 + 1.0)) /
      (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl")))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(index.idCol).asc)
    matched
      .join(broadcast(queryTerms), "term") // fan out to the queries wanting each term
      .join(broadcast(dfs), "term")
      .join(index.docLens, index.idCol)
      .crossJoin(broadcast(stats))
      .withColumn("term_score", idf * tfNorm)
      .groupBy(col("query_id"), col(index.idCol))
      .agg(sum(col("term_score")).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(index.idCol), col("score"), col("rank"))
  }

  /** One-shot convenience: build + search (what the HTTP bm25 route does
    * end-to-end, httproutes.rs:906-1054). */
  def search(docs: DataFrame, idCol: String, textCol: String,
      query: String, k: Int): DataFrame =
    searchIndex(buildIndex(docs, idCol, textCol), query, k)

  /** FTS stats surface (A2): num_docs + total tokens. */
  def stats(index: Index): DataFrame =
    index.docLens.agg(
      count(lit(1)).as("num_docs"),
      sum(col("dl")).as("total_tokens"))
}
