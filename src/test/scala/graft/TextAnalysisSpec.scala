package graft

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "The quick brown fox, and the lazy dog!"),
    (1L, "el perro y el gato en la casa de los niños no se van"),
    (2L, "x"),
    (3L, "word word word other")) // repeated tokens, order matters
    .toDF("doc_id", "text")

  test("stats: chars, tokens, ratios") {
    val r = TextAnalysis.stats(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    val d0 = r(0L)
    assert(d0.getAs[Int]("n_chars") == 38)
    assert(d0.getAs[Int]("n_ws_tokens") == 8)
    // bpe-ish: 8 words + ',' + '!' = 10
    assert(d0.getAs[Int]("n_bpeish_tokens") == 10)
    assert(d0.getAs[Double]("punct_ratio") > 0 && d0.getAs[Double]("punct_ratio") < 0.1)
    assert(r(2L).getAs[Double]("alpha_ratio") == 1.0)
  }

  test("quality: stopword-poor or too-short docs dropped") {
    val q = TextAnalysis.quality(docs, "doc_id", "text", minChars = 10)
      .collect().map(x => x.getLong(0) -> x.getAs[Boolean]("keep")).toMap
    assert(q(0L)) // fluent English, long enough
    assert(!q(2L)) // too short
  }

  test("language id: picks the right function-word profile") {
    val langs = TextAnalysis.languageId(docs, "doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getString(1))).toMap
    assert(langs(0L) == "en")
    assert(langs(1L) == "es")
    // no hits anywhere → all ratios 0 → alphabetical tiebreak
    assert(langs(2L) == "de")
  }

  test("fingerprint is order-sensitive, unlike a bag-of-words sketch") {
    val a = Seq((0L, "alpha beta gamma"), (1L, "gamma beta alpha"),
      (2L, "alpha beta gamma")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(a, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(fp(0L) == fp(2L))
    assert(fp(0L) != fp(1L))
  }

  test("token report aggregates per group") {
    val g = Seq((0L, "a", "one two"), (1L, "a", "three"), (2L, "b", "four five six"))
      .toDF("doc_id", "src", "text")
    val r = TextAnalysis.tokenReport(g, "src", "text")
      .select("src", "n_docs", "ws_tokens")
      .as[(String, Long, Long)].collect()
      .map { case (k, v, w) => k -> ((v, w)) }.toMap
    assert(r("a") == ((2L, 3L)) && r("b") == ((1L, 3L)))
  }

  test("repetition score: degenerate repeats flagged, clean prose low") {
    val docs = Seq(
      (0L, "buy now buy now buy now buy now"), // 'buy now'/'now buy' dominate
      (1L, "every word here is entirely distinct prose"),
      (2L, "solo"), // < 2 tokens → no bigrams, dropped
      (3L, "a a a a")) // self-overlapping bigram: raw 2·3/4 > 1 → capped
      .toDF("doc_id", "text")
    val r = TextAnalysis.repetitionScore(docs, "doc_id", "text")
      .as[(Long, Int, Long, Double)].collect().map(x => x._1 -> x).toMap
    // doc 0: 8 tokens, 'buy now' appears 4x → ratio 8/8 = 1.0
    assert(r(0L)._3 == 4L && r(0L)._4 == 1.0)
    // doc 3: the ratio is a true fraction — capped at 1.0
    assert(r(3L)._3 == 3L && r(3L)._4 == 1.0)
    // doc 1: 7 tokens, every bigram unique → 2/7
    assert(r(1L)._3 == 1L)
    assert(math.abs(r(1L)._4 - math.round(2.0 / 7.0 * 1e6) / 1e6) < 1e-9)
    assert(!r.contains(2L))
  }

  test("corpus report: exact interpolated percentiles per group") {
    val corpus = Seq(
      (0L, "a", "one"), (1L, "a", "one two"), (2L, "a", "one two three"),
      (3L, "a", "one two three four"), (4L, "a", "one two three four five"),
      (5L, "b", "x y")) // single-minus group sanity
      .toDF("doc_id", "source", "text")
    val r = TextAnalysis.corpusReport(corpus, "source", "text")
      .collect().map(x => x.getString(0) -> x).toMap
    val a = r("a")
    assert(a.getAs[Long]("n_docs") == 5L)
    // token counts 1..5: p50 = 3 exactly, p90 interpolates 0.6 of the way
    // from 4 to 5 at index 0.9·(5−1) = 3.6
    assert(a.getAs[Double]("p50_tokens") == 3.0)
    assert(a.getAs[Double]("p90_tokens") == 4.6)
    assert(r("b").getAs[Double]("p99_tokens") == 2.0)
  }

  test("duplicated span fraction: cross-doc spans counted, within-doc repeats not") {
    import org.apache.spark.sql.functions.col
    val corpus = Seq(
      // docs 10/11 share the 6-token prefix; doc 10 has 2 extra tokens
      (10L, "alpha beta gamma delta epsilon zeta unique1 unique2"),
      (11L, "alpha beta gamma delta epsilon zeta"),
      // doc 12 repeats a span WITHIN itself only — not cross-doc duplication
      (12L, "one two three four one two three four"),
      (13L, "totally different words with no overlap at all"),
      (14L, "tiny")) // under the window length → no row
      .toDF("doc_id", "text")
    val r = TextAnalysis.duplicatedSpanFraction(corpus, "doc_id", "text", windowLen = 4)
      .collect().map(x => x.getLong(0) ->
        (x.getAs[Long]("n_windows"), x.getAs[Long]("dup_windows"),
          x.getAs[Double]("dup_fraction"))).toMap
    // doc 11: all 3 of its 4-token windows appear in doc 10 → fraction 1.0
    assert(r(11L) == ((3L, 3L, 1.0)), r(11L))
    // doc 10: 5 windows, the 3 shared ones duplicated
    assert(r(10L) == ((5L, 3L, 0.6)), r(10L))
    // doc 12: within-doc repetition is NOT cross-doc duplication
    assert(r(12L)._2 == 0L, r(12L))
    assert(r(13L)._2 == 0L)
    assert(!r.contains(14L))
    // determinism
    val again = TextAnalysis.duplicatedSpanFraction(corpus, "doc_id", "text", windowLen = 4)
      .collect().map(x => x.getLong(0) -> x.getAs[Long]("dup_windows")).toMap
    assert(again == r.map { case (k, v) => k -> v._2 })
    // no document text in the shuffled window relation: only (id, hash) move
    val w = TextAnalysis.duplicatedSpanFraction(corpus, "doc_id", "text", windowLen = 4)
    assert(!w.queryExecution.executedPlan.toString.contains("CartesianProduct"))
  }

  test("span scrub: cross-doc duplicated windows removed, everything else kept") {
    val corpus = Seq(
      // docs 10/11 share the 6-token prefix; doc 10 keeps its unique tail
      (10L, "alpha beta gamma delta epsilon zeta unique1 unique2"),
      (11L, "alpha beta gamma delta epsilon zeta"),
      // within-doc repetition only — NOT scrubbed (df counts distinct docs)
      (12L, "one two three four one two three four"),
      (13L, "totally different words with no overlap at all"),
      (14L, "tiny"), // under the window length → untouched
      (15L, "")) // token-less → empty stream, not a crash
      .toDF("doc_id", "text")
    val r = TextAnalysis.spanScrub(corpus, "doc_id", "text", windowLen = 4)
      .collect().map(x => x.getLong(0) ->
        (x.getAs[Int]("n_tokens"), x.getAs[Int]("n_dropped"),
          x.getAs[String]("clean_text"))).toMap
    // every row of the input survives (scrub rewrites, never drops docs)
    assert(r.keySet == Set(10L, 11L, 12L, 13L, 14L, 15L))
    // the shared 6-token prefix is fully covered by duplicated 4-windows
    assert(r(10L) == ((8, 6, "unique1 unique2")), r(10L))
    assert(r(11L) == ((6, 6, "")), r(11L))
    // within-doc repeats and unique docs keep their full token stream
    assert(r(12L) == ((8, 0, "one two three four one two three four")))
    assert(r(13L)._2 == 0 && r(13L)._3 == "totally different words with no overlap at all")
    assert(r(14L) == ((1, 0, "tiny")))
    assert(r(15L) == ((0, 0, "")))
    // consistency with the scoring view: zero dup_fraction ⇒ zero dropped
    val frac = TextAnalysis.duplicatedSpanFraction(corpus, "doc_id", "text", windowLen = 4)
      .collect().map(x => x.getLong(0) -> x.getAs[Double]("dup_fraction")).toMap
    frac.foreach { case (id, f) => assert((f > 0.0) == (r(id)._2 > 0)) }
    // partially-overlapping windows: covered positions form the UNION, not
    // a double count — doc sharing two overlapping windows drops 5 tokens
    val ov = Seq(
      (20L, "a b c d e tail1 tail2"), // windows abcd + bcde both duplicated
      (21L, "a b c d e other thing"))
      .toDF("doc_id", "text")
    val r2 = TextAnalysis.spanScrub(ov, "doc_id", "text", windowLen = 4)
      .collect().map(x => x.getLong(0) -> x.getAs[String]("clean_text")).toMap
    assert(r2(20L) == "tail1 tail2", r2(20L))
    assert(r2(21L) == "other thing")
    // no cartesian anywhere in the plan
    val plan = TextAnalysis.spanScrub(corpus, "doc_id", "text", windowLen = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }

  test("lm score: common-token docs score higher than rare-token docs") {
    // corpus: 'common' appears 6x, rare words once each → the all-common doc
    // has the highest mean token log-probability
    val docs = Seq(
      (0L, "common common common"),
      (1L, "common common common"),
      (2L, "rarest unique singleton"))
      .toDF("doc_id", "text")
    val s = TextAnalysis.lmScore(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(s(0L) == s(1L)) // identical docs, identical score
    assert(s(0L) > s(2L))
    // doc 0: all tokens 'common' with p = 6/9 → score = ln(2/3)
    assert(math.abs(s(0L) - math.round(math.log(6.0 / 9.0) * 1e4) / 1e4) < 1e-9)
  }

  test("nb quality score: separable classes split by sign, formula exact") {
    val fixture = Seq(
      (0L, true, "good clean prose text"),
      (1L, true, "clean good text here"),
      (2L, false, "spam junk noise blob"),
      (3L, false, "junk spam blob noise"),
      (4L, true, "good prose"),
      (5L, false, "mixed good junk"))
    val docs = fixture.toDF("doc_id", "y", "text")
    val got = TextAnalysis.nbQualityScore(docs, "doc_id", "text",
      org.apache.spark.sql.functions.col("y"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    // brute-force model from the same corpus
    val toks = fixture.map { case (id, y, t) => (id, y, t.split(" ").toSeq) }
    val pos = toks.filter(_._2).flatMap(_._3)
    val neg = toks.filterNot(_._2).flatMap(_._3)
    val v = (pos ++ neg).distinct.size
    val (np, nn) = (pos.size, neg.size)
    def lo(t: String) =
      math.log((pos.count(_ == t) + 1.0) / (np + v)) -
        math.log((neg.count(_ == t) + 1.0) / (nn + v))
    val prior = math.log((toks.count(_._2) + 1.0) / (toks.count(!_._2) + 1))
    toks.foreach { case (id, _, ts) =>
      val want = math.round((prior + ts.map(lo).sum) * 1e4) / 1e4
      assert(math.abs(got(id) - want) < 1e-9, s"doc $id")
    }
    // class separation: clean docs positive, junk negative, mixed between
    assert(Seq(0L, 1L, 4L).forall(got(_) > 0))
    assert(Seq(2L, 3L).forall(got(_) < 0))
    assert(got(2L) < got(5L) && got(5L) < got(0L))
  }

  test("bigram lm score equals the hand-computed interpolated model") {
    val docs = Seq(
      (0L, "the cat sat"),
      (1L, "the cat ran"),
      (2L, "sat the cat"), // same unigrams as 0, different transitions
      (3L, "solo"))        // <2 tokens → no transitions → absent
      .toDF("doc_id", "text")
    val got = TextAnalysis.lmScoreBigram(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // corpus: N=10; c(the)=3 c(cat)=3 c(sat)=2 c(ran)=1 c(solo)=1
    // bigrams: (the,cat)=3 (cat,sat)=1 (cat,ran)=1 (sat,the)=1
    val c = Map("the" -> 3.0, "cat" -> 3.0, "sat" -> 2.0, "ran" -> 1.0)
    val b = Map(("the", "cat") -> 3.0, ("cat", "sat") -> 1.0,
      ("cat", "ran") -> 1.0, ("sat", "the") -> 1.0)
    def p(w1: String, w2: String) =
      0.5 * b((w1, w2)) / c(w1) + 0.5 * c(w2) / 10.0
    def score(ts: Seq[(String, String)]) =
      math.round(ts.map { case (a, bb) => math.log(p(a, bb)) }.sum / ts.size * 1e4) / 1e4
    assert(got(0L)._1 == 2L)
    assert(math.abs(got(0L)._2 - score(Seq(("the", "cat"), ("cat", "sat")))) < 1e-9)
    assert(math.abs(got(2L)._2 - score(Seq(("sat", "the"), ("the", "cat")))) < 1e-9)
    assert(!got.contains(3L))
    // transition order matters even with identical unigrams
    assert(got(0L)._2 != got(2L)._2)
  }

  test("tfidf top terms: corpus-wide words rank below distinctive ones") {
    val docs = Seq(
      (0L, "shared shared apple apple apple"),
      (1L, "shared banana"),
      (2L, "shared cherry cherry"))
      .toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", 2)
      .as[(Long, String, Double, Int)].collect()
    val rank1 = top.filter(_._4 == 1).map(r => r._1 -> r._2).toMap
    // 'shared' is in every doc → idf 0 → never the top term
    assert(rank1 == Map(0L -> "apple", 1L -> "banana", 2L -> "cherry"))
    assert(top.count(_._1 == 0L) == 2) // k bounded per doc
    // ranks are 1..k, deterministic tiebreak
    assert(top.filter(_._1 == 0L).map(_._4).sorted.toSeq == Seq(1, 2))
  }

  test("corpusReportApprox: sketch percentiles track the exact report") {
    import org.apache.spark.sql.functions.col
    // 500 docs per group with token counts 1..500 — percentile ranks are
    // unambiguous, so the sketch must land within its rank-error bound
    val docs = spark.range(1000).select(
      (col("id") % 2).cast("string").as("source"),
      org.apache.spark.sql.functions.concat_ws(" ",
        org.apache.spark.sql.functions.transform(
          org.apache.spark.sql.functions.sequence(
            org.apache.spark.sql.functions.lit(1),
            (col("id") / 2 % 500 + 1).cast("int")),
          _ => org.apache.spark.sql.functions.lit("w"))).as("text"))
    val exact = TextAnalysis.corpusReport(docs, "source", "text")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("p90_tokens")).toMap
    val approx = TextAnalysis.corpusReportApprox(docs, "source", "text")
      .collect().map(r => r.getString(0) -> r.getAs[Int]("p90_tokens").toDouble).toMap
    for ((g, e) <- exact) {
      assert(math.abs(approx(g) - e) <= math.max(2.0, e * 0.01),
        s"group $g: approx ${approx(g)} vs exact $e")
    }
    // partial-aggregating: the plan must be HashAggregate/ObjectHashAggregate
    // with a partial pass, never a per-group Sort
    val p = TextAnalysis.corpusReportApprox(docs, "source", "text")
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_percentile_approx"), p.take(1500))
  }

  test("piiScrub: counts on original text, pattern-order redaction") {
    val docs = Seq(
      (0L, "mail a.b+c@ex.co and b@d.org call +1-555-0001 from 10.0.0.7"),
      (1L, "no pii here"),
      (2L, "ping 10.0.0.7@x.io then 1.2.3.4.5 stray"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(docs, "doc_id", "text")
      .as[(Long, Int, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    assert(out(0L) == ((0L, 2, 1, 1,
      "mail <EMAIL> and <EMAIL> call <PHONE> from <IP>")))
    assert(out(1L) == ((1L, 0, 0, 0, "no pii here")))
    // counts are on the ORIGINAL text (the dotted quad inside the email
    // local part still counts as an ip), but redaction applies in pattern
    // order: email consumes "10.0.0.7@x.io" whole before the ip pass, which
    // then only sees the stray "1.2.3.4" prefix of "1.2.3.4.5"
    assert(out(2L) == ((2L, 1, 2, 0, "ping <EMAIL> then <IP>.5 stray")))
  }

  test("vocabBuild: dense rank ids by count desc then term asc, capped at V") {
    val v = TextAnalysis.vocabBuild(docs, "text", vocabSize = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(v.length == 5)
    // corpus counts: el=2, word=3, the=2, ... rank: word(3) first, then
    // count-2 terms in term-asc order: el, the; then count-1 alphabetical
    assert(v.sortBy(_._2).map(x => (x._1, x._3)).toSeq ==
      Seq(("word", 3L), ("el", 2L), ("the", 2L), ("and", 1L), ("brown", 1L)))
    assert(v.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L)) // dense 1..V
  }

  test("encodeTokens: order-exact ids, OOV = 0, empty docs drop out") {
    val vocab = TextAnalysis.vocabBuild(docs, "text", vocabSize = 3)
    // vocab: word→1, el→2, the→3; everything else OOV
    val enc = TextAnalysis.encodeTokens(docs, vocab, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getSeq[Long](2).toList)).toMap
    assert(enc(3L) == ((4L, List(1L, 1L, 1L, 0L)))) // word word word other
    // doc 0: the quick brown fox and the lazy dog → the=3 at pos 0 and 5
    assert(enc(0L)._2.length == 8)
    assert(enc(0L)._2.zipWithIndex.filter(_._1 == 3L).map(_._2) == List(0, 5))
    assert(enc(0L)._2.count(_ == 0L) == 6) // the 6 non-vocab tokens
    // doc 2 ("x") has one token → encodes; a zero-token doc would drop
    val empty = Seq((9L, "!!! ...")).toDF("doc_id", "text")
    assert(TextAnalysis.encodeTokens(empty, vocab, "doc_id", "text").count() == 0)
  }

  test("normalizeText: NFC + lower + whitespace collapse + trim, idempotent") {
    import org.apache.spark.sql.functions.col
    val raw = "  Café \t ÉSTA  x\n" // decomposed accents: NFC must compose
    val got = Seq(Tuple1(raw)).toDF("t")
      .select(TextAnalysis.normalizeText(col("t")).as("n")).as[String].head()
    assert(got == "café ésta x")
    // idempotent: normalizing the normalized form is the identity
    val twice = Seq(Tuple1(got)).toDF("t")
      .select(TextAnalysis.normalizeText(col("t")).as("n")).as[String].head()
    assert(twice == got)
    // frame op flags changed rows only
    val fr = TextAnalysis.normalized(
      Seq((0L, raw), (1L, "already clean")).toDF("id", "text"), "id", "text")
      .as[(Long, String, Boolean)].collect()
      .map { case (k, v, c) => k -> ((v, c)) }.toMap
    assert(fr(0L)._2 && !fr(1L)._2)
  }

  test("token entropy: known distributions, uniform max, degenerate zero") {
    val docs = Seq(
      (0L, "a a a b"),     // skewed: H = ln4 − 3·ln3/4
      (1L, "a b c d"),     // uniform: H = ln4, TTR 1
      (2L, "x"),           // single token: H = 0
      (3L, "")             // token-less: absent
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tokenEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
          r.getAs[Double]("entropy"), r.getAs[Double]("type_token_ratio")))).toMap
    assert(out(0L) == ((4L, 2L,
      BigDecimal(math.log(4) - 3 * math.log(3) / 4)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, 0.5)))
    assert(out(1L)._3 == 1.3863 && out(1L)._4 == 1.0)
    assert(out(2L) == ((1L, 1L, 0.0, 1.0)))
    assert(!out.contains(3L))
  }

  test("gopher rules: each rule trips independently") {
    val clean = ("the data " + Seq.tabulate(30)(i => s"word$i").mkString(" "))
    val docs = Seq(
      (0L, clean),                                      // passes everything
      (1L, "the be to"),                                // too few words
      (2L, clean + " ### ## # # #"),                    // symbol ratio
      (3L, (1 to 32).map(i => s"- item the $i\n").mkString), // bullets
      (4L, clean.replace("word", "0000")),              // alpha fraction
      (5L, Seq.tabulate(32)(i => s"w$i").mkString(" ")) // no required words
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, "doc_id", "text",
        minWords = 30, minRequiredWords = 1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("keep"), r.getAs[Int]("n_words"),
          r.getAs[Double]("symbol_word_ratio"),
          r.getAs[Double]("bullet_line_frac"),
          r.getAs[Double]("alpha_word_frac")))).toMap
    assert(out(0L)._1, out(0L).toString)
    assert(!out(1L)._1 && out(1L)._2 == 3)
    assert(!out(2L)._1 && out(2L)._3 > 0.1)
    assert(!out(3L)._1 && out(3L)._4 == 1.0)
    assert(!out(4L)._1 && out(4L)._5 < 0.8)
    assert(!out(5L)._1)
  }

  test("htmlExtract: elements out, blocks to newlines, one unescape level") {
    val pages = Seq(
      (0L, "<html><head><script>var a = '<p>not text</p>';</script>" +
        "<style>h1 { x: y }</style></head><body>" +
        "<h1>Title</h1><!-- secret --><p>para one</p><p>two &amp; three</p>" +
        "<div>d1</div>tail</body></html>"),
      (1L, "no markup at all"),
      (2L, "a &amp;lt; b &lt; c"), // double-escaped: exactly ONE level
      (3L, "<ul><li>x</li><li>y</li></ul>"),
      (4L, "<p>MULTI\n\n\n  spaces   and\t tabs</p>")
    ).toDF("doc_id", "html")
    val r = TextAnalysis.htmlExtract(pages, "doc_id", "html")
      .collect().map(x => x.getLong(0) -> x).toMap
    // script/style CONTENT is gone (not just the tags), comment gone,
    // block closers create line structure
    assert(r(0L).getAs[String]("text") == "Title\npara one\ntwo & three\nd1\ntail")
    assert(r(0L).getAs[Int]("n_tags") > 10)
    assert(r(1L).getAs[String]("text") == "no markup at all")
    assert(r(1L).getAs[Int]("n_tags") == 0)
    // &amp;lt; unescapes to the LITERAL "&lt;", never to "<"
    assert(r(2L).getAs[String]("text") == "a &lt; b < c")
    assert(r(3L).getAs[String]("text") == "x\ny")
    assert(r(4L).getAs[String]("text") == "MULTI\nspaces and tabs")
  }

  test("lineDedup: cross-doc lines drop, unique lines keep order and bytes") {
    val docs = Seq(
      (0L, "banner\nalpha unique\nshared middle\nend zero"),
      (1L, "banner\nbeta unique\nshared middle\nend one"),
      (2L, "banner\ngamma solo"),
      (3L, "all original\nnothing shared here")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.lineDedup(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        ((x.getAs[String]("clean_text"), x.getAs[Int]("n_lines"),
          x.getAs[Int]("n_removed")))).toMap
    assert(r(0L) == (("alpha unique\nend zero", 4, 2)))
    assert(r(1L) == (("beta unique\nend one", 4, 2)))
    assert(r(2L) == (("gamma solo", 2, 1)))
    assert(r(3L) == (("all original\nnothing shared here", 2, 0)))
    // trim-equality: indentation variants of the same line still dedup;
    // within-doc repeats alone do NOT (cross-doc means distinct docs)
    val docs2 = Seq(
      (0L, "  padded line\nself\nself"),
      (1L, "padded line  \nother")).toDF("doc_id", "text")
    val r2 = TextAnalysis.lineDedup(docs2, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getAs[String]("clean_text")).toMap
    assert(r2(0L) == "self\nself")
    assert(r2(1L) == "other")
  }

  test("bpeTrain: hand-computed merges on a tiny corpus") {
    // vocabulary: low x4, lower x2, newest x3 (split on non-alnum)
    val docs = Seq(
      (0L, "low low low low"),
      (1L, "lower lower"),
      (2L, "newest, newest; newest")).toDF("doc_id", "text")
    val m = TextAnalysis.bpeTrain(docs, "text", nMerges = 4)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[String]("merged"),
        r.getAs[Long]("freq")))
    // round 1 pair counts: (l,o)=6, (o,w)=6, (w,e)=5, (e,s)=3, (s,t)=3,
    // (e,r)=2, (n,e)=3, (e,w)=3 → argmax ties (l,o)/(o,w) at 6 → "l o" asc
    assert(m(0) == ((1, "l", "o", "lo", 6L)))
    // after ' l o '→' lo ': (lo,w)=6 wins
    assert(m(1) == ((2, "lo", "w", "low", 6L)))
    // then: low x4 done; lower = [low,e,r] x2; newest = [n,e,w,e,s,t] x3
    // pairs: (low,e)=2,(e,r)=2,(n,e)=3,(e,w)=3,(w,e)=3,(e,s)=3,(s,t)=3
    // → tie at 3, asc: "e s" < "e w" < "n e" < "s t" < "w e" → (e,s)
    assert(m(2) == ((3, "e", "s", "es", 3L)))
    // newest = [n,e,w,es,t]: (es,t)=3,(n,e)=3,(e,w)=3,(w,es)=3,(low,e)=2,
    // (e,r)=2 → asc "e w" < "es t" < "n e" < "w es" → (e,w)... but ' e w '
    // only matches where w follows e: newest → [n,ew,es,t]
    assert(m(3) == ((4, "e", "w", "ew", 3L)))
    // determinism: identical result on a re-run
    val m2 = TextAnalysis.bpeTrain(docs, "text", nMerges = 4)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[String]("merged")))
    assert(m2.toSeq == m.toSeq.map(x => (x._1, x._4)))
  }

  test("gopherRepetition: hand-computed signals, union counts overlap once") {
    val docs = Seq(
      (0L, "x\nab ab ab\nx"),                    // dup line + top-gram shares
      (1L, "a b c d e a b c d e"),               // dup 5-gram, union = all
      (2L, "plain words only here")              // nothing repeats
    ).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRepetition(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    val d0 = r(0L)
    // lines: ["x", "ab ab ab", "x"] -> group x has c=2: 1 repeat of 3 lines
    assert(d0.getAs[Double]("dup_line_frac") == math.rint(1.0 / 3 * 1e6) / 1e6)
    assert(d0.getAs[Double]("dup_line_char_frac") == 0.1) // 1 char of 10
    // tokens [x ab ab ab x], chars 8; top bigram "ab ab" c=2 chars 4 -> 8/8
    assert(d0.getAs[Int]("n_tokens") == 5 && d0.getAs[Long]("token_chars") == 8L)
    assert(d0.getAs[Double]("top_2gram_char_frac") == 1.0)
    // trigram tie at c=1 -> "ab ab ab" wins asc; 6 chars of 8
    assert(d0.getAs[Double]("top_3gram_char_frac") == 0.75)
    assert(d0.getAs[Double]("dup_5gram_char_frac") == 0.0)
    val d1 = r(1L)
    // "a b c d e" 5-gram at starts 0 and 5: union covers all 10 tokens
    assert(d1.getAs[Double]("dup_5gram_char_frac") == 1.0)
    assert(d1.getAs[Double]("dup_10gram_char_frac") == 0.0) // single 10-gram
    val d2 = r(2L)
    assert(d2.getAs[Double]("dup_line_frac") == 0.0)
    assert(d2.getAs[Double]("dup_5gram_char_frac") == 0.0)
    // top bigram exists even without repeats (c=1): deterministic asc pick
    assert(d2.getAs[Double]("top_2gram_char_frac") > 0.0)
  }

  test("bpeEncode: merges apply in order, never across word boundaries") {
    val docs = Seq((0L, "low lower"), (1L, "ol lo")).toDF("doc_id", "text")
    val r = TextAnalysis.bpeEncode(docs, "doc_id", "text",
        Seq(("l", "o"), ("lo", "w")))
      .collect().map(x => x.getLong(0) ->
        ((x.getAs[Int]("n_subwords"), x.getAs[String]("subword_text")))).toMap
    assert(r(0L) == ((4, "low low e r")))
    // "ol lo": the (l,o) merge fires inside "lo" but NOT across "ol|lo"
    assert(r(1L) == ((3, "o l lo")))
    // empty merge list = plain character segmentation
    val plain = TextAnalysis.bpeEncode(docs, "doc_id", "text", Nil)
      .collect().map(x => x.getLong(0) -> x.getAs[String]("subword_text")).toMap
    assert(plain(0L) == "l o w l o w e r")
  }

  test("bpeTrain: greedy left-to-right application (aaa -> aa a)") {
    val docs = Seq((0L, "aaa aaa")).toDF("doc_id", "text")
    val m = TextAnalysis.bpeTrain(docs, "text", nMerges = 2)
      .collect().map(r => (r.getAs[String]("left"), r.getAs[String]("right"),
        r.getAs[Long]("freq")))
    // 'aaa' = [a,a,a]: positions (a,a)x2 per word, 2 words → freq 4;
    // applying ' a a '→' aa ' greedily leaves [aa, a]
    assert(m(0) == (("a", "a", 4L)))
    // round 2 over [aa, a]: the only pair is (aa, a), freq 2
    assert(m(1) == (("aa", "a", 2L)))
  }

  test("ngramDiversity: totals, distincts and exact ppm ratio per group") {
    val docs = Seq(
      (0L, "a", "one two three four"),        // 2 distinct trigrams
      (1L, "a", "one two three five"),        // shares 'one two three'
      (2L, "b", "x x x x x"),                 // 3 grams, all identical
      (3L, "b", "short doc")                  // < 3 tokens → no grams
    ).toDF("doc_id", "source", "text")
    val r = TextAnalysis.ngramDiversity(docs, "source", "text", n = 3)
      .collect().map(x => x.getAs[String]("source") ->
        ((x.getAs[Long]("n_grams"), x.getAs[Long]("n_distinct"),
          x.getAs[Long]("diversity_ppm")))).toMap
    // source a: 4 grams total, 3 distinct (one-two-three shared)
    assert(r("a") == ((4L, 3L, 3L * 1000000L / 4L)))
    // source b: 3 grams, 1 distinct — the pure-repetition signature
    assert(r("b") == ((3L, 1L, 1000000L / 3L)))
  }

  test("collocations: tight pairs outrank frequent-but-independent pairs; minCount floors") {
    // "united kingdom" always adjacent (PMI-max); "the data" co-occurs but
    // 'the' and 'data' also appear apart (diluted PMI); "rare gem" appears
    // only 2 times (< minCount, excluded)
    val docs = ((1 to 6).map(i => (i.toLong, "united kingdom the data report")) ++
      (7 to 12).map(i => (i.toLong, "the report shows data trends")) ++
      Seq((13L, "rare gem"), (14L, "rare gem")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.collocations(docs, "text", minCount = 5, k = 10)
      .collect()
    val pairs = out.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(!pairs.contains(("rare", "gem")), "below-minCount pair must drop")
    assert(pairs.contains(("united", "kingdom")))
    val pmi = out.map(r => ((r.getString(0), r.getString(1)),
      r.getAs[Double]("pmi"))).toMap
    // united+kingdom occur ONLY together (6/6) — strictly higher PMI than
    // the+data (6 pairs over 12×12 unigrams)
    assert(pmi(("united", "kingdom")) > pmi(("the", "data")))
    // hand-check: PMI(united kingdom) = ln(6·N / (6·6)) with N = 6·5 + 6·5 + 4
    val n = 6 * 5 + 6 * 5 + 4
    val want = math.log(6.0 * n / (6.0 * 6.0))
    assert(math.abs(pmi(("united", "kingdom")) - want) < 5e-7)
  }

  test("readability: hand-computed Flesch / FK on a two-sentence text; syllable heuristic") {
    val docs = Seq(
      (0L, "The cat sat. The cat ran!"),
      (1L, "Beautiful education, unbelievable!"), // multi-syllable words
      (2L, "")                                    // degenerate: no words
    ).toDF("doc_id", "text")
    val r = TextAnalysis.readability(docs, "doc_id", "text")
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    // doc 0: 6 words, 2 sentence runs, 6 syllables (all monosyllables)
    assert(r(0L).getAs[Int]("n_words") == 6)
    assert(r(0L).getAs[Long]("n_sentences") == 2L)
    assert(r(0L).getAs[Long]("n_syllables") == 6L)
    val f0 = 206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (6.0 / 6.0)
    val g0 = 0.39 * (6.0 / 2.0) + 11.8 * (6.0 / 6.0) - 15.59
    assert(r(0L).getAs[Double]("flesch") == f0)
    assert(r(0L).getAs[Double]("fk_grade") == g0)
    // doc 1: beautiful = eau|i|u → 3, education = e|u|a|io → 4,
    // unbelievable = u|e|ie|a|e → 5 ⇒ 12 syllables over 3 words, 1 sentence
    assert(r(1L).getAs[Int]("n_words") == 3)
    assert(r(1L).getAs[Long]("n_syllables") == 12L)
    assert(r(1L).getAs[Long]("n_sentences") == 1L)
    // doc 2: empty text — counts clamp, formulas stay finite
    assert(r(2L).getAs[Int]("n_words") == 0)
    assert(r(2L).getAs[Long]("n_sentences") == 1L)
    assert(!r(2L).getAs[Double]("flesch").isNaN)
  }
}
