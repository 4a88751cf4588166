package graft

import graft.operators.QualityMetrics
import org.apache.spark.sql.functions._

/** Metric definitions vs the reference harness semantics (recall@k,
  * precision@k, MRR, nDCG@k — latte/full-text-search metrics table). */
class QualityMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def one(retrieved: Seq[Long], relevant: Seq[Long], k: Int) =
    QualityMetrics.evaluate(
      Seq((retrieved, relevant)).toDF("retrieved", "relevant"),
      "retrieved", "relevant", k).head()

  test("perfect retrieval: all metrics 1") {
    val r = one(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), 3)
    assert(r.getAs[Double]("recall_at_3") == 1.0)
    assert(r.getAs[Double]("precision_at_3") == 1.0)
    assert(r.getAs[Double]("mrr") == 1.0)
    assert(math.abs(r.getAs[Double]("ndcg_at_3") - 1.0) < 1e-12)
  }

  test("partial retrieval: textbook values") {
    // retrieved 1,9,2 vs relevant {1,2,3}: hits at ranks 1 and 3
    val r = one(Seq(1L, 9L, 2L), Seq(1L, 2L, 3L), 3)
    assert(math.abs(r.getAs[Double]("recall_at_3") - 2.0 / 3) < 1e-12)
    assert(math.abs(r.getAs[Double]("precision_at_3") - 2.0 / 3) < 1e-12)
    assert(r.getAs[Double]("mrr") == 1.0)
    val dcg = 1.0 / (math.log(2) / math.log(2)) + 1.0 / (math.log(4) / math.log(2))
    val idcg = 1.0 + 1.0 / (math.log(3) / math.log(2)) + 1.0 / (math.log(4) / math.log(2))
    assert(math.abs(r.getAs[Double]("ndcg_at_3") - dcg / idcg) < 1e-12)
  }

  test("no relevant retrieved: zeros (and no division blowups)") {
    val r = one(Seq(7L, 8L), Seq(1L, 2L), 2)
    assert(r.getAs[Double]("recall_at_2") == 0.0)
    assert(r.getAs[Double]("mrr") == 0.0)
    assert(r.getAs[Double]("ndcg_at_2") == 0.0)
    val empty = one(Seq(7L), Seq.empty[Long], 1)
    assert(empty.getAs[Double]("recall_at_1") == 0.0)
    assert(empty.getAs[Double]("ndcg_at_1") == 0.0)
  }

  test("mrr uses the first hit's rank") {
    assert(one(Seq(9L, 9L, 2L), Seq(2L), 3).getAs[Double]("mrr") == 1.0 / 3)
  }

  test("summary averages across the query set (approx-vs-exact recall)") {
    val df = Seq(
      (Seq(1L, 2L), Seq(1L, 2L)), // recall 1
      (Seq(1L, 9L), Seq(1L, 2L))) // recall .5
      .toDF("retrieved", "relevant")
    val s = QualityMetrics.summary(
      QualityMetrics.evaluate(df, "retrieved", "relevant", 2), 2).head()
    assert(math.abs(s.getAs[Double]("recall_at_2") - 0.75) < 1e-12)
  }

  test("rocAuc: perfect separation 1.0, inverted 0.0, random-tie 0.5, textbook mixed") {
    def auc(rows: Seq[(Long, Double, Boolean)]): Double =
      QualityMetrics.rocAuc(rows.toDF("id", "s", "y"), "id", "s", "y")
        .head().getAs[Double]("auc")
    assert(auc(Seq((1L, 1.0, true), (2L, 2.0, true), (3L, 0.5, false))) == 1.0)
    assert(auc(Seq((1L, 0.1, true), (2L, 2.0, false))) == 0.0)
    // all scores tied: average rank everywhere → AUC exactly 1/2
    assert(auc(Seq((1L, 1.0, true), (2L, 1.0, false), (3L, 1.0, true),
      (4L, 1.0, false))) == 0.5)
    // scores pos {3,1}, neg {2}: pairs won 1 of 2 → 0.5; with a tie:
    // pos {3,2}, neg {2} → (1 + 0.5)/2 = 0.75
    assert(auc(Seq((1L, 3.0, true), (2L, 1.0, true), (3L, 2.0, false))) == 0.5)
    assert(auc(Seq((1L, 3.0, true), (2L, 2.0, true), (3L, 2.0, false))) == 0.75)
  }

  test("rocAuc output carries the class counts") {
    val r = QualityMetrics.rocAuc(
      Seq((1L, 1.0, true), (2L, 0.0, false), (3L, 0.5, false))
        .toDF("id", "s", "y"), "id", "s", "y").head()
    assert(r.getAs[Long]("n_pos") == 1L && r.getAs[Long]("n_neg") == 2L)
  }

  test("calibrationCurve: equal-width bins, exact counts and rates; degenerate range is one bin") {
    // scores i/10000 for i in 0..99 → si = i, width = (99+10)/10 = 10,
    // bin = i/10; label flips at i = 50
    val df = (0 until 100).map(i => (i.toLong, i / 10000.0, i >= 50))
      .toDF("id", "s", "y")
    val out = QualityMetrics.calibrationCurve(df, "id", "s", "y", nBins = 10)
      .collect().map(r => r.getAs[Int]("bin") ->
        (r.getAs[Long]("n"), r.getAs[Double]("mean_score"),
          r.getAs[Double]("frac_pos"))).toMap
    assert(out.keySet == (0 to 9).toSet)
    assert(out.values.forall(_._1 == 10L))
    (0 to 9).foreach { b =>
      assert(out(b)._3 == (if (b < 5) 0.0 else 1.0))
      assert(math.abs(out(b)._2 - (10 * b + 4.5) / 10000) < 1e-9)
    }
    // all rows share one score: a single bin 0 carrying the base rate
    val one = QualityMetrics.calibrationCurve(
      Seq((1L, 0.5, true), (2L, 0.5, false), (3L, 0.5, false), (4L, 0.5, true))
        .toDF("id", "s", "y"), "id", "s", "y", nBins = 10).collect()
    assert(one.length == 1 && one.head.getAs[Int]("bin") == 0 &&
      one.head.getAs[Double]("frac_pos") == 0.5)
  }

  test("clusterQuality: tight well-separated clusters score low ratio; overlap scores high") {
    // two clusters on axis 0 at +/-10 with radius 1, one diffuse cluster
    // straddling both
    val vecs =
      (1 to 8).map(i => (0, Array(10f + (i % 3) - 1, 0f))) ++
        (1 to 8).map(i => (1, Array(-10f - (i % 3) + 1, 0f))) ++
        (1 to 8).map(i => (2, Array((i % 2) * 18f - 9f, 5f)))
    val out = QualityMetrics.clusterQuality(
      vecs.toDF("label", "embedding"), "label", "embedding")
      .collect().map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("n_vectors"), r.getAs[Double]("cohesion"),
          r.getAs[Double]("separation"), r.getAs[Double]("ratio"))).toMap
    assert(out.keySet == Set(0, 1, 2))
    assert(out.values.forall(_._1 == 8L))
    // tight clusters: cohesion ~ 0.5, separation ~ 20 → ratio << 1
    assert(out(0)._4 < 0.1 && out(1)._4 < 0.1)
    // the diffuse cluster's members sit ~9 from its centroid while its
    // centroid is ~10 from the others → ratio near 1, clearly the worst
    assert(out(2)._4 > out(0)._4 * 5 && out(2)._4 > out(1)._4 * 5)
  }

  test("rrf fusion: both-list ids outrank single-list, ties break on id") {
    val lex = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "r")
    val sem = Seq((20L, 1), (40L, 2), (10L, 3)).toDF("id", "r")
    val fused = QualityMetrics.rrfFuse(Seq(lex, sem), "id", "r", 60, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    // 20: 1/62 + 1/61, 10: 1/61 + 1/63, then singles 40 (1/62) before 30 (1/63)
    assert(fused.map(_._1).toSeq == Seq(20L, 10L, 40L, 30L))
    assert(fused.head._3 == 2 && fused.last._3 == 1)
    val expected20 = BigDecimal(1.0 / 62 + 1.0 / 61)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(fused.head._2 == expected20)
    // equal-rank singles tie exactly → id ascending decides
    val tied = QualityMetrics.rrfFuse(
      Seq(Seq((7L, 1)).toDF("id", "r"), Seq((3L, 1)).toDF("id", "r")),
      "id", "r", 60, 10).collect().map(_.getLong(0)).toSeq
    assert(tied == Seq(3L, 7L))
  }

  test("mmrRerank: diversity beats raw relevance ordering") {
    // ids 1,2 nearly identical vectors with top relevance; id 3 slightly
    // less relevant but orthogonal — plain top-3 is (1,2,3); MMR must
    // interleave the orthogonal doc ahead of the near-duplicate
    val cands = Seq(
      (1L, 0.99, Seq(1f, 0f, 0f, 0f)),
      (2L, 0.98, Seq(0.999f, 0.04f, 0f, 0f)),
      (3L, 0.80, Seq(0f, 1f, 0f, 0f)),
      (4L, 0.10, Seq(0f, 0f, 1f, 0f))).toDF("id", "rel", "vec")
    val out = QualityMetrics.mmrRerank(cands, "id", "rel", "vec",
        k = 3, lambda = 0.5)
      .collect().map(r => (r.getAs[Int]("mmr_rank"), r.getAs[Long]("id")))
    // the near-dup's penalty (0.5·sim≈0.5) exceeds its relevance edge, so
    // it drops out of the top-3 entirely — even the weak orthogonal doc 4
    // outranks it
    assert(out.toSeq == Seq((1, 1L), (2, 3L), (3, 4L)),
      s"near-dup of the top hit must sink below the orthogonal docs: ${out.toSeq}")
    // lambda = 1 degenerates to pure relevance order
    val pure = QualityMetrics.mmrRerank(cands, "id", "rel", "vec",
        k = 3, lambda = 1.0)
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(pure == Seq(1L, 2L, 3L))
    // k caps at the candidate count; determinism across runs
    val all = QualityMetrics.mmrRerank(cands, "id", "rel", "vec", k = 99)
    assert(all.count() == 4)
    val rerun = QualityMetrics.mmrRerank(cands, "id", "rel", "vec", k = 99)
    assert(all.collect().toSeq == rerun.collect().toSeq)
  }

  test("momentsProfile: hand-computed moments, degenerate group null") {
    import graft.operators.Curation
    // group g: values 1,2,3,4 -> mean 2.5, popvar 1.25; symmetric -> skew 0
    // group h: constant -> stddev 0, skew/kurtosis null
    val df = Seq(("g", 1), ("g", 2), ("g", 3), ("g", 4),
      ("h", 7), ("h", 7)).toDF("grp", "x")
    val r = Curation.momentsProfile(df, "grp", "x")
      .collect().map(x => x.getString(0) -> x).toMap
    val g = r("g")
    assert(g.getAs[Long]("n") == 4L)
    assert(g.getAs[Double]("mean") == 2.5)
    assert(g.getAs[Double]("stddev") == math.rint(math.sqrt(1.25) * 1e6) / 1e6)
    assert(g.getAs[Double]("skewness") == 0.0)
    // E[(x-m)^4] = (2.25^2 + .25^2)*2/4 = 2.5625; /var^2 - 3 = -1.36
    assert(g.getAs[Double]("excess_kurtosis") == -1.36)
    val h = r("h")
    assert(h.getAs[Double]("stddev") == 0.0)
    assert(h.isNullAt(h.fieldIndex("skewness")))
    assert(h.isNullAt(h.fieldIndex("excess_kurtosis")))
  }
}
