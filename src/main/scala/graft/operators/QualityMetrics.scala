package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Search-quality metrics the reference's harnesses measure
  * (BASELINE.md: recall@k for the CQL path — benchmark/src/main.rs:608-634;
  * recall@k, precision@k, MRR, nDCG@k for the FTS latte workload —
  * latte/full-text-search/README.md).
  *
  * Input shape: per query, the retrieved ids in rank order and the relevant
  * (ground-truth) ids in ideal order — both as array columns, computed
  * upstream (e.g. approximate results vs the exact plan's results).
  * Everything is per-row array arithmetic: no shuffle beyond what built the
  * arrays; evaluating a million queries is embarrassingly parallel.
  */
object QualityMetrics {

  /** |retrieved[0..k) ∩ relevant| / |relevant| */
  def recallAtK(retrieved: Column, relevant: Column, k: Int): Column =
    size(array_intersect(slice(retrieved, 1, k), relevant)).cast("double") /
      greatest(size(relevant), lit(1))

  /** |retrieved[0..k) ∩ relevant| / k */
  def precisionAtK(retrieved: Column, relevant: Column, k: Int): Column =
    size(array_intersect(slice(retrieved, 1, k), relevant)).cast("double") / k

  /** 1 / rank of the first relevant hit (0 when none). */
  def reciprocalRank(retrieved: Column, relevant: Column): Column = {
    val firstHit = array_position(
      transform(retrieved, r => array_contains(relevant, r)), true)
    when(firstHit > 0, lit(1.0) / firstHit).otherwise(lit(0.0))
  }

  /** Binary-relevance nDCG@k: DCG with gain 1/log2(rank+1) over the first k
    * retrieved, normalized by the ideal DCG for |relevant| items. */
  def ndcgAtK(retrieved: Column, relevant: Column, k: Int): Column = {
    def dcgOf(flags: Column): Column =
      aggregate(
        zip_with(flags, sequence(lit(1), size(flags)),
          (hit, rank) => when(hit, lit(1.0) / log2(rank.cast("double") + 1.0))
            .otherwise(lit(0.0))),
        lit(0.0), _ + _)
    val gains = transform(slice(retrieved, 1, k), r => array_contains(relevant, r))
    val idealSize = least(size(relevant), lit(k))
    val idealGains = transform(sequence(lit(1), greatest(idealSize, lit(1))),
      _ => idealSize > 0) // idealSize ones (or a single false when empty)
    val ideal = dcgOf(idealGains)
    when(ideal > 0, dcgOf(gains) / ideal).otherwise(lit(0.0))
  }

  /** Attach all metrics; `retrievedCol`/`relevantCol` are array columns. */
  def evaluate(df: DataFrame, retrievedCol: String, relevantCol: String, k: Int): DataFrame =
    df.withColumn(s"recall_at_$k", recallAtK(col(retrievedCol), col(relevantCol), k))
      .withColumn(s"precision_at_$k", precisionAtK(col(retrievedCol), col(relevantCol), k))
      .withColumn("mrr", reciprocalRank(col(retrievedCol), col(relevantCol)))
      .withColumn(s"ndcg_at_$k", ndcgAtK(col(retrievedCol), col(relevantCol), k))

  /** Convenience: mean metrics over a whole query set. */
  def summary(evaluated: DataFrame, k: Int): DataFrame =
    evaluated.agg(
      avg(col(s"recall_at_$k")).as(s"recall_at_$k"),
      avg(col(s"precision_at_$k")).as(s"precision_at_$k"),
      avg(col("mrr")).as("mrr"),
      avg(col(s"ndcg_at_$k")).as(s"ndcg_at_$k"))

  /** Global ROC-AUC of a score column against a boolean label — the
    * rank-sum (Mann–Whitney U) formulation with average ranks over ties:
    * AUC = (Σ_pos avg_rank − n₊(n₊+1)/2) / (n₊·n₋). The standard one-number
    * eval for a quality classifier gating a corpus.
    *
    * Scale shape: ranking uses [[Curation.globalRank]] (range exchange +
    * per-partition row_number + broadcast offsets — never an Exchange
    * SinglePartition over the corpus); the tie-average is (min+max)/2 of
    * the positional ranks per distinct score (exact halves in doubles, so
    * the rank-sum is order-independent and cross-engine exact); the final
    * AUC is one scalar aggregate. */
  def rocAuc(
      scored: DataFrame, idCol: String, scoreCol: String,
      labelCol: String): DataFrame = {
    val ranked = Curation.globalRank(
      scored.select(col(idCol), col(scoreCol),
        col(labelCol).cast("boolean").as("_y")),
      idCol, Seq(scoreCol))
    // one shuffle by score; Σ_pos avg_rank folds to Σ_s n_pos(s)·ar(s), so
    // the corpus never joins back to the per-score frame (exact: ar is a
    // half-integer and the products stay < 2^53)
    val perScore = ranked.groupBy(col(scoreCol))
      .agg(((min(col("rank")) + max(col("rank"))).cast("double") / 2).as("_ar"),
        sum(when(col("_y"), 1L).otherwise(0L)).as("_np"),
        count(lit(1)).as("_n"))
    perScore
      .agg(
        sum(col("_np")).as("n_pos"),
        sum(col("_n") - col("_np")).as("n_neg"),
        sum(col("_np") * col("_ar")).as("_sp"))
      .select(col("n_pos"), col("n_neg"),
        (round((col("_sp") - col("n_pos").cast("double") * (col("n_pos") + 1) / 2) /
          (col("n_pos").cast("double") * col("n_neg")), 6) + lit(0.0)).as("auc"))
  }

  /** Reliability (calibration) curve of a score column against a boolean
    * label: equal-width bins over the observed score range; per bin the
    * member count, mean score, and positive rate — the "is the classifier's
    * confidence honest" eval next to [[rocAuc]] (a well-calibrated gate has
    * frac_pos monotone in mean_score).
    *
    * Cross-engine exactness: scores are 4-decimal-rounded upstream, so
    * binning runs in ×10⁴ scaled-integer space — bin width ceil(range/bins)
    * and the bin index are integer arithmetic (floor division via the
    * pmod/decimal identity, never double division); bin means divide an
    * explicit long sum, never avg(). Scale shape: one scalar min/max
    * aggregate broadcast back (1-row Cross attach), then one shuffle by
    * bin id. */
  def calibrationCurve(
      scored: DataFrame, idCol: String, scoreCol: String,
      labelCol: String, nBins: Int = 10,
      policy: CheckpointPolicy = CheckpointPolicy.Local): DataFrame = {
    require(nBins > 0, "nBins must be positive")
    def fdiv(x: Column, w: Column): Column =
      ((x - pmod(x, w)).cast("decimal(38,0)") / w).cast("long")
    // base feeds BOTH the min/max scalar and the binning aggregate; the
    // checkpoint stops the caller's scoring pipeline (for the NB
    // classifier: tokenize → explode → model joins) from executing twice
    // — the materialized frame is two longs per row (r12, guide §2.4).
    // Policy-routed (r13, VERDICT r12 #4): Local keeps the eager
    // localCheckpoint; Reliable persists with the recompute path intact.
    val base = policy.midRound(scored.select(
      round(col(scoreCol) * 10000).cast("long").as("_si"),
      col(labelCol).cast("boolean").as("_y")))
    val mm = base.agg(min(col("_si")).as("_mn"), max(col("_si")).as("_mx"))
    base.crossJoin(broadcast(mm))
      .withColumn("_w",
        fdiv(col("_mx") - col("_mn") + lit(nBins.toLong), lit(nBins.toLong)))
      .groupBy(fdiv(col("_si") - col("_mn"), col("_w")).cast("int").as("bin"))
      .agg(count(lit(1)).as("n"),
        (round(sum(col("_si")).cast("double") / count(lit(1)) / 10000, 6) +
          lit(0.0)).as("mean_score"),
        (round(sum(when(col("_y"), 1L).otherwise(0L)).cast("double") /
          count(lit(1)), 6) + lit(0.0)).as("frac_pos"))
  }

  /** Per-cluster quality report over a labeled embedding column: cohesion
    * (mean member→centroid L2), separation (nearest other centroid), and
    * their Davies–Bouldin-style ratio. The "are these clusters real" eval
    * after any labeling/clustering pass.
    *
    * Scale shape: centroids are the per-(label,dim) average
    * ([[ApproxAnn.labelCentroids]] — rounded to 6 decimals so downstream
    * arithmetic is cross-engine exact); member distances are one broadcast
    * join + per-row array math (zip_with folds in array order); the
    * centroid-pair matrix is labels², tiny by construction. */
  def clusterQuality(
      df: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    def d2(a: Column, b: Column): Column =
      aggregate(zip_with(a, b,
        (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
        lit(0.0), _ + _)
    val cents = ApproxAnn.labelCentroids(df, labelCol, vecCol)
    val coh = df.filter(col(vecCol).isNotNull)
      .join(broadcast(cents), labelCol)
      .groupBy(col(labelCol))
      .agg(max(col("n_vectors")).as("n_vectors"),
        (round(avg(sqrt(d2(col(vecCol), col("centroid")))), 4) + lit(0.0))
          .as("cohesion"))
    val a = cents.select(col(labelCol).as("_la"), col("centroid").as("_ca"))
    val b = cents.select(col(labelCol).as("_lb"), col("centroid").as("_cb"))
    val sep = a.join(broadcast(b), col("_la") =!= col("_lb"))
      .groupBy(col("_la").as(labelCol))
      .agg((round(min(sqrt(d2(col("_ca"), col("_cb")))), 6) + lit(0.0))
        .as("separation"))
    coh.join(sep, labelCol)
      .select(col(labelCol), col("n_vectors"), col("cohesion"), col("separation"),
        (round(col("cohesion") / col("separation"), 4) + lit(0.0)).as("ratio"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009): combine ranked result
    * lists from heterogeneous retrievers (BM25 lexical + ANN semantic is
    * the canonical hybrid-search pair) by summing 1/(k + rank) per id —
    * score-scale-free, so a raw BM25 score never has to be calibrated
    * against a distance.
    *
    * Each input must carry the id and a 1-based `rankCol`; inputs are
    * already top-k lists (k rows each), so the union/aggregate work is
    * k·lists rows regardless of corpus size — fusion cost is the RESULT
    * size. Ties break on the id for a deterministic final order. */
  def rrfFuse(
      lists: Seq[DataFrame], idCol: String, rankCol: String,
      kConst: Int = 60, topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    lists.map(df => df.select(col(idCol),
        (lit(1.0) / (lit(kConst.toDouble) + col(rankCol).cast("double")))
          .as("_rrf_c")))
      .reduce(_.unionByName(_))
      .groupBy(col(idCol))
      .agg(round(sum(col("_rrf_c")), 6).as("rrf_score"),
        count(lit(1)).cast("int").as("n_lists"))
      .orderBy(col("rrf_score").desc, col(idCol).asc)
      .limit(topK)
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998) —
    * diversified top-k: greedily pick the candidate maximizing
    * `λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)`, so near-duplicate
    * hits (the retrieval-time face of corpus duplication) can't crowd
    * the result list. The standard second stage over an ANN candidate
    * set.
    *
    * Inputs: `candidates` = (id, relevance, vector) — an already-bounded
    * top-N list (k·oversample rows, the same contract as the rescoring
    * stages), with relevance HIGHER-better. The greedy loop is
    * inherently sequential and the candidate set is result-sized, so it
    * runs on the driver over the collected candidates — identical
    * economics to the broadcast candidate sets of `ann_rescored` (never
    * do this over a corpus; the candidate GENERATOR is the distributed
    * stage). Similarity = cosine, computed in double in array order;
    * scores rounded to 6 with id tiebreaks so the selection order is
    * exactly replayable cross-engine. Returns (mmr_rank, id, relevance,
    * mmr_score). */
  def mmrRerank(
      candidates: DataFrame, idCol: String, relCol: String, vecCol: String,
      k: Int, lambda: Double = 0.7): DataFrame = {
    require(k >= 1 && lambda >= 0 && lambda <= 1)
    val spark = candidates.sparkSession
    val rows = candidates.select(col(idCol), col(relCol), col(vecCol))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
      .sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot, na, nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      // sqrt(na) * sqrt(nb), NOT sqrt(na * nb): the replayed SQL computes
      // the norms separately and the two forms differ by an ulp
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val vecs = rows.map(r => r._1 -> r._3).toMap
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double, Double)]
    val remaining = scala.collection.mutable.LinkedHashMap(rows.map(r => r._1 -> r): _*)
    for (rank <- 1 to math.min(k, rows.length)) {
      val best = remaining.values.map { case (id, rel, v) =>
        val maxSim =
          if (selected.isEmpty) 0.0
          else selected.map(s => cos(v, vecs(s._2))).max
        // HALF_UP like Spark's round()/DuckDB's round(), NOT rint's
        // HALF_EVEN — the argmax boundary must replay identically
        val score = BigDecimal(lambda * rel - (1 - lambda) * maxSim)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, rel, score)
      }.toSeq.minBy { case (id, _, score) => (-score, id) }
      selected += ((rank, best._1, best._2, best._3))
      remaining.remove(best._1)
    }
    import spark.implicits._
    selected.toSeq.toDF("mmr_rank", idCol, relCol, "mmr_score")
  }
}
