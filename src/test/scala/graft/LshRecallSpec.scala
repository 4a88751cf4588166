package graft

import graft.functions.VectorFunctions.Euclidean
import graft.operators.{Ann, ApproxAnn, Restriction}
import graft.operators.Ann.AnnRequest
import org.apache.spark.sql.functions._

/** Filtered-ANN recall across selectivity buckets — the reference's benchmark
  * methodology (`crates/benchmark/src/main.rs:45-49,188-190` builds filter
  * buckets at [50,20,10,5,2,1,0.5,0.2]% selectivity and measures recall@k in
  * each) ported to [[ApproxAnn.searchLshAdaptive]].
  *
  * The hazard being pinned: a fixed-radius LSH probe applies the residual
  * predicate INSIDE the pruned buckets, so at tight selectivity a probe can
  * return far fewer than k matching rows where the exact path returns k —
  * and even with enough candidates the true top-k can live outside the
  * probed neighborhood. The adaptive search compensates the way the
  * reference's in-traversal filtering does (`vs_index/usearch.rs:224-248`):
  * it only serves from a pruned probe when the probe provably covers
  * `minCoverage` (default 0.9) of the matching rows, else it falls back to
  * the exact scan. Recall@k >= 0.9 in EVERY selectivity bucket follows by
  * construction; this spec pins it empirically.
  */
class LshRecallSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(sf("embeddings")).cache()
  private lazy val qv: Seq[Float] =
    emb.filter(col("vec_id") === 0).select("embedding").head.getSeq[Float](0)
  private lazy val idx =
    ApproxAnn.buildLshIndex(emb, "embedding", nbits = 8, dims = qv.length).cache()

  /** Selectivity buckets as vec_id range restrictions over the 500-row
    * fixture: 50% … 0.2% (0.1% of 500 rounds below one row). */
  private val buckets: Seq[(Double, Restriction)] = Seq(
    50.0 -> Restriction.Lt("vec_id", 250L),
    20.0 -> Restriction.Lt("vec_id", 100L),
    10.0 -> Restriction.Lt("vec_id", 50L),
    5.0 -> Restriction.Lt("vec_id", 25L),
    2.0 -> Restriction.Lt("vec_id", 10L),
    1.0 -> Restriction.Lt("vec_id", 5L),
    0.4 -> Restriction.Lt("vec_id", 2L),
    0.2 -> Restriction.Lt("vec_id", 1L))

  private def req(r: Restriction): AnnRequest =
    AnnRequest(qv, limit = 10, restrictions = Seq(r), allowFiltering = true)

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("vec_id").as[Long].collect().toSeq

  test("adaptive filtered search holds recall@10 >= 0.9 in every selectivity bucket") {
    val rows = buckets.map { case (pct, r) =>
      val exact = ids(Ann.plan(emb, "embedding", Seq("vec_id"), Euclidean, req(r)))
      val approx = ids(ApproxAnn.searchLshAdaptive(idx, emb, "embedding",
        Seq("vec_id"), Euclidean, req(r), nbits = 8)).toSet
      val recall =
        if (exact.isEmpty) 1.0 else exact.count(approx.contains).toDouble / exact.size
      (pct, exact.size, recall)
    }
    info(f"${"sel%"}%8s ${"k_exact"}%8s ${"recall@10"}%10s")
    rows.foreach { case (pct, n, rec) => info(f"$pct%8.1f $n%8d $rec%10.2f") }
    rows.foreach { case (pct, _, rec) =>
      assert(rec >= 0.9, f"recall@10 $rec%.2f below 0.9 in $pct%.1f%% bucket")
    }
  }

  test("fixed-radius probe UNDER-returns in tight buckets; adaptive matches exact") {
    // the failure mode the adaptive path exists for: at ~1% selectivity the
    // radius-1 probe holds fewer matching rows than the exact top-k
    val tight = Restriction.Lt("vec_id", 5L)
    val exact = ids(Ann.plan(emb, "embedding", Seq("vec_id"), Euclidean, req(tight)))
    val fixed = ids(ApproxAnn.searchLsh(
      idx.filter(col("vec_id") < 5), "embedding", Seq("vec_id"), Euclidean,
      AnnRequest(qv, limit = 10), nbits = 8, radius = 1))
    assert(fixed.size < exact.size,
      s"expected the fixed radius-1 probe to under-return (got ${fixed.size} vs ${exact.size})")
    val adaptive = ids(ApproxAnn.searchLshAdaptive(idx, emb, "embedding",
      Seq("vec_id"), Euclidean, req(tight), nbits = 8))
    assert(adaptive == exact) // exact fallback: identical rows, identical order
  }

  test("near-orthogonal vectors: no radius certifies 0.9 coverage => exact fallback") {
    // the fixture's embeddings are random => sign-LSH carries no signal; the
    // honest adaptive outcome is the exact scan, never a low-recall probe
    assert(ApproxAnn.chooseLshRadius(idx, "embedding",
      req(Restriction.Lt("vec_id", 250L)), nbits = 8).isEmpty)
    assert(ApproxAnn.chooseLshRadius(idx, "embedding",
      AnnRequest(qv, limit = 10), nbits = 8).isEmpty)
  }

  test("clustered vectors with a correlated filter: pruned probe, recall >= 0.9") {
    // the production regime: matching rows of a correlated predicate sit in
    // few buckets => a small radius certifies coverage and the ranking scan
    // stays pruned (here label == cluster, e.g. a tenant/shard/language tag)
    val dims = 16
    val clustered = (0 until 500).map { i =>
      val c = i % 10
      val center = Array.tabulate(dims)(d => math.sin(c * 37.0 + d * 3.1) * 5.0)
      val v = center.zipWithIndex.map { case (x, d) =>
        (x + math.sin(i * 13.7 + d) * 0.05).toFloat }.toSeq
      (i.toLong, c, v)
    }.toDF("vec_id", "label", "embedding")
    val cqv = clustered.filter(col("vec_id") === 0).select("embedding")
      .head.getSeq[Float](0)
    val cidx = ApproxAnn.buildLshIndex(clustered, "embedding", nbits = 8, dims = dims)
    val creq = AnnRequest(cqv, limit = 10,
      restrictions = Seq(Restriction.Eq("label", 0)), allowFiltering = true)
    val chosen = ApproxAnn.chooseLshRadius(cidx, "embedding", creq, nbits = 8)
    assert(chosen.nonEmpty, "expected a pruned probe radius on clustered data")
    val exact = ids(Ann.plan(clustered, "embedding", Seq("vec_id"), Euclidean, creq))
    val approx = ids(ApproxAnn.searchLshAdaptive(cidx, clustered, "embedding",
      Seq("vec_id"), Euclidean, creq, nbits = 8)).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
    // and the probe really prunes: it scans fewer rows than the table holds
    val probes = ApproxAnn.probeBuckets(cqv, 8, chosen.get)
    assert(cidx.filter(col("_bucket").isin(probes: _*)).count() < clustered.count())
  }

  test("adaptive IVF mirrors the policy: clustered filter => pruned probes; selective => exact") {
    import org.apache.spark.sql.functions.col
    val dims = 16
    val clustered = (0 until 500).map { i =>
      val c = i % 10
      val center = Array.tabulate(dims)(d => math.sin(c * 37.0 + d * 3.1) * 5.0)
      val v = center.zipWithIndex.map { case (x, d) =>
        (x + math.sin(i * 13.7 + d) * 0.05).toFloat }.toSeq
      (i.toLong, c, v)
    }.toDF("vec_id", "label", "embedding")
    val (assigned, centroids) = ApproxAnn.buildIvfIndex(clustered, "embedding", k = 10)
    val cqv = clustered.filter(col("vec_id") === 0).select("embedding")
      .head.getSeq[Float](0)
    // correlated filter (one cluster): a small nprobe certifies coverage
    val creq = AnnRequest(cqv, limit = 10,
      restrictions = Seq(Restriction.Eq("label", 0)), allowFiltering = true)
    val chosen = ApproxAnn.chooseIvfProbes(assigned, "embedding", creq, centroids,
      nprobes = Seq(1, 2, 4, 8))
    assert(chosen.nonEmpty && chosen.get < 10,
      s"expected a pruned probe count on clustered data, got $chosen")
    val exact = ids(Ann.plan(clustered, "embedding", Seq("vec_id"), Euclidean, creq))
    val approx = ids(ApproxAnn.searchIvfAdaptive(assigned, clustered, "embedding",
      Seq("vec_id"), Euclidean, creq, centroids)).toSet
    assert(exact.count(approx.contains).toDouble / exact.size >= 0.9)
    // tight filter: too few matches anywhere => exact fallback, identical rows
    val tight = AnnRequest(cqv, limit = 10,
      restrictions = Seq(Restriction.Lt("vec_id", 5L)), allowFiltering = true)
    assert(ApproxAnn.chooseIvfProbes(assigned, "embedding", tight, centroids,
      nprobes = Seq(1, 2, 4, 8)).isEmpty)
    assert(ids(ApproxAnn.searchIvfAdaptive(assigned, clustered, "embedding",
      Seq("vec_id"), Euclidean, tight, centroids)) ==
      ids(Ann.plan(clustered, "embedding", Seq("vec_id"), Euclidean, tight)))
  }
}
