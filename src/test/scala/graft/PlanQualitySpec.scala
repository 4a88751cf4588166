package graft

/** Physical-plan regression gate (SURVEY §4): the plans that make these
  * operators scale are asserted, not assumed — a refactor that silently
  * turns a broadcast into a shuffle, drops a pushdown, or introduces a
  * cartesian product fails here, at sf0.001 cost. */
class PlanQualitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    // other suites may have cached fixture tables (InMemoryTableScan would
    // mask the parquet pushdown evidence); serving plans read the source
    spark.catalog.clearCache()
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString()
  }

  test("exact ANN: pushed filters + TakeOrderedAndProject, no shuffle join") {
    val p = plan("ann_euclidean")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(p.contains("PushedFilters: [IsNotNull(embedding)"), p.take(2000))
  }

  test("filtered ANN: restriction reaches the scan") {
    val p = plan("ann_filtered")
    assert(p.contains("TakeOrderedAndProject"))
    // the label restriction is pushed to the parquet source, not evaluated
    // post-scan only
    assert(p.contains("PushedFilters") && p.contains("label"), p.take(2000))
  }

  test("batched ANN: partial top-k via WindowGroupLimit before the exchange") {
    val p = plan("ann_batch")
    assert(p.contains("WindowGroupLimit"), p.take(2000))
    assert(p.contains("BroadcastExchange"), "query side must broadcast")
  }

  test("join+agg analytics: dimensions broadcast, aggregates partial") {
    for (q <- Seq("q_join_agg", "q3_shipping", "q5_region_revenue")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q: ${p.take(1500)}")
      assert(p.contains("HashAggregate"), s"$q: ${p.take(1500)}")
      assert(!p.contains("CartesianProduct"), q)
    }
  }

  test("semi/anti joins: hash-join shaped, aggregates partial") {
    for ((q, kind) <- Seq("q_semi_join" -> "LeftSemi", "q_anti_join" -> "LeftAnti")) {
      val p = plan(q)
      assert(p.contains(kind), s"$q must plan as $kind:\n${p.take(1500)}")
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), q)
      assert(p.contains("HashAggregate"), q)
    }
  }

  test("dedup candidate generation: equi-join shaped, never a cross product") {
    for (q <- Seq("dedup_minhash", "dedup_jaccard", "dedup_embedding_lsh",
        "knn_join_lsh", "doc_novelty", "source_overlap",
        "dedup_containment")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), q)
      assert(!p.contains("BroadcastNestedLoopJoin"), q)
    }
  }

  test("LWW compaction: aggregate (partial-capable), not a window") {
    val p = plan("lww_state")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p.take(1500))
    assert(!p.contains("Window"), "a window plan would shuffle every event")
  }

  test("adaptive filtered LSH / IVF probe: restriction pushed, top-k shaped, no cross product") {
    for (q <- Seq("ann_lsh_filtered", "ann_ivf")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q: ${p.take(1500)}")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), q)
    }
    // the residual label filter reaches the scan whether the adaptive plan
    // settles on a pruned probe or the exact fallback
    val p = plan("ann_lsh_filtered")
    assert(p.contains("PushedFilters") && p.contains("label"), p.take(2000))
  }

  test("boolean FTS: an n-clause query scans the postings store exactly once") {
    // scoreBoolean pivots the one pruned postings pass into a per-doc
    // term->score map and compiles the boolean structure to an expression —
    // a grouped 3-term query must not plan 3 postings subtrees
    val p = plan("bm25_bool_grouped")
    val postingsScans = "bm25_pos".r.findAllIn(p).length
    assert(postingsScans == 1, s"expected 1 postings scan, saw $postingsScans:\n${p.take(3000)}")
  }

  test("materialized index probes scan narrow columns") {
    // quantized stage 1 must read (vec_id, _q), not the float vectors
    val p = plan("ann_rescored")
    assert(p.contains("_q"), p.take(2000))
  }

  test("pq search: code-only stage-1 scan, broadcast rescore, no cross product") {
    val p = plan("ann_pq")
    // the ADC stage reads the (vec_id, _pq) store — 8 codes, never floats
    assert(p.contains("_pq"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), "candidate set must broadcast onto the base table")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("ivfpq: cell-pruned code scan feeding the broadcast rescore") {
    val p = plan("ann_ivfpq")
    assert(p.contains("_pq"), p.take(2000))
    // the probe prunes the _centroid-partitioned store at the source
    assert(p.contains("_centroid"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("stratified sample: stateless filter, no shuffle, narrow scan") {
    val p = plan("stratified_sample")
    assert(!p.contains("Exchange"), s"sampling must not shuffle:\n${p.take(2000)}")
    // only the id + stratum columns are read, never the text payload
    assert(p.contains("ReadSchema") && !p.contains("text"), p.take(2000))
  }

  test("decontamination: hash-join on shingle hashes, never a cross product") {
    val p = plan("decontamination")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // the corpus shingle store must NOT shuffle before the match-row
    // aggregate: the bench side is declared broadcast (it is small by
    // construction, not by statistics — the optimizer's estimate of the
    // join-derived bench set overshoots the autoBroadcast threshold at
    // scale and would silently fall back to a full-corpus sort-merge
    // join, the one superlinear step the first 10× sweep caught)
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("bloom decontamination: prefilter stays a scan-side filter, no cross product") {
    val p = plan("decontamination_bloom")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // the bloom probe is a Filter over the shingle scan, not a join —
    // Spark's native might_contain over the broadcast sketch literal
    assert(p.contains("might_contain"), "bloom membership must gate the scan side")
  }

  test("semantic dedup: in-cell pairs are an equi-join on the cell id") {
    val p = plan("semantic_dedup")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("per-source cap: WindowGroupLimit partial top-k, narrow scan") {
    val p = plan("source_cap_sample")
    assert(p.contains("WindowGroupLimit"), p.take(2000))
    // only (doc_id, source) are read, never the text payload
    assert(p.contains("ReadSchema") && !p.contains("text"), p.take(2000))
  }

  test("span dedup: equi-join on window hashes, never a cross product") {
    val p = plan("span_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("asof join: window merge — NO join operator, bounded shuffles") {
    val p = plan("asof_join")
    assert(!p.contains("Join"), s"asof must not plan a join:\n${p.take(2000)}")
    // one shuffle for the right-side (key, ts) dedupe aggregate + one for
    // the union+window merge; the operator alone is pinned to exactly one
    // in TemporalSpec
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 2, p.take(2000))
  }

  test("range join: bucketed equi-join, never a theta cross product") {
    val p = plan("range_join")
    assert(p.contains("Join"), "bucket equi-join expected")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("fuzzy join: gram equi-join candidates, never a cross product") {
    // the serving (capped) path materializes behind a localCheckpoint, so
    // inspect the lazy oracle path — identical join skeleton minus the cap
    import org.apache.spark.sql.functions.{col, substring}
    val names = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), substring(col("text"), 1, 24).as("name"))
    val p = graft.operators.Dedup
      .editDistancePairs(names, "doc_id", "name", maxDist = 3, maxGramDf = None)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("exact fuzzy join: segment equi-join candidates, never a cross product") {
    // PassJoin candidate generation must stay an equi-join on the
    // (partner-length, segment-index, segment) composite key — at corpus
    // scale a nested-loop fallback here IS the |A|×|B| cross the
    // partitioning exists to avoid
    val p = plan("fuzzy_join_exact")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("token entropy: both aggregates partial, no join") {
    val p = plan("token_entropy")
    assert(p.contains("partial_sum") || p.contains("partial_count"), p.take(1500))
    assert(!p.contains("Join"), "entropy is two aggregates, never a join")
  }

  test("gopher rules: one stateless projection, no shuffle") {
    val p = plan("gopher_rules")
    assert(!p.contains("Exchange"), s"rule battery must not shuffle:\n${p.take(1500)}")
    assert(!p.contains("Join"), "rule battery must not join")
  }

  test("event analytics: narrow aggregates, no cartesian anywhere") {
    for (q <- Seq("event_funnel", "cohort_retention", "interval_join",
        "event_resample", "moments_profile")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$q:\n${p.take(1500)}")
      assert(p.contains("HashAggregate") || p.contains("Window"), q)
    }
  }

  test("html extract + url gate: stateless projections, no shuffle") {
    for (q <- Seq("html_extract", "url_host_filter")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q must not shuffle:\n${p.take(1500)}")
      assert(!p.contains("Join"), s"$q must not join")
    }
  }

  test("line dedup + gopher repetition: equi-join shaped, partial top-k") {
    for (q <- Seq("line_dedup", "gopher_repetition")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$q:\n${p.take(1500)}")
    }
    // the top-n-gram argmax ships <= 1 row per doc past its exchange
    assert(plan("gopher_repetition").contains("WindowGroupLimit"))
  }

  test("hybrid rrf: fusion over top-k lists only, never a cross product") {
    val p = plan("hybrid_rrf")
    // the BM25 tower's 1-row corpus-stats frame broadcasts as a nested-loop
    // join by design (a scalar, not a pair space) — only a true cartesian
    // over row sets is forbidden here
    assert(!p.contains("CartesianProduct"), p.take(1500))
    // both towers keep their top-k shape before fusion
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    // fusion aggregates partially before its exchange
    assert(p.contains("partial_sum"), p.take(1500))
  }

  test("global rank: never an Exchange SinglePartition") {
    // the naive row_number() OVER (ORDER BY …) formulation collapses the
    // corpus into one task; globalRank exists to keep the rank computation
    // partition-parallel (range shuffle + per-partition window + broadcast
    // offsets)
    val p = plan("curriculum_order")
    assert(!p.contains("Exchange SinglePartition"), p.take(2000))
    assert(p.contains("row_number"), p.take(2000))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p.take(2000))
  }

  test("text model scoring: partial-aggregatable, scalars broadcast, no cartesian") {
    for (q <- Seq("lm_score_bigram", "quality_classifier")) {
      val p = plan(q)
      assert(p.contains("HashAggregate"), q)
      assert(p.contains("BroadcastExchange"), s"$q: model totals must broadcast")
      assert(!p.contains("CartesianProduct"), q)
    }
  }

  test("curriculum stages: rank stays per-partition, count rides the offsets job") {
    val p = plan("curriculum_stages")
    // the row_number window partitions by _pid (globalRank's offsets path)
    assert(p.contains("windowspecdefinition(_pid"), p.take(1500))
    // n comes back with the offsets as a literal — no single-partition
    // exchange anywhere, not even a scalar-count one
    assert(!p.contains("Exchange SinglePartition"), p.take(1500))
  }

  test("quantile filter: thresholds broadcast back, aggregates partial") {
    val p = plan("quality_quantile_filter")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    // per-group percentile aggregates map-side before its narrow exchange
    assert(p.contains("partial_percentile"), p.take(2000))
  }

  test("ngram top-k: TakeOrdered, not a global window over the n-gram universe") {
    val p = plan("ngram_top")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("vocab build: TakeOrdered slice, rank window never sees the term universe") {
    val p = plan("vocab_build")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    // the (term) count aggregate partials map-side before its exchange
    assert(p.contains("partial_count"), p.take(2000))
  }

  test("token encode: vocabulary joins as a broadcast, never a corpus-keyed shuffle side") {
    val p = plan("token_ids")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
  }

  test("mixture sampling: temperature rates broadcast; epoch repeat shuffle-free") {
    val pt = plan("temperature_mix")
    assert(pt.contains("BroadcastHashJoin") && !pt.contains("text"), pt.take(2000))
    val pe = plan("mixture_epochs")
    assert(!pe.contains("Exchange"), s"repeat-by-weight must not shuffle:\n${pe.take(2000)}")
  }

  test("cms heavy hitters: exact top-k is TakeOrdered, sketch probes hash-join, aggregates partial") {
    val p = plan("heavy_hitters")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(p.contains("partial_count") || p.contains("partial_sum"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
  }

  test("dsir weights: model tables broadcast back, text never joins") {
    val p = plan("importance_weights")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      s"per-doc bucket counts must join the tiny λ table broadcast:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // scalar totals (rtot/ttot, 1 row) attach to the ≤numBuckets λ frame as
    // broadcast Cross — allowed; any other nested-loop shape is a regression
    val bnlj = "BroadcastNestedLoopJoin[^\\n]*".r.findAllIn(p).toSeq
    assert(bnlj.forall(_.contains("Cross")),
      s"only the scalar-totals Cross attach may nested-loop:\n${bnlj.mkString("\n")}")
  }

  test("cluster quality: centroids broadcast into the member join, no corpus-side shuffle join") {
    val p = plan("cluster_quality")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("pagerank: equi-joins + partial aggregation per iteration, top-k TakeOrdered") {
    val p = plan("pagerank")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(p.contains("HashAggregate"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the only nested-loop shapes allowed are the broadcast 1-row node-count
    // attaches; every rank↔edge join must be hash-equi
    val bnlj = "BroadcastNestedLoopJoin[^\\n]*".r.findAllIn(p).toSeq
    assert(bnlj.forall(_.contains("Cross")),
      s"rank-edge joins must be equi, only the n-attach may cross:\n${bnlj.mkString("\n")}")
  }

  test("ngram diversity / shard plan: single partial-agg shapes, no payload join") {
    val pd = plan("ngram_diversity")
    assert(pd.contains("HashAggregate") || pd.contains("ObjectHashAggregate"),
      pd.take(2000))
    assert(!pd.contains("Join"), s"diversity is one aggregation:\n${pd.take(2000)}")
    val ps = plan("shard_plan")
    assert(ps.contains("HashAggregate"), ps.take(2000))
    val bnlj = "BroadcastNestedLoopJoin[^\\n]*".r.findAllIn(ps).toSeq
    assert(bnlj.forall(_.contains("Cross")),
      s"only the totals attach may cross:\n${bnlj.mkString("\n")}")
  }

  test("dedup delta probe: candidate joins equi-shaped, never a cross product") {
    val p = plan("dedup_delta")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("label propagation: per-round equi-joins + partial aggregates, never a cross product") {
    val p = plan("label_propagation")
    assert(p.contains("HashAggregate"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the synthetic-link generator's 1-row node-count attach is the only
    // allowed nested-loop shape (the same broadcast Cross pagerank allows);
    // every label↔edge join must be hash-equi
    val bnlj = "BroadcastNestedLoopJoin[^\\n]*".r.findAllIn(p).toSeq
    assert(bnlj.forall(_.contains("Cross")),
      s"label-edge joins must be equi, only the n-attach may cross:\n${bnlj.mkString("\n")}")
  }

  test("hll distinct: register max is a partial-capable aggregate, no join beyond the report attach") {
    val p = plan("hll_distinct")
    // the (group, bucket) max must partially aggregate map-side — that is
    // the HLL merge; without it every raw row shuffles
    assert(p.contains("partial_max") || p.contains("partial"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("readability / rp_project: stateless projections, no shuffle, narrow scans") {
    val pr = plan("readability")
    assert(!pr.contains("Exchange"), s"readability is per-row:\n${pr.take(2000)}")
    val pp = plan("rp_project")
    assert(!pp.contains("Exchange"), s"projection is per-row:\n${pp.take(2000)}")
    assert(pp.contains("ReadSchema") && pp.contains("embedding"), pp.take(2000))
  }

  test("histogram quantiles: windows run over bucket-cardinality rows, no cross product") {
    val p = plan("quantile_histogram")
    assert(p.contains("HashAggregate"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("ivf bulk join: cell equi-join, partial top-k window, no cross product") {
    for (q <- Seq("knn_join_ivf", "knn_join_ivf_sqrt")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$q: ${p.take(1500)}")
      assert(p.contains("WindowGroupLimit"),
        s"$q must push partial top-k before the exchange: ${p.take(1500)}")
    }
  }

  test("best-member cluster resolution: narrow score join, partial argmax aggregate") {
    val p = plan("dedup_clusters_best")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("max_by") || p.contains("HashAggregate"), p.take(1500))
  }

  test("scale-safety gate: no fixed-nbits DEFAULT parameter anywhere in main") {
    // VERDICT r9 #1: a fixed LSH plane count makes every bucket join
    // quadratic in corpus size (measured 54-175x per 10x decade,
    // BENCH_sf10), so the library's contract is: auto-tuned entry points
    // are the defaults, and every API that takes nbits takes it as a
    // REQUIRED parameter (it is either index metadata or a deliberate
    // deterministic-replay pin). This gate fails the build if a default
    // creeps back in.
    import scala.jdk.CollectionConverters._
    val offenders = java.nio.file.Files.walk(java.nio.file.Paths.get("src/main"))
      .iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { f =>
        java.nio.file.Files.readAllLines(f).asScala.zipWithIndex.collect {
          case (line, i) if line.matches(""".*\bnbits:\s*Int\s*=\s*\d+.*""") =>
            s"$f:${i + 1}: $line"
        }
      }.toList
    assert(offenders.isEmpty,
      s"fixed-nbits defaults reintroduced:\n${offenders.mkString("\n")}")
  }

  test("scale-safety gate: Engine-served LSH uses the store's own plane count") {
    // The serving config's nbits is index METADATA (the planes the store's
    // _bucket column was hashed with). ApproxServing must carry it through
    // to the probe: a 6-bit store probed at radius 0 must prune to exactly
    // the query's own 6-bit bucket — provable from the probe set size.
    import graft.operators.ApproxAnn
    val probes0 = ApproxAnn.probeBuckets(Seq(1f, 2f, 3f, 4f), nbits = 6, radius = 0)
    assert(probes0.size == 1 && probes0.head < (1L << 6))
    val probes1 = ApproxAnn.probeBuckets(Seq(1f, 2f, 3f, 4f), nbits = 6, radius = 1)
    assert(probes1.size == 7, "radius-1 ball over 6 bits = 1 + 6 buckets")
  }
}
