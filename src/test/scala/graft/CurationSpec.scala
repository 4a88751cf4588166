package graft

import graft.operators.{Curation, Dedup}
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def pairsDf(ps: (Long, Long)*) = ps.toDF("id_a", "id_b")
  private def nodesDf(ns: Long*) = ns.toDF("doc_id")

  test("connected components: chain, clique, singletons") {
    // chain 1-2-3-4 (diameter 3), clique 10-11-12, singletons 20, 21
    val pairs = pairsDf((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (11L, 12L))
    val nodes = nodesDf(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L, 21L)
    val cc = Curation.connectedComponents(pairs, nodes, "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 21L))
  }

  test("connected components: min label wins regardless of edge direction") {
    // edges written high-to-low; component label is still the minimum id
    val cc = Curation.connectedComponents(
      pairsDf((9L, 3L), (3L, 7L)), nodesDf(3L, 7L, 9L), "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(3L -> 3L, 7L -> 3L, 9L -> 3L))
  }

  test("connected components matches brute-force union-find on a random graph") {
    // deterministic pseudo-random graph: 60 nodes, 45 hash-derived edges
    val n = 60
    val edges = (0 until 45).map { i =>
      val a = math.abs(s"edge-a-$i".hashCode) % n
      val b = math.abs(s"edge-b-$i".hashCode) % n
      (a.toLong, b.toLong)
    }.filter { case (a, b) => a != b }
    // union-find oracle
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = (0 until n).map { i =>
      // component label = min member id
      val root = find(i)
      val minMember = (0 until n).filter(j => find(j) == root).min
      (i.toLong, minMember.toLong)
    }.toMap
    val cc = Curation.connectedComponents(
      edges.toDF("id_a", "id_b"), (0 until n).map(_.toLong).toDF("doc_id"),
      "doc_id").as[(Long, Long)].collect().toMap
    assert(cc == expected)
  }

  test("connected components: edge-only ids connect but don't fake convergence") {
    // regression: phantom ids entering the label frame mid-iteration once
    // inflated the fixpoint sum enough to exactly mask a real decrease —
    // nodes {1,2,3} with pairs {(1,2),(2,3),(1,4),(1,5)} declared
    // convergence after one round with 3 still in its own component
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 4L), (1L, 5L)).toDF("id_a", "id_b")
    val r = Curation.connectedComponents(pairs, nodes, "id")
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), r) // one component, no phantoms
    // a path THROUGH an edge-only id still merges components
    val r2 = Curation.connectedComponents(
        Seq((10L, 99L), (99L, 20L)).toDF("id_a", "id_b"),
        Seq(10L, 20L).toDF("id"), "id")
      .as[(Long, Long)].collect().toMap
    assert(r2 == Map(10L -> 10L, 20L -> 10L), r2)
    // dedupClusters keeps exactly one REAL doc per cluster even when the
    // component minimum is an edge-only connector id
    val dk = Curation.dedupClusters(
        Seq((10L, 5L)).toDF("id_a", "id_b"),
        Seq(10L, 20L).toDF("id"), "id")
      .select("id", "keep").as[(Long, Boolean)].collect().toMap
    assert(dk == Map(10L -> true, 20L -> true), dk)
  }

  test("connected components: maxIter too small fails loudly") {
    // a 6-node chain needs ~5 rounds; cap at 1 must throw, not silently
    // return half-merged components
    val pairs = pairsDf((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    intercept[IllegalArgumentException] {
      Curation.connectedComponents(pairs, nodesDf(1L, 2L, 3L, 4L, 5L, 6L),
        "doc_id", maxIter = 1)
    }
  }

  test("dedupClusters marks exactly one keeper per cluster") {
    val out = Curation.dedupClusters(
      pairsDf((5L, 6L), (6L, 7L)), nodesDf(4L, 5L, 6L, 7L), "doc_id")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(out == Set((4L, 4L, true), (5L, 5L, true), (6L, 5L, false), (7L, 5L, false)))
  }

  test("dedupClustersBest keeps the argmax-by-(score desc, id asc) member") {
    // cluster {5,6,7}: doc 6 has the top score → keeper despite not being
    // min-id; cluster {8,9}: equal scores → LOWER id 8 wins the tiebreak;
    // singleton 4 keeps itself
    val docs = Seq((4L, 10.0), (5L, 1.0), (6L, 9.0), (7L, 3.0),
      (8L, 2.0), (9L, 2.0)).toDF("doc_id", "quality")
    val out = Curation.dedupClustersBest(
      pairsDf((5L, 6L), (6L, 7L), (8L, 9L)), docs, "doc_id", "quality")
      .select("doc_id", "component_id", "keep")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(out == Set(
      (4L, 4L, true),
      (5L, 5L, false), (6L, 5L, true), (7L, 5L, false),
      (8L, 8L, true), (9L, 8L, false)))
    // exactly one keeper per component, always
    val keepers = out.groupBy(_._2).view.mapValues(_.count(_._3)).toMap
    assert(keepers.values.forall(_ == 1))
  }

  test("stratified sample: deterministic, per-stratum rates, unlisted default") {
    val docs = (0L until 2000L).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "xx"))
      .toDF("doc_id", "lang")
    val fr = Map("en" -> 0.25, "de" -> 1.0)
    val s1 = Curation.stratifiedSample(docs, "doc_id", "lang", fr, defaultFraction = 0.0)
    val s2 = Curation.stratifiedSample(docs, "doc_id", "lang", fr, defaultFraction = 0.0)
    // deterministic: identical survivors on re-run
    assert(s1.select("doc_id").as[Long].collect().sorted.toSeq ==
      s2.select("doc_id").as[Long].collect().sorted.toSeq)
    val byLang = s1.groupBy("lang").count().as[(String, Long)].collect().toMap
    // de kept fully, xx dropped fully, en ≈ 25% (hash-uniform; wide tolerance)
    assert(byLang("de") == 667)
    assert(!byLang.contains("xx"))
    assert(byLang("en") > 100 && byLang("en") < 233, byLang("en"))
    // the u column is the rounded sampling coin, in [0, 1)
    val us = s1.select("u").as[Double].collect()
    assert(us.forall(u => u >= 0.0 && u < 1.0))
  }

  test("dataset split: total partition, deterministic, fraction-proportional") {
    val docs = (0L until 2000L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val splits = Seq("train" -> 0.9, "validation" -> 0.05, "test" -> 0.05)
    val s1 = Curation.datasetSplit(docs, "doc_id", splits)
    // TOTAL partition: every row assigned exactly once, no row lost
    assert(s1.count() == 2000)
    val byName = s1.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byName.keySet == Set("train", "validation", "test"), byName)
    // hash-uniform coin: proportions near fractions (wide tolerance)
    assert(byName("train") > 1700 && byName("train") < 1900, byName)
    assert(byName("validation") > 50 && byName("validation") < 150, byName)
    // deterministic and incremental-safe: the assignment of a doc depends
    // only on its id — a subset corpus assigns identically
    val sub = Curation.datasetSplit(docs.filter($"doc_id" < 500), "doc_id", splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val full = s1.select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(sub.forall { case (id, sp) => full(id) == sp })
    // degenerate single split takes everything
    val one = Curation.datasetSplit(docs, "doc_id", Seq("all" -> 1.0))
    assert(one.filter($"split" === "all").count() == 2000)
    // malformed fractions rejected
    intercept[IllegalArgumentException] {
      Curation.datasetSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.6))
    }
  }

  test("global rank == single-window rank; duplicate keys, re-run stable") {
    import org.apache.spark.sql.expressions.Window
    // heavy duplication across the order key: every range-partition
    // boundary falls inside a tie run, the regime where a broken
    // pid→offset alignment or a non-total order would corrupt ranks
    val docs = (0L until 5000L).map(i => (i, (i % 7).toInt)).toDF("id", "score")
    val got = Curation.globalRank(docs, "id", Seq("score"))
      .select("id", "rank").as[(Long, Long)].collect().toMap
    val want = docs.withColumn("rank",
        row_number().over(Window.orderBy($"score", $"id")).cast("long"))
      .select("id", "rank").as[(Long, Long)].collect().toMap
    assert(got == want)
    // deterministic across invocations (fresh range sample + checkpoint)
    val again = Curation.globalRank(docs, "id", Seq("score"))
      .select("id", "rank").as[(Long, Long)].collect().toMap
    assert(again == want)
    // empty input: empty output, same schema, no crash
    val empty = Curation.globalRank(docs.filter($"id" < 0), "id", Seq("score"))
    assert(empty.count() == 0 && empty.columns.toSeq == Seq("id", "score", "rank"))
  }

  test("splitAssign column equals datasetSplit's assignment (stateless membership)") {
    import org.apache.spark.sql.functions.col
    val splits = Seq("train" -> 0.8, "test" -> 0.2)
    val ids = (0L until 500L).toDF("id")
    val viaTable = Curation.datasetSplit(ids, "id", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    val viaColumn = ids.select(col("id"),
        Curation.splitAssign(col("id"), splits).as("split"))
      .as[(Long, String)].collect().toMap
    assert(viaColumn == viaTable)
    assert(viaColumn.values.toSet == Set("train", "test"))
  }

  test("winsorize: per-group clip at exact interpolated percentiles") {
    // 21 values 0..20 per group: p5 lands exactly on rank 1 (0.05·20),
    // p95 on rank 19 — no interpolation ambiguity
    val df = (for (g <- Seq("a", "b"); v <- 0 to 20)
      yield (g, v.toLong * (if (g == "a") 1 else 10))).toDF("src", "v")
    val got = Curation.winsorize(df, "src", "v", 0.05, 0.95)
      .select("src", "v", "clipped", "p_lo", "p_hi")
      .as[(String, Long, Double, Double, Double)].collect()
    val a = got.filter(_._1 == "a")
    assert(a.forall(r => r._4 == 1.0 && r._5 == 19.0))
    assert(a.find(_._2 == 0L).get._3 == 1.0)   // below band → clipped up
    assert(a.find(_._2 == 20L).get._3 == 19.0) // above band → clipped down
    assert(a.filter(r => r._2 >= 1 && r._2 <= 19)
      .forall(r => r._3 == r._2.toDouble))     // in band → unchanged
    // group b scales ×10 — thresholds are per-group, not global
    val b = got.filter(_._1 == "b")
    assert(b.forall(r => r._4 == 10.0 && r._5 == 190.0))
  }

  test("curriculum bins: exact floor formula, near-equal stages, monotone in rank") {
    // 5003 rows / 10 bins: n NOT divisible by bins — remainder handling
    // must still produce stage sizes differing by at most 1
    val docs = (0L until 5003L).map(i => (i, (i % 11).toInt)).toDF("id", "score")
    val got = Curation.curriculumBins(docs, "id", Seq("score"), bins = 10)
      .select("id", "rank", "stage").as[(Long, Long, Int)].collect()
    assert(got.length == 5003)
    got.foreach { case (_, r, s) =>
      assert(s == ((r - 1) * 10 / 5003).toInt, s"rank $r stage $s")
    }
    val sizes = got.groupBy(_._3).view.mapValues(_.length).toMap
    assert(sizes.keySet == (0 until 10).toSet)
    assert(sizes.values.max - sizes.values.min <= 1, sizes)
    // divisible case: exactly equal stages
    val even = Curation.curriculumBins(docs.limit(5000), "id", Seq("score"), 10)
      .groupBy("stage").count().as[(Int, Long)].collect().toMap
    assert(even.values.forall(_ == 500), even)
  }

  test("per-key cap: at most cap rows per key, deterministic hash-order survivors") {
    val docs = (0L until 300L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val capped = Curation.perKeyCap(docs, "doc_id", "source", cap = 7)
    val byKey = capped.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(byKey.values.forall(_ == 7), byKey)
    // survivors are a function of the hash coin, not scan order: identical
    // on a re-run over a differently-partitioned input
    val ids1 = capped.select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = Curation.perKeyCap(docs.repartition(7), "doc_id", "source", cap = 7)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2)
    // a key with fewer rows than the cap keeps them all
    val small = Curation.perKeyCap(docs.limit(4), "doc_id", "source", cap = 7)
    assert(small.count() == 4)
    // rank ≤ cap plans as WindowGroupLimit (partial top-k before the shuffle)
    assert(capped.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("token budget sample: fills per-stratum budgets in hash order, boundary doc kept") {
    val docs = (0L until 100L).map(i =>
      (i, if (i < 60) "en" else "de", Seq.fill(10)("tok").mkString(" "))) // 10 tokens each
      .toDF("doc_id", "lang", "text")
    val out = Curation.tokenBudgetSample(docs, "doc_id", "text", "lang",
      budgets = Map("en" -> 95L), defaultBudget = 0L)
      .select("lang", "doc_id", "n_tokens", "taken_before")
      .as[(String, Long, Long, Long)].collect()
    // de budget 0 → nothing; en budget 95 → 10 docs (the 10th starts at 90 < 95)
    assert(out.forall(_._1 == "en"))
    assert(out.length == 10)
    assert(out.map(_._4).sorted.toSeq == (0 until 10).map(_ * 10L))
    // deterministic: same survivors on re-run
    val again = Curation.tokenBudgetSample(docs, "doc_id", "text", "lang",
      budgets = Map("en" -> 95L), defaultBudget = 0L)
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.map(_._2).toSet)
  }

  test("pack sequences: per-shard running offsets, boundary-spanning chunks") {
    val docs = Seq(
      (0L, "s1", "a b c d"), // 4 tokens, offset 0 → chunk 0
      (1L, "s1", "e f g"), // offset 4, spans tokens 4-6 → chunks 0..1 (window 5)
      (2L, "s1", "h i"), // offset 7 → chunk 1
      (3L, "s2", "x y z"), // other shard packs independently from 0
      (4L, "s2", "")) // zero tokens → dropped
      .toDF("doc_id", "shard", "text")
    val out = Curation.packSequences(docs, "doc_id", "text", "shard", windowTokens = 5)
      .select("doc_id", "n_tokens", "offset", "chunk_start", "chunk_end")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(0L) == ((4L, 0L, 0L, 0L)))
    assert(out(1L) == ((3L, 4L, 0L, 1L))) // spans the window boundary
    assert(out(2L) == ((2L, 7L, 1L, 1L)))
    assert(out(3L) == ((3L, 0L, 0L, 0L))) // shard s2 restarts at offset 0
    assert(!out.contains(4L))
  }

  test("chunk documents: overlap, partial tail kept iff it adds tokens, short docs whole") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b c"),                                  // shorter than one window
      (3L, (1 to 8).map(i => s"u$i").mkString(" ")))  // n−W divisible by stride
      .toDF("doc_id", "text")
    val r = Curation.chunkDocuments(docs, "doc_id", "text",
        windowTokens = 4, strideTokens = 2)
      .select("doc_id", "chunk_idx", "token_start", "n_tokens", "chunk_text")
      .as[(Long, Int, Int, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    // doc 1: starts 0,2,4,6 — full coverage, last window exactly reaches 10
    assert(r(1L).map(c => (c._3, c._4)) == Seq((0, 4), (2, 4), (4, 4), (6, 4)))
    assert(r(1L).head._5 == "t1 t2 t3 t4")
    assert(r(1L).last._5 == "t7 t8 t9 t10")
    // doc 2: one whole-document chunk
    assert(r(2L) == Seq((2L, 0, 0, 3, "a b c")))
    // doc 3: 8 tokens, starts 0,2,4 — no empty tail window beyond the end
    assert(r(3L).map(_._3) == Seq(0, 2, 4))
    // every token position is covered by some chunk
    assert(r(1L).flatMap(c => c._3 until (c._3 + c._4)).toSet == (0 until 10).toSet)
    // shuffle-free: chunking lives inside the scan stage
    val p = Curation.chunkDocuments(docs, "doc_id", "text", 4, 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("decontaminate: containment of benchmark shingles, self-pairs excluded") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"), // benchmark
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota"), // superset → contaminated
      (2L, "alpha beta gamma delta epsilon unrelated words here"), // partial
      (3L, "completely different content with no shared phrases at all"))
      .toDF("doc_id", "text")
    val sh = Dedup.shingles(docs, "doc_id", "text", 5)
    val bench = Seq(0L).toDF("bench_id")
    val out = Curation.decontaminate(sh, "doc_id", bench, minContainment = 0.2)
      .as[(Long, Long, Long, Double)].collect().map(r => (r._1, r._4)).toMap
    // doc 0 has 4 5-gram shingles; doc 1 contains all 4 → containment 1.0
    assert(out(1L) == 1.0)
    // doc 2 shares exactly 1 of 4 → 0.25
    assert(out(2L) == 0.25)
    assert(!out.contains(3L)) // no overlap
    assert(!out.contains(0L)) // self-pair excluded
  }

  test("bloom-prefiltered decontamination equals the exact pipeline (real corpus)") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(sf("documents"))
    val sh = Dedup.shingles(docs, "doc_id", "text", 5)
    val bench = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("bench_id"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Double)].collect().toSet
    // identical answer uncapped and under the df-cap serving default —
    // bloom membership is per shingle value, so caps see the same dfs
    assert(rows(Curation.decontaminateBloom(sh, "doc_id", bench, 0.2,
        maxShingleDf = None)) ==
      rows(Curation.decontaminate(sh, "doc_id", bench, 0.2,
        maxShingleDf = None)))
    assert(rows(Curation.decontaminateBloom(sh, "doc_id", bench, 0.2)) ==
      rows(Curation.decontaminate(sh, "doc_id", bench, 0.2)))
    // an empty benchmark set yields an empty (not failing) result
    assert(Curation.decontaminateBloom(sh, "doc_id",
      bench.limit(0), 0.2).count() == 0)
    // a prebuilt (ingest-time) bloom serves the identical answer — the
    // serialized sketch round-trips through bytes like a store read-back
    val pre = Curation.benchBloom(sh, "doc_id", bench)
    val roundTripped = Curation.Bloom(pre.bytes.clone())
    assert(rows(Curation.decontaminateBloom(sh, "doc_id", bench, 0.2,
        prebuilt = Some(roundTripped))) ==
      rows(Curation.decontaminateBloom(sh, "doc_id", bench, 0.2)))
  }

  test("bloomBuild sizes past the runtime-join-filter caps and restores them") {
    import org.apache.spark.sql.functions.col
    // Spark's BloomFilterAggregate clamps its numBits/numItems LITERALS to
    // the runtime-filter caps (Math.min in its buffer sizing) — with the
    // defaults, >~7M distinct hashes at 1% fpp silently saturate the
    // sketch. bloomBuild must build at the REQUESTED size: pin it by
    // setting a pathologically small cap and checking the sketch ignores it.
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val n = 50000L
    val want = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(n, 0.01)
    spark.conf.set(bitsKey, "64") // far below `want`
    try {
      val hashes = spark.range(n).select(col("id").as("sh"))
      val bloom = Curation.bloomBuild(hashes, fpp = 0.01)
      val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bloom.bytes))
      assert(bf.bitSize() >= want, s"sketch clamped: ${bf.bitSize()} < $want bits")
      // build restored the ambient conf (our tiny cap), not its own value
      assert(spark.conf.get(bitsKey) == "64")
    } finally spark.conf.unset(bitsKey)
  }

  test("connected components: 300-link chain converges within the round cap") {
    import org.apache.spark.sql.functions.col
    // worst-case diameter for min-label propagation: plain hop-at-a-time
    // needs ~300 rounds; pointer jumping must close it in O(log d)
    val edges = spark.range(299)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val nodes = spark.range(300).select(col("id"))
    val comps = Curation.connectedComponents(edges, nodes, "id")
      .select("component_id").distinct().as[Long].collect().toSeq
    assert(comps == Seq(0L))
  }

  test("quantileFilter: per-group interpolated threshold, boundary kept") {
    import org.apache.spark.sql.functions.col
    // group a scores 1..4: p25 interpolates to 1.75 → survivor scores 2,3,4
    // group b scores 10,20: p25 = 12.5 → survivor 20
    val rows = Seq(
      ("a", 0L, 1.0), ("a", 1L, 2.0), ("a", 2L, 3.0), ("a", 3L, 4.0),
      ("b", 4L, 10.0), ("b", 5L, 20.0))
      .toDF("src", "id", "score")
    val out = Curation.quantileFilter(rows, "src", "score", 0.25)
      .select("id", "threshold").as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> 1.75, 2L -> 1.75, 3L -> 1.75, 5L -> 12.5))
    // exact-boundary score survives (>= not >): p50 of {1,2,3} is 2
    val b = Curation.quantileFilter(
      Seq(("a", 0L, 1.0), ("a", 1L, 2.0), ("a", 2L, 3.0)).toDF("src", "id", "score"),
      "src", "score", 0.5).select("id").as[Long].collect().toSet
    assert(b == Set(1L, 2L))
    // thresholds reach the corpus via a broadcast join, not a shuffle
    val plan = Curation.quantileFilter(rows, "src", "score", 0.25)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("scoreBuckets: per-group terciles, boundary rule, top tier = cuts.length") {
    import org.apache.spark.sql.functions.col
    // group a scores 1..4: t0 = q(1/3) = 2.0, t1 = q(2/3) = 3.0
    //   1 → bucket 0 (< t0), 2 → 1 (boundary: NOT < its own threshold),
    //   3 → 2 (>= t1), 4 → 2
    // group b gets its own thresholds (10,20,30 → t0=16.667, t1=23.333)
    val rows = Seq(
      ("a", 0L, 1.0), ("a", 1L, 2.0), ("a", 2L, 3.0), ("a", 3L, 4.0),
      ("b", 4L, 10.0), ("b", 5L, 20.0), ("b", 6L, 30.0))
      .toDF("src", "id", "score")
    val out = Curation.scoreBuckets(rows, "src", "score")
      .select("id", "bucket", "threshold_0", "threshold_1")
      .as[(Long, Int, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(0L)._2 == 0 && out(1L)._2 == 1 && out(2L)._2 == 2 && out(3L)._2 == 2)
    assert(out(4L)._2 == 0 && out(5L)._2 == 1 && out(6L)._2 == 2)
    assert(out(0L)._3 == 2.0 && out(0L)._4 == 3.0)
    assert(out(4L)._3 == 16.666667 && out(4L)._4 == 23.333333)
    // every input row lands in exactly one bucket
    assert(out.size == 7)
    // custom cuts: a single median cut gives two buckets
    val halves = Curation.scoreBuckets(rows, "src", "score", Seq(0.5))
      .select("id", "bucket").as[(Long, Int)].collect().toMap
    assert(halves(0L) == 0 && halves(3L) == 1 && halves(6L) == 1)
    // thresholds reach the corpus via a broadcast join, not a shuffle
    val plan = Curation.scoreBuckets(rows, "src", "score")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // invalid cuts rejected
    intercept[IllegalArgumentException] {
      Curation.scoreBuckets(rows, "src", "score", Seq(0.7, 0.3))
    }
  }

  test("temperatureMix: tau flattens the head, tau=1 is uniform sampling") {
    import org.apache.spark.sql.functions.col
    // heavily skewed corpus: 900 'en' vs 100 'de'
    val docs = spark.range(1000).select(col("id"),
      org.apache.spark.sql.functions.when(col("id") < 900, "en").otherwise("de").as("lang"))
    val rates = Curation.temperatureMix(docs, "id", "lang", tau = 0.5, sampleFraction = 0.3)
      .select("lang", "rate").distinct()
      .as[(String, Double)].collect().toMap
    // sqrt flattening: de's keep rate must exceed en's by ~sqrt(900/100)=3
    assert(rates("de") > rates("en"))
    assert(math.abs(rates("de") / rates("en") - 3.0) < 0.01)
    // tau=1 degenerates to uniform: every group keeps sampleFraction
    val uni = Curation.temperatureMix(docs, "id", "lang", tau = 1.0, sampleFraction = 0.3)
      .select("rate").distinct().as[Double].collect().toSeq
    assert(uni == Seq(0.3))
    // expected-size sanity: the realized sample is near 30%
    val n = Curation.temperatureMix(docs, "id", "lang", 0.5, 0.3).count()
    assert(n > 200 && n < 400, s"realized $n of 1000")
  }

  test("repeatByWeight: integer weights exact, fractional via coin, zero drops") {
    import org.apache.spark.sql.functions.{col, lit}
    val docs = Seq((0L, 2.0), (1L, 0.0), (2L, 1.0), (3L, 0.4), (4L, 2.5))
      .toDF("id", "w")
    val out = Curation.repeatByWeight(docs, "id", "w")
      .select("id", "epoch").as[(Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(out(0L) == Seq(1, 2)) // w=2.0: exactly 2 epochs
    assert(!out.contains(1L)) // w=0: dropped
    assert(out(2L) == Seq(1))
    assert(out.get(3L).forall(e => e == Seq(1))) // 0 or 1, contiguous from 1
    assert(out(4L) == Seq(1, 2) || out(4L) == Seq(1, 2, 3)) // 2 + coin
    // deterministic: same input, same epochs
    val again = Curation.repeatByWeight(docs, "id", "w")
      .select("id", "epoch").as[(Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(again == out)
    // fractional coins realize at roughly their rate over many rows
    val many = Curation.repeatByWeight(
      spark.range(1000).select(col("id"), lit(0.4).as("w")), "id", "w").count()
    assert(many > 300 && many < 500, s"realized $many of ~400")
  }

  test("distributionShift: over-represented facets get positive KL terms; uniform sample ~0") {
    // corpus 60/40 across two facets; sample drawn only from facet a
    val df = ((1 to 60).map(i => ("a", i <= 30)) ++ (1 to 40).map(_ => ("b", false)))
      .toDF("facet", "samp")
    val out = Curation.distributionShift(df.toDF("src", "samp"), "src", col("samp"))
      .collect().map(r => r.getAs[String]("facet") ->
        (r.getAs[Long]("n_sample"), r.getAs[Double]("p_sample"),
          r.getAs[Double]("kl_term"))).toMap
    assert(out("a")._1 == 30L && out("b")._1 == 0L)
    // sample mass concentrates on a: positive term there, negative on b
    assert(out("a")._3 > 0 && out("b")._3 < 0)
    // probabilities are add-one smoothed over 2 facets: (30+1)/(30+2)
    assert(math.abs(out("a")._2 - 31.0 / 32) < 1e-6)
    // a sample matching the corpus mix: both terms ≈ 0
    val even = Curation.distributionShift(
      df.toDF("src", "samp"), "src", lit(true))
    assert(even.collect().forall(r =>
      math.abs(r.getAs[Double]("kl_term")) < 1e-4))
  }

  test("ngramTop: occurrences vs document frequency, deterministic rank") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (0L, "big data big data big data"), // 'big data' 3x, 'data big' 2x
      (1L, "big data pipelines"),
      (2L, "tiny"), // < n tokens → contributes nothing
      (3L, "Big, DATA!")) // tokenizer lowercases and strips punctuation
      .toDF("doc_id", "text")
    val top = TextAnalysis.ngramTop(docs, "doc_id", "text", n = 2, k = 3)
      .as[(String, Long, Long, Int)].collect()
    assert(top.head == (("big data", 3L, 5L, 1))) // df counts docs, not hits
    // tie between 'data big' (2 in doc 0) — ranks are contiguous from 1
    assert(top.map(_._4).toSeq == (1 to top.length))
    assert(top.forall(_._1.split(" ").length == 2))
    // trigrams: the guard keeps short docs out instead of sequence(1,0) DESC
    val tri = TextAnalysis.ngramTop(docs, "doc_id", "text", n = 3, k = 5)
      .as[(String, Long, Long, Int)].collect()
    assert(tri.exists(_._1 == "big data big") && tri.forall(!_._1.contains("tiny")))
  }

  test("weighted sample: deterministic, k-bounded, weight-biased") {
    val rows = (0L until 200L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", if (i < 100) 50.0 else 0.1))
      .toDF("doc_id", "stratum", "w")
    val s1 = Curation.weightedSample(rows, "doc_id", "stratum", "w", k = 20)
      .select("doc_id", "rank").as[(Long, Int)].collect().toMap
    val s2 = Curation.weightedSample(rows, "doc_id", "stratum", "w", k = 20)
      .select("doc_id", "rank").as[(Long, Int)].collect().toMap
    assert(s1 == s2) // same hash coins → same selection every run
    val perStratum = Curation.weightedSample(rows, "doc_id", "stratum", "w", 20)
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(perStratum == Map("a" -> 20L, "b" -> 20L))
    // 500x weight ratio dominates the A-ES keys: the heavy half (ids<100)
    // should take nearly every slot
    val heavy = s1.keys.count(_ < 100L)
    assert(heavy >= 35, s"heavy rows took only $heavy/40 slots")
  }

  test("scored budget select: quality order, boundary kept, per-stratum") {
    val scored = Seq(
      // stratum a, budget 100: scores 9 > 7 > 5; 60+60 crosses at doc 2
      (1L, "a", 9.0, 60L), (2L, "a", 7.0, 60L), (3L, "a", 5.0, 60L),
      // stratum b, default budget 50: only the best fits (boundary kept)
      (4L, "b", 2.0, 80L), (5L, "b", 1.0, 10L),
      // stratum c: score tie → lower id first
      (6L, "c", 4.0, 30L), (7L, "c", 4.0, 30L))
      .toDF("doc_id", "source", "score", "n_tokens")
    val kept = Curation.scoredBudgetSelect(scored, "doc_id", "source",
        "score", "n_tokens", budgets = Map("a" -> 100L, "c" -> 40L),
        defaultBudget = 50L)
      .select("doc_id", "taken_before").as[(Long, Long)].collect().toMap
    // a: doc1 (0 before), doc2 (60 before < 100, boundary kept), doc3 dropped
    // b: doc4 (best, kept though 80 > 50), doc5 dropped (80 before >= 50)
    // c: tie → doc6 first, doc7 kept at 30 < 40
    assert(kept == Map(1L -> 0L, 2L -> 60L, 4L -> 0L, 6L -> 0L, 7L -> 30L))
  }

  test("cross-source overlap: symmetric fold, per-cell counts") {
    val pairs = pairsDf((1L, 2L), (1L, 3L), (2L, 4L), (5L, 6L))
    val docs = Seq((1L, "web"), (2L, "wiki"), (3L, "web"), (4L, "web"),
      (5L, "books"), (6L, "wiki")).toDF("doc_id", "source")
    val cells = Curation.crossSourceOverlap(pairs, docs, "doc_id", "source")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // (1,2) web-wiki and (2,4) wiki-web fold into the same canonical cell
    assert(cells == Map(("web", "wiki") -> 2L, ("web", "web") -> 1L,
      ("books", "wiki") -> 1L))
  }

  test("tableProfile: typed min/max, nulls, distincts in one pass") {
    val df = Seq(
      (1L, Some("a"), Some(2.5)),
      (2L, Some("c"), None),
      (3L, None, Some(1.0)),
      (3L, Some("b"), Some(9.5))
    ).toDF("id", "s", "x")
    val r = Curation.tableProfile(df, Seq("id", "s", "x"))
      .collect().map(x => x.getString(0) -> x).toMap
    val id = r("id")
    assert(id.getAs[Long]("n_rows") == 4 && id.getAs[Long]("n_nulls") == 0 &&
      id.getAs[Long]("n_distinct") == 3)
    assert(id.getAs[Double]("min_num") == 1.0 && id.getAs[Double]("max_num") == 3.0)
    assert(id.isNullAt(id.fieldIndex("min_str")))
    val s = r("s")
    assert(s.getAs[Long]("n_nulls") == 1 && s.getAs[Long]("n_distinct") == 3)
    assert(s.getAs[String]("min_str") == "a" && s.getAs[String]("max_str") == "c")
    assert(s.isNullAt(s.fieldIndex("min_num")))
    val x = r("x")
    assert(x.getAs[Long]("n_nulls") == 1 && x.getAs[Double]("max_num") == 9.5)
  }

  test("urlFacets: parse, dot-boundary blocklist, scheme gate, case fold") {
    val urls = Seq(
      (0L, "https://ads.example.com/x"),          // blocked exactly
      (1L, "https://tracker.ads.example.com/y"),  // blocked subdomain
      (2L, "https://badads.example.com/z"),       // NOT blocked (no dot)
      (3L, "ftp://good.org/file"),                // scheme rejected
      (4L, "example.com/no-scheme"),              // no host parse
      (5L, "HTTPS://ADS.Example.COM/case"),       // case-folded block
      (6L, "http://ok.org?q=1"),                  // query, empty path
      (7L, "https://ok.org:8443/port/path")       // port excluded from host
    ).toDF("doc_id", "url")
    val r = Curation.urlFacets(urls, "doc_id", "url", Seq("ads.example.com"))
      .collect().map(x => x.getLong(0) ->
        ((x.getAs[String]("scheme"), x.getAs[String]("host"),
          x.getAs[String]("path"), x.getAs[Boolean]("keep")))).toMap
    assert(r(0L) == (("https", "ads.example.com", "/x", false)))
    assert(r(1L) == (("https", "tracker.ads.example.com", "/y", false)))
    assert(r(2L) == (("https", "badads.example.com", "/z", true)))
    assert(r(3L) == (("ftp", "good.org", "/file", false)))
    assert(r(4L) == (("", "", "", false)))
    assert(r(5L) == (("https", "ads.example.com", "/case", false)))
    assert(r(6L) == (("http", "ok.org", "", true)))
    assert(r(7L) == (("https", "ok.org", "/port/path", true)))
  }

  test("embeddingProfile: exact scaled stats per dimension, nulls dropped") {
    val rows = Seq(
      (0L, Seq(0.5f, -1.25f, 0.0f)),
      (1L, Seq(0.25f, 2.0f, 0.0f)),
      (2L, null.asInstanceOf[Seq[Float]])
    ).toDF("vec_id", "embedding")
    val p = Curation.embeddingProfile(rows, "embedding").collect()
      .map(r => r.getAs[Int]("dim") -> r).toMap
    assert(p.size == 3)
    // dim 0: 0.5, 0.25 → scaled 500000, 250000
    assert(p(0).getAs[Long]("n") == 2 && p(0).getAs[Long]("sum_s") == 750000L)
    assert(p(0).getAs[Long]("sumsq_s") == 500000L * 500000L + 250000L * 250000L)
    assert(p(0).getAs[Long]("n_zero") == 0)
    // dim 1: -1.25 floors to -1250000 exactly
    assert(p(1).getAs[Long]("min_s") == -1250000L)
    assert(p(1).getAs[Long]("max_s") == 2000000L)
    // dim 2: all zeros — the dead-dimension signature
    assert(p(2).getAs[Long]("n_zero") == 2 && p(2).getAs[Long]("sum_s") == 0L)
  }

  test("shardPlan: totals reconcile, skew is exact per-mille vs mean shard") {
    val rows = (0L until 200L).map(i => (i, "x" * (10 + (i % 7)).toInt))
      .toDF("doc_id", "text")
    val plan = Curation.shardPlan(rows, "doc_id", "text", numShards = 8)
      .collect()
    assert(plan.map(_.getAs[Long]("n_rows")).sum == 200L)
    val totalBytes = (0L until 200L).map(i => 10 + (i % 7)).sum
    assert(plan.map(_.getAs[Long]("bytes")).sum == totalBytes)
    val meanShard = totalBytes / plan.length
    plan.foreach { r =>
      assert(r.getAs[Long]("skew_permille") ==
        r.getAs[Long]("bytes") * 1000L / meanShard)
    }
  }

  test("madOutliers: hand-computed median/MAD; mean-insensitive to one extreme value") {
    // group a: 1..9 plus one 1000: median = rank ⌈10/2⌉... = (10+1) div 2 =
    // 5th smallest = 5; deviations sorted [0,1,1,2,2,3,3,4,4,995] → MAD at
    // rank 5 = 2; outliers: d > 6 → only the 1000 row
    val df = ((1 to 9).map(i => ("a", i.toLong)) :+ (("a", 1000L)) :+
      (("b", 7L)) :+ (("b", 7L)) :+ (("b", 7L))).toDF("g", "v")
    val out = Curation.madOutliers(df, "g", "v").collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("median"), r.getAs[Long]("mad"),
          r.getAs[Long]("n_outliers")))).toMap
    assert(out("a") == ((10L, 5L, 2L, 1L)))
    // group b: constant — median 7, MAD 0 (floored to 1 in the gate),
    // nothing deviates ⇒ no outliers, no division blowup
    assert(out("b") == ((3L, 7L, 0L, 0L)))
  }
}
