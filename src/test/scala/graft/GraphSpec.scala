package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // star-plus-cycle toy graph: 0→1, 1→2, 2→0 (3-cycle), and 3,4 both → 0
  // (dangling sinks don't exist: 3 and 4 also link to each other)
  private def edges = Seq(
    (0L, 1L), (1L, 2L), (2L, 0L),
    (3L, 0L), (3L, 4L), (4L, 0L), (4L, 3L)
  ).toDF("src", "dst")

  test("pagerank: bit-identical to a driver-side replay of the recurrence") {
    val es = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (3L, 0L), (3L, 4L), (4L, 0L), (4L, 3L))
    // plain-Scala model of the exact integer recurrence
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val od = es.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = Graph.RankScale / nodes.length
    var rank = nodes.map(_ -> base).toMap
    for (_ <- 1 to 5) {
      val inc = es.groupBy(_._2).view
        .mapValues(_.map { case (s, _) => rank(s) / od(s) }.sum).toMap
      rank = nodes.map(v => v -> (15L * base + 85L * inc.getOrElse(v, 0L)) / 100L)
        .toMap
    }
    val r = Graph.pageRank(edges, "src", "dst", iterations = 5).collect()
      .map(x => x.getAs[Long]("id") -> x.getAs[Long]("rank")).toMap
    assert(r == rank) // integer arithmetic ⇒ bit-identical, any plan order
  }

  test("pagerank: mass is conserved up to integer truncation") {
    // every div truncates ≤ 1 unit per node per iteration; with scale 1e12
    // and 5 nodes the total stays within a few hundred units of scale
    val total = Graph.pageRank(edges, "src", "dst", iterations = 5)
      .agg(sum("rank")).as[Long].head()
    assert(total <= Graph.RankScale)
    assert(total > Graph.RankScale - 1000L)
  }

  test("pagerank: uniform cycle stays uniform (fixed point)") {
    // a pure k-cycle: every node has outdeg 1 and indeg 1 — the uniform
    // distribution is exact, so every iteration returns base (mod the
    // truncation of the damping blend, identical per node)
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("src", "dst")
    val r = Graph.pageRank(cyc, "src", "dst", iterations = 3).collect()
    assert(r.map(_.getAs[Long]("rank")).distinct.length == 1)
  }

  test("hits: bit-identical to a driver-side replay of the recurrence") {
    val es = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (3L, 0L), (3L, 4L), (4L, 0L), (4L, 3L))
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val scale = Graph.HitsScale
    var hub = nodes.map(_ -> scale).toMap
    var auth = nodes.map(_ -> scale).toMap
    for (_ <- 1 to 5) {
      val araw = es.groupBy(_._2).view
        .mapValues(_.map { case (s, _) => hub(s) }.sum).toMap
      val amax = araw.values.max
      auth = nodes.map(v => v -> araw.getOrElse(v, 0L) * scale / amax).toMap
      val hraw = es.groupBy(_._1).view
        .mapValues(_.map { case (_, d) => auth(d) }.sum).toMap
      val hmax = hraw.values.max
      hub = nodes.map(v => v -> hraw.getOrElse(v, 0L) * scale / hmax).toMap
    }
    val r = Graph.hits(edges, "src", "dst", iterations = 5).collect()
      .map(x => x.getAs[Long]("id") ->
        ((x.getAs[Long]("auth"), x.getAs[Long]("hub")))).toMap
    assert(r == nodes.map(v => v -> ((auth(v), hub(v)))).toMap)
  }

  test("hits: the node pointing at the best authorities is the best hub") {
    // 0 → {1,2,3}, 4 → 1, 1 → 0 (so every score survives the max-norm):
    // authority concentrates on 1 (two in-links), hub on 0 (three outlinks
    // to scored authorities)
    val g = Seq((0L, 1L), (0L, 2L), (0L, 3L), (4L, 1L), (1L, 0L))
      .toDF("src", "dst")
    val r = Graph.hits(g, "src", "dst", iterations = 3).collect()
      .map(x => x.getAs[Long]("id") ->
        ((x.getAs[Long]("auth"), x.getAs[Long]("hub")))).toMap
    assert(r(1L)._1 == r.values.map(_._1).max) // best authority
    assert(r(0L)._2 == r.values.map(_._2).max) // best hub
  }

  test("label propagation: bit-identical to a driver-side replay of the deterministic rule") {
    val es = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (3L, 0L), (3L, 4L), (4L, 0L), (4L, 3L))
    // plain-Scala model: undirected distinct closure, synchronous rounds,
    // most-frequent neighbor label with smallest-label ties
    val und = (es ++ es.map(_.swap)).distinct
    val nodes = und.map(_._1).distinct.sorted
    var lbl = nodes.map(v => v -> v).toMap
    for (_ <- 1 to 4) {
      lbl = nodes.map { v =>
        val nbrLabels = und.filter(_._1 == v).map(e => lbl(e._2))
        val best = nbrLabels.groupBy(identity).view.mapValues(_.size).toSeq
          .minBy { case (l, c) => (-c, l) }._1
        v -> best
      }.toMap
    }
    val r = Graph.labelPropagation(edges, "src", "dst", iterations = 4)
      .collect().map(x => x.getAs[Long]("id") -> x.getAs[Long]("label")).toMap
    assert(r == lbl)
  }

  test("label propagation: disconnected cliques converge to distinct per-clique labels") {
    // two triangles with no cross edges: labels never cross components
    val g = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (10L, 11L), (11L, 12L), (12L, 10L)).toDF("src", "dst")
    val r = Graph.labelPropagation(g, "src", "dst", iterations = 6)
      .collect().map(x => x.getAs[Long]("id") -> x.getAs[Long]("label")).toMap
    val c1 = Set(0L, 1L, 2L).map(r)
    val c2 = Set(10L, 11L, 12L).map(r)
    assert(c1.intersect(c2).isEmpty)
    assert(c1.forall(l => l >= 0L && l <= 2L))
    assert(c2.forall(l => l >= 10L && l <= 12L))
  }

  test("Reliable checkpoint policy: identical results, durable snapshots written") {
    import graft.operators.{CheckpointPolicy, Curation}
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toFile
    val hadDir = spark.sparkContext.getCheckpointDir
    try {
      val pol = CheckpointPolicy.Reliable(everyN = 2,
        checkpointDir = Some(s"file:${dir.getAbsolutePath}"))
      // every iterative operator, both modes, same answer
      val prL = Graph.pageRank(edges, "src", "dst", iterations = 5)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val prR = Graph.pageRank(edges, "src", "dst", iterations = 5, policy = pol)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(prR == prL)
      val hL = Graph.hits(edges, "src", "dst", iterations = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val hR = Graph.hits(edges, "src", "dst", iterations = 3, policy = pol)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(hR == hL)
      val lpL = Graph.labelPropagation(edges, "src", "dst", iterations = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val lpR = Graph.labelPropagation(edges, "src", "dst", iterations = 4,
          policy = pol)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(lpR == lpL)
      val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("id_a", "id_b")
      val nodes = (0L to 7L).toDF("doc_id")
      val ccL = Curation.connectedComponents(pairs, nodes, "doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ccR = Curation.connectedComponents(pairs, nodes, "doc_id", policy = pol)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(ccR == ccL)
      // the durability claim is real: reliable snapshot files exist on disk
      def files(f: java.io.File): Seq[java.io.File] = {
        val kids = Option(f.listFiles()).map(_.toSeq).getOrElse(Nil)
        kids.filter(_.isFile) ++ kids.filter(_.isDirectory).flatMap(files)
      }
      assert(files(dir).nonEmpty, "Reliable policy must write checkpoint files")
    } finally {
      // restore whatever dir (usually none) the shared session had
      hadDir.foreach(spark.sparkContext.setCheckpointDir)
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }

  test("Reliable policy recovers from block eviction (executor-loss proxy)") {
    import graft.operators.CheckpointPolicy
    // local[4] cannot lose an executor, but it CAN lose the blocks one
    // holds: materialize a Reliable run (persisted mid-round aggregates +
    // durable snapshots), evict every cached block, and re-run the action.
    // The recompute path (cache → lineage → last durable snapshot) must
    // reproduce the identical answer — the property a localCheckpoint
    // anywhere in the chain would destroy (its blocks have no recompute
    // path; a lost executor kills the job).
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_evict").toFile
    val hadDir = spark.sparkContext.getCheckpointDir
    try {
      val pol = CheckpointPolicy.Reliable(everyN = 2,
        checkpointDir = Some(s"file:${dir.getAbsolutePath}"))
      val baseline = Graph.hits(edges, "src", "dst", iterations = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val rel = Graph.hits(edges, "src", "dst", iterations = 3, policy = pol)
      val first = rel.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(first == baseline)
      // the eviction: every DataFrame block the policy persisted is gone
      // (Reliable.midRound persists through the CacheManager; clearCache
      // drops exactly those InMemoryRelations)
      spark.sharedState.cacheManager.clearCache()
      val recovered = rel.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(recovered == baseline,
        "Reliable run must recompute evicted blocks from durable snapshots")
    } finally {
      hadDir.foreach(spark.sparkContext.setCheckpointDir)
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }

  test("syntheticLinks: outdegree is 1 + id mod 3, targets within [0, n)") {
    val docs = (0L until 30L).toDF("doc_id")
    val e = Graph.syntheticLinks(docs, "doc_id")
    val od = e.groupBy("src").count().collect()
      .map(r => r.getAs[Long]("src") -> r.getAs[Long]("count")).toMap
    assert((0L until 30L).forall(d => od(d) == 1 + d % 3))
    val bad = e.filter(col("dst") < 0 || col("dst") >= 30).count()
    assert(bad == 0)
  }
}
