package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Link-graph operators for crawl-scale corpus curation.
  *
  * PageRank over the document/host link graph is the classic crawl-quality
  * signal (the provenance score next to the Gopher/C4 content gates that
  * `Curation` implements). The reference has no graph surface
  * (crates/vector-store is a per-row index engine); this extends the
  * training-data-pipeline side of the library the same way Dedup/Curation do.
  *
  * Everything here is integer fixed-point arithmetic: ranks live in
  * `scale`-scaled BIGINTs, every division is integral `div`, every sum is a
  * BIGINT sum — exact, order-independent, and replayable query-for-query in
  * DuckDB (float PageRank would hash-diverge on aggregation order).
  */
object Graph {

  /** Fixed-point scale for rank values: 1e12 micro-units per unit of
    * probability mass. With n ≤ 1e9 nodes the initial per-node rank
    * `scale div n` keeps ≥3 significant digits; sums of n terms stay far
    * below 2^63. */
  val RankScale: Long = 1000000000000L

  /** Integer fixed-point PageRank with damping 0.85 over an (src, dst)
    * edge list. Returns (id, rank) for every node, rank in `scale` units.
    *
    * Recurrence (all integral ops, replayed verbatim by the oracle):
    * {{{
    *   base     = scale div n
    *   contrib  = rank(u) div outdeg(u)            per edge u -> v
    *   rank'(v) = (15 * base + 85 * sum(contrib)) div 100
    * }}}
    *
    * Scale shape: each iteration is one equi-join of the rank vector to the
    * edge list on `src` (both hash-partitioned on the join key) plus one
    * partial-aggregating groupBy on `dst` — the canonical distributed
    * PageRank, shuffling only (long, long) pairs, never node payloads. The
    * rank vector is node-cardinality, the edge list dominates; at 100 TB
    * both sides would be bucketed on id so the per-iteration join plans
    * shuffle-free (see Layout), and the lineage would be checkpointed every
    * ~10 iterations. Dangling nodes (no outlinks) keep mass only through
    * the teleport term, like the classic formulation without the dangling
    * redistribution (documented, matched by the oracle).
    */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, scale: Long = RankScale,
      policy: CheckpointPolicy = CheckpointPolicy.Local): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val nodes = policy.materialize(e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()) // scanned every round
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("od"))
    // n as a broadcast 1-row aggregate: the node count stays in the plan
    // (no driver action), and `base` folds to the same constant everywhere
    val nDf = nodes.agg(count(lit(1)).as("n"))
    // (src, dst, od): static across iterations
    val eo = policy.materialize(e.join(outdeg, "src"))
    var ranks = nodes.crossJoin(broadcast(nDf))
      .select(col("id"), expr(s"${scale}L div n").as("rank"))
    for (i <- 1 to iterations) {
      val inc = eo.join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("rank div od").as("c"))
        .groupBy("id").agg(sum("c").as("s"))
      val next = ranks.join(inc, Seq("id"), "left")
        .crossJoin(broadcast(nDf))
        .select(col("id"),
          expr(s"(15L * (${scale}L div n) + 85L * coalesce(s, 0L)) div 100")
            .as("rank"))
      // lineage truncation per round (the connectedComponents discipline):
      // `ranks` appears twice per iteration, so without the checkpoint the
      // logical plan DOUBLES per round — at 5 iterations that is 32 copies
      // of the base scan, and AQE's per-stage logical-plan update walks the
      // whole tree (measured: the sf0.01 verify write spun >9 min of
      // driver CPU in TreeNode traversal before this truncation). The LAST
      // round stays untruncated so the served plan exposes one round's
      // join/aggregate shape to the PlanQualitySpec gate. Truncation mode
      // (executor-local vs durable-every-N) is the caller's `policy`.
      ranks = if (i == iterations) next else policy.truncate(next, i)
    }
    ranks
  }

  /** Scale for HITS scores: 1e6 keeps the running sums far from Long
    * overflow even at extreme in-degree (Σ over n nodes of 1e6-scaled
    * scores × the renormalization multiply stays < 2^63 for n ≤ ~1e12/edge
    * fanout). */
  val HitsScale: Long = 1000000L

  /** Integer fixed-point HITS (Kleinberg hubs & authorities) over an
    * (src, dst) edge list: authority(v) = Σ hub of in-neighbors, hub(u) =
    * Σ authority of out-neighbors, each renormalized so max = `scale`
    * after every half-step (the integer analogue of the usual L∞
    * normalization — exact, order-independent, oracle-replayable).
    * Returns (id, auth, hub), both in `scale` units.
    *
    * Scale shape: each half-step is one score-to-edges equi-join + one
    * partial-aggregating groupBy + a broadcast 1-row max attach — only
    * (long, long) pairs shuffle. Same bucketing/checkpointing notes as
    * [[pageRank]]. */
  def hits(
      edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, scale: Long = HitsScale,
      policy: CheckpointPolicy = CheckpointPolicy.Local): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = policy.materialize( // scanned twice every round
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")))
    val nodes = policy.materialize(e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct())
    var auth = nodes.withColumn("auth", lit(scale))
    var hub = nodes.withColumn("hub", lit(scale))
    // lineage truncation per half-step: each raw-score frame is referenced
    // TWICE (the score join and its own max attach), so hub(k+1) ≈ 4·auth(k)
    // in plan size without the checkpoints — exponential by round (the
    // worst of the three iterative operators here; see pageRank's note).
    for (i <- 1 to iterations) {
      val a = policy.midRound(
        e.join(hub.select(col("id").as("src"), col("hub")), "src")
          .select(col("dst").as("id"), col("hub"))
          .groupBy("id").agg(sum("hub").as("araw")))
      val amax = a.agg(max("araw").as("amax"))
      val nextAuth = nodes.join(a, Seq("id"), "left").crossJoin(broadcast(amax))
        .select(col("id"),
          expr(s"(coalesce(araw, 0L) * ${scale}L) div amax").as("auth"))
      // the hub half-step consumes auth twice — keep the final round's
      // auth untruncated only where it feeds the returned join directly
      auth = if (i == iterations) nextAuth else policy.truncate(nextAuth, i)
      val h = policy.midRound(
        e.join(auth.select(col("id").as("dst"), col("auth")), "dst")
          .select(col("src").as("id"), col("auth"))
          .groupBy("id").agg(sum("auth").as("hraw")))
      val hmax = h.agg(max("hraw").as("hmax"))
      val nextHub = nodes.join(h, Seq("id"), "left").crossJoin(broadcast(hmax))
        .select(col("id"),
          expr(s"(coalesce(hraw, 0L) * ${scale}L) div hmax").as("hub"))
      hub = if (i == iterations) nextHub else policy.truncate(nextHub, i)
    }
    auth.join(hub, "id")
  }

  /** Deterministic synchronous label propagation (Raghavan et al. 2007)
    * over the UNDIRECTED closure of an (src, dst) edge list — the community
    * signal next to [[pageRank]]'s quality signal (site/mirror clusters in
    * a crawl graph). Returns (id, label) for every node after `iterations`
    * synchronous rounds; label starts as the node's own id.
    *
    * Determinism (the classic formulation is randomized; this one is
    * oracle-replayable): all nodes update together each round (no visit
    * order), and a node's next label is the most frequent label among its
    * neighbors with ties broken by SMALLEST label — the argmax is
    * `min(struct(-count, label))`, exact integer ordering. A node with no
    * neighbors keeps its own id via the left join + coalesce.
    *
    * Scale shape: per round one labels-to-edges equi-join + one
    * (id, label) partial-aggregating count + one per-id min — only
    * (long, long, long) tuples shuffle, never payloads; the undirected
    * closure is materialized once. Same bucketing/checkpoint notes as
    * [[pageRank]] (lineage grows per round; checkpoint every ~10 at scale).
    */
  def labelPropagation(
      edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int,
      policy: CheckpointPolicy = CheckpointPolicy.Local): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    // undirected neighbor relation, one row per distinct (node, neighbor);
    // scanned every round — materialize once
    val und = policy.materialize(
      e.select(col("src").as("a"), col("dst").as("b"))
        .union(e.select(col("dst").as("a"), col("src").as("b")))
        .distinct())
    val nodes = und.select(col("a").as("id")).distinct()
    var labels = nodes.withColumn("label", col("id"))
    for (i <- 1 to iterations) {
      val freq = und
        .join(labels.select(col("id").as("b"), col("label")), "b")
        .groupBy(col("a").as("id"), col("label"))
        .agg(count(lit(1)).as("c"))
      val pick = freq.groupBy("id")
        .agg(min(struct((-col("c")).as("nc"), col("label").as("l")))
          .as("_best"))
        .select(col("id"), col("_best.l").as("next"))
      // per-round lineage truncation — `labels` appears twice per round
      // (neighbor join + carry-forward), see pageRank's note; the last
      // round stays untruncated for the plan gate
      val next = labels.join(pick, Seq("id"), "left")
        .select(col("id"), coalesce(col("next"), col("label")).as("label"))
      labels = if (i == iterations) next else policy.truncate(next, i)
    }
    labels
  }

  /** Deterministic synthetic outlink list over contiguous ids [0, n):
    * node d links to (17·d + j) mod n for j in 1..(1 + d mod 3) — variable
    * outdegree 1..3, every node a source, targets uniform. The stand-in for
    * a crawl's href graph (the fixture corpus has no real links), written so
    * the oracle regenerates it with three filtered selects. */
  def syntheticLinks(docs: DataFrame, idCol: String): DataFrame = {
    val nDf = docs.agg(count(lit(1)).as("n"))
    docs.select(col(idCol).as("src")).crossJoin(broadcast(nDf))
      .select(col("src"),
        explode(sequence(lit(1), lit(1) + (col("src") % 3).cast("int")))
          .as("j"),
        col("n"))
      .select(col("src"), ((lit(17) * col("src") + col("j")) % col("n")).as("dst"))
  }
}
