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
      k: Int = 20): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape ${depth}x$width")
    // Exact per-key counts first: the raw occurrence stream collapses to
    // (key, cnt) with map-side partial aggregation before anything fans out
    // by depth — the ×depth explosion happens on the collapsed frame.
    val tf = keys.groupBy(col("key")).agg(count(lit(1)).as("cnt"))
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
      a: DataFrame, b: DataFrame, depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape ${depth}x$width")
    def tf(x: DataFrame) = x.groupBy(col("key")).agg(count(lit(1)).as("cnt"))
    def sketch(t: DataFrame) = t.select(col("cnt"), explode(array(
        (0 until depth).map { j =>
          struct(lit(j).as("row"),
            (Dedup.stableHash(concat(lit(s"$j:"), col("key"))) % width)
              .as("bucket"))
        }: _*)).as("_rb"))
      .groupBy(col("_rb.row").as("row"), col("_rb.bucket").as("bucket"))
      .agg(sum(col("cnt")).as("bcnt"))
    val (ta, tb) = (tf(a), tf(b))
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
