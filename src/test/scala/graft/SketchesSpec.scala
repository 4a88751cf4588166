package graft

import graft.operators.{Curation, Sketches}
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // a skewed key stream: key k_i appears i times, i = 1..40 (820 rows)
  private def stream = (1 to 40).flatMap(i => Seq.fill(i)(f"k$i%02d"))
    .toDF("key")

  test("cms: one-sided error — estimate >= exact for every reported key") {
    val out = Sketches.cmsHeavyHitters(stream, depth = 3, width = 8, k = 40)
      .collect()
    assert(out.length == 40)
    assert(out.forall(r => r.getAs[Long]("cms_estimate") >= r.getAs[Long]("exact_cnt")))
    assert(out.forall(r =>
      r.getAs[Long]("overcount") ==
        r.getAs[Long]("cms_estimate") - r.getAs[Long]("exact_cnt")))
    // width 8 for 40 keys: collisions are certain somewhere
    assert(out.exists(r => r.getAs[Long]("overcount") > 0))
  }

  test("cms: wide sketch (no collisions possible to matter) is exact, ordered by count desc") {
    val out = Sketches.cmsHeavyHitters(stream, depth = 4, width = 4096, k = 10)
      .collect()
    assert(out.length == 10)
    // with 40 keys in 4096 buckets × 4 rows, min over rows dodges any
    // single collision: estimates collapse to the exact counts
    assert(out.forall(r => r.getAs[Long]("cms_estimate") == r.getAs[Long]("exact_cnt")))
    assert(out.map(_.getAs[Long]("exact_cnt")).toSeq == (31 to 40).reverse.map(_.toLong))
  }

  test("cms: sketch tables merge by counter-wise sum (shard-and-add == single pass)") {
    // the property that makes the sketch safe to build map-side: the d×w
    // table from any sharding of the stream, summed counter-wise, equals
    // the single-pass table — here via disjoint halves of the stream
    import org.apache.spark.sql.DataFrame
    def sketchTable(keys: DataFrame): DataFrame = {
      val tf = keys.groupBy(col("key")).agg(count(lit(1)).as("cnt"))
      tf.select(col("cnt"), explode(array((0 until 3).map { j =>
        struct(lit(j).as("row"),
          (graft.operators.Dedup.stableHash(concat(lit(s"$j:"), col("key"))) % 16)
            .as("bucket"))
      }: _*)).as("_rb"))
        .groupBy(col("_rb.row").as("row"), col("_rb.bucket").as("bucket"))
        .agg(sum(col("cnt")).as("bcnt"))
    }
    val all = stream.withColumn("_i", monotonically_increasing_id())
    val h1 = all.filter(col("_i") % 2 === 0).select("key")
    val h2 = all.filter(col("_i") % 2 =!= 0).select("key")
    val merged = sketchTable(h1).union(sketchTable(h2))
      .groupBy("row", "bucket").agg(sum("bcnt").as("bcnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val single = sketchTable(stream)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == single)
  }

  test("linear counting: occupied <= exact, estimate >= occupied, near-exact when m >> n") {
    val df = (1 to 500).map(i => ("g" + i % 2, i)).toDF("g", "v")
    val out = Sketches.linearCountingDistinct(df, "g", "v", m = 65536).collect()
    assert(out.length == 2)
    out.foreach { r =>
      val exact = r.getAs[Long]("n_exact")
      val occ = r.getAs[Long]("buckets_occupied")
      val est = r.getAs[Double]("lc_estimate")
      assert(exact == 250 && occ <= exact && est >= occ - 1e-9)
      // m/n = 262: collision probability tiny, estimate within 2%
      assert(math.abs(est - exact) / exact < 0.02, s"est=$est exact=$exact")
    }
  }

  test("linear counting: estimate compensates collisions (est between V and n upper range)") {
    val df = (1 to 2000).map(i => ("g", i)).toDF("g", "v")
    val Array(r) = Sketches.linearCountingDistinct(df, "g", "v", m = 1024).collect()
    val occ = r.getAs[Long]("buckets_occupied")
    val est = r.getAs[Double]("lc_estimate")
    // heavy collisions: occupied is far below 2000, the -m ln(empty/m)
    // inversion recovers most of the gap
    assert(occ < 1000)
    assert(est > occ && math.abs(est - 2000) / 2000.0 < 0.15, s"occ=$occ est=$est")
  }

  test("dsir: target-like docs score above off-target docs; weights finite; n_feats = 2·tokens − 1") {
    // two disjoint vocabularies: target docs speak 'alpha beta…', raw-only
    // docs speak 'omega psi…' — the LLR must separate them cleanly
    val docs = ((1 to 20).map(i => (i.toLong, s"alpha beta gamma delta d$i", true)) ++
      (21 to 40).map(i => (i.toLong, s"omega psi chi phi d$i", false)))
      .toDF("doc_id", "text", "is_en")
    val out = Curation.dsirWeights(docs, "doc_id", "text", col("is_en"), numBuckets = 256)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_feats"), r.getAs[Double]("dsir_weight"))).toMap
    assert(out.size == 40)
    // 5 tokens → 5 unigrams + 4 bigrams
    assert(out.values.forall(_._1 == 9L))
    val t = (1 to 20).map(i => out(i.toLong)._2)
    val o = (21 to 40).map(i => out(i.toLong)._2)
    assert(t.forall(w => !w.isNaN && !w.isInfinite))
    assert(t.min > o.max, s"target min ${t.min} <= off-target max ${o.max}")
  }

  test("hll: estimate within 5% of exact at n >> m; registers <= m") {
    val df = (1 to 20000).map(i => ("g", "user" + i)).toDF("g", "v")
    val Array(r) = Sketches.hllDistinct(df, "g", "v", p = 9).collect()
    assert(r.getAs[Long]("n_exact") == 20000L)
    assert(r.getAs[Long]("hll_registers") <= 512L)
    assert(!r.getAs[Boolean]("small_range")) // far past 2.5·m
    val est = r.getAs[Double]("hll_estimate")
    // 1.04/sqrt(512) ≈ 4.6% standard error — a 2σ bound. The md5 hash is
    // FIXED, so this is one deterministic draw, not an average: it lands at
    // +8.8% (1.9σ) on this stream, and the assert pins the 2σ window.
    assert(math.abs(est - 20000) / 20000.0 < 0.10, s"est=$est")
  }

  test("hll: small-range fallback engages and is near-exact at n << m") {
    val df = (1 to 30).map(i => ("g", "u" + i)).toDF("g", "v")
    val Array(r) = Sketches.hllDistinct(df, "g", "v", p = 9).collect()
    assert(r.getAs[Boolean]("small_range"))
    val est = r.getAs[Double]("hll_estimate")
    // linear counting at 30/512 occupancy: within ~10%
    assert(math.abs(est - 30) / 30.0 < 0.10, s"est=$est")
  }

  test("hll: registers merge by max (shard-and-max == single pass) and duplicates don't move the estimate") {
    // duplicate every value 3x: registers are max-of-rho, so the sketch —
    // and therefore the estimate — must be identical to the deduped stream
    val base = (1 to 5000).map(i => ("g", "v" + i))
    val dup = (base ++ base ++ base).toDF("g", "v")
    val single = (1 to 5000).map(i => ("g", "v" + i)).toDF("g", "v")
    val a = Sketches.hllDistinct(dup, "g", "v", p = 9).head
    val b = Sketches.hllDistinct(single, "g", "v", p = 9).head
    assert(a.getAs[Double]("hll_estimate") == b.getAs[Double]("hll_estimate"))
    assert(a.getAs[Long]("hll_registers") == b.getAs[Long]("hll_registers"))
    assert(a.getAs[Long]("n_exact") == 5000L)
  }

  test("hll: register tables from any stream split max-merge to the single pass (streaming property)") {
    // the micro-batch maintenance contract: per-batch registers merged into
    // a store equal the one-shot registers — so a streaming counter's state
    // is ≤ m rows per group forever and never drifts from batch
    val all = (1 to 3000).map(i => ("g" + i % 3, "u" + i)).toDF("g", "v")
    val b1 = (1 to 1100).map(i => ("g" + i % 3, "u" + i)).toDF("g", "v")
    val b2 = (1101 to 2300).map(i => ("g" + i % 3, "u" + i)).toDF("g", "v")
    val b3 = (2301 to 3000).map(i => ("g" + i % 3, "u" + i)).toDF("g", "v")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getAs[Long]("_bucket")) -> r.getAs[Int]("_M"))
      .toMap
    val merged = Seq(b2, b3).foldLeft(Sketches.hllRegisters(b1, "g", "v", 9)) {
      (store, b) =>
        Sketches.mergeHllRegisters(store, Sketches.hllRegisters(b, "g", "v", 9), "g")
    }
    assert(key(merged) == key(Sketches.hllRegisters(all, "g", "v", 9)))
    // and the report over the maintained store equals the batch report
    val se = Sketches.hllEstimate(merged, "g", 9).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("hll_estimate")).toMap
    val be = Sketches.hllDistinct(all, "g", "v", 9).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("hll_estimate")).toMap
    assert(se == be)
  }

  test("histogram quantiles: hand-computed targets, interpolation, and exact order statistics on 1..100") {
    val df = (1 to 100).map(i => ("g", i.toLong)).toDF("g", "v")
    val out = Sketches.histogramQuantiles(df, "g", "v", width = 10L)
      .collect().map(r => r.getAs[String]("quantile") ->
        ((r.getAs[Long]("target_rank"), r.getAs[Double]("hist_estimate"),
          r.getAs[Long]("exact_value")))).toMap
    // buckets: b0 = {1..9} (9 rows), b1..b9 = 10 rows each, b10 = {100}
    // p50: target ⌈100/2⌉ = 50 → bucket 5 (cum 59, before 49):
    //      est = 50 + (50−49)·10/10 = 51.0; exact 50th smallest = 50
    assert(out("p50") == ((50L, 51.0, 50L)))
    // p90: target 90 → bucket 9 (cum 99, before 89): est 91.0; exact 90
    assert(out("p90") == ((90L, 91.0, 90L)))
    // p99: target ⌈99·100/100⌉ = 99 → same bucket 9: est 100.0; exact 99
    assert(out("p99") == ((99L, 100.0, 99L)))
  }

  test("histogram quantiles: estimate lands inside the target bucket's value range per group") {
    val df = ((1 to 500).map(i => ("a", (i * 7 % 997).toLong)) ++
      (1 to 300).map(i => ("b", (i * 13 % 499).toLong))).toDF("g", "v")
    val rows = Sketches.histogramQuantiles(df, "g", "v", width = 50L).collect()
    assert(rows.length == 6) // 2 groups × 3 quantiles
    rows.foreach { r =>
      val est = r.getAs[Double]("hist_estimate")
      val exact = r.getAs[Long]("exact_value")
      // exact sits in the bucket the estimate interpolates over
      assert(math.abs(est - exact) <= 50.0,
        s"${r.getAs[String]("quantile")}: est=$est exact=$exact")
    }
  }

  test("cmsJoinSize: one-sided error; wide sketch hits the exact size") {
    // A: k1 x2, k2 x3, k3 x1; B: k2 x4, k3 x5, k9 x7
    // exact join size = 3*4 + 1*5 = 17
    val a = (Seq.fill(2)("k1") ++ Seq.fill(3)("k2") ++ Seq("k3")).toDF("key")
    val b = (Seq.fill(4)("k2") ++ Seq.fill(5)("k3") ++ Seq.fill(7)("k9")).toDF("key")
    val wide = Sketches.cmsJoinSize(a, b, depth = 4, width = 4096).head
    assert(wide.getAs[Long]("exact_join_size") == 17L)
    // 6 distinct keys in 4096 buckets: no collisions, inner product exact
    assert(wide.getAs[Long]("cms_estimate") == 17L &&
      wide.getAs[Long]("overcount") == 0L)
    // a deliberately tiny sketch collides but NEVER underestimates
    val tiny = Sketches.cmsJoinSize(a, b, depth = 2, width = 2).head
    assert(tiny.getAs[Long]("cms_estimate") >= 17L)
    assert(tiny.getAs[Long]("overcount") >= 0L)
    // disjoint key sets: exact 0, estimate still >= 0
    val none = Sketches.cmsJoinSize(a,
      Seq("zz").toDF("key"), depth = 4, width = 4096).head
    assert(none.getAs[Long]("exact_join_size") == 0L &&
      none.getAs[Long]("cms_estimate") >= 0L)
  }
}
