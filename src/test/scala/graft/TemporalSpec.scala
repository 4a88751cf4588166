package graft

import graft.operators.Temporal
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  // left: (key, ts, lid)   right: (key, ts, rid, rv)
  private lazy val left = Seq(
    (1L, 100L, "l1"),
    (1L, 200L, "l2"),
    (1L, 50L, "l0"), // before any right row ⇒ dropped (inner)
    (2L, 500L, "l3"),
    (3L, 10L, "l4")) // key with no right rows at all
    .toDF("k", "ts", "lid")

  private lazy val right = Seq(
    (1L, 100L, 10L, 1.5), // exactly AT l1's ts ⇒ inclusive match
    (1L, 150L, 11L, 2.5),
    (2L, 100L, 12L, 3.5),
    (2L, 400L, 13L, 4.5))
    .toDF("k", "ts", "rid", "rv")

  test("asof: latest right at-or-before each left, inner semantics") {
    val out = Temporal.asofJoin(left, right, Seq("k"), "ts", Seq("rid", "rv"))
      .select("lid", "asof_ts", "asof_rid", "asof_rv")
      .as[(String, Long, Long, Double)].collect().toSet
    assert(out == Set(
      ("l1", 100L, 10L, 1.5), // tie at ts=100 matches (inclusive)
      ("l2", 150L, 11L, 2.5), // skips older rid=10
      ("l3", 400L, 13L, 4.5))) // l0 (nothing before) and l4 (no rights) dropped
  }

  test("asof == naive per-left max-ts join on random data") {
    // dense collisions on a tiny key/time domain exercise ties and ordering
    val l = spark.range(300).select(
      (col("id") % 7).as("k"), ((col("id") * 37) % 50).as("ts"), col("id").as("lid"))
    val r = spark.range(120).select(
      (col("id") % 7).as("k"), ((col("id") * 13) % 50 * 2).as("ts"), col("id").as("rid"))
      // unique (k, ts) on the right — the precondition every asof impl shares
      .groupBy("k", "ts").agg(max("rid").as("rid"))
    val got = Temporal.asofJoin(l, r, Seq("k"), "ts", Seq("rid"))
      .select("lid", "asof_ts", "asof_rid").as[(Long, Long, Long)].collect().toSet
    val naive = l.join(r.withColumnRenamed("ts", "rts"), Seq("k"))
      .filter(col("rts") <= col("ts"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("lid").orderBy(col("rts").desc)))
      .filter(col("rk") === 1)
      .select("lid", "rts", "rid").as[(Long, Long, Long)].collect().toSet
    assert(got == naive && got.nonEmpty)
  }

  test("asof forward: nearest right at-or-after, inclusive, tolerance") {
    val out = Temporal.asofJoin(left, right, Seq("k"), "ts", Seq("rid", "rv"),
        forward = true)
      .select("lid", "asof_ts", "asof_rid")
      .as[(String, Long, Long)].collect().toSet
    assert(out == Set(
      ("l1", 100L, 10L),  // tie at ts=100 matches (inclusive)
      ("l0", 100L, 10L)), // l0 at 50 → nearest AFTER is 100
      // l2 (200) and l3 (500) have nothing after; l4's key has no rights
      s"got $out")
    // forward tolerance measures the FORWARD gap: l0's 50µs gap > 40 drops
    // it, l1's 0 gap survives
    val tol = Temporal.asofJoin(left, right, Seq("k"), "ts", Seq("rid", "rv"),
        toleranceMicros = Some(40L), forward = true)
      .select("lid").as[String].collect().toSet
    assert(tol == Set("l1"))
  }

  test("asof forward == naive per-left min-ts join on random data") {
    val l = spark.range(300).select(
      (col("id") % 7).as("k"), ((col("id") * 37) % 50).as("ts"), col("id").as("lid"))
    val r = spark.range(120).select(
      (col("id") % 7).as("k"), ((col("id") * 13) % 50 * 2).as("ts"), col("id").as("rid"))
      .groupBy("k", "ts").agg(max("rid").as("rid"))
    val got = Temporal.asofJoin(l, r, Seq("k"), "ts", Seq("rid"), forward = true)
      .select("lid", "asof_ts", "asof_rid").as[(Long, Long, Long)].collect().toSet
    val naive = l.join(r.withColumnRenamed("ts", "rts"), Seq("k"))
      .filter(col("rts") >= col("ts"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("lid").orderBy(col("rts").asc)))
      .filter(col("rk") === 1)
      .select("lid", "rts", "rid").as[(Long, Long, Long)].collect().toSet
    assert(got == naive)
  }

  test("asof left outer: unmatched lefts kept with null right columns") {
    val out = Temporal.asofJoin(left, right, Seq("k"), "ts", Seq("rid"),
      leftOuter = true)
      .select("lid", "asof_rid")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out == Map("l1" -> Some(10L), "l2" -> Some(11L),
      "l3" -> Some(13L), "l0" -> None, "l4" -> None))
    // tolerance in outer mode nulls the stale match instead of dropping
    val tol = Temporal.asofJoin(left, right, Seq("k"), "ts", Seq("rid"),
      toleranceMicros = Some(60L), leftOuter = true)
      .select("lid", "asof_rid")
      .collect().map(r => r.getString(0) -> r.isNullAt(1)).toMap
    assert(tol("l3") && !tol("l1") && !tol("l2") && tol.size == 5)
  }

  test("asof tolerance drops stale matches") {
    val out = Temporal.asofJoin(left, right, Seq("k"), "ts", Seq("rid"),
      toleranceMicros = Some(60L))
      .select("lid").as[String].collect().toSet
    // l2 matches rid=11 at gap 50 ≤ 60; l3's best is 100 µs stale ⇒ dropped
    assert(out == Set("l1", "l2"))
  }

  test("asof plan: one shuffle on the key, no join operator") {
    val out = Temporal.asofJoin(left, right, Seq("k"), "ts", Seq("rid"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asof must not plan a join:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected exactly one shuffle, got $shuffles:\n$plan")
  }

  test("range join == naive theta join, band boundaries (low exclusive, high inclusive]") {
    val l = spark.range(200).select(
      (col("id") % 5).as("k"), ((col("id") * 31) % 97).as("ts"), col("id").as("lv"))
    val r = spark.range(200).select(
      (col("id") % 5).as("k"), ((col("id") * 17) % 97).as("ts"), col("id").as("rv"))
    val got = Temporal.rangeJoin(l, r, Seq("k"), "ts", lowMicros = 0L,
      highMicros = 10L, leftValCols = Seq("lv"), rightValCols = Seq("rv"))
      .select("l_lv", "r_rv", "delta_us").as[(Long, Long, Long)].collect().toSet
    val naive = l.join(r.select(col("k"), col("ts").as("rts"), col("rv")), Seq("k"))
      .filter(col("rts") - col("ts") > 0 && col("rts") - col("ts") <= 10)
      .select(col("lv"), col("rv"), (col("rts") - col("ts")).as("d"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == naive && got.nonEmpty)
  }

  test("range join with narrow buckets still exact") {
    val l = Seq((1L, 0L, "a"), (1L, 95L, "b")).toDF("k", "ts", "lv")
    val r = Seq((1L, 100L, "x"), (1L, 101L, "y"), (1L, 200L, "z")).toDF("k", "ts", "rv")
    val got = Temporal.rangeJoin(l, r, Seq("k"), "ts", 0L, 100L,
      Seq("lv"), Seq("rv"), bucketMicros = 7L)
      .select("l_lv", "r_rv").as[(String, String)].collect().toSet
    assert(got == Set(("a", "x"), ("b", "x"), ("b", "y")))
  }

  test("rolling stats: per-key bounded frame equals the brute-force windows") {
    val fixture = Seq(
      // (key, id, ts, value) — interleaved keys, a tie on ts within key a
      ("a", 1L, 10L, 1.0), ("a", 2L, 10L, 2.0), ("a", 3L, 30L, 4.0),
      ("a", 4L, 40L, 8.0), ("b", 5L, 5L, 100.0), ("b", 6L, 50L, 200.0))
    val got = Temporal.rollingStats(
        fixture.toDF("k", "id", "ts", "v"), "k", "id", "ts", "v", window = 3)
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5, r._6))).toMap
    // brute force: sort per key by (ts, id), frame = last 3 rows inclusive
    fixture.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2))
      ordered.zipWithIndex.foreach { case ((_, id, _, _), i) =>
        val frame = ordered.slice(math.max(0, i - 2), i + 1).map(_._4)
        val (n, s, a, m) = got(id)
        def r6(d: Double) = math.round(d * 1e6) / 1e6
        assert(n == frame.size && m == frame.max, s"id $id")
        assert(s == r6(frame.sum) && a == r6(frame.sum / frame.size), s"id $id")
      }
    }
    // the tie on (a, ts=10) resolves by id: id=2's frame includes id=1
    assert(got(2L)._1 == 2 && got(2L)._2 == 3.0)
  }

  test("timeWeightedAvg: left-step hold, window clip, burst immunity") {
    // window 1000us, ms granularity degenerates (all gaps < 1000us get
    // dms=0 hold) — use windowMicros large enough for ms holds
    val win = 1000000L // 1s windows, holds in ms
    val ev = Seq(
      // key A window 0: v=1 held 100ms, then v=3 held 300ms, last drops
      ("A", 1L, 0L, 1.0), ("A", 2L, 100000L, 3.0), ("A", 3L, 400000L, 9.9),
      // key A window 1: single event -> no held span -> absent
      ("A", 4L, 1500000L, 5.0),
      // key B: a BURST of 9 quick v=100 then a long v=1 hold — plain avg
      // would say ~90, TWA must sit near 1
      ("B", 10L, 0L, 100.0), ("B", 11L, 1000L, 100.0), ("B", 12L, 2000L, 100.0),
      ("B", 13L, 3000L, 100.0), ("B", 14L, 4000L, 100.0), ("B", 15L, 5000L, 100.0),
      ("B", 16L, 6000L, 100.0), ("B", 17L, 7000L, 100.0), ("B", 18L, 8000L, 100.0),
      ("B", 19L, 9000L, 1.0), ("B", 20L, 999000L, 7.7)
    ).toDF("k", "id", "ts_us", "v")
    val r = Temporal.timeWeightedAvg(ev, "k", "id", "ts_us", "v", win)
      .collect().map(x => (x.getString(0), x.getLong(1)) -> x).toMap
    // A window 0: (100*100 + 300*300)/(100+300) cents = 250 -> 2.5
    val a0 = r(("A", 0L))
    assert(a0.getAs[Double]("twa") == 2.5 && a0.getAs[Long]("held_ms") == 400L)
    assert(!r.contains(("A", 1000000L))) // single-event window dropped
    // B: 9ms at 100.00 (9 spans of 1ms... first 9 events each held 1ms)
    // + 990ms at 1.00 -> (9*10000 + 990*100)/999 cents ≈ 1.89
    val b = r(("B", 0L))
    assert(b.getAs[Double]("twa") < 2.0 && b.getAs[Double]("twa") > 1.5,
      s"burst must not dominate: ${b.getAs[Double]("twa")}")
    assert(b.getAs[Long]("n_spans") == 10L)
  }

  test("intervalJoin: exactly-once pairs, equality with the naive join") {
    val left = Seq(
      ("u", 1L, 0L, 250L),   // spans 3 buckets at width 100
      ("u", 2L, 300L, 320L),
      ("v", 3L, 0L, 50L)
    ).toDF("k", "lid", "s", "e")
    val right = Seq(
      ("u", 10L, 200L, 400L), // overlaps BOTH u-intervals, shares 3 buckets w/ lid=1
      ("u", 11L, 260L, 290L), // overlaps neither (gap between them)
      ("v", 12L, 50L, 60L),   // touches lid=3 at the closed endpoint
      ("w", 13L, 0L, 1000L)   // key w: no left rows
    ).toDF("k", "rid", "s", "e")
    val got = Temporal.intervalJoin(left, right, Seq("k"), "s", "e",
        Seq("lid"), Seq("rid"), bucketMicros = 100L)
      .select("k", "l_lid", "r_rid", "overlap_us")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("u", 1L, 10L, 50L), ("u", 2L, 10L, 20L),
      ("v", 3L, 12L, 0L)))
    // exactly-once even when a pair shares many buckets: count == set size
    val cnt = Temporal.intervalJoin(left, right, Seq("k"), "s", "e",
      Seq("lid"), Seq("rid"), bucketMicros = 10L).count()
    assert(cnt == 3, s"duplicate pair emission: $cnt")
    // equality with the naive inequality join at several bucket widths
    val naive = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") &&
          col("l.s") <= col("r.e") && col("r.s") <= col("l.e"))
      .select(col("l.k"), col("l.lid"), col("r.rid"))
      .as[(String, Long, Long)].collect().toSet
    for (w <- Seq(7L, 100L, 1000L)) {
      val b = Temporal.intervalJoin(left, right, Seq("k"), "s", "e",
          Seq("lid"), Seq("rid"), bucketMicros = w)
        .select(col("k"), col("l_lid"), col("r_rid"))
        .as[(String, Long, Long)].collect().toSet
      assert(b == naive, s"width $w")
    }
  }

  test("rollingZscore: preceding-window baseline, warmup, exact constants") {
    val ev = (1 to 10).map(i => ("A", i.toLong, i.toLong * 10, 5.0)) ++
      Seq(("A", 11L, 110L, 105.0)) // spike after a constant baseline
    val df = ev.toDF("k", "id", "ts_us", "v")
    val r = Temporal.rollingZscore(df, "k", "id", "ts_us", "v",
        window = 5, minPeriods = 3)
      .collect().map(x => x.getLong(1) -> x).toMap
    // warmup: first 3 events have < 3 baseline rows -> no score
    (1L to 3L).foreach(i => assert(r(i).isNullAt(r(i).fieldIndex("zscore"))))
    // constant baseline: variance exactly 0 -> no zscore, never NaN/flip
    assert(r(10L).isNullAt(r(10L).fieldIndex("zscore")))
    assert(r(10L).getAs[Double]("baseline_mean") == 5.0)
    // the spike itself: baseline excludes it (still constant 5s) -> null z
    assert(r(11L).isNullAt(r(11L).fieldIndex("zscore")))
    assert(!r(11L).getAs[Boolean]("is_anomaly"))
    // varying baseline: z computed and the spike flags
    val ev2 = Seq(("B", 1L, 10L, 1.0), ("B", 2L, 20L, 2.0),
      ("B", 3L, 30L, 3.0), ("B", 4L, 40L, 2.0), ("B", 5L, 50L, 1.0),
      ("B", 6L, 60L, 50.0)).toDF("k", "id", "ts_us", "v")
    val r2 = Temporal.rollingZscore(ev2, "k", "id", "ts_us", "v",
        window = 5, minPeriods = 3)
      .collect().map(x => x.getLong(1) -> x).toMap
    assert(r2(6L).getAs[Boolean]("is_anomaly"))
    assert(r2(6L).getAs[Double]("zscore") > 3.0)
    assert(r2(5L).getAs[Double]("baseline_mean") == 2.0) // mean of 1,2,3,2
  }

  test("resampleFfill: grid densifies, LOCF fills, last-in-bucket wins") {
    // step 10: A has buckets 0 (two events) and 3; B a single bucket
    val ev = Seq(
      ("A", 1L, 1.0), ("A", 7L, 2.0),   // bucket 0: last ts wins -> 2.0
      ("A", 35L, 9.0),                  // bucket 3; buckets 1, 2 are gaps
      ("B", 100L, 5.0)                  // single bucket: no gaps at all
    ).toDF("k", "ts_us", "v")
    val r = Temporal.resampleFfill(ev, "k", "ts_us", "v", stepMicros = 10L)
      .collect().map(x => (x.getString(0), x.getLong(1)) ->
        ((x.getDouble(2), x.getBoolean(3)))).toMap
    assert(r.size == 5)
    assert(r(("A", 0L)) == ((2.0, false)))
    assert(r(("A", 10L)) == ((2.0, true)))   // gap carries bucket 0's value
    assert(r(("A", 20L)) == ((2.0, true)))
    assert(r(("A", 30L)) == ((9.0, false)))
    assert(r(("B", 100L)) == ((5.0, false)))
    // same-timestamp tie inside a bucket: struct (ts, v) max -> larger v
    val tie = Seq(("A", 5L, 1.0), ("A", 5L, 3.0)).toDF("k", "ts_us", "v")
    val t = Temporal.resampleFfill(tie, "k", "ts_us", "v", 10L).collect()
    assert(t.length == 1 && t(0).getDouble(2) == 3.0)
  }

  test("range join plan: bucketed equi-join, no cartesian/BNLJ") {
    val l = spark.range(50).select((col("id") % 3).as("k"), col("id").as("ts"), col("id").as("lv"))
    val plan = Temporal.rangeJoin(l, l.withColumnRenamed("lv", "rv"), Seq("k"),
      "ts", 0L, 10L, Seq("lv"), Seq("rv"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join must stay an equi-join:\n$plan")
  }
}
