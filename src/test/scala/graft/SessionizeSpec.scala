package graft

import graft.operators.Sessionize
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  // (user, ts_us, seq, value)
  private lazy val events = Seq(
    (1L, 0L, 0L, 1.0),
    (1L, 100L, 1L, 2.0), // same session (gap 100 ≤ 1000)
    (1L, 2000L, 2L, 3.0), // gap 1900 > 1000 ⇒ new session
    (2L, 50L, 3L, 4.0))
    .toDF("user_id", "ts", "seq", "value")

  test("gap splits sessions; ids are 0-based per key") {
    val s = Sessionize.withSessionId(events, "user_id", "ts", gapMicros = 1000L, "seq")
      .select("user_id", "ts", "session_id").as[(Long, Long, Long)].collect().toSet
    assert(s == Set((1L, 0L, 0L), (1L, 100L, 0L), (1L, 2000L, 1L), (2L, 50L, 0L)))
  }

  test("session summary bounds, counts, sums") {
    val s = Sessionize.sessions(events, "user_id", "ts", 1000L, "seq", Some("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    val s10 = s((1L, 0L))
    assert(s10.getAs[Long]("session_start") == 0L)
    assert(s10.getAs[Long]("session_end") == 100L)
    assert(s10.getAs[Long]("n_events") == 2L)
    assert(s10.getAs[Double]("sum_value") == 3.0)
    assert(s((1L, 1L)).getAs[Long]("n_events") == 1L)
  }

  test("exactly-touching gap boundary stays in the session (> not >=)") {
    val e = Seq((1L, 0L, 0L, 0.0), (1L, 1000L, 1L, 0.0)).toDF("user_id", "ts", "seq", "value")
    val n = Sessionize.sessions(e, "user_id", "ts", 1000L, "seq").count()
    assert(n == 1)
  }

  test("sessionsStream (session_window) == batch gaps-and-islands, incl. exact boundaries") {
    // deltas are multiples of 100 s and the gap is exactly 100 s, so the
    // grid is FULL of exact-boundary pairs — the case where session_window's
    // overlap-merge and the batch > rule disagree without the +1µs alignment
    val ev = spark.range(400).select(
      (col("id") % 5).as("user_id"),
      (lit(1700000000L) + (col("id") * 37 % 20) * 100).cast("timestamp").as("ts"),
      col("id").as("seq"), (col("id") % 7).cast("double").as("value"))
    val gapUs = 100L * 1000000L
    val viaWindow = Sessionize.sessionsStream(ev, "user_id", "ts", gapUs, Some("value"))
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    val viaIslands = Sessionize.sessions(
      ev.withColumn("ts_us", unix_micros(col("ts"))),
      "user_id", "ts_us", gapUs, "seq", Some("value"))
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(viaWindow == viaIslands && viaWindow.nonEmpty)
  }

  test("sessionsStream over a real stream: closed sessions emitted once, == batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)](spark)
    val gapUs = 60L * 1000000L
    val out = Sessionize.sessionsStream(
      mem.toDF().toDF("user_id", "ts", "value")
        .withWatermark("ts", "0 seconds"),
      "user_id", "ts", gapUs, Some("value"))
    val name = s"sess_out_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    def t(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    try {
      mem.addData((1L, t(0), 1.0), (1L, t(30), 2.0), (2L, t(10), 5.0))
      q.processAllAvailable()
      mem.addData((1L, t(7200), 9.0)) // 2 h later: closes every earlier session
      q.processAllAvailable()
      mem.addData((99L, t(90000), 0.0)) // sentinel pushes the watermark past it
      q.processAllAvailable()
      val got = spark.table(name)
        .select("user_id", "session_start", "session_end", "n_events", "sum_value")
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      val us = 1700000000000000L
      assert(got == Set(
        (1L, us, us + 30L * 1000000L, 2L, 3.0), // merged pair, emitted once
        (2L, us + 10L * 1000000L, us + 10L * 1000000L, 1L, 5.0),
        (1L, us + 7200L * 1000000L, us + 7200L * 1000000L, 1L, 9.0)))
    } finally q.stop()
  }

  test("funnel: strict in-order progression, stalls keep partial stages") {
    import spark.implicits._
    val ev = Seq(
      // user 1 completes in order
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // user 2: purchase BEFORE the click — must not complete
      (2L, 10L, "view"), (2L, 15L, "purchase"), (2L, 20L, "click"),
      // user 3: stalls after view
      (3L, 10L, "view"),
      // user 4: never enters (no view) — absent from the output
      (4L, 10L, "click"), (4L, 20L, "purchase"),
      // user 5: multiple candidates — earliest valid each stage
      (5L, 10L, "view"), (5L, 5L, "click"), (5L, 12L, "click"),
      (5L, 40L, "click"), (5L, 13L, "purchase")
    ).toDF("user_id", "ts_us", "event_type")
    val r = graft.operators.Sessionize
      .funnel(ev, "user_id", "ts_us", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r.keySet == Set(1L, 2L, 3L, 5L))
    assert(r(1L).getAs[Boolean]("completed") &&
      r(1L).getAs[Long]("funnel_micros") == 20L)
    assert(!r(2L).getAs[Boolean]("completed") &&
      r(2L).getAs[Long]("t_2") == 20L && r(2L).isNullAt(r(2L).fieldIndex("t_3")))
    assert(!r(3L).getAs[Boolean]("completed") &&
      r(3L).isNullAt(r(3L).fieldIndex("t_2")))
    // user 5: click at 5 is before the view and must not count; click at
    // 12 starts the chain; purchase at 13 completes it
    assert(r(5L).getAs[Long]("t_2") == 12L &&
      r(5L).getAs[Long]("t_3") == 13L && r(5L).getAs[Boolean]("completed"))
  }

  test("cohortRetention: triangle counts by first-activity period") {
    import spark.implicits._
    val p = 100L // period
    val ev = Seq(
      (1L, 10L), (1L, 110L), (1L, 310L),  // cohort 0, active 0/1/3
      (2L, 50L), (2L, 120L),              // cohort 0, active 0/1
      (3L, 150L), (3L, 160L), (3L, 250L)  // cohort 1, active 1(x2)/2
    ).toDF("user_id", "ts_us")
    val r = graft.operators.Sessionize
      .cohortRetention(ev, "user_id", "ts_us", p)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(r == Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 2L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L))
  }
}
