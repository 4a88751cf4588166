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
}
