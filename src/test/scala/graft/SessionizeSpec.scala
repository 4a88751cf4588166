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
}
