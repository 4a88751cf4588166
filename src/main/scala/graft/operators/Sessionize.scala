package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization (training-pipeline operator; the reference has no
  * windowed aggregation at all — SURVEY §2.8 ST7 — so this is part of the
  * beyond-the-reference surface).
  *
  * Batch formulation is gaps-and-islands: a new session starts when the gap
  * to the previous event of the same key exceeds `gapMicros`; session_id =
  * running count of starts. Pure integer arithmetic over a per-key window —
  * one shuffle by key, exactly reproducible in SQL (the oracle mirrors it).
  * The streaming twin is `groupBy(session_window(...))` which implements the
  * same merge semantics incrementally.
  */
object Sessionize {

  /** Assign a session index per (key, event): 0-based, ordered by time. */
  def withSessionId(
      df: DataFrame, keyCol: String, tsCol: String,
      gapMicros: Long, seqCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(seqCol))
    val prev = lag(col(tsCol), 1).over(w)
    val isStart = when(prev.isNull || col(tsCol) - prev > gapMicros, 1).otherwise(0)
    df.withColumn("_start", isStart)
      .withColumn("session_id",
        sum(col("_start")).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
      .drop("_start")
  }

  /** Streaming twin of [[sessions]] via Spark's native
    * `session_window` (incremental merge semantics; works identically in
    * batch mode, which is what the equivalence spec pins). `tsCol` must be
    * a TimestampType column here — streaming needs real event-time for the
    * watermark the caller attaches.
    *
    * Boundary alignment: [[sessions]] keeps an event in the session when
    * the gap is `<= gapMicros` (strict `>` starts a new one);
    * `session_window` merges only on OVERLAP, i.e. strict `<` gap. Passing
    * `gapMicros + 1` µs as the window's gap duration makes the two
    * definitions agree at every integer-microsecond timestamp.
    *
    * Output: key, session_start/session_end (epoch µs of first/last event —
    * NOT the window's gap-extended end), n_events, optional sum_value —
    * the same shape and arithmetic as [[sessions]] minus the per-key
    * session index (a running count is inherently cross-batch; the
    * (key, session_start) pair is the streaming-stable session identity).
    */
  def sessionsStream(
      df: DataFrame, keyCol: String, tsCol: String, gapMicros: Long,
      valueCol: Option[String] = None): DataFrame = {
    val gapExpr = s"INTERVAL ${gapMicros + 1} MICROSECOND"
    val tsUs = unix_micros(col(tsCol))
    val aggs = Seq(
      min(tsUs).as("session_start"),
      max(tsUs).as("session_end"),
      count(lit(1)).as("n_events")) ++
      valueCol.map(v => round(sum(col(v).cast("decimal(18,6)")), 4)
        .cast("double").as("sum_value"))
    df.groupBy(col(keyCol), session_window(col(tsCol), gapExpr).as("_w"))
      .agg(aggs.head, aggs.tail: _*)
      .drop("_w")
  }

  /** Per-session summary: bounds, event count, value sum. */
  def sessions(
      df: DataFrame, keyCol: String, tsCol: String,
      gapMicros: Long, seqCol: String,
      valueCol: Option[String] = None): DataFrame = {
    val withIds = withSessionId(df, keyCol, tsCol, gapMicros, seqCol)
    val aggs = Seq(
      min(col(tsCol)).as("session_start"),
      max(col(tsCol)).as("session_end"),
      count(lit(1)).as("n_events")) ++
      valueCol.map(v => round(sum(col(v).cast("decimal(18,6)")), 4)
        .cast("double").as("sum_value"))
    withIds.groupBy(col(keyCol), col("session_id"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Ordered funnel analysis: per key, the earliest time of stage 1, then
    * the earliest stage-2 event STRICTLY AFTER it, then the earliest
    * stage-3 event strictly after that, … — the standard "did the user
    * progress through the funnel in order" measure (a plain per-stage min
    * ignores order and overcounts). Emits `t_1..t_n` (null once the key
    * falls out), `completed`, and the end-to-end `funnel_micros`.
    *
    * Scale shape: one narrow (key, ts) aggregate for stage 1, then per
    * stage one key equi-join + min aggregate — no window, no
    * collect_list of event history, nothing driver-side; every
    * intermediate is one row per surviving key. Timestamps are plain
    * numeric micros (engine-replayable). */
  def funnel(
      df: DataFrame, keyCol: String, tsCol: String, typeCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, s"a funnel needs >= 2 stages, got $stages")
    var acc = df.filter(col(typeCol) === stages.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as("t_1"))
    stages.tail.zipWithIndex.foreach { case (stage, i) =>
      val prev = s"t_${i + 1}"
      val cur = s"t_${i + 2}"
      val nxt = acc.select(col(keyCol), col(prev))
        .join(df.filter(col(typeCol) === stage)
          .select(col(keyCol), col(tsCol).as("_ts")), keyCol)
        .filter(col("_ts") > col(prev))
        .groupBy(col(keyCol)).agg(min(col("_ts")).as(cur))
      acc = acc.join(nxt, Seq(keyCol), "left")
    }
    val tn = col(s"t_${stages.size}")
    acc.withColumn("completed", tn.isNotNull)
      .withColumn("funnel_micros", when(tn.isNotNull, tn - col("t_1")))
  }

  /** Cohort retention: keys bucketed by their FIRST-activity period
    * (the cohort), then distinct-key activity counted per (cohort,
    * periods-since-cohort offset) — the classic retention triangle.
    * Two narrow aggregates + one key equi-join; periods are integer
    * epoch buckets of `periodMicros` so the arithmetic replays
    * anywhere. */
  def cohortRetention(
      df: DataFrame, keyCol: String, tsCol: String,
      periodMicros: Long): DataFrame = {
    require(periodMicros >= 1)
    val ev = df.select(col(keyCol),
      expr(s"$tsCol div ${periodMicros}L").as("_p"))
    val first = ev.groupBy(col(keyCol)).agg(min(col("_p")).as("_c"))
    ev.join(first, keyCol)
      .groupBy(col("_c").as("cohort_period"),
        (col("_p") - col("_c")).as("period_offset"))
      .agg(countDistinct(col(keyCol)).as("n_active"))
  }
}
