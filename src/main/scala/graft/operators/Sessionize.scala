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
}
