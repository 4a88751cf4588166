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
