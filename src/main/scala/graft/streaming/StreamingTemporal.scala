package graft.streaming

import graft.operators.Temporal
import org.apache.spark.sql.DataFrame

/** Streaming temporal enrichment: the continuous analogue of
  * [[graft.operators.Temporal.asofJoin]] — each micro-batch of left events
  * enriches against a fixed (or maintained-store) right side.
  *
  * Because the right side does not change between batches, the per-batch
  * as-of of a left row equals its as-of in the one-shot batch join over
  * the whole stream — so the accumulated epoch log equals the batch
  * operator over all delivered left rows (pinned in StreamingSpec), and
  * replaying a batch overwrites its epoch with identical rows (idempotent
  * sink, the same contract as every epoch-partitioned sink here).
  *
  * Scale notes: the union+window merge runs per micro-batch over
  * (batch ∪ right-rows-of-the-batch's-keys); with the right side served
  * from a key-partitioned store, each batch reads only the partitions its
  * keys touch — the streaming cost is O(batch + touched right rows), not
  * O(right). */
object StreamingTemporal {

  /** foreachBatch body: as-of join the micro-batch against `right`, write
    * the enriched rows to `outPath/epoch=N` (overwrite ⇒ replay-idempotent).
    * Parameters mirror [[Temporal.asofJoin]]. */
  def asofBatch(
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      rightValCols: Seq[String],
      outPath: String,
      toleranceMicros: Option[Long] = None,
      leftOuter: Boolean = false): (DataFrame, Long) => Unit =
    (batch: DataFrame, epoch: Long) =>
      Temporal.asofJoin(batch, right, keyCols, tsCol, rightValCols,
          toleranceMicros = toleranceMicros, leftOuter = leftOuter)
        .write.mode("overwrite").parquet(s"$outPath/epoch=$epoch")

  /** foreachBatch body: band-join the micro-batch (as the left side)
    * against `right`, same fixed-right contract and epoch-overwrite sink as
    * [[asofBatch]] — each left row's band pairs depend only on the right
    * side, so the accumulated log equals the batch [[Temporal.rangeJoin]]
    * over all delivered left rows. */
  def rangeBatch(
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      lowMicros: Long,
      highMicros: Long,
      leftValCols: Seq[String],
      rightValCols: Seq[String],
      outPath: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, epoch: Long) =>
      Temporal.rangeJoin(batch, right, keyCols, tsCol, lowMicros, highMicros,
          leftValCols, rightValCols)
        .write.mode("overwrite").parquet(s"$outPath/epoch=$epoch")

  /** One scored event out of [[zscoreStream]]. */
  case class ZscoreEvent(key: Long, id: Long, ts: Long, value: Double,
      zscore: Option[Double], isAnomaly: Boolean)

  /** Per-key baseline ring buffer for [[zscoreStream]]: the last ≤ window
    * cent-scaled values in arrival order. */
  case class ZState(key: Long, recent: Seq[Long])

  /** One raw metric event for [[zscoreStream]]. */
  case class MetricEvent(key: Long, id: Long, ts: Long, value: Double)

  /** Continuous rolling z-score — the streaming twin of
    * [[graft.operators.Temporal.rollingZscore]]: per-key state is a ring
    * buffer of the last `window` scaled values (window·8 bytes per key,
    * no unbounded history); each event scores against the buffer BEFORE
    * being appended (self-exclusion, same as the batch frame ending at
    * `-1 PRECEDING`). Append-mode: every event emits exactly once,
    * scored or warming up.
    *
    * Under per-key in-order delivery within the watermark the emitted
    * scores equal the batch operator row for row (StreamingSpec pins the
    * equivalence across batch splits) — the same integer-exactness
    * argument: sums of exact scaled integers don't care where the
    * micro-batch boundary fell. */
  def zscoreStream(
      events: org.apache.spark.sql.Dataset[MetricEvent],
      window: Int, minPeriods: Int = 5, threshold: Double = 3.0,
      scale: Long = 100): org.apache.spark.sql.Dataset[ZscoreEvent] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(window >= minPeriods && minPeriods >= 2)
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[MetricEvent], state: GroupState[ZState]) =>
          var buf = state.getOption.map(_.recent.toVector).getOrElse(Vector.empty)
          val out = it.toSeq.sortBy(e => (e.ts, e.id)).map { ev =>
            // BigDecimal.valueOf (the shortest-decimal string), matching
            // Spark's round() so the batch equivalence is bit-exact
            val c = BigDecimal(java.math.BigDecimal.valueOf(ev.value * scale))
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
            val scored = if (buf.size >= minPeriods) {
              val n = buf.size.toDouble
              val mu = buf.sum / n
              val variance = math.max(
                buf.map(v => v.toDouble * v).sum / n - mu * mu, 0.0)
              val sd = math.sqrt(variance)
              if (sd > 0) {
                val z = BigDecimal(java.math.BigDecimal.valueOf((c - mu) / sd))
                  .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
                Some(z)
              } else None
            } else None
            buf = (buf :+ c).takeRight(window)
            ZscoreEvent(ev.key, ev.id, ev.ts, ev.value, scored,
              scored.exists(z => math.abs(z) > threshold))
          }
          state.update(ZState(key, buf))
          out.iterator
      }
  }

  /** One funnel event: key, event-time micros, stage label. */
  case class FunnelEvent(key: Long, ts: Long, stage: String)

  /** Per-key funnel state: earliest valid timestamp per stage (parallel
    * to the stage list; -1 = not reached). */
  case class FunnelState(key: Long, times: Seq[Long])

  /** Continuous ordered-funnel tracking — the streaming twin of
    * [[graft.operators.Sessionize.funnel]]: per-key state holds the
    * earliest valid timestamp per stage; an event advances stage i+1 only
    * if stage i is reached and the event is STRICTLY later. Update-mode:
    * emits the key's state whenever it advances.
    *
    * Funnel advancement is monotone (times only ever get set, never
    * improved retroactively), so under per-key in-order delivery within
    * the watermark the final state equals the batch operator over the
    * whole stream (StreamingSpec pins the equivalence). Late events that
    * would have BEATEN an already-recorded stage time are a reordering
    * violation the watermark is sized to prevent — same contract as the
    * LWW stream. State is stages·8 bytes per key, no event history. */
  def funnelStream(
      events: org.apache.spark.sql.Dataset[FunnelEvent],
      stages: Seq[String]): org.apache.spark.sql.Dataset[FunnelState] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(stages.size >= 2)
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          var times = state.getOption.map(_.times.toArray)
            .getOrElse(Array.fill(stages.size)(-1L))
          var changed = false
          // (ts asc) within the batch so a batch's own events apply in order
          it.toSeq.sortBy(_.ts).foreach { ev =>
            val i = stages.indexOf(ev.stage)
            if (i == 0 && times(0) < 0) { times(0) = ev.ts; changed = true }
            else if (i > 0 && times(i) < 0 && times(i - 1) >= 0 &&
              ev.ts > times(i - 1)) { times(i) = ev.ts; changed = true }
          }
          if (changed) {
            val next = FunnelState(key, times.toSeq)
            state.update(next)
            Iterator(next)
          } else Iterator.empty
      }
  }
}
