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
}
