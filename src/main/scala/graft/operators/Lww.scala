package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Last-write-wins compaction of a change stream (SURVEY §2.8 ST2–ST4).
  *
  * Reference semantics (`crates/vector-store/src/table/mod.rs`):
  *  - newer timestamp wins; stale/equal-timestamp events are no-ops
  *    (`is_newer_timestamp` check at mod.rs:905-910) — so for a batch replay
  *    the winner per key is the *first-arriving* event among those with the
  *    maximum timestamp (later equal-ts events are ignored);
  *  - a DELETE is a tombstone (mod.rs:616-675 compare_timestamps);
  *  - an UPSERT whose target value is missing/null is forced into a tombstone
  *    (mod.rs:912-915, update_index `values.is_none()` branch);
  *  - a row whose partition key column is missing is forced into a tombstone
  *    (UpdateWork ProcessingPartition::MissingKey, mod.rs:849-858);
  *  - partition movement (ST4) falls out of recomputing partition membership
  *    from the compacted state.
  *
  * Scale design: implemented as `groupBy(pk).agg(max_by(payload, ordKey))`,
  * NOT a window — `max_by` is an ordinary aggregate, so Spark runs a
  * map-side partial aggregation before the shuffle. With many updates per
  * key (the CDC steady state) the shuffle carries one row per key per map
  * task instead of every event. A window/`row_number` plan would shuffle the
  * full event set and sort each partition.
  */
object Lww {

  val TombstoneCol = "_tombstone"
  val TsCol = "_lww_ts"

  /** Compact a change-event DataFrame to one row per primary key.
    *
    * PERF: project `events` down to the columns you actually need FIRST —
    * the payload struct inside `max_by` is opaque to Catalyst column
    * pruning, so every column present rides through every comparison.
    * Carrying an unused fat text column through the aggregate measured
    * 10-20× on the events fixture (GC churn, not compute).
    *
    * @param events    change events
    * @param pkCols    primary-key columns
    * @param tsCol     writetime column (bigger = newer)
    * @param opCol     optional operation column; value `DELETE` ⇒ tombstone
    * @param targetCol optional indexed-target column; null value ⇒ tombstone
    * @param seqCol    optional arrival-sequence column for reference-exact
    *                  equal-timestamp behavior (first arrival wins). Without
    *                  it, equal-ts winners are arbitrary (but stable per run).
    * @return one row per pk: original payload columns + boolean
    *         [[TombstoneCol]] + [[TsCol]] (winning timestamp)
    */
  def compactState(
      events: DataFrame,
      pkCols: Seq[String],
      tsCol: String,
      opCol: Option[String] = None,
      targetCol: Option[String] = None,
      seqCol: Option[String] = None): DataFrame = {
    val payloadCols = events.columns.toSeq
    val tombstone: Column = {
      // coalesce: a NULL op must not three-valued-null the predicate — an
      // event with a missing op but a live payload is an upsert, not a delete
      val opTomb = opCol.map(c => coalesce(upper(col(c)) === "DELETE", lit(false)))
        .getOrElse(lit(false))
      val nullTomb = targetCol.map(c => col(c).isNull).getOrElse(lit(false))
      opTomb || nullTomb
    }
    val payload = struct(payloadCols.map(col) :+ tombstone.as(TombstoneCol): _*)
    // Order key: max ts first; among equal ts the FIRST arrival wins, i.e.
    // max of (ts, -seq).
    val ordKey = seqCol match {
      case Some(s) => struct(col(tsCol), (lit(-1L) * col(s)).as("_negseq"))
      case None => struct(col(tsCol))
    }
    events
      .groupBy(pkCols.map(col): _*)
      .agg(max_by(payload, ordKey).as("_winner"))
      .select(
        payloadCols.filterNot(pkCols.contains).map(c => col(s"_winner.$c").as(c)) ++
          pkCols.map(col) :+
          col(s"_winner.$TombstoneCol").as(TombstoneCol) :+
          col(s"_winner.$tsCol").as(TsCol): _*)
  }

  /** Live view: compacted state minus tombstoned rows (what the index serves). */
  def compactLive(
      events: DataFrame,
      pkCols: Seq[String],
      tsCol: String,
      opCol: Option[String] = None,
      targetCol: Option[String] = None,
      seqCol: Option[String] = None): DataFrame =
    compactState(events, pkCols, tsCol, opCol, targetCol, seqCol)
      .filter(!col(TombstoneCol))
      .drop(TombstoneCol)

  /** Merge a change batch into a base snapshot (the `foreachBatch` merge of
    * SURVEY §3.3 step 4). Both sides must share the payload schema; base rows
    * carry their writetime in `tsCol`. Idempotent and insensitive to event
    * re-delivery (ST3): replaying any subset of already-applied changes is a
    * no-op.
    *
    * The base snapshot keeps tombstones so that a late-arriving stale upsert
    * cannot resurrect a deleted row; compact periodically by dropping
    * tombstones older than the CDC safety window (the reference's "wide
    * reader" interval, db_cdc/actor.rs:44-46).
    */
  def applyChanges(
      baseState: DataFrame,
      events: DataFrame,
      pkCols: Seq[String],
      tsCol: String,
      opCol: Option[String] = None,
      targetCol: Option[String] = None,
      seqCol: Option[String] = None): DataFrame = {
    val changes = compactState(events, pkCols, tsCol, opCol, targetCol, seqCol)
    val aligned = baseState.select(changes.columns.map(col): _*)
    // LWW between the two states: base rows win ties (they arrived first).
    aligned.withColumn("_src", lit(0))
      .unionByName(changes.withColumn("_src", lit(1)))
      .groupBy(pkCols.map(col): _*)
      .agg(max_by(
        struct(changes.columns.filterNot(pkCols.contains).map(col): _*),
        struct(col(TsCol), (lit(-1) * col("_src")).as("_negsrc"))).as("_w"))
      .select(pkCols.map(col) ++
        changes.columns.filterNot(pkCols.contains).map(c => col(s"_w.$c").as(c)): _*)
  }

  /** Per-partition live sizes (SURVEY §2.4 A3, table/mod.rs:118-174);
    * empty partitions simply don't appear (partition removal). */
  def partitionSizes(liveState: DataFrame, partitionCols: Seq[String]): DataFrame =
    liveState.groupBy(partitionCols.map(col): _*).agg(count(lit(1)).as("size"))
}
