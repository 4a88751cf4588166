package graft.sources

import graft.operators.Lww
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DynamoDB-shaped item write operations over an Alternator `:attrs` table
  * (SURVEY §1.3; validator suite crates/validator/src/alternator/ —
  * put_item.rs, update_item.rs, delete_item.rs, batch_write_item.rs: every
  * write through the DynamoDB API must be reflected by the vector index).
  *
  * State shape: one row per item — pk columns + [[AttrsCol]]
  * (`map<string, binary>`, each value a tagged Alternator blob) + writetime.
  * Writes are LWW change events merged with [[Lww.applyChanges]], exactly
  * like the CQL path — the Alternator API is a different front door to the
  * same engine (the reference routes both through the same Table cache).
  *
  * Scale: item ops are DataFrames; merges are the bucketed LWW shape. A
  * whole batch_write_item call is ONE change-set DataFrame — per-batch cost
  * follows the snapshot-merge contract, not per-item round trips.
  */
object AlternatorItems {

  val AttrsCol = ":attrs"
  val TsCol = "_wt"
  val SeqCol = "_seq"
  val OpCol = "_op"

  /** put_item / batch_write_item PutRequest: whole-item replace.
    * @param items (pk, attrs) rows */
  def putEvents(items: DataFrame, pkCol: String, ts: Long, seq0: Long = 0): DataFrame =
    items.select(col(pkCol), col(AttrsCol),
      lit("UPSERT").as(OpCol), lit(ts).as(TsCol),
      (monotonically_increasing_id() + seq0).as(SeqCol))

  /** delete_item / batch_write_item DeleteRequest: tombstone by pk. */
  def deleteEvents(pks: DataFrame, pkCol: String, ts: Long, seq0: Long = 0): DataFrame =
    pks.select(col(pkCol),
      lit(null).cast("map<string,binary>").as(AttrsCol),
      lit("DELETE").as(OpCol), lit(ts).as(TsCol),
      (monotonically_increasing_id() + seq0).as(SeqCol))

  /** update_item: per-attribute upsert — attributes present in the update
    * override, absent ones keep their current value; a missing item is
    * created (DynamoDB semantics). Produces whole-item put events against
    * the CURRENT state (read-modify-write at the item level, which is what
    * Alternator's UpdateItem compiles to on the CQL side). */
  def updateEvents(
      state: DataFrame, updates: DataFrame, pkCol: String,
      ts: Long, seq0: Long = 0,
      removeAttrs: Seq[String] = Nil): DataFrame = {
    val emptyAttrs = map().cast("map<string,binary>")
    val setMerged = map_zip_with(
      coalesce(col("_cur"), emptyAttrs),
      coalesce(col(AttrsCol), emptyAttrs),
      (_, oldV, newV) => coalesce(newV, oldV))
    // REMOVE actions drop attributes (update_item.rs REMOVE cases); SET and
    // REMOVE target disjoint attributes, as in DynamoDB
    val withRemoves =
      if (removeAttrs.isEmpty) setMerged
      else map_filter(setMerged, (k, _) => !k.isInCollection(removeAttrs))
    val merged = updates.alias("u")
      .join(state.select(col(pkCol), col(AttrsCol).as("_cur")), Seq(pkCol), "left")
      .select(col(pkCol), withRemoves.as(AttrsCol))
    putEvents(merged, pkCol, ts, seq0)
  }

  /** Apply a change-set to the item state (LWW: newer writetime wins, equal
    * writetime first-arrival wins — same rules as the CQL/CDC path). */
  def merge(state: DataFrame, events: DataFrame, pkCol: String): DataFrame =
    Lww.applyChanges(state, events, Seq(pkCol), TsCol,
      opCol = Some(OpCol), targetCol = Some(AttrsCol), seqCol = Some(SeqCol))

  /** Bootstrap state from an initial put set (no prior state). */
  def init(events: DataFrame, pkCol: String): DataFrame =
    Lww.compactState(events, Seq(pkCol), TsCol,
      opCol = Some(OpCol), targetCol = Some(AttrsCol), seqCol = Some(SeqCol))

  /** Decode a DynamoDB numeric (N) attribute stored as UTF-8 decimal text. */
  def numericAttr(attrsCol: org.apache.spark.sql.Column, name: String): org.apache.spark.sql.Column =
    element_at(attrsCol, name).cast("string").cast("double")

  /** TTL expiration (alternator/ttl.rs:59-113): items whose TTL attribute
    * holds an epoch ≤ `nowEpochS` become tombstone events — the analogue of
    * DynamoDB's reaper emitting CDC tombstones that the index consumes.
    * Items without the attribute never expire. */
  def expireTtl(
      state: DataFrame, pkCol: String, ttlAttr: String,
      nowEpochS: Long, ts: Long): DataFrame = {
    val ttl = numericAttr(col(AttrsCol), ttlAttr)
    val expired = state
      .filter(!col(Lww.TombstoneCol) && ttl.isNotNull && ttl <= nowEpochS)
      .select(col(pkCol))
    merge(state, deleteEvents(expired, pkCol, ts), pkCol)
  }

  /** The vector-index projection of the item state: live rows with the
    * target attribute decoded (malformed blobs decode to null and are
    * dropped by the ANN null filter — the reference's per-row error
    * handling, never a job failure). */
  def indexProjection(state: DataFrame, pkCol: String, targetAttr: String): DataFrame =
    state
      .filter(!col(Lww.TombstoneCol))
      .select(col(pkCol),
        Alternator.scanProjection(col(AttrsCol), targetAttr).as("embedding"))
}
