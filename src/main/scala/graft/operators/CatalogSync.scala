package graft.operators

import graft.operators.Catalog._

/** Index-discovery reconciliation (SURVEY §2 S6): the Spark analogue of
  * `monitor_indexes` — re-read the desired index definitions, set-diff
  * against the live catalog, add the new, drop the removed
  * (monitor_indexes.rs:112-134, diff at 330-338; schema-version gate at
  * 155-178 becomes the `version` fast-path below).
  */
object CatalogSync {

  final case class SyncResult(added: Seq[IndexKey], removed: Seq[IndexKey])

  /** One reconciliation tick. `definitionsVersion` mirrors the reference's
    * group0 schema-version check: when unchanged, the tick is a no-op
    * without touching definitions at all. Returns what changed. */
  def reconcile(
      engine: Engine,
      definitions: Seq[IndexMetadata],
      frames: IndexKey => org.apache.spark.sql.DataFrame,
      lastVersion: Option[String],
      definitionsVersion: String): (SyncResult, Option[String]) = {
    if (lastVersion.contains(definitionsVersion))
      return (SyncResult(Nil, Nil), lastVersion)

    val desired = definitions.map(m => m.key -> m).toMap
    val current = engine.catalog.list.map(_.meta.key).toSet

    val toAdd = (desired.keySet -- current).toSeq.sortBy(k => (k.keyspace, k.index))
    val toRemove = (current -- desired.keySet).toSeq.sortBy(k => (k.keyspace, k.index))

    toAdd.foreach { k =>
      // new indexes start building (Initializing → FullScanning → Serving;
      // node_state.rs:21-43) — the backfill job flips them to Serving
      engine.addIndex(desired(k), frames(k), status = FullScanning, progressPct = 0.0)
    }
    toRemove.foreach(engine.catalog.remove)

    (SyncResult(toAdd, toRemove), Some(definitionsVersion))
  }
}
