package graft.operators

import graft.functions.VectorFunctions.Space

/** Index metadata, status machine, routing groups and best-index scoring —
  * the pure-Scala layer above Catalyst (SURVEY §4 O3).
  *
  * Reference: `crates/vector-store/src/lib.rs:592-680` (metadata/options),
  * `crates/vector-store/src/indexes.rs:35-56` (NeedsFiltering ordering),
  * `indexes.rs:193-238` (score_index), `indexes.rs:360-431` (best_index),
  * `crates/vector-store/src/node_state.rs:21-43` (status machine).
  */
object Catalog {

  final case class IndexKey(keyspace: String, index: String)

  /** Routing group: indexes over the same (keyspace, table, target column)
    * serve each other's queries (`indexes.rs:63-78`). */
  final case class RoutingGroupKey(keyspace: String, table: String, targetColumn: String)

  sealed trait Partitioning
  case object Global extends Partitioning
  /** One sub-index per distinct value tuple of `partitionColumns`. */
  final case class Local(partitionColumns: Seq[String]) extends Partitioning

  sealed trait Quantization
  case object F32 extends Quantization
  case object F16 extends Quantization
  case object BF16 extends Quantization
  case object I8 extends Quantization
  /** Sign-bit packing, forces the Hamming metric
    * (`vs_index/usearch.rs:450-464`). */
  case object B1 extends Quantization

  /** HNSW-ish knobs kept for API parity; the Spark engine's exact path does
    * not need them, the approximate path maps expansionSearch → oversampling. */
  final case class IndexOptionsVs(
      dims: Int,
      space: Space,
      quantization: Quantization = F32,
      connectivity: Int = 16,       // lib.rs:394-398
      expansionAdd: Int = 128,      // lib.rs:414-418
      expansionSearch: Int = 64)    // lib.rs:434-438

  final case class IndexOptionsFts()

  sealed trait IndexKind
  final case class Vs(options: IndexOptionsVs) extends IndexKind
  final case class Fts(options: IndexOptionsFts) extends IndexKind

  sealed trait IndexStatus
  case object Initializing extends IndexStatus
  case object FullScanning extends IndexStatus
  case object Serving extends IndexStatus

  final case class IndexMetadata(
      keyspace: String,
      index: String,
      table: String,
      targetColumn: String,
      primaryKeyColumns: Seq[String],
      partitioning: Partitioning = Global,
      filteringColumns: Seq[String] = Nil,
      version: Long = 0L,
      kind: IndexKind) {
    def key: IndexKey = IndexKey(keyspace, index)
    def routingGroup: RoutingGroupKey = RoutingGroupKey(keyspace, table, targetColumn)
    /** Full set of columns a restriction may reference: pk ++ local partition
      * ++ declared filtering columns (`indexes.rs:162-169`). */
    def allFilteringColumns: Set[String] = {
      val partCols = partitioning match {
        case Local(cs) => cs
        case Global => Nil
      }
      (primaryKeyColumns ++ partCols ++ filteringColumns).toSet
    }
  }

  /** How many restriction columns the index leaves to residual filtering.
    * Ordering: No > Yes(a) with fewer uncovered better (`indexes.rs:44-58`). */
  sealed trait NeedsFiltering
  case object NoFiltering extends NeedsFiltering
  final case class YesFiltering(uncovered: Int) extends NeedsFiltering

  implicit val needsFilteringOrdering: Ordering[NeedsFiltering] =
    (a: NeedsFiltering, b: NeedsFiltering) => (a, b) match {
      case (NoFiltering, NoFiltering) => 0
      case (NoFiltering, YesFiltering(_)) => 1
      case (YesFiltering(_), NoFiltering) => -1
      case (YesFiltering(x), YesFiltering(y)) => y.compare(x)
    }

  /** `score_index` (`indexes.rs:203-238`): None ⇒ index cannot serve. */
  def scoreIndex(
      meta: IndexMetadata,
      equalityColumns: Seq[String],
      rangeColumns: Seq[String]): Option[NeedsFiltering] = {
    val filtering = meta.allFilteringColumns
    if (!(equalityColumns ++ rangeColumns).forall(filtering.contains)) return None
    meta.partitioning match {
      case Global =>
        val uncovered = equalityColumns.length + rangeColumns.length
        Some(if (uncovered == 0) NoFiltering else YesFiltering(uncovered))
      case Local(pkCols) =>
        if (!pkCols.forall(equalityColumns.contains)) return None
        val uncovered = equalityColumns.length - pkCols.length + rangeColumns.length
        Some(if (uncovered == 0) NoFiltering else YesFiltering(uncovered))
    }
  }

  sealed trait BestIndexState
  case object NotFound extends BestIndexState
  final case class NotServing(progressPct: Double) extends BestIndexState
  case object NoGlobalIndex extends BestIndexState
  final case class ServingIndex(meta: IndexMetadata, needsFiltering: NeedsFiltering)
      extends BestIndexState

  final case class Entry(meta: IndexMetadata, status: IndexStatus, progressPct: Double)
}

/** Mutable registry of index entries; thread-safety is the caller's concern
  * (driver-side planning only — never shipped to executors). */
final class Catalog {
  import Catalog._

  private var entries: Map[IndexKey, Entry] = Map.empty

  def register(meta: IndexMetadata, status: IndexStatus = Serving,
      progressPct: Double = 100.0): Unit =
    entries = entries.updated(meta.key, Entry(meta, status, progressPct))

  def setStatus(key: IndexKey, status: IndexStatus, progressPct: Double = 100.0): Unit =
    entries.get(key).foreach(e =>
      entries = entries.updated(key, e.copy(status = status, progressPct = progressPct)))

  def get(key: IndexKey): Option[Entry] = entries.get(key)
  def list: Seq[Entry] = entries.values.toSeq
  def remove(key: IndexKey): Boolean = {
    val existed = entries.contains(key)
    entries = entries.removed(key)
    existed
  }

  /** `best_index` (`indexes.rs:360-431`): route to the best serving index in
    * the requested index's routing group. */
  def bestIndex(
      key: IndexKey,
      equalityColumns: Seq[String],
      rangeColumns: Seq[String]): BestIndexState = {
    entries.get(key) match {
      case None => NotFound
      case Some(requested) =>
        val group = requested.meta.routingGroup
        val candidates = entries.values.filter(_.meta.routingGroup == group).toSeq
        val best = candidates
          .filter(_.status == Serving)
          .flatMap(e => scoreIndex(e.meta, equalityColumns, rangeColumns)
            .map(score => (e, score)))
          // final tiebreak: at equal (score, version) the REQUESTED index
          // wins — group members may differ in distance space, and a query
          // addressed to an index that can serve must get that index's
          // semantics (and its attached serving config), not whichever
          // member map iteration happened to order last
          .sortBy { case (e, score) =>
            (score, e.meta.version, if (e.meta.key == key) 1 else 0) }(
            Ordering.Tuple3(needsFilteringOrdering, Ordering.Long, Ordering.Int))
          .lastOption
        best match {
          case Some((e, score)) => ServingIndex(e.meta, score)
          case None =>
            if (candidates.exists(_.status == Serving)) NoGlobalIndex
            else NotServing(requested.progressPct)
        }
    }
  }
}
