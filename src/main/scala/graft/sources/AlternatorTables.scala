package graft.sources

import graft.operators.{Catalog, Engine, Lww, QueryException}
import graft.functions.VectorFunctions.Cosine
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DynamoDB-shaped table/index lifecycle + LWT conditional writes over
  * Alternator `:attrs` tables (SURVEY §1.3).
  *
  * Reference behaviors re-expressed (validator/src/alternator/):
  *  - `create_table.rs`: CreateTable with VectorIndexes — name validation
  *    (3–192 chars, `[a-zA-Z0-9._-]+`, case-SENSITIVE so case-distinct names
  *    are independent), dimension bounds (1–16000), at most one index per
  *    vector column per table, DescribeTable surfacing the index defs,
  *    DeleteTable dropping table + indexes;
  *  - `update_table.rs`: UpdateTable creating a vector index on a live table
  *    (preexisting items are indexed; rows whose attribute is malformed
  *    decode to null and are skipped, never a job failure) and deleting one
  *    (writes keep flowing afterwards);
  *  - `lwt.rs`: the `always_use_lwt` write path — every write serializes
  *    against the current state; here each change-set merges one at a time
  *    ([[write]]), and [[conditionalWrite]] adds the DynamoDB
  *    ConditionExpression semantics LWT enables: the condition is evaluated
  *    per item against the CURRENT attrs, losers are rejected (the
  *    ConditionalCheckFailedException analogue), winners merge.
  *
  * Scale: the table state and every index projection stay DataFrames; a
  * whole BatchWriteItem is ONE change-set merged through the bucketed LWW
  * path — no per-item round trips.
  */
object AlternatorTables {

  /** ScyllaDB Alternator caps CQL-backed names at 192 (validator
    * alternator/mod.rs:76-91: 255-byte dirname − UUID suffix − CDC-log
    * suffix); index names validate with the same rule. */
  val MaxNameLen = 192
  val MinNameLen = 3
  private val NamePattern = "[a-zA-Z0-9._-]+".r
  /** Dimension bound pinned by create_table.rs:411 (16000 ok, 16001 not). */
  val MaxDimensions = 16000

  final case class VectorIndexDef(indexName: String, vecAttr: String, dims: Int)

  /** A DynamoDB table `T` lives in keyspace `alternator_T` (mod.rs:105-111) —
    * what discovery scans and queries route on. */
  def keyspace(tableName: String): String = s"alternator_$tableName"

  private[sources] def validateName(kind: String, name: String): Unit = {
    if (name.length < MinNameLen || name.length > MaxNameLen)
      throw new QueryException(400,
        s"$kind name length ${name.length} outside [$MinNameLen, $MaxNameLen]")
    if (!NamePattern.matches(name))
      throw new QueryException(400, s"$kind name must match [a-zA-Z0-9._-]+: $name")
  }

  // ---- ConditionExpression building blocks (evaluated over the CURRENT
  // ---- item's attrs map; null map = item absent) ---------------------------

  type Condition = Column => Column

  val unconditional: Condition = _ => lit(true)

  /** `attribute_exists(name)` — false when the item is absent. */
  def attributeExists(name: String): Condition =
    cur => try_element_at(cur, lit(name)).isNotNull

  /** `attribute_not_exists(name)` — TRUE when the item is absent (the
    * DynamoDB put-if-absent idiom). */
  def attributeNotExists(name: String): Condition =
    cur => try_element_at(cur, lit(name)).isNull

  /** Numeric attribute comparison (N attrs are UTF-8 decimal text). */
  def numericAttrEquals(name: String, v: Double): Condition =
    cur => coalesce(
      try_element_at(cur, lit(name)).cast("string").cast("double") === v,
      lit(false))
}

/** Mutable table registry bound to an [[graft.operators.Engine]]: index
  * registration/queries route through the engine exactly like the CQL path
  * (the Alternator API is a different front door to the same engine). */
final class AlternatorTables(engine: Engine) {
  import AlternatorTables._
  import AlternatorItems.{AttrsCol, OpCol, SeqCol, TsCol}

  private final case class TableEntry(
      pkAttr: String,
      state: Option[DataFrame],
      indexes: Seq[VectorIndexDef])

  private var tables: Map[String, TableEntry] = Map.empty

  private def entry(name: String): TableEntry =
    tables.getOrElse(name,
      throw new QueryException(404, s"table not found: $name"))

  // ---- table lifecycle -----------------------------------------------------

  def createTable(
      name: String, pkAttr: String,
      indexes: Seq[VectorIndexDef] = Nil): Unit = synchronized {
    validateName("table", name)
    if (tables.contains(name))
      throw new QueryException(400, s"table exists: $name")
    // validate against the preceding slice BY POSITION — takeWhile(_ != ix)
    // uses value equality, so two identical defs would each see an empty
    // prefix and the duplicate-name/column checks would never fire
    indexes.zipWithIndex.foreach { case (ix, i) =>
      validateIndexDef(name, indexes.take(i), ix)
    }
    tables += name -> TableEntry(pkAttr, None, Nil)
    indexes.foreach(registerIndex(name, _))
  }

  /** DescribeTable: the vector index defs visible on the table. */
  def describeTable(name: String): Seq[VectorIndexDef] = entry(name).indexes

  def deleteTable(name: String): Unit = synchronized {
    entry(name).indexes.foreach(ix =>
      engine.dropIndex(keyspace(name), ix.indexName))
    tables -= name
  }

  /** UpdateTable + CreateVectorIndex: index a live table — preexisting
    * items are indexed immediately (rows whose attribute decodes to null,
    * e.g. malformed or missing, are skipped by the null filter). */
  def createIndex(name: String, ix: VectorIndexDef): Unit = synchronized {
    val e = entry(name)
    validateIndexDef(name, e.indexes, ix)
    registerIndex(name, ix)
  }

  /** UpdateTable + DeleteVectorIndex: drop the index; item writes keep
    * flowing (the write path never consults indexes). */
  def deleteIndex(name: String, indexName: String): Unit = synchronized {
    val e = entry(name)
    if (!e.indexes.exists(_.indexName == indexName))
      throw new QueryException(404, s"index not found: $name/$indexName")
    engine.dropIndex(keyspace(name), indexName)
    tables += name -> e.copy(indexes = e.indexes.filterNot(_.indexName == indexName))
  }

  private def validateIndexDef(
      name: String, existing: Seq[VectorIndexDef], ix: VectorIndexDef): Unit = {
    validateName("index", ix.indexName)
    if (ix.dims < 1 || ix.dims > MaxDimensions)
      throw new QueryException(400,
        s"Dimensions ${ix.dims} outside [1, $MaxDimensions]")
    if (existing.exists(_.indexName == ix.indexName))
      throw new QueryException(400, s"index exists: $name/${ix.indexName}")
    // one index per vector column per table (create_table.rs:317-358); the
    // check is case-sensitive, like every Alternator name comparison
    if (existing.exists(_.vecAttr == ix.vecAttr))
      throw new QueryException(400,
        s"column ${ix.vecAttr} already has a vector index on $name")
  }

  private def registerIndex(name: String, ix: VectorIndexDef): Unit = {
    val e = entry(name)
    engine.addIndex(
      Catalog.IndexMetadata(
        keyspace(name), ix.indexName, name, ix.vecAttr,
        primaryKeyColumns = Seq(e.pkAttr),
        // the reference's default SpaceType is Cosine (lib.rs:440-447);
        // Alternator CreateTable has no metric parameter, so every
        // Alternator-backed index serves cosine distance
        kind = Catalog.Vs(Catalog.IndexOptionsVs(ix.dims, Cosine))),
      indexFrame(e, ix))
    tables += name -> e.copy(indexes = e.indexes :+ ix)
  }

  /** The served frame of one index: live items, target attr decoded (aliased
    * to the attribute name so restrictions/queries use DynamoDB names). A
    * table with no items yet serves an empty frame (count 0), not an error —
    * the reference discovers and serves indexes on empty tables. */
  private def indexFrame(e: TableEntry, ix: VectorIndexDef): DataFrame =
    e.state match {
      case Some(st) =>
        st.filter(!col(Lww.TombstoneCol))
          .select(col(e.pkAttr),
            Alternator.scanProjection(col(AttrsCol), ix.vecAttr).as(ix.vecAttr))
      case None =>
        val spark = org.apache.spark.sql.SparkSession.active
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(e.pkAttr,
              org.apache.spark.sql.types.DataTypes.StringType),
            org.apache.spark.sql.types.StructField(ix.vecAttr,
              org.apache.spark.sql.types.DataTypes.createArrayType(
                org.apache.spark.sql.types.DataTypes.FloatType)))))
    }

  /** Refresh every registered index frame after a state change. */
  private def refreshIndexes(name: String): Unit = {
    val e = entry(name)
    e.indexes.foreach { ix =>
      engine.addIndex(
        Catalog.IndexMetadata(
          keyspace(name), ix.indexName, name, ix.vecAttr,
          primaryKeyColumns = Seq(e.pkAttr),
          kind = Catalog.Vs(Catalog.IndexOptionsVs(ix.dims, Cosine))),
        indexFrame(e, ix))
    }
  }

  // ---- item writes (the always_use_lwt serialized path) --------------------

  def state(name: String): Option[DataFrame] = entry(name).state

  /** Apply one change-set (one PutItem/DeleteItem/UpdateItem/BatchWriteItem
    * call) against the current state — change-sets serialize through here,
    * the `always_use_lwt` isolation analogue (lwt.rs fixture). */
  def write(name: String, events: DataFrame): Unit = synchronized {
    val e = entry(name)
    val next = e.state match {
      case None => AlternatorItems.init(events, e.pkAttr)
      case Some(st) => AlternatorItems.merge(st, events, e.pkAttr)
    }
    tables += name -> e.copy(state = Some(next))
    refreshIndexes(name)
  }

  /** LWT conditional write: evaluate `condition` per event against the
    * CURRENT item's attrs (null when absent); winners merge, losers come
    * back as the rejected set — per-item ConditionalCheckFailedException
    * semantics, batch-shaped. */
  def conditionalWrite(
      name: String, events: DataFrame, condition: Condition): DataFrame =
    synchronized {
      val e = entry(name)
      val cur = e.state match {
        case Some(st) => st.filter(!col(Lww.TombstoneCol))
          .select(col(e.pkAttr), col(AttrsCol).as("_cur"))
        case None => events.sparkSession.emptyDataFrame // no current items
      }
      val checked =
        if (cur.columns.isEmpty)
          events.withColumn("_cur", lit(null).cast("map<string,binary>"))
        else events.join(cur, Seq(e.pkAttr), "left")
      val pass = coalesce(condition(col("_cur")), lit(false))
      val accepted = checked.filter(pass)
        .select(col(e.pkAttr), col(AttrsCol), col(OpCol), col(TsCol), col(SeqCol))
      val rejected = checked.filter(!pass)
        .select(col(e.pkAttr), col(AttrsCol), col(OpCol), col(TsCol), col(SeqCol))
        .localCheckpoint(true) // pin losers BEFORE the state advances
      write(name, accepted)
      rejected
    }
}
