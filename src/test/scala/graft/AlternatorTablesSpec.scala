package graft

import graft.operators.{Engine, QueryException}
import graft.operators.Ann.AnnRequest
import graft.sources.{Alternator, AlternatorItems => AI, AlternatorTables => AT}
import graft.sources.AlternatorTables.VectorIndexDef
import org.apache.spark.sql.DataFrame

/** The reference validator's Alternator LWT + table-lifecycle suites, ported
  * case-for-case (crates/validator/src/alternator/{lwt, create_table,
  * update_table}.rs). Test names match the reference's functions. */
class AlternatorTablesSpec extends SparkSpec {
  spark // force the shared session: empty-table index frames need an active one
  import spark.implicits._

  private def items(rows: (String, Map[String, Array[Byte]])*): DataFrame =
    rows.toSeq.toDF("pk", AI.AttrsCol)

  private def bin(v: Seq[Float]) = Alternator.encodeBinary(v)
  private def vecItem(pk: String, v: Seq[Float]) = pk -> Map("vec" -> bin(v))

  private def annPks(eng: Engine, ks: String, idx: String, q: Seq[Float],
      k: Int): Seq[String] =
    eng.ann(ks, idx, AnnRequest(q, limit = k)).select("pk").as[String].collect().toSeq

  // ---- lwt.rs --------------------------------------------------------------

  test("alternator_with_always_use_lwt (lwt.rs:51)") {
    val eng = new Engine
    val tbl = new AT(eng)
    val (t, idx) = ("Alt-Tbl-lwt", "Alt-Idx-lwt")
    val ks = AT.keyspace(t)
    tbl.createTable(t, "pk", Seq(VectorIndexDef(idx, "vec", 3)))
    // discovery: the index serves (empty) right after CreateTable
    assert(eng.count(ks, idx) == 0)

    // every write below goes through the serialized conditional path with an
    // always-true condition — the always_use_lwt isolation: same visible
    // results as the plain path, one change-set at a time
    def lwtWrite(ev: DataFrame): DataFrame =
      tbl.conditionalWrite(t, ev, AT.unconditional)

    // PutItem item-a, item-b
    assert(lwtWrite(AI.putEvents(items(
      vecItem("item-a", Seq(1f, 2f, 4f)),
      vecItem("item-b", Seq(4f, 2f, 1f))), "pk", ts = 1)).count() == 0)
    assert(eng.count(ks, idx) == 2)

    // DeleteItem item-b
    lwtWrite(AI.deleteEvents(Seq("item-b").toDF("pk"), "pk", ts = 2))
    assert(eng.count(ks, idx) == 1)

    // UpdateItem SET vec on item-a; verify via ANN ordering
    tbl.conditionalWrite(t,
      AI.updateEvents(tbl.state(t).get,
        items(vecItem("item-a", Seq(1f, 1f, 1f))), "pk", ts = 3),
      AT.unconditional)
    assert(annPks(eng, ks, idx, Seq(1f, 1f, 1f), 1) == Seq("item-a"))

    // BatchWriteItem put batch-a, batch-b
    lwtWrite(AI.putEvents(items(
      vecItem("batch-a", Seq(1f, 2f, 4f)),
      vecItem("batch-b", Seq(4f, 2f, 1f))), "pk", ts = 4))
    assert(eng.count(ks, idx) == 3)

    // mixed BatchWriteItem: put batch-c, delete batch-a — ONE change-set
    lwtWrite(AI.putEvents(items(
      vecItem("batch-c", Seq(-1f, -1f, -1f))), "pk", ts = 5)
      .unionByName(AI.deleteEvents(Seq("batch-a").toDF("pk"), "pk", ts = 5, seq0 = 10)))
    assert(eng.count(ks, idx) == 3)
    assert(annPks(eng, ks, idx, Seq(-1f, -1f, -1f), 3) ==
      Seq("batch-c", "batch-b", "item-a"))

    // delete-only BatchWriteItem: batch-b, batch-c
    lwtWrite(AI.deleteEvents(Seq("batch-b", "batch-c").toDF("pk"), "pk", ts = 6))
    assert(eng.count(ks, idx) == 1)
  }

  test("lwt conditional writes reject losers (ConditionalCheckFailed per item)") {
    val eng = new Engine
    val tbl = new AT(eng)
    val (t, idx) = ("Alt-Tbl-cond", "Alt-Idx-cond")
    tbl.createTable(t, "pk", Seq(VectorIndexDef(idx, "vec", 3)))

    // put-if-absent: first writer wins, second is rejected
    tbl.conditionalWrite(t,
      AI.putEvents(items(vecItem("a", Seq(1f, 0f, 0f))), "pk", ts = 1),
      AT.attributeNotExists("vec"))
    val rejected = tbl.conditionalWrite(t,
      AI.putEvents(items(vecItem("a", Seq(9f, 9f, 9f))), "pk", ts = 2),
      AT.attributeNotExists("vec"))
    assert(rejected.select("pk").as[String].collect().toSeq == Seq("a"))
    // loser did not apply: the index still serves the first vector
    assert(annPks(eng, AT.keyspace(t), idx, Seq(1f, 0f, 0f), 1) == Seq("a"))

    // CAS on a numeric version attribute: matching version wins
    tbl.conditionalWrite(t,
      AI.putEvents(items("b" -> Map(
        "vec" -> bin(Seq(0f, 1f, 0f)),
        "ver" -> "1".getBytes("UTF-8"))), "pk", ts = 3),
      AT.unconditional)
    val casLoser = tbl.conditionalWrite(t,
      AI.putEvents(items("b" -> Map(
        "vec" -> bin(Seq(0f, 2f, 0f)), "ver" -> "2".getBytes("UTF-8"))), "pk", ts = 4),
      AT.numericAttrEquals("ver", 99.0))
    assert(casLoser.count() == 1)
    val casWinner = tbl.conditionalWrite(t,
      AI.putEvents(items("b" -> Map(
        "vec" -> bin(Seq(0f, 2f, 0f)), "ver" -> "2".getBytes("UTF-8"))), "pk", ts = 5),
      AT.numericAttrEquals("ver", 1.0))
    assert(casWinner.count() == 0)
    assert(annPks(eng, AT.keyspace(t), idx, Seq(0f, 2f, 0f), 1) == Seq("b"))

    // delete-if-exists on an absent item is rejected
    val delLoser = tbl.conditionalWrite(t,
      AI.deleteEvents(Seq("ghost").toDF("pk"), "pk", ts = 6),
      AT.attributeExists("vec"))
    assert(delLoser.count() == 1)
  }

  // ---- create_table.rs -----------------------------------------------------

  test("create_describe_and_delete_table_with_vector_index (create_table.rs:121)") {
    val eng = new Engine
    val tbl = new AT(eng)
    tbl.createTable("Alt-Tbl.1", "pk", Seq(VectorIndexDef("Alt-Idx_1", "vec", 3)))
    assert(tbl.describeTable("Alt-Tbl.1") == Seq(VectorIndexDef("Alt-Idx_1", "vec", 3)))
    assert(eng.count(AT.keyspace("Alt-Tbl.1"), "Alt-Idx_1") == 0) // discovered
    tbl.deleteTable("Alt-Tbl.1")
    intercept[QueryException](tbl.describeTable("Alt-Tbl.1"))
    val gone = intercept[QueryException](
      eng.ann(AT.keyspace("Alt-Tbl.1"), "Alt-Idx_1", AnnRequest(Seq(0f, 0f, 0f))))
    assert(gone.status == 404)
  }

  test("create_table_with_two_case_distinct_vector_indexes (create_table.rs:196)") {
    val eng = new Engine
    val tbl = new AT(eng)
    tbl.createTable("Alt-Tbl-cs", "pk", Seq(
      VectorIndexDef("MyIndex", "vec1", 3),
      VectorIndexDef("myindex", "vec2", 3))) // case-distinct: both accepted
    assert(tbl.describeTable("Alt-Tbl-cs").map(_.indexName) == Seq("MyIndex", "myindex"))
  }

  test("create_table_with_same_index_name_on_case_distinct_tables (create_table.rs:253)") {
    val eng = new Engine
    val tbl = new AT(eng)
    tbl.createTable("Alt-Tbl-A", "pk", Seq(VectorIndexDef("SharedIdx", "vec", 3)))
    tbl.createTable("alt-tbl-a", "pk", Seq(VectorIndexDef("SharedIdx", "vec", 3)))
    // independent: distinct keyspaces, both discoverable
    assert(eng.count(AT.keyspace("Alt-Tbl-A"), "SharedIdx") == 0)
    assert(eng.count(AT.keyspace("alt-tbl-a"), "SharedIdx") == 0)
  }

  test("create_table_with_two_indexes_on_same_vector_column (create_table.rs:317)") {
    val tbl = new AT(new Engine)
    val err = intercept[QueryException](
      tbl.createTable("Alt-Tbl-dup", "pk", Seq(
        VectorIndexDef("Idx-1", "vec", 3), VectorIndexDef("Idx-2", "vec", 3))))
    assert(err.status == 400)
    // two IDENTICAL defs must also be rejected — the positional prefix check
    // (value-equality takeWhile gave both an empty prefix and let them pass)
    val dup = intercept[QueryException](
      tbl.createTable("Alt-Tbl-dup2", "pk", Seq(
        VectorIndexDef("Idx-1", "vec", 3), VectorIndexDef("Idx-1", "vec", 3))))
    assert(dup.status == 400)
  }

  test("create_table_with_over_max_length_index_name (create_table.rs:363)") {
    val tbl = new AT(new Engine)
    val over = "X" * (AT.MaxNameLen + 1)
    val err = intercept[QueryException](
      tbl.createTable("Alt-Tbl-len", "pk", Seq(VectorIndexDef(over, "vec", 3))))
    assert(err.status == 400)
    // boundary: exactly MaxNameLen is accepted
    tbl.createTable("Alt-Tbl-len", "pk",
      Seq(VectorIndexDef("X" * AT.MaxNameLen, "vec", 3)))
  }

  test("create_table_with_boundary_dimensions (create_table.rs:403)") {
    val tbl = new AT(new Engine)
    val err = intercept[QueryException](
      tbl.createTable("Alt-Tbl-dim", "pk",
        Seq(VectorIndexDef("Alt-Idx-dim", "vec", AT.MaxDimensions + 1))))
    assert(err.status == 400)
    // positive: MaxDimensions succeeds with the same table/index names
    tbl.createTable("Alt-Tbl-dim", "pk",
      Seq(VectorIndexDef("Alt-Idx-dim", "vec", AT.MaxDimensions)))
  }

  test("invalid index name characters are rejected (vector-search.md name rule)") {
    val tbl = new AT(new Engine)
    val err = intercept[QueryException](
      tbl.createTable("Alt-Tbl-chars", "pk",
        Seq(VectorIndexDef("bad name!", "vec", 3))))
    assert(err.status == 400)
  }

  // ---- update_table.rs -----------------------------------------------------

  test("create_vector_index_via_update_table (update_table.rs:32)") {
    val eng = new Engine
    val tbl = new AT(eng)
    tbl.createTable("Alt-Tbl-ut", "pk")
    // no index yet
    val notFound = intercept[QueryException](
      eng.ann(AT.keyspace("Alt-Tbl-ut"), "Alt-Idx-ut", AnnRequest(Seq(0f, 0f, 0f))))
    assert(notFound.status == 404)
    tbl.createIndex("Alt-Tbl-ut", VectorIndexDef("Alt-Idx-ut", "vec", 3))
    assert(eng.count(AT.keyspace("Alt-Tbl-ut"), "Alt-Idx-ut") == 0)
  }

  test("create_vector_index_via_update_table_with_preexisting_data (update_table.rs:74)") {
    val eng = new Engine
    val tbl = new AT(eng)
    tbl.createTable("Alt-Tbl-pre", "pk")
    tbl.write("Alt-Tbl-pre", AI.putEvents(items(
      vecItem("x", Seq(1f, 0f, 0f)), vecItem("y", Seq(0f, 1f, 0f))), "pk", ts = 1))
    tbl.createIndex("Alt-Tbl-pre", VectorIndexDef("Alt-Idx-pre", "vec", 3))
    // preexisting rows are indexed immediately
    assert(eng.count(AT.keyspace("Alt-Tbl-pre"), "Alt-Idx-pre") == 2)
    assert(annPks(eng, AT.keyspace("Alt-Tbl-pre"), "Alt-Idx-pre",
      Seq(1f, 0f, 0f), 1) == Seq("x"))
  }

  test("create_vector_index_via_update_table_with_invalid_data (update_table.rs:125)") {
    val eng = new Engine
    val tbl = new AT(eng)
    tbl.createTable("Alt-Tbl-inv", "pk")
    tbl.write("Alt-Tbl-inv", AI.putEvents(items(
      vecItem("good", Seq(1f, 0f, 0f)),
      "bad" -> Map("vec" -> Array[Byte](9, 9, 9)), // malformed blob
      "none" -> Map("note" -> "no vec".getBytes("UTF-8"))), "pk", ts = 1))
    tbl.createIndex("Alt-Tbl-inv", VectorIndexDef("Alt-Idx-inv", "vec", 3))
    // invalid rows decode to null and are skipped — never a failure
    assert(eng.count(AT.keyspace("Alt-Tbl-inv"), "Alt-Idx-inv") == 1)
  }

  test("delete_vector_index_via_update_table (update_table.rs:186)") {
    val eng = new Engine
    val tbl = new AT(eng)
    tbl.createTable("Alt-Tbl-del", "pk", Seq(VectorIndexDef("Alt-Idx-del", "vec", 3)))
    tbl.write("Alt-Tbl-del", AI.putEvents(items(vecItem("a", Seq(1f, 0f, 0f))), "pk", ts = 1))
    tbl.deleteIndex("Alt-Tbl-del", "Alt-Idx-del")
    val gone = intercept[QueryException](
      eng.ann(AT.keyspace("Alt-Tbl-del"), "Alt-Idx-del", AnnRequest(Seq(0f, 0f, 0f))))
    assert(gone.status == 404)
    // arbitrary writes are still accepted after index deletion
    tbl.write("Alt-Tbl-del", AI.putEvents(items(vecItem("b", Seq(0f, 1f, 0f))), "pk", ts = 2))
    assert(tbl.state("Alt-Tbl-del").get.count() == 2)
  }
}
