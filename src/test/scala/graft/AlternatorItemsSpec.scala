package graft

import graft.functions.VectorFunctions._
import graft.operators._
import graft.operators.Ann.AnnRequest
import graft.operators.Catalog._
import graft.sources.{Alternator, AlternatorItems => AI}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference validator's Alternator item-write suite, ported
  * case-for-case (crates/validator/src/alternator/{put_item, update_item,
  * delete_item, batch_write_item, query}.rs): every write through the
  * DynamoDB-shaped API must be reflected by the vector index; malformed
  * vectors are skipped per-row, never a failure. Test names match the
  * reference's functions. */
class AlternatorItemsSpec extends SparkSpec {
  import spark.implicits._

  private def vec(seed: Int): Seq[Float] =
    Seq(seed.toFloat, 0f, 0f)

  private def itemsDf(rows: (Long, Map[String, Array[Byte]])*): DataFrame =
    rows.toSeq.toDF("pk", AI.AttrsCol)

  private def put(state: Option[DataFrame], ts: Long,
      rows: (Long, Map[String, Array[Byte]])*): DataFrame = {
    val ev = AI.putEvents(itemsDf(rows: _*), "pk", ts)
    state.map(AI.merge(_, ev, "pk")).getOrElse(AI.init(ev, "pk"))
  }

  private def annPks(state: DataFrame, q: Seq[Float], k: Int = 10): Seq[Long] = {
    val decoded = AI.indexProjection(state, "pk", "embedding")
    val eng = new Engine
    eng.addIndex(IndexMetadata("alternator_ks", "idx", "tbl", "embedding",
      primaryKeyColumns = Seq("pk"),
      kind = Vs(IndexOptionsVs(dims = 3, space = Euclidean))), decoded)
    eng.ann("alternator_ks", "idx", AnnRequest(q, limit = k))
      .select("pk").as[Long].collect().toSeq
  }

  private def bin(v: Seq[Float]) = Alternator.encodeBinary(v)

  test("put_item_updates_index (put_item.rs:21)") {
    var st = put(None, ts = 1,
      1L -> Map("embedding" -> bin(vec(1))),
      2L -> Map("embedding" -> bin(vec(2))))
    assert(annPks(st, vec(1)).head == 1L)
    // re-put pk=1 with a new vector: the index serves the replacement
    st = put(Some(st), ts = 2, 1L -> Map("embedding" -> bin(vec(100))))
    assert(annPks(st, vec(100)).head == 1L)
    assert(annPks(st, vec(1)).head == 2L)
  }

  test("put_item_with_invalid_vector_is_not_indexed (put_item.rs:80)") {
    val st = put(None, ts = 1,
      1L -> Map("embedding" -> bin(vec(1))),
      2L -> Map("embedding" -> Array[Byte](9, 9, 9)), // bad tag
      3L -> Map("note" -> "no vector here".getBytes("UTF-8")))
    assert(annPks(st, vec(1)) == Seq(1L), "only the valid vector is indexed")
  }

  test("update_item_updates_index (update_item.rs:56)") {
    var st = put(None, ts = 1, 1L -> Map("embedding" -> bin(vec(1))))
    st = AI.merge(st, AI.updateEvents(st,
      itemsDf(1L -> Map("embedding" -> bin(vec(50)))), "pk", ts = 2), "pk")
    assert(annPks(st, vec(50)).head == 1L)
  }

  test("update_item_with_invalid_vector_is_not_indexed (update_item.rs:154)") {
    var st = put(None, ts = 1, 1L -> Map("embedding" -> bin(vec(1))))
    st = AI.merge(st, AI.updateEvents(st,
      itemsDf(1L -> Map("embedding" -> Array[Byte](7))), "pk", ts = 2), "pk")
    assert(annPks(st, vec(1)).isEmpty, "the overwritten-to-invalid vector must deindex")
  }

  test("update_item_unrelated_attribute_does_not_deindex (update_item.rs:210)") {
    var st = put(None, ts = 1, 1L -> Map("embedding" -> bin(vec(1))))
    st = AI.merge(st, AI.updateEvents(st,
      itemsDf(1L -> Map("note" -> "hello".getBytes("UTF-8"))), "pk", ts = 2), "pk")
    assert(annPks(st, vec(1)) == Seq(1L), "vector survives an unrelated update")
  }

  test("update_item_remove_vector_and_set_unrelated_deindexes (update_item.rs:252)") {
    var st = put(None, ts = 1, 1L -> Map("embedding" -> bin(vec(1))))
    st = AI.merge(st, AI.updateEvents(st,
      itemsDf(1L -> Map("note" -> "x".getBytes("UTF-8"))), "pk", ts = 2,
      removeAttrs = Seq("embedding")), "pk")
    assert(annPks(st, vec(1)).isEmpty, "REMOVE of the vector attribute deindexes")
    // the item itself still exists (live, just not indexed)
    assert(st.filter(!col(Lww.TombstoneCol)).count() == 1)
  }

  test("update_item_remove_unrelated_and_set_vector_updates_index (update_item.rs:286)") {
    var st = put(None, ts = 1,
      1L -> Map("embedding" -> bin(vec(1)), "note" -> "x".getBytes("UTF-8")))
    st = AI.merge(st, AI.updateEvents(st,
      itemsDf(1L -> Map("embedding" -> bin(vec(77)))), "pk", ts = 2,
      removeAttrs = Seq("note")), "pk")
    assert(annPks(st, vec(77)).head == 1L)
    val attrs = st.filter(!col(Lww.TombstoneCol))
      .select(map_keys(col(AI.AttrsCol))).as[Seq[String]].head()
    assert(attrs.toSet == Set("embedding"), "REMOVEd attribute is gone")
  }

  test("delete_item_updates_index (delete_item.rs:35)") {
    var st = put(None, ts = 1,
      1L -> Map("embedding" -> bin(vec(1))),
      2L -> Map("embedding" -> bin(vec(2))))
    st = AI.merge(st,
      AI.deleteEvents(Seq(Tuple1(1L)).toDF("pk"), "pk", ts = 2), "pk")
    assert(annPks(st, vec(1)) == Seq(2L), "deleted item leaves the index")
  }

  test("batch_write_item_updates_index (batch_write_item.rs:68)") {
    var st = put(None, ts = 1,
      1L -> Map("embedding" -> bin(vec(1))),
      2L -> Map("embedding" -> bin(vec(2))))
    // one batch = one change-set: puts and deletes merged together
    val batch = AI.putEvents(itemsDf(
        3L -> Map("embedding" -> bin(vec(3))),
        4L -> Map("embedding" -> bin(vec(4)))), "pk", ts = 2)
      .unionByName(AI.deleteEvents(Seq(Tuple1(2L)).toDF("pk"), "pk", ts = 2, seq0 = 1000))
    st = AI.merge(st, batch, "pk")
    assert(annPks(st, vec(0), k = 10).toSet == Set(1L, 3L, 4L))
  }

  test("batch_write_item_with_invalid_vector (batch_write_item.rs:136)") {
    val batch = AI.putEvents(itemsDf(
      1L -> Map("embedding" -> bin(vec(1))),
      2L -> Map("embedding" -> Alternator.encodeJson(vec(2))), // tag-4 JSON, valid
      3L -> Map("embedding" -> Array[Byte](5, 1, 2))), "pk", ts = 1) // truncated tag-5
    val st = AI.init(batch, "pk")
    assert(annPks(st, vec(0)).toSet == Set(1L, 2L),
      "valid binary + JSON vectors index; the malformed one is skipped per-row")
  }

  test("query_with_vector_search_multiple_results_ordering (query.rs:283)") {
    val st = put(None, ts = 1,
      (1L to 5L).map(i => i -> Map("embedding" -> bin(vec(i.toInt * 10)))): _*)
    // ascending distance from [0,0,0]: pk 1 (10) closest, then 2, 3, 4, 5
    assert(annPks(st, Seq(0f, 0f, 0f)) == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("ttl_expiration_removes_vector (ttl.rs:59)") {
    def n(epoch: Long) = epoch.toString.getBytes("UTF-8")
    var st = put(None, ts = 1,
      1L -> Map("embedding" -> bin(vec(1))),
      2L -> Map("embedding" -> bin(vec(2))),
      3L -> Map("embedding" -> bin(vec(3)), "ttl_expiry" -> n(1000L)))
    // before the TTL horizon: all three indexed
    assert(annPks(st, vec(0)).toSet == Set(1L, 2L, 3L))
    st = AI.expireTtl(st, "pk", "ttl_expiry", nowEpochS = 2000L, ts = 2)
    assert(annPks(st, vec(0)).toSet == Set(1L, 2L),
      "expired item leaves the index; permanent items survive")
    // the expiry is a tombstone, not a physical drop (LWW semantics hold)
    assert(st.filter(col(Lww.TombstoneCol)).count() == 1)
  }

  test("query_with_select_count (query.rs:476)") {
    var st = put(None, ts = 1,
      1L -> Map("embedding" -> bin(vec(1))),
      2L -> Map("embedding" -> bin(vec(2))),
      3L -> Map("note" -> "n".getBytes("UTF-8")))
    st = AI.merge(st,
      AI.deleteEvents(Seq(Tuple1(2L)).toDF("pk"), "pk", ts = 2), "pk")
    val decoded = AI.indexProjection(st, "pk", "embedding")
    val eng = new Engine
    eng.addIndex(IndexMetadata("ks", "idx", "tbl", "embedding",
      primaryKeyColumns = Seq("pk"),
      kind = Vs(IndexOptionsVs(dims = 3, space = Euclidean))), decoded)
    assert(eng.count("ks", "idx") == 1, "count = live rows with a decodable vector")
  }
}
