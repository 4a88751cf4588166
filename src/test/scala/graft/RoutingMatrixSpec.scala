package graft

import graft.functions.VectorFunctions._
import graft.operators._
import graft.operators.Ann.AnnRequest
import graft.operators.Catalog._
import org.apache.spark.sql.functions._

/** The reference validator's routing suite, ported case-for-case
  * (crates/validator/src/routing.rs:65-381): queries route within a
  * (keyspace, table, target-column) routing group to the best SERVING
  * index, never across columns, and report 404/503 exactly like the
  * reference's HTTP surface. Test names match the reference's functions. */
class RoutingMatrixSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = Seq((0, Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)))
    .toDF("pk", "embedding", "embedding2")

  private def meta(index: String, target: String, version: Long) =
    IndexMetadata("ks", index, "tbl", target,
      primaryKeyColumns = Seq("pk"),
      version = version,
      kind = Vs(IndexOptionsVs(dims = 3, space = Euclidean)))

  private val q = AnnRequest(Seq(1f, 2f, 3f), limit = 5)

  test("ann_routes_to_serving_index_while_replacement_is_bootstrapping (routing.rs:65)") {
    val e = new Engine
    e.addIndex(meta("idx_old", "embedding", version = 0), rows)
    e.addIndex(meta("idx_new", "embedding", version = 1), rows,
      status = FullScanning, progressPct = 10.0)
    // querying the BOOTSTRAPPING index routes to the serving one (same
    // routing group) instead of 503ing
    assert(e.ann("ks", "idx_new", q).select("pk").as[Int].collect().toSeq == Seq(0))
    // once the replacement serves and the old index is dropped, the
    // replacement answers directly
    e.setStatus(IndexKey("ks", "idx_new"), Serving)
    assert(e.dropIndex("ks", "idx_old"))
    assert(e.ann("ks", "idx_new", q).select("pk").as[Int].collect().toSeq == Seq(0))
  }

  test("ann_does_not_route_between_columns_while_requested_index_is_bootstrapping (routing.rs:162)") {
    val e = new Engine
    e.addIndex(meta("idx_e1", "embedding", version = 0), rows)
    e.addIndex(meta("idx_e2", "embedding2", version = 0), rows,
      status = FullScanning, progressPct = 25.0)
    // embedding2's index is bootstrapping; the serving embedding index is a
    // DIFFERENT routing group and must not answer for it
    val ex = intercept[QueryException] { e.ann("ks", "idx_e2", q) }
    assert(ex.status == 503)
    // while the serving column still answers its own queries
    assert(e.ann("ks", "idx_e1", q).count() == 1)
  }

  test("ann_returns_not_found_for_nonexistent_index (routing.rs:236)") {
    val e = new Engine
    e.addIndex(meta("idx", "embedding", version = 0), rows)
    val ex = intercept[QueryException] { e.ann("ks", "nonexistent", q) }
    assert(ex.status == 404)
  }

  test("ann_returns_unavailable_when_only_index_is_bootstrapping (routing.rs:268)") {
    val e = new Engine
    e.addIndex(meta("idx", "embedding", version = 0), rows,
      status = FullScanning, progressPct = 42.0)
    val ex = intercept[QueryException] { e.ann("ks", "idx", q) }
    assert(ex.status == 503)
    assert(ex.getMessage.contains("42.0"), "503 must carry build progress")
  }

  test("ann_returns_not_found_after_index_is_dropped (routing.rs:329)") {
    val e = new Engine
    e.addIndex(meta("idx", "embedding", version = 0), rows)
    assert(e.ann("ks", "idx", q).count() == 1)
    assert(e.dropIndex("ks", "idx"))
    val ex = intercept[QueryException] { e.ann("ks", "idx", q) }
    assert(ex.status == 404)
    assert(!e.dropIndex("ks", "idx"), "double drop reports missing")
  }
}
