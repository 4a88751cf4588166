package graft

import graft.api.JsonValues
import graft.functions.VectorFunctions._
import graft.operators._
import graft.operators.Ann.AnnRequest
import graft.operators.Catalog._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference validator's filtering case matrix, ported case-for-case:
  * every named test in crates/validator/src/filtering.rs:42-1372, same data
  * shapes, same WHERE forms, same expected row sets / rejections. Test names
  * below match the reference's function names exactly.
  *
  * CQL → engine mapping: `WHERE c = v` → [[Restriction.Eq]], `IN` →
  * [[Restriction.In]], `<`/`>`/`>=`/`<=` → Lt/Gt/Gte/Lte; `ALLOW FILTERING`
  * → `AnnRequest.allowFiltering`; a CQL error → [[QueryException]] 400.
  */
class FilteringMatrixSpec extends SparkSpec {
  import spark.implicits._

  private def vecs3(rows: Seq[(Int, Int)]): DataFrame =
    rows.map { case (pk, ck) => (pk, ck, Seq(pk.toFloat, ck.toFloat, 0f)) }
      .toDF("pk", "ck", "v")

  private def meta(
      pkCols: Seq[String],
      partitioning: Partitioning = Global,
      filtering: Seq[String] = Nil,
      dims: Int = 3) =
    IndexMetadata("ks", "idx", "tbl", "v",
      primaryKeyColumns = pkCols, partitioning = partitioning,
      filteringColumns = filtering,
      kind = Vs(IndexOptionsVs(dims = dims, space = Euclidean)))

  private def engineFor(df: DataFrame, m: IndexMetadata): Engine = {
    val e = new Engine
    e.addIndex(m, df)
    e
  }

  /** 4 partitions × 5 clustering rows, v = [pk, ck, 0] (filtering.rs:56-66). */
  private lazy val grid4x5 = vecs3(for (pk <- 0 until 4; ck <- 0 until 5) yield (pk, ck))
  /** One partition, ck 0..9, v = [0,0,0] (filtering.rs:472-481). */
  private lazy val onePartition10 =
    (0 until 10).map(ck => (0, ck, Seq(0f, 0f, 0f))).toDF("pk", "ck", "v")

  test("ann_filter_by_partition_key_eq (filtering.rs:42)") {
    val eng = engineFor(grid4x5, meta(Seq("pk", "ck")))
    val rows = eng.ann("ks", "idx", AnnRequest(Seq(1f, 0f, 0f), limit = 20,
        restrictions = Seq(Restriction.Eq("pk", 1)), allowFiltering = true))
      .select("pk", "ck").as[(Int, Int)].collect()
    assert(rows.length == 5)
    assert(rows.forall(_._1 == 1))
  }

  test("ann_filter_by_partition_key_in (filtering.rs:114)") {
    val eng = engineFor(grid4x5, meta(Seq("pk", "ck")))
    val pks = eng.ann("ks", "idx", AnnRequest(Seq(0f, 0f, 0f), limit = 20,
        restrictions = Seq(Restriction.In("pk", Seq(0, 2))), allowFiltering = true))
      .select("pk").as[Int].collect()
    assert(pks.length == 10)
    assert(pks.toSet == Set(0, 2))
  }

  test("ann_filter_by_clustering_key_lt (filtering.rs:183)") {
    val eng = engineFor(onePartition10, meta(Seq("pk", "ck")))
    val cks = eng.ann("ks", "idx", AnnRequest(Seq(0f, 0f, 0f), limit = 10,
        restrictions = Seq(Restriction.Eq("pk", 0), Restriction.Lt("ck", 3)),
        allowFiltering = true))
      .select("ck").as[Int].collect().toSet
    assert(cks == Set(0, 1, 2))
  }

  test("ann_filter_by_clustering_key_gt (filtering.rs:250)") {
    val eng = engineFor(onePartition10, meta(Seq("pk", "ck")))
    val cks = eng.ann("ks", "idx", AnnRequest(Seq(0f, 0f, 0f), limit = 10,
        restrictions = Seq(Restriction.Eq("pk", 0), Restriction.Gt("ck", 7)),
        allowFiltering = true))
      .select("ck").as[Int].collect().toSet
    assert(cks == Set(8, 9))
  }

  test("ann_filter_by_clustering_key_range (filtering.rs:317)") {
    val eng = engineFor(onePartition10, meta(Seq("pk", "ck")))
    val cks = eng.ann("ks", "idx", AnnRequest(Seq(0f, 0f, 0f), limit = 10,
        restrictions = Seq(Restriction.Eq("pk", 0),
          Restriction.Gte("ck", 3), Restriction.Lte("ck", 5)),
        allowFiltering = true))
      .select("ck").as[Int].collect().toSet
    assert(cks == Set(3, 4, 5))
  }

  test("ann_filter_by_pk_and_ck (filtering.rs:385)") {
    // pk,ck1,ck2 composite: 2×2×5 = 20 rows; WHERE pk = 1 AND ck1 = 0
    val df = (for (pk <- 0 until 2; ck1 <- 0 until 2; ck2 <- 0 until 5)
        yield (pk, ck1, ck2, Seq(pk.toFloat, ck1.toFloat, ck2.toFloat)))
      .toDF("pk", "ck1", "ck2", "v")
    val eng = engineFor(df, meta(Seq("pk", "ck1", "ck2")))
    val rows = eng.ann("ks", "idx", AnnRequest(Seq(1f, 0f, 0f), limit = 20,
        restrictions = Seq(Restriction.Eq("pk", 1), Restriction.Eq("ck1", 0)),
        allowFiltering = true))
      .select("pk", "ck1").as[(Int, Int)].collect()
    assert(rows.length == 5)
    assert(rows.forall(r => r._1 == 1 && r._2 == 0))
  }

  test("ann_filter_returns_no_results_when_nothing_matches (filtering.rs:459)") {
    val eng = engineFor(onePartition10, meta(Seq("pk", "ck")))
    val rows = eng.ann("ks", "idx", AnnRequest(Seq(0f, 0f, 0f), limit = 10,
        restrictions = Seq(Restriction.Eq("pk", 999)), allowFiltering = true))
      .collect()
    assert(rows.isEmpty)
  }

  test("ann_filter_by_vector_column_fails (filtering.rs:528)") {
    val df = (0 until 5).map(pk => (pk, Seq(pk.toFloat, 0f, 0f))).toDF("pk", "v")
    val eng = engineFor(df, meta(Seq("pk")))
    val ex = intercept[QueryException] {
      eng.ann("ks", "idx", AnnRequest(Seq(1f, 0f, 0f), limit = 5,
        restrictions = Seq(Restriction.Eq("v", Seq(1f, 0f, 0f))),
        allowFiltering = true))
    }
    assert(ex.status == 400)
  }

  test("global_index_filter_by_filtering_columns (filtering.rs:587)") {
    // pk 0..9, ck = pk % 4, f = pk % 2, v = [pk, 0, 0]
    val df = (0 until 10).map(pk => (pk, pk % 4, pk % 2, Seq(pk.toFloat, 0f, 0f)))
      .toDF("pk", "ck", "f", "v")
    val eng = engineFor(df, meta(Seq("pk", "ck"), filtering = Seq("f")))
    def q(rs: Restriction*): Set[Int] =
      eng.ann("ks", "idx", AnnRequest(Seq(0f, 0f, 0f), limit = 10,
          restrictions = rs, allowFiltering = true))
        .select("pk").as[Int].collect().toSet
    assert(q(Restriction.Eq("f", 0)) == Set(0, 2, 4, 6, 8))
    assert(q(Restriction.Eq("pk", 3), Restriction.Eq("f", 1)) == Set(3))
    assert(q(Restriction.Eq("ck", 2), Restriction.Eq("f", 0)) == Set(2, 6))
  }

  test("local_index_filter_by_filtering_columns (filtering.rs:677)") {
    // 10×10 grid, f = ck % 2; local index partitioned by pk, filtering on f
    val df = (for (pk <- 0 until 10; ck <- 0 until 10)
        yield (pk, ck, ck % 2, Seq(pk.toFloat, ck.toFloat, 0f)))
      .toDF("pk", "ck", "f", "v")
    val eng = engineFor(df,
      meta(Seq("pk", "ck"), partitioning = Local(Seq("pk")), filtering = Seq("f")))
    val q1 = eng.ann("ks", "idx", AnnRequest(Seq(0f, 0f, 0f), limit = 10,
        restrictions = Seq(Restriction.Eq("pk", 3), Restriction.Eq("f", 1)),
        allowFiltering = true))
      .select("pk", "ck").as[(Int, Int)].collect().toSet
    assert(q1 == Set((3, 1), (3, 3), (3, 5), (3, 7), (3, 9)))
    val q2 = eng.ann("ks", "idx", AnnRequest(Seq(0f, 0f, 0f), limit = 10,
        restrictions = Seq(Restriction.Eq("pk", 7), Restriction.Eq("ck", 2),
          Restriction.Eq("f", 0)),
        allowFiltering = true))
      .select("pk", "ck").as[(Int, Int)].collect().toSet
    assert(q2 == Set((7, 2)))
  }

  test("local_index_filter_by_partition_key_eq (filtering.rs:758)") {
    // pk Eq on a local index is consumed by pruning: NO ALLOW FILTERING needed
    val eng = engineFor(grid4x5, meta(Seq("pk", "ck"), partitioning = Local(Seq("pk"))))
    val rows = eng.ann("ks", "idx", AnnRequest(Seq(1f, 0f, 0f), limit = 20,
        restrictions = Seq(Restriction.Eq("pk", 1)), allowFiltering = false))
      .select("pk", "ck").as[(Int, Int)].collect()
    assert(rows.length == 5)
    assert(rows.forall(_._1 == 1))
  }

  test("local_index_filter_by_clustering_key_range (filtering.rs:834)") {
    val eng = engineFor(onePartition10,
      meta(Seq("pk", "ck"), partitioning = Local(Seq("pk"))))
    val cks = eng.ann("ks", "idx", AnnRequest(Seq(0f, 0f, 0f), limit = 10,
        restrictions = Seq(Restriction.Eq("pk", 0),
          Restriction.Gte("ck", 3), Restriction.Lte("ck", 5)),
        allowFiltering = true))
      .select("ck").as[Int].collect().toSet
    assert(cks == Set(3, 4, 5))
  }

  test("local_index_filter_returns_no_results_when_nothing_matches (filtering.rs:902)") {
    val eng = engineFor(onePartition10,
      meta(Seq("pk", "ck"), partitioning = Local(Seq("pk"))))
    val rows = eng.ann("ks", "idx", AnnRequest(Seq(0f, 0f, 0f), limit = 10,
        restrictions = Seq(Restriction.Eq("pk", 999)), allowFiltering = false))
      .collect()
    assert(rows.isEmpty)
  }

  test("local_index_filter_by_partition_key_or_filtering (filtering.rs:971)") {
    // 5×5 rows over (pk, ck, v[1], rc, fp, fc); three local-index configs:
    // partition col ∈ {pk, ck, rc} with a filtering col — a local index may
    // be partitioned by ANY column, not just the CQL partition key
    val df = (for (pk <- 0 until 5; ck <- 0 until 5)
        yield (pk, ck, Seq(pk.toFloat), ck, pk, ck))
      .toDF("pk", "ck", "v", "rc", "fp", "fc")
    for ((pc, oc, fc) <- Seq(("pk", "ck", "fc"), ("ck", "pk", "fp"), ("rc", "pk", "fp"))) {
      val eng = engineFor(df,
        meta(Seq("pk", "ck"), partitioning = Local(Seq(pc)), filtering = Seq(fc), dims = 1))
      val q1 = eng.ann("ks", "idx", AnnRequest(Seq(1f), limit = 25,
          restrictions = Seq(Restriction.Eq(pc, 1)), allowFiltering = false))
        .select(oc).as[Int].collect()
      assert(q1.length == 5, s"config ($pc, $fc): expected 5 rows for $pc = 1")
      val q2 = eng.ann("ks", "idx", AnnRequest(Seq(1f), limit = 25,
          restrictions = Seq(Restriction.Eq(pc, 1), Restriction.Eq(fc, 1)),
          allowFiltering = true))
        .select(oc).as[Int].collect()
      assert(q2.toSeq == Seq(1), s"config ($pc, $fc): expected one row with $oc = 1")
    }
  }

  test("global_ann_query_on_local_only_index_fails (filtering.rs:1086)") {
    // VECTOR-609: a global query (no partition-key Eq) against a local-only
    // index must be rejected, not answered empty/incorrectly
    val eng = engineFor(grid4x5, meta(Seq("pk", "ck"), partitioning = Local(Seq("pk"))))
    val ex = intercept[QueryException] {
      eng.ann("ks", "idx", AnnRequest(Seq(1f, 1f, 0f), limit = 20))
    }
    assert(ex.status == 400)
  }

  test("global_ann_with_timestamp_eq_filter (filtering.rs:1147)") {
    // space-separated CQL timestamp through the JSON boundary (F7)
    val ts = (s: String) =>
      JsonValues.fromJson(s, JsonValues.TimestampT).asInstanceOf[java.sql.Timestamp]
    val df = Seq(
      ("a", Seq(0.1f, 0.2f, 0.3f), ts("2024-06-15 10:00:00.000Z")),
      ("b", Seq(0.4f, 0.5f, 0.6f), ts("2005-01-01 00:01:04.000Z")),
      ("c", Seq(0.7f, 0.8f, 0.9f), ts("2024-08-20 14:30:00.000Z")))
      .toDF("pk", "v", "created_at")
    val eng = engineFor(df, meta(Seq("pk", "created_at")))
    val rows = eng.ann("ks", "idx", AnnRequest(Seq(0.4f, 0.5f, 0.6f), limit = 5,
        restrictions = Seq(Restriction.Eq("created_at", ts("2005-01-01 00:01:04.000Z"))),
        allowFiltering = true))
      .select("pk").as[String].collect()
    assert(rows.toSeq == Seq("b"))
  }

  test("local_ann_with_timestamp_gte_filter (filtering.rs:1211)") {
    // VECTOR-593: date-only CQL timestamp in an inequality must not fail
    val ts = (s: String) =>
      JsonValues.fromJson(s, JsonValues.TimestampT).asInstanceOf[java.sql.Timestamp]
    val df = Seq(
      ("alice", 42, Seq(0.1f, 0.2f, 0.3f), ts("2024-06-15 10:00:00.000Z")),
      ("alice", 42, Seq(0.12f, 0.34f, 0.56f), ts("2024-08-20 14:30:00.000Z")),
      ("alice", 42, Seq(0.3f, 0.3f, 0.3f), ts("2023-01-10 08:00:00.000Z")))
      .toDF("pk", "board_id", "v", "created_at")
    val eng = engineFor(df,
      meta(Seq("pk", "board_id", "created_at"),
        partitioning = Local(Seq("pk", "board_id"))))
    val rows = eng.ann("ks", "idx", AnnRequest(Seq(0.1f, 0.2f, 0.3f), limit = 5,
        restrictions = Seq(
          Restriction.Eq("pk", "alice"), Restriction.Eq("board_id", 42),
          Restriction.Gte("created_at", ts("2024-01-01"))),
        allowFiltering = true))
      .select("pk").as[String].collect()
    assert(rows.length == 2)
  }

  test("ann_filter_by_clustering_key_only_requires_allow_filtering (filtering.rs:1282)") {
    // rows (p,ck): (1,1), (2,1), (3,2) — ck-only filter needs ALLOW FILTERING
    val df = Seq(
      (1, 1, Seq(0.1f, 0.2f, 0.3f)),
      (2, 1, Seq(0.4f, 0.5f, 0.6f)),
      (3, 2, Seq(0.7f, 0.8f, 0.9f)))
      .toDF("p", "ck", "v")
    val m = IndexMetadata("ks", "idx", "tbl", "v",
      primaryKeyColumns = Seq("p", "ck"),
      kind = Vs(IndexOptionsVs(dims = 3, space = Euclidean)))
    val eng = engineFor(df, m)
    val ex = intercept[QueryException] {
      eng.ann("ks", "idx", AnnRequest(Seq(0.1f, 0.2f, 0.3f), limit = 5,
        restrictions = Seq(Restriction.Eq("ck", 1)), allowFiltering = false))
    }
    assert(ex.status == 400)
    val rows = eng.ann("ks", "idx", AnnRequest(Seq(0.1f, 0.2f, 0.3f), limit = 5,
        restrictions = Seq(Restriction.Eq("ck", 1)), allowFiltering = true))
      .select("ck").as[Int].collect()
    assert(rows.length == 2)
    assert(rows.forall(_ == 1))
  }

  /** Table with a non-PK column `c` that is NOT a declared filtering column
    * (filtering.rs:1452-1477 — a secondary CQL index on c does not make it a
    * vector-store filtering column). */
  private def nonPkColumnEngine: Engine = {
    val df = Seq((1, 1, Seq(0.1f, 0.2f, 0.3f))).toDF("p", "c", "v")
    engineFor(df, meta(Seq("p")))
  }

  test("ann_filter_by_non_pk_column_rejected_without_allow_filtering (filtering.rs:1328)") {
    val ex = intercept[QueryException] {
      nonPkColumnEngine.ann("ks", "idx", AnnRequest(Seq(0.1f, 0.2f, 0.3f), limit = 5,
        restrictions = Seq(Restriction.Eq("c", 1)), allowFiltering = false))
    }
    assert(ex.status == 400)
  }

  test("ann_filter_by_non_pk_column_rejected_with_allow_filtering (filtering.rs:1351)") {
    // rejected even WITH allow filtering: c is not in the index's declared
    // pk/partition/filtering column set
    val ex = intercept[QueryException] {
      nonPkColumnEngine.ann("ks", "idx", AnnRequest(Seq(0.1f, 0.2f, 0.3f), limit = 5,
        restrictions = Seq(Restriction.Eq("c", 1)), allowFiltering = true))
    }
    assert(ex.status == 400)
  }
}
