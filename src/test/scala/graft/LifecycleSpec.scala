package graft

import graft.functions.VectorFunctions.Euclidean
import graft.operators._
import graft.operators.Ann.AnnRequest
import graft.operators.Catalog._
import org.apache.spark.sql.functions._

/** The §3.3 lifecycle end-to-end: discovery → bootstrap full scan →
  * LWW-compacted serving state → ANN queries → CDC batch merge → updated
  * results — the Spark re-expression of the reference's
  * create→full-scan→serve→CDC flow (engine.rs / monitor_items / db_cdc). */
class LifecycleSpec extends SparkSpec {
  import spark.implicits._

  test("bootstrap, serve, CDC update, partition move, delete — one flow") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lifecycle").toFile
    try {
      val base = new java.io.File(dir, "base").getAbsolutePath
      val state = new java.io.File(dir, "state").getAbsolutePath

      // ---- bootstrap: raw upsert feed (think: token-range full scan) ----
      Seq(
        ("UPSERT", 1, Seq(1f, 0f), 10, 100L, 0L),
        ("UPSERT", 2, Seq(0f, 1f), 10, 100L, 1L),
        ("UPSERT", 3, Seq(1f, 1f), 20, 100L, 2L),
        ("UPSERT", 2, Seq(0.5f, 1f), 10, 150L, 3L)) // newer version of pk 2
        .toDF("op", "pk", "embedding", "part", "ts", "seq")
        .write.mode("overwrite").parquet(base)

      // discovery tick registers the index as building
      val eng = new Engine
      val meta = IndexMetadata("ks", "idx", "items", "embedding",
        primaryKeyColumns = Seq("pk"), filteringColumns = Seq("part"),
        kind = Vs(IndexOptionsVs(2, Euclidean)))
      val (sync, _) = CatalogSync.reconcile(eng, Seq(meta),
        _ => spark.read.parquet(base), None, "v1")
      assert(sync.added.nonEmpty)
      intercept[QueryException] { // 503 while bootstrapping
        eng.ann("ks", "idx", AnnRequest(Seq(1f, 0f)))
      }

      // backfill: LWW-compact the scan into the serving snapshot
      Lww.compactState(spark.read.parquet(base), Seq("pk"), "ts",
          Some("op"), Some("embedding"), Some("seq"))
        .write.mode("overwrite").parquet(state)
      eng.addIndex(meta, spark.read.parquet(state)
        .filter(!col(Lww.TombstoneCol)), status = Serving)

      // ---- serve ----
      val hits1 = eng.ann("ks", "idx", AnnRequest(Seq(0.5f, 1f), limit = 1))
        .select("pk").as[Int].collect().toSeq
      assert(hits1 == Seq(2)) // sees the ts=150 version
      assert(eng.count("ks", "idx") == 3)

      // ---- CDC batch: delete pk 1, move pk 3 to partition 30, add pk 4 ----
      val cdc = Seq(
        ("DELETE", 1, null.asInstanceOf[Seq[Float]], 10, 200L, 4L),
        ("UPSERT", 3, Seq(1f, 1f), 30, 200L, 5L),
        ("UPSERT", 4, Seq(0f, 0f), 10, 200L, 6L))
        .toDF("op", "pk", "embedding", "part", "ts", "seq")
      val merged = Lww.applyChanges(spark.read.parquet(state), cdc,
        Seq("pk"), "ts", Some("op"), Some("embedding"), Some("seq"))
      merged.write.mode("overwrite").parquet(state + "2")
      val live = spark.read.parquet(state + "2").filter(!col(Lww.TombstoneCol))
      eng.addIndex(meta.copy(version = 1), live, status = Serving)

      // routed to the newer version automatically (version tiebreak)
      val pks = eng.ann("ks", "idx", AnnRequest(Seq(0f, 0f), limit = 10,
          restrictions = Nil))
        .select("pk").as[Int].collect().toSet
      assert(pks == Set(2, 3, 4)) // pk 1 deleted, pk 4 added
      // partition move visible in per-partition sizes (old partition gone)
      val sizes = Lww.partitionSizes(live, Seq("part"))
        .as[(Int, Long)].collect().toMap
      // pk2+pk4 @10, pk3 moved to @30; emptied partition 20 vanished
      assert(sizes == Map(10 -> 2L, 30 -> 1L))

      // filtered search on the moved partition
      val moved = eng.ann("ks", "idx", AnnRequest(Seq(1f, 1f), limit = 5,
          restrictions = Seq(Restriction.Eq("part", 30)), allowFiltering = true))
        .select("pk").as[Int].collect().toSeq
      assert(moved == Seq(3))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }
}
