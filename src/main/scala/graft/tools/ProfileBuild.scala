package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession

/** Attribute the sf1 index-store build time per store (VERDICT r12 #6:
  * the driver's `sf1_build_sec` went 14.9 → 57.5 s across r11→r12 with a
  * ~1.5× host factor — the residual was unattributed because the bench
  * reports the build phase as one number). Replays exactly the bench's
  * store-warm loop — the index-backed members of the sf1 subset, one run
  * each — against a CLEARED store dir so every run is a build, timing and
  * labeling each query separately.
  *
  * Usage: ProfileBuild <sfDir> [--keep]
  * (clears /tmp/graft-indexes/<dirname> first unless --keep, so pass
  * --keep to time the reuse path instead). One JSON line to stdout.
  */
object ProfileBuild {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val keep = args.contains("--keep")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // mirror of Bench's sf1 subset (the store-warm loop filters it the
    // same way); keep in sync with Bench.scala
    val sf1Subset = Seq(
      "q1_agg", "q5_region_revenue", "ann_cosine", "ann_lsh", "ann_ivfpq",
      "ann_rescored", "bm25_multi", "dedup_exact", "dedup_minhash",
      "dedup_embedding_lsh", "semantic_dedup", "semantic_dedup_capped",
      "dedup_clusters",
      "fuzzy_join", "fuzzy_join_exact", "decontamination_bloom",
      "span_dedup", "gopher_report", "lm_score", "bpe_merges", "token_ids",
      "stratified_sample", "pack_sequences", "pagerank", "hits_scores",
      "heavy_hitters", "quantile_histogram", "asof_join", "rolling_stats",
      "event_sessions_window", "hybrid_rrf", "knn_join_lsh", "image_features")
    val buildSet = sf1Subset.filter(SparkEntry.indexBackedQueries.contains)

    val storeRoot = new java.io.File(
      s"${sys.props("java.io.tmpdir")}/graft-indexes/${new java.io.File(dir).getName}")
    if (!keep && storeRoot.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(storeRoot)
      System.err.println(s"[graft] cleared $storeRoot")
    }

    Tables.names.foreach { n =>
      try Tables.load(spark, dir, n).count() catch { case _: Throwable => () }
    }
    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))
    val times = buildSet.map { name =>
      val rb = graft.sources.IndexStorage.rebuilds.get()
      spark.sparkContext.setJobDescription(s"build:$name")
      val t0 = System.nanoTime()
      val ok = try { SparkEntry.queries(name)(spark, dir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[graft] build FAILED: $name: ${e.getMessage}"); false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.setJobDescription(null)
      val rebuilt = graft.sources.IndexStorage.rebuilds.get() > rb
      (name, dt, rebuilt, ok)
    }
    val qs = times.map { case (n, t, rb, ok) =>
      s""""$n":{"sec":${fmt(t)},"rebuilt":$rb,"ok":$ok}"""
    }.mkString("{", ",", "}")
    println(s"""{"build_profile":$qs,"total":${fmt(times.map(_._2).sum)},""" +
      s""""dir":"$dir","cleared":${!keep}}""")
    spark.stop()
  }
}
