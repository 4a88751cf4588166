package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose `decontamination_bloom`'s per-decade cost (VERDICT r10 #6:
  * 4.2× at r9 → 5.5× at r10 — still inside the ≤10× bar but the only
  * linear-family member trending up). Times each stage separately on one
  * corpus:
  *   1. shingle-store scan (the shared input),
  *   2. bench-side shingle derivation (join + distinct),
  *   3. bloom BUILD (the distributed bit-or aggregate + driver densify),
  *   4. bloom PROBE (filter the corpus shingles through the broadcast),
  *   5. the exact containment join tail.
  * The suspicion to test: the FIXTURE's bench set is `doc_id % 5 = 0` —
  * 20% of the corpus — so the "corpus-independent benchmark" assumption
  * does not hold on this data and the build/broadcast side grows 10× per
  * decade with mBits ∝ bench shingles.
  *
  * Usage: ProfileDecon <sfDir> [runs=2]. Prints one JSON line.
  */
object ProfileDecon {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the same store-backed shingle input the query uses
    val sh = SparkEntry.shingleStore(spark, dir)
    val benchIds = Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 5 === 0).select(col("doc_id").as("bench_id"))

    def timeMin(label: String)(body: => Unit): (String, Double) = {
      val secs = (0 until runs).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      label -> secs.min
    }

    val bsh = sh.join(benchIds, sh("doc_id") === benchIds("bench_id"))
      .select(col("bench_id"), col("sh"))
    val distinctBsh = bsh.select(col("sh")).distinct()
    var bloom: graft.operators.Curation.Bloom = null
    val stages = Seq(
      timeMin("scan_store") { sh.count(): Unit },
      timeMin("bench_join_distinct") { distinctBsh.count(): Unit },
      timeMin("bloom_build") {
        bloom = graft.operators.Curation.bloomBuild(distinctBsh, 0.01)
      },
      timeMin("bloom_probe_filter") {
        sh.filter(graft.operators.Curation.bloomMember(col("sh"), bloom))
          .count(): Unit
      },
      // the containment tail ALONE, prebuilt bloom (what the bench times
      // after its warm): bsh broadcast + groupBy + bsz broadcast
      timeMin("containment_tail") {
        graft.operators.Curation.decontaminateBloom(sh, "doc_id", benchIds,
          minContainment = 0.2, maxShingleDf = None,
          prebuilt = Some(bloom)).count(): Unit
      },
      timeMin("full_query") {
        SparkEntry.queries("decontamination_bloom")(spark, dir).count(): Unit
      })
    val benchShingles = distinctBsh.count()
    val benchRows = bsh.count()
    val corpusShingles = sh.count()
    def fmt(d: Double) =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))
    println(s"""{"metric":"decon_bloom_profile","dir":"$dir",""" +
      s""""bench_distinct_shingles":$benchShingles,""" +
      s""""bench_shingle_rows":$benchRows,""" +
      s""""corpus_shingle_rows":$corpusShingles,""" +
      stages.map { case (l, s) => s""""$l":${fmt(s)}""" }.mkString(",") + "}")
    spark.stop()
  }
}
