package graft

import graft.operators.{CheckpointPolicy, Curation, Sketches, TextAnalysis, QualityMetrics}
import org.apache.spark.sql.functions._

/** r13 (VERDICT r12 #4): the corpus-scale shared-frame checkpoint sites
  * (nbQualityScore tf, tfidfTopTermsFromTf, calibrationCurve base,
  * dsirWeights perDoc, cmsHeavyHitters/cmsJoinSize tf) are routed through
  * CheckpointPolicy so cluster callers can choose persist-with-lineage
  * (Reliable) over lineage-free executor blocks (Local). The route must be
  * invisible in the output: every operator produces bit-identical rows
  * under both policies. */
class ReliableRoutingSpec extends SparkSpec {
  import spark.implicits._

  private def withReliable[A](f: CheckpointPolicy => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_route").toFile
    val hadDir = spark.sparkContext.getCheckpointDir
    try f(CheckpointPolicy.Reliable(everyN = 1,
      checkpointDir = Some(s"file:${dir.getAbsolutePath}")))
    finally {
      hadDir.foreach(spark.sparkContext.setCheckpointDir)
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", true),
    (2L, "spark shuffles bytes across the cluster", false),
    (3L, "the lazy dog sleeps while the fox runs", true),
    (4L, "bytes and bits and shuffles and spills", false),
    (5L, "quick quick quick brown brown fox", true),
  ).toDF("doc_id", "text", "label")

  test("nbQualityScore: Reliable route == Local route") {
    withReliable { pol =>
      val l = TextAnalysis.nbQualityScore(docs, "doc_id", "text", col("label"))
        .collect().map(_.toSeq).toSet
      val r = TextAnalysis.nbQualityScore(docs, "doc_id", "text", col("label"),
        policy = pol).collect().map(_.toSeq).toSet
      assert(r == l)
    }
  }

  test("tfidfTopTermsFromTf: Reliable route == Local route") {
    withReliable { pol =>
      val tf = TextAnalysis.termFrequencies(docs, "doc_id", "text")
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val l = TextAnalysis.tfidfTopTermsFromTf(tf, n, "doc_id", k = 3)
        .collect().map(_.toSeq).toSet
      val r = TextAnalysis.tfidfTopTermsFromTf(tf, n, "doc_id", k = 3,
        policy = pol).collect().map(_.toSeq).toSet
      assert(r == l)
    }
  }

  test("calibrationCurve: Reliable route == Local route") {
    withReliable { pol =>
      val scored = Seq(
        (1L, 0.9123, true), (2L, 0.1211, false), (3L, 0.5444, true),
        (4L, 0.3333, false), (5L, 0.8008, true), (6L, 0.0001, false),
      ).toDF("id", "score", "y")
      val l = QualityMetrics.calibrationCurve(scored, "id", "score", "y", nBins = 4)
        .collect().map(_.toSeq).toSet
      val r = QualityMetrics.calibrationCurve(scored, "id", "score", "y",
        nBins = 4, policy = pol).collect().map(_.toSeq).toSet
      assert(r == l)
    }
  }

  test("dsirWeights: Reliable route == Local route") {
    withReliable { pol =>
      val l = Curation.dsirWeights(docs, "doc_id", "text", col("label"),
        numBuckets = 32).collect().map(_.toSeq).toSet
      val r = Curation.dsirWeights(docs, "doc_id", "text", col("label"),
        numBuckets = 32, policy = pol).collect().map(_.toSeq).toSet
      assert(r == l)
    }
  }

  test("cmsHeavyHitters / cmsJoinSize: Reliable route == Local route") {
    withReliable { pol =>
      val keys = docs.select(explode(split(col("text"), " ")).as("key"))
      val hhL = Sketches.cmsHeavyHitters(keys, depth = 3, width = 16, k = 5)
        .collect().map(_.toSeq)
      val hhR = Sketches.cmsHeavyHitters(keys, depth = 3, width = 16, k = 5,
        policy = pol).collect().map(_.toSeq)
      assert(hhR.toSeq == hhL.toSeq) // ordered output
      val other = docs.filter(col("label"))
        .select(explode(split(col("text"), " ")).as("key"))
      val jsL = Sketches.cmsJoinSize(keys, other, depth = 3, width = 16)
        .collect().map(_.toSeq).toSet
      val jsR = Sketches.cmsJoinSize(keys, other, depth = 3, width = 16,
        policy = pol).collect().map(_.toSeq).toSet
      assert(jsR == jsL)
    }
  }
}
