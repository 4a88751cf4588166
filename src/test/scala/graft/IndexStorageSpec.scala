package graft

import graft.functions.VectorFunctions.Euclidean
import graft.operators.{Ann, ApproxAnn, Dedup}
import graft.operators.Ann.AnnRequest
import org.apache.spark.sql.functions._
import graft.sources.IndexStorage

/** Physical layout: partitioned index writes give partition-pruned probes. */
class IndexStorageSpec extends SparkSpec {
  import spark.implicits._

  test("LSH bucket probe prunes partitions at the file source") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lsh").toFile
    try {
      val emb = spark.read.parquet(sf("embeddings"))
      val qv = emb.filter(col("vec_id") === 0).select("embedding").head.getSeq[Float](0)
      val indexed = ApproxAnn.buildLshIndex(emb, "embedding", nbits = 6, dims = qv.length)
      IndexStorage.writePartitioned(indexed, dir.getAbsolutePath, Seq("_bucket"))

      val onDisk = IndexStorage.read(spark, dir.getAbsolutePath)
      val probes = ApproxAnn.probeBuckets(qv, 6, radius = 1)
      val probe = onDisk.filter(col("_bucket").isin(probes: _*))
      assert(IndexStorage.prunesPartitions(probe), "probe must show PartitionFilters")

      // pruned result matches in-memory filtering exactly
      val viaDisk = Ann.plan(probe, "embedding", Seq("vec_id"), Euclidean,
        AnnRequest(qv, 5)).select("vec_id").as[Long].collect().toSeq
      val viaMem = ApproxAnn.searchLsh(indexed, "embedding", Seq("vec_id"),
        Euclidean, AnnRequest(qv, 5), nbits = 6, radius = 1)
        .select("vec_id").as[Long].collect().toSeq
      assert(viaDisk == viaMem)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("local-index partition column prunes the same way") {
    val dir = java.nio.file.Files.createTempDirectory("graft_local").toFile
    try {
      val df = Fixtures.itemsLocal(spark, "/root/testdata/sf0.001")
      IndexStorage.writePartitioned(df, dir.getAbsolutePath, Seq("part_col"))
      val probe = IndexStorage.read(spark, dir.getAbsolutePath)
        .filter(col("part_col") === 7)
      assert(IndexStorage.prunesPartitions(probe))
      assert(probe.count() == df.filter(col("part_col") === 7).count())
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("shingle df cap removes only boilerplate-driven pairs") {
    val docs = Seq(
      (0L, "common common common common common alpha beta gamma delta eps"),
      (1L, "common common common common common zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta eps unique tail words here now"),
      (3L, "common common common common common psi chi phi upsilon tau"))
      .toDF("doc_id", "text")
    // docs 0/1/3 share ONLY the boilerplate prefix shingles (df=3);
    // docs 0/2 share a genuine content shingle (df=2)
    val without = Dedup.jaccardPairs(docs, "doc_id", "text", 5, 0.05)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(without.contains((0L, 1L)))
    val withCap = Dedup.jaccardPairs(docs, "doc_id", "text", 5, 0.05,
        maxShingleDf = Some(2))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!withCap.contains((0L, 1L))) // boilerplate-only pair gone
    assert(withCap.contains((0L, 2L))) // genuine content overlap survives
  }

  test("buildOnce fingerprint markers resolve through Hadoop FS (file: URI)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_once").toFile
    try {
      // URI-style paths never resolve through java.io.File — this is the
      // HDFS/S3 stand-in the local filesystem can express. Base + store
      // both use it so a java.io probe would answer "absent" ⇒ rebuild
      // every call, which is exactly what the rebuild counter must refute.
      val base = s"file:${sf("documents")}"
      val store = s"file:${dir.getAbsolutePath}/store"
      var builds = 0
      def build(): Unit = {
        builds += 1
        spark.read.parquet(sf("documents")).limit(5)
          .write.mode("overwrite").parquet(store)
      }
      IndexStorage.buildOnce(base, store)(build())
      assert(builds == 1)
      val counted = IndexStorage.rebuilds.get()
      IndexStorage.buildOnce(base, store)(build())
      assert(builds == 1, "second call must reuse, not rebuild")
      assert(IndexStorage.rebuilds.get() == counted)
      // marker survives alongside parquet data and the store stays readable
      assert(spark.read.parquet(store).count() == 5)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }
}
