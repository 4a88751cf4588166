package graft.tools

import graft.operators.ApproxAnn
import graft.operators.Ann.AnnRequest
import graft.functions.VectorFunctions.Euclidean
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the materialized-LSH path (dev aid, not part of the
  * driver contract). */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    time("warm count")(emb.count())
    val qv = time("qv head")(
      emb.filter(col("vec_id") === 0).select("embedding").head.getSeq[Float](0))
    val built = time("buildLshIndex+count")(
      ApproxAnn.buildLshIndex(emb, "embedding", 8, qv.length).count())
    println(s"[profile] built rows $built")
    time("materialize (write)")(
      graft.sources.IndexStorage.writePartitioned(
        ApproxAnn.buildLshIndex(emb, "embedding", 8, qv.length),
        "/tmp/profile-lsh", Seq("_bucket")))
    time("write flat (no partitionBy)")(
      ApproxAnn.buildLshIndex(emb, "embedding", 8, qv.length)
        .write.mode("overwrite").parquet("/tmp/profile-lsh-flat"))
    time("write partitionBy coalesce(1)")(
      ApproxAnn.buildLshIndex(emb, "embedding", 8, qv.length).coalesce(1)
        .write.partitionBy("_bucket").mode("overwrite").parquet("/tmp/profile-lsh-c1"))
    time("materialize again (2nd)")(
      graft.sources.IndexStorage.writePartitioned(
        ApproxAnn.buildLshIndex(emb, "embedding", 8, qv.length),
        "/tmp/profile-lsh", Seq("_bucket")))
    val idx = time("read back")(graft.sources.IndexStorage.read(spark, "/tmp/profile-lsh"))
    time("probe search")(
      ApproxAnn.searchLsh(idx, "embedding", Seq("vec_id"), Euclidean,
        AnnRequest(qv, limit = 10), nbits = 8, radius = 2).count())
    spark.stop()
  }
}
