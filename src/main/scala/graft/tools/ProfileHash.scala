package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-profile of the md5-derived [[graft.operators.Dedup.stableHash]]
  * under single-task vs all-cores execution — quantifies the per-JVM
  * MessageDigest contention hypothesis (commons-codec's md5Hex calls
  * MessageDigest.getInstance per row; the JDK provider lookup serializes
  * concurrent callers). Usage: runMain graft.tools.ProfileHash [rows]. */
object ProfileHash {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def hash(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm codegen
    spark.range(0, 1000, 1, 1).select(hash(col("id").cast("string"))).count()
    time(s"serial  $n rows") {
      spark.range(0, n, 1, 1)
        .select(hash(col("id").cast("string")).as("h"))
        .agg(sum(col("h") % 1000000007L)).collect()
    }
    time(s"${cpus}-way $n rows") {
      spark.range(0, n, 1, cpus.toInt)
        .select(hash(col("id").cast("string")).as("h"))
        .agg(sum(col("h") % 1000000007L)).collect()
    }
    // the same comparison for a contention-free built-in (xxhash64)
    time(s"serial  $n rows xxh") {
      spark.range(0, n, 1, 1)
        .select(xxhash64(col("id").cast("string")).as("h"))
        .agg(sum(col("h") % 1000000007L)).collect()
    }
    time(s"${cpus}-way $n rows xxh") {
      spark.range(0, n, 1, cpus.toInt)
        .select(xxhash64(col("id").cast("string")).as("h"))
        .agg(sum(col("h") % 1000000007L)).collect()
    }
    spark.stop()
  }
}
