package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided deterministic parquet fixtures
  * (`/root/testdata/sf*`, see TESTDATA.md). One DataFrame per table; the
  * partitioned parquet scan is the engine's bootstrap "token-range full
  * scan" (SURVEY §2 S1 — reference: crates/vector-store/src/db_index.rs:439-561).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def loadAll(spark: SparkSession, dir: String): Map[String, DataFrame] =
    names.map(n => n -> load(spark, dir, n)).toMap
}
