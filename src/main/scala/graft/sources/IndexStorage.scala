package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Physical layout for index tables (SURVEY §4 O2 — partition pruning).
  *
  * The reference's "local index" (one sub-index per partition-key value,
  * table/mod.rs:97-114) and our LSH buckets (ApproxAnn) both map to
  * directory-partitioned parquet: `partitionBy(col)` at write time turns a
  * partition-key Eq / bucket probe into a file-source `PartitionFilters`
  * prune — only matching directories are listed and scanned, which is the
  * 1000-executor analogue of "resolve the sub-index".
  */
object IndexStorage {

  /** Write an index table partitioned by pruning columns. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** True when the physical plan prunes partitions for the given scan —
    * test/diagnostic hook: a probe query whose plan does NOT show partition
    * filters is reading the whole index. */
  def prunesPartitions(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString()
    plan.contains("PartitionFilters: [") &&
      !plan.contains("PartitionFilters: []")
  }
}
