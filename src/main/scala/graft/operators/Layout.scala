package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout operators: multi-dimensional clustering keys (Z-order /
  * Morton interleave) for write-time file organization.
  *
  * At 100 TB the scan cost of a two-dimensional predicate (user × time,
  * tenant × date) is set by LAYOUT, not compute: range-partitioning and
  * sorting parquet by the interleaved key makes every file a small
  * hyper-rectangle in BOTH dimensions, so row-group min/max stats prune on
  * either predicate — the reason Delta/Iceberg ship OPTIMIZE ZORDER. A
  * single-column sort prunes one dimension and shreds the other; the
  * Z-curve bounds the locality loss of each to ~√(row-group fraction).
  *
  * The reference organizes its stores by a one-dimensional token ring
  * (crates/vector-store/src/db_index.rs bootstrap scans); this extends the
  * same idea to composite scan predicates.
  */
object Layout {

  /** Morton/Z interleave of the low `bits` bits of two non-negative codes:
    * result bit 2i holds a's bit i, bit 2i+1 holds b's. Pure unrolled
    * shift/and/or column arithmetic — whole-stage-codegen'd, and replayable
    * verbatim in any engine with integer bit ops. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in 1..31, got $bits")
    (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Attach the Z key and return the frame range-partitioned and sorted by
    * it — the shape to hand straight to a parquet write. One range shuffle;
    * the sort is within partitions only (no global single-partition sort). */
  def zorder(
      df: DataFrame, a: Column, b: Column,
      bits: Int = 16, outCol: String = "z"): DataFrame =
    df.withColumn(outCol, zValue(a, b, bits))
      .repartitionByRange(col(outCol))
      .sortWithinPartitions(col(outCol))

  /** Bucketed-table layout — shuffle ONCE at write time instead of on
    * every join. `bucketBy(n, key)` hash-partitions rows into n files per
    * write task and records the spec in the catalog; a later equi-join of
    * two tables bucketed the same way plans with NO Exchange on either
    * side (bucket-to-bucket task alignment; `sortBy` additionally removes
    * the per-task Sort under SortMergeJoin). At 100 TB this is the
    * difference between re-shuffling the fact table on every join of a
    * recurring pipeline and paying the shuffle once at ingest — the same
    * build-once economics as the index stores, applied to JOIN layout.
    * `PlanQualitySpec` pins the Exchange-free plan.
    *
    * Files are parquet at `path` (external table), metadata in the
    * session catalog; `n` should be sized so a bucket ≈ one task's worth
    * (128-256 MB) at the target scale. */
  def writeBucketed(
      df: DataFrame, table: String, path: String,
      bucketCol: String, nBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet").option("path", path)
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)

  /** Session-cached [[writeBucketed]]: write+register on first use, serve
    * the catalog table afterwards (catalog metadata is session-scoped, so
    * a fresh session rewrites — the bucket spec must come from the
    * catalog for the planner to use it). */
  def bucketedOnce(
      df: DataFrame, table: String, path: String,
      bucketCol: String, nBuckets: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(table))
      writeBucketed(df, table, path, bucketCol, nBuckets)
    spark.table(table)
  }
}
