package graft.streaming

import graft.operators.Bm25
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of materialized FTS index stores from a change
  * stream (SURVEY §2.8 ST6 — commit batching; §3.3 step 4).
  *
  * The reference keeps its tantivy index continuously updated from CDC and
  * commits every 3 s (fts_index/tantivy.rs:129-130: IndexWriter commit loop;
  * doc delete+re-add per updated row). The Spark-native equivalent: the
  * postings/doc-length parquet stores are directory-partitioned by a pk-hash
  * bucket, and each micro-batch
  *  1. computes the buckets its doc ids touch,
  *  2. partition-prunes the store read to those buckets,
  *  3. drops every posting of a touched doc (upsert = replace, delete = drop),
  *  4. unions freshly analyzed postings for the upserted docs, and
  *  5. rewrites ONLY the touched bucket directories (dynamic overwrite).
  * Per-batch cost is O(changed docs + their buckets), not O(corpus) — the
  * property that keeps a 100 TB postings store maintainable by a CDC trickle.
  *
  * Events are assumed LWW-compacted per doc id (compose with
  * [[graft.operators.Lww.compactState]] upstream for out-of-order streams).
  */
object IndexMaintenance {

  val BucketCol = "_bkt"

  /** foreachBatch writer: merge a micro-batch of document upserts/deletes
    * into the positional-postings and doc-length stores at the given paths.
    *
    * @param opCol optional operation column; value `DELETE` (or a null
    *              `textCol`) removes the document from the index
    * @param nBuckets bucket count — size so one bucket is a comfortable
    *                 task read at the target corpus size */
  def mergeFtsBatch(
      spark: SparkSession,
      postingsPath: String,
      docLensPath: String,
      idCol: String,
      textCol: String,
      opCol: Option[String],
      nBuckets: Int = 64): (DataFrame, Long) => Unit = {
    (batch: DataFrame, _: Long) =>
      val bucket = pmod(xxhash64(col(idCol)), lit(nBuckets.toLong)).cast("int")
      val isDelete = {
        val op = opCol.map(c => upper(col(c)) === "DELETE").getOrElse(lit(false))
        op || col(textCol).isNull
      }
      val upserts = batch.filter(!isDelete)
      val touchedIds = batch.select(col(idCol)).distinct()
      val fresh = Bm25.buildPositionalIndex(upserts, idCol, textCol)

      mergeKeyed(spark, postingsPath, idCol, touchedIds, fresh.postings, bucket, nBuckets)
      mergeKeyed(spark, docLensPath, idCol, touchedIds, fresh.docLens, bucket, nBuckets)
  }

  /** Read the maintained stores back as a queryable [[Bm25.PosIndex]] (the
    * postings double as tf postings — see SparkEntry.bm25Stores). */
  def readFtsIndex(
      spark: SparkSession, postingsPath: String, docLensPath: String,
      idCol: String): Bm25.PosIndex =
    Bm25.PosIndex(
      spark.read.parquet(postingsPath).drop(BucketCol),
      spark.read.parquet(docLensPath).drop(BucketCol),
      idCol)

  /** Replace all rows keyed by `touchedIds` with `fresh` rows, rewriting
    * only the bucket directories those keys live in. Shared shape with
    * [[StreamingIngest.mergeIntoSnapshot]] (LWW row state); here the value
    * rows are one-to-many per key (postings). */
  private def mergeKeyed(
      spark: SparkSession,
      path: String,
      idCol: String,
      touchedIds: DataFrame,
      fresh: DataFrame,
      bucket: org.apache.spark.sql.Column,
      nBuckets: Int): Unit = {
    val exists = new java.io.File(path).exists()
    val touched: Seq[Int] =
      if (exists) touchedIds.select(bucket.as(BucketCol)).distinct()
        .collect().map(_.getInt(0)).toSeq
      else Nil
    val merged =
      if (exists)
        spark.read.parquet(path)
          .filter(col(BucketCol).isin(touched: _*)) // PartitionFilters prune
          .drop(BucketCol)
          .join(touchedIds, Seq(idCol), "left_anti") // upsert = replace
          .unionByName(fresh)
      else fresh
    // localCheckpoint cuts lineage to the files being replaced; clustering
    // by bucket gives one writer per directory
    val out = merged.withColumn(BucketCol, bucket)
      .repartition(col(BucketCol))
      .localCheckpoint(true)
    out.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(BucketCol)
      .parquet(path)
    // dynamic overwrite only replaces partitions PRESENT in the written
    // data — a touched bucket whose docs were all deleted would keep its
    // stale directory. Clear those explicitly (delete-only buckets).
    if (touched.nonEmpty) {
      val present = out.select(col(BucketCol)).distinct()
        .collect().map(_.getInt(0)).toSet
      (touched.toSet -- present).foreach { b =>
        org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(path, s"$BucketCol=$b"))
      }
    }
  }
}
