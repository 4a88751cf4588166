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
        // coalesce: a NULL op must not three-valued-null the predicate — an
        // event with a missing op but live text is an upsert, not a delete
        val op = opCol.map(c => coalesce(upper(col(c)) === "DELETE", lit(false)))
          .getOrElse(lit(false))
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

  // ---- segment-append FTS maintenance (the tantivy/LSM commit shape) ----

  val SegCol = "_seg"

  /** foreachBatch writer with SEGMENT-APPEND commit semantics — the shape
    * the reference's tantivy writer actually has (fts_index/tantivy.rs
    * commit loop: each commit seals a new immutable segment; searches visit
    * all live segments; merges amortize in the background — the surface our
    * `fts_segment_count` metric family mirrors).
    *
    * [[mergeFtsBatch]]'s bucket rewrite is O(touched buckets); when a
    * batch's keys spray every bucket (any realistic CDC batch), that is
    * O(accumulated store) per commit — measured as a per-batch lag that
    * GROWS as the corpus accumulates (PERF.md round 9). This writer is the
    * scale cure: each batch appends one new `_seg=<id>` directory of
    * postings + doc lengths — strictly O(batch) work, never touching
    * earlier segments — and deletes/upserts are reconciled AT READ by a
    * per-doc latest-segment rule ([[readFtsSegmentIndex]]): a delete (or
    * null text) writes a tombstone doc-length row (dl = −1) claiming the
    * doc in this segment with no postings. Write cost is therefore
    * independent of corpus size; the read-side union grows with segment
    * count until [[compactFtsSegments]] folds history into one segment.
    *
    * Segment ids must be MONOTONIC over the index's lifetime. Within one
    * streaming query the foreachBatch batchId is; a caller resuming the
    * same store under a NEW query (batchId restarts at 0) must pass the
    * previous lifetime's ceiling as `segOffset`, or older claims would win.
    *
    * Events are assumed LWW-compacted per doc id, as [[mergeFtsBatch]]. */
  def appendFtsSegment(
      spark: SparkSession,
      postingsPath: String,
      docLensPath: String,
      idCol: String,
      textCol: String,
      opCol: Option[String],
      segOffset: Long = 0L): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      val isDelete = dedupIsDelete(textCol, opCol)
      val fresh = Bm25.buildPositionalIndex(batch.filter(!isDelete), idCol, textCol)
      // every event claims its doc in this segment: upserts via their real
      // length, deletes via a −1 tombstone (no postings row exists for it)
      val lens = fresh.docLens.unionByName(
        batch.filter(isDelete).select(col(idCol), lit(-1).as("dl")))
      val seg = segOffset + batchId
      appendSeg(postingsPath, fresh.postings, seg)
      appendSeg(docLensPath, lens, seg)
  }

  /** Append one immutable segment directory — the only write a
    * segment-mode commit performs. */
  private def appendSeg(path: String, df: DataFrame, seg: Long): Unit =
    df.withColumn(SegCol, lit(seg))
      .write.mode("append").partitionBy(SegCol).parquet(path)

  /** Per-id winning claims: the row with the highest segment id. `claims`
    * must hold exactly one row per id per touching segment. */
  private def winners(claims: DataFrame, idCol: String): DataFrame = {
    val dl = claims.withColumn(SegCol, col(SegCol).cast("long"))
    dl.join(dl.groupBy(col(idCol)).agg(max(col(SegCol)).as(SegCol)),
      Seq(idCol, SegCol))
  }

  /** Values rows of the winning (id, seg) claims — an upsert's older
    * rows lose the semi join; tombstoned ids have no live claim at all. */
  private def liveValues(
      valuesPath: String, live: DataFrame, idCol: String,
      spark: SparkSession): DataFrame =
    spark.read.parquet(valuesPath)
      .withColumn(SegCol, col(SegCol).cast("long"))
      .join(live.select(col(idCol), col(SegCol)), Seq(idCol, SegCol), "left_semi")
      .drop(SegCol)

  /** Fold a (values, claims) segment pair into the single CURRENT HIGHEST
    * segment (ids stay monotonic without consuming a new one) and delete
    * every older segment directory. */
  private def compactPair(
      spark: SparkSession, valuesPath: String, claimsPath: String,
      values: DataFrame, claims: DataFrame): Unit = {
    val ceiling = spark.read.parquet(claimsPath)
      .agg(max(col(SegCol).cast("long"))).head.getLong(0)
    // DELETE-LAST across BOTH stores: both ceiling-segment overwrites land
    // before any old segment directory is removed. A crash before the
    // deletes leaves every (id, seg) claim resolvable against live values —
    // readable and re-compactable; the old ordering (values segments
    // deleted before the claims rewrite) left a window where surviving
    // old claims pointed at deleted value segments and the reconcile
    // semi-join silently dropped those docs forever (ADVICE r9). A crash
    // MID-delete leaves a superset of segments; re-issue the below-ceiling
    // directory deletes ([[dropSegmentsBelow]]) to finish — do NOT re-run
    // the fold, which would bake any transiently resurrected claim in.
    overwriteCeiling(valuesPath, values, ceiling, Nil)
    overwriteCeiling(claimsPath, claims, ceiling, Nil)
    dropSegmentsBelow(spark, valuesPath, ceiling)
    dropSegmentsBelow(spark, claimsPath, ceiling)
  }

  /** Rewrite `df` as the single ceiling segment (dynamic partition
    * overwrite; `cellCols` adds the nested cell partitioning of the
    * vector/IVF layouts). An EMPTY fold still writes one schema-bearing
    * zero-row file under the ceiling directory — a dynamic overwrite of
    * zero rows writes nothing at all, and once [[dropSegmentsBelow]] runs
    * the store would have no files left to infer a schema from (a fully
    * tombstoned store must stay readable and appendable). */
  private def overwriteCeiling(
      path: String, df: DataFrame, ceiling: Long,
      cellCols: Seq[String]): Unit = {
    // localCheckpoint cuts lineage from the files about to be replaced
    val out = df.withColumn(SegCol, lit(ceiling)).localCheckpoint(true)
    if (out.isEmpty) {
      val leaf = (s"$SegCol=$ceiling" +: cellCols.map(c => s"$c=-1")).mkString("/")
      out.drop(SegCol +: cellCols: _*).repartition(1)
        .write.mode("overwrite").parquet(s"$path/$leaf")
    } else {
      out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(SegCol +: cellCols: _*).parquet(path)
      // a dynamic overwrite only replaces cell dirs PRESENT in the folded
      // frame: a ceiling-segment cell dir absent from it (e.g. the
      // `_bucket=-1` tombstone dir the last pre-fold batch wrote) would
      // otherwise survive the fold and stay on disk until a later batch
      // happens to rewrite that cell — breaking the "a tombstone lives at
      // most one fold cycle" contract for cell stores (ADVICE r10).
      // Reads were already correct (winners filters stale claims); this
      // keeps the STORAGE contract true too. Cell cardinality is the
      // bucket count — a bounded driver-side set.
      cellCols.foreach { cellCol =>
        val spark = out.sparkSession
        // the keep set matches cast("string") values against PHYSICAL dir
        // names: a null cell (dir __HIVE_DEFAULT_PARTITION__) or a value
        // needing partition-path escaping (space, %, / …) would be absent
        // from keep and its LIVE dir deleted. Today's cell columns are
        // non-null longs; fail loudly if a future store breaks that
        // invariant instead of deleting live data (ADVICE r11).
        val cellVals = out.select(col(cellCol).cast("string")).distinct()
          .collect().map(r => Option(r.getString(0)))
        require(cellVals.forall(_.exists(_.matches("[A-Za-z0-9_.+-]+"))),
          s"cell column $cellCol has a null or path-escaped value " +
            s"(${cellVals.find(!_.exists(_.matches("[A-Za-z0-9_.+-]+")))}); " +
            "stale-dir cleanup only supports plain non-null cell values — " +
            "extend with ExternalCatalogUtils escaping before relaxing this")
        val keep = cellVals.map(v => s"$cellCol=${v.get}").toSet
        val segDir = s"$path/$SegCol=$ceiling"
        graft.sources.IndexStorage.listDirs(spark, segDir)
          .filter(n => n.startsWith(s"$cellCol=") && !keep(n))
          .foreach(n =>
            graft.sources.IndexStorage.deleteRecursive(spark, s"$segDir/$n"))
      }
    }
  }

  /** Remove every `_seg=<id>` directory with id below `ceiling` — the
    * (idempotent) cleanup half of a compaction; re-issue it to repair a
    * compaction interrupted in its delete phase. */
  def dropSegmentsBelow(spark: SparkSession, path: String, ceiling: Long): Unit =
    graft.sources.IndexStorage.listDirs(spark, path)
      .filter(n => n.startsWith(s"$SegCol=") &&
        n.stripPrefix(s"$SegCol=").toLong < ceiling)
      .foreach(n => graft.sources.IndexStorage.deleteRecursive(spark, s"$path/$n"))

  /** Reconciled live view over the segment store: a doc's winning claim is
    * its doc-length row with the HIGHEST segment id; tombstone winners
    * (dl < 0) drop the doc, and only the winning segment's postings
    * survive (an upsert's older postings lose the (doc, seg) semi join).
    * The plan is one narrow groupBy over the doc-length rows (one row per
    * doc per touching batch) plus one equi semi join — no per-segment
    * driver work, segments prune nothing (exactly tantivy: searches visit
    * every live segment until a merge). */
  def readFtsSegmentIndex(
      spark: SparkSession, postingsPath: String, docLensPath: String,
      idCol: String): Bm25.PosIndex = {
    val live = winners(spark.read.parquet(docLensPath), idCol)
      .filter(col("dl") >= 0)
    Bm25.PosIndex(liveValues(postingsPath, live, idCol, spark),
      live.drop(SegCol), idCol)
  }

  /** Live segment-directory count (the `fts_segment_count` number a
    * segment-maintained index reports): one filesystem listing. The layout
    * is kind-independent (`_seg=<id>` directories), so this counts ANY
    * segment store's claims path. */
  def ftsSegmentCount(spark: SparkSession, docLensPath: String): Int =
    graft.sources.IndexStorage.listDirs(spark, docLensPath)
      .count(_.startsWith(s"$SegCol="))

  /** Compaction cadence for segment stores (VERDICT r9 #4): fold history
    * once the live segment count exceeds `maxSegments`. WHY a count
    * threshold: the read-side reconcile is one groupBy over the claims
    * union, whose input grows linearly with segment count — the threshold
    * caps read amplification at a constant factor while keeping the
    * amortized write cost O(store / maxSegments) per fold, the standard
    * LSM trade (tantivy's merge policy is the reference shape,
    * fts_index/tantivy.rs commit/merge loop). Tombstone retirement rides
    * along: every fold drops superseded rows, so a tombstone lives at most
    * one fold cycle. */
  final case class CompactionPolicy(maxSegments: Int = 16) {
    require(maxSegments >= 1, "maxSegments must be >= 1")
  }

  /** Wrap a segment-append writer with the auto-compaction cadence: after
    * each commit, if the claims store's segment count exceeds the policy
    * threshold, run the kind's `compact` function. foreachBatch serializes
    * batches, so the fold always runs against a QUIESCED store (between
    * micro-batches) — the commit-visibility contract the compactors
    * document. One combinator serves all nine segment kinds: pass the
    * kind's claims path (segment counting is layout-independent) and its
    * compact* closure. The `fts_segment_count` gauge (wire it via
    * `onCount`) shows the resulting sawtooth: rises to maxSegments+1,
    * drops to 1 at each fold. */
  def withCompaction(
      spark: SparkSession, claimsPath: String, policy: CompactionPolicy,
      compact: () => Unit, onCount: Int => Unit = _ => ())(
      writer: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      writer(batch, batchId)
      val n = ftsSegmentCount(spark, claimsPath)
      if (n > policy.maxSegments) {
        compact()
        onCount(ftsSegmentCount(spark, claimsPath))
      } else onCount(n)
    }

  /** Fold all segments into one: materialize the reconciled live view, then
    * rewrite it as the CURRENT HIGHEST segment (reusing the ceiling keeps
    * ids monotonic without consuming a new one) and delete every older
    * segment directory. Deleted docs vanish entirely — nothing older
    * remains for a stale claim to resurrect. Amortized cost is a full
    * rewrite, exactly a tantivy merge; run it on a cadence (or a
    * segment-count threshold) from the maintenance scheduler.
    *
    * Same commit-visibility contract as [[overwriteBuckets]]: run against a
    * quiesced store (between micro-batches). */
  def compactFtsSegments(
      spark: SparkSession, postingsPath: String, docLensPath: String,
      idCol: String): Unit = {
    val idx = readFtsSegmentIndex(spark, postingsPath, docLensPath, idCol)
    compactPair(spark, postingsPath, docLensPath, idx.postings, idx.docLens)
  }

  /** Segment-append twin of [[mergeDedupBatch]] — the same tantivy/LSM
    * commit shape for the MinHash dedup stores: each batch appends one
    * `_seg=<id>` directory of fresh shingles (values) and signatures
    * (claims — exactly one row per touched doc; a delete claims the doc
    * with NULL signature columns and no shingle rows). O(batch) per
    * commit; [[readDedupSegmentIndex]] reconciles latest-claim-wins at
    * read; [[compactDedupSegments]] folds history. Same monotonic-segment
    * contract as [[appendFtsSegment]]. */
  def appendDedupSegment(
      spark: SparkSession,
      shinglePath: String,
      sigPath: String,
      idCol: String,
      textCol: String,
      opCol: Option[String],
      shingleN: Int = 5,
      numHashes: Int = 16,
      segOffset: Long = 0L): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      import graft.operators.Dedup
      val isDelete = dedupIsDelete(textCol, opCol)
      val freshShingles = Dedup.shingles(
          batch.filter(!isDelete), idCol, textCol, shingleN)
        .localCheckpoint(true) // one tokenize pass feeds both stores
      val freshSigs =
        Dedup.minhashSignaturesFromShingles(freshShingles, idCol, numHashes)
      // EVERY batch event must claim its doc in this segment, or the doc's
      // older claim keeps winning at read. Deletes have no signature by
      // construction — and so does an UPSERT whose new text yields zero
      // shingles (fewer than shingleN tokens): both get a null-signature
      // tombstone row, derived by anti-joining batch ids against the fresh
      // signatures, matching the bucket twin (mergeDedupBatch removes all
      // touchedIds rows regardless of the fresh side).
      val tombstones = batch.select(col(idCol)).distinct()
        .join(freshSigs.select(col(idCol)), Seq(idCol), "left_anti")
        .select(col(idCol) +: (0 until numHashes)
          .map(i => lit(null).cast("long").as(s"sig_$i")): _*)
      val seg = segOffset + batchId
      appendSeg(shinglePath, freshShingles, seg)
      appendSeg(sigPath, freshSigs.unionByName(tombstones), seg)
  }

  /** Reconciled (shingles, signatures) live view over the dedup segment
    * stores — the [[graft.operators.Dedup.minhashNearDupsFromStores]]
    * input shape, like [[readDedupIndex]] for the bucket layout. */
  def readDedupSegmentIndex(
      spark: SparkSession, shinglePath: String, sigPath: String,
      idCol: String): (DataFrame, DataFrame) = {
    val live = winners(spark.read.parquet(sigPath), idCol)
      .filter(col("sig_0").isNotNull)
    (liveValues(shinglePath, live, idCol, spark), live.drop(SegCol))
  }

  /** Fold the dedup segment stores into one segment (see
    * [[compactFtsSegments]]). */
  def compactDedupSegments(
      spark: SparkSession, shinglePath: String, sigPath: String,
      idCol: String): Unit = {
    val (sh, sigs) = readDedupSegmentIndex(spark, shinglePath, sigPath, idCol)
    compactPair(spark, shinglePath, sigPath, sh, sigs)
  }

  /** Segment-append twin of [[mergeVsBatch]] for the materialized LSH
    * vector store — and a simplification: the (id, old-bucket) SIDECAR
    * disappears. The bucket path needs it because a moved vector's old
    * cell is not derivable from the id; with segments the old row simply
    * LOSES the latest-claim reconcile, wherever it lives. Each batch
    * appends rows (id, vector, `_bucket`) under `_seg=<id>/_bucket=<b>` —
    * the nested layout keeps `_bucket` a partition column, so the serving
    * probe's `IN (buckets)` filter still prunes directories inside every
    * segment — with a (null vector, bucket −1) tombstone row per delete.
    * O(batch) per commit; same monotonic-segment contract as
    * [[appendFtsSegment]]. */
  def appendVsSegment(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      vecCol: String,
      opCol: Option[String],
      dims: Int,
      nbits: Int,
      segOffset: Long = 0L): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      import graft.operators.ApproxAnn
      val isDelete = dedupIsDelete(vecCol, opCol)
      val planes = ApproxAnn.hyperplanes(nbits, dims)
      val fresh = batch.filter(!isDelete)
        .select(col(idCol), col(vecCol),
          ApproxAnn.lshBucket(col(vecCol), planes).as("_bucket"))
      val tombstones = batch.filter(isDelete)
        .select(col(idCol), lit(null).cast(fresh.schema(vecCol).dataType).as(vecCol),
          lit(-1L).as("_bucket"))
      fresh.unionByName(tombstones)
        .withColumn(SegCol, lit(segOffset + batchId))
        .write.mode("append").partitionBy(SegCol, "_bucket").parquet(indexPath)
  }

  /** Reconciled live view over a one-row-per-id CELL store (LSH `_bucket` /
    * IVF `_centroid` layouts): latest (id, seg) claim wins, tombstones
    * (null `liveCol`) drop the id, cell-probe filters push below the
    * reconcile join to the row scan (partition pruning intact) while the
    * winner relation reads only the narrow (id, `_seg`) columns. */
  private def readCellSegments(
      spark: SparkSession, path: String, idCol: String,
      liveCol: String, cellCol: String): DataFrame = {
    val all = spark.read.parquet(path)
      .withColumn(SegCol, col(SegCol).cast("long"))
      .withColumn(cellCol, col(cellCol).cast("long"))
    val win = all.select(col(idCol), col(SegCol))
      .groupBy(col(idCol)).agg(max(col(SegCol)).as(SegCol))
    all.join(win, Seq(idCol, SegCol))
      .filter(col(liveCol).isNotNull)
      .drop(SegCol)
  }

  /** Fold a cell store's segments into one (tombstoned ids vanish). */
  private def compactCellSegments(
      spark: SparkSession, path: String, idCol: String,
      liveCol: String, cellCol: String): Unit = {
    val ceiling = spark.read.parquet(path)
      .agg(max(col(SegCol).cast("long"))).head.getLong(0)
    overwriteCeiling(path,
      readCellSegments(spark, path, idCol, liveCol, cellCol),
      ceiling, Seq(cellCol))
    dropSegmentsBelow(spark, path, ceiling)
  }

  /** Reconciled live view over the vector segment store — the
    * [[graft.operators.ApproxAnn.searchLsh]] input shape (id, vector,
    * `_bucket` long), like [[readVsIndex]] for the bucket layout. A
    * probed stale row (its id re-bucketed or tombstoned by a later
    * segment) loses the (id, seg) join; tombstone rows carry no vector. */
  def readVsSegmentIndex(
      spark: SparkSession, indexPath: String, idCol: String,
      vecCol: String = "embedding"): DataFrame =
    readCellSegments(spark, indexPath, idCol, vecCol, "_bucket")

  /** Fold the vector segment store into one segment (see
    * [[compactFtsSegments]]); tombstoned ids vanish entirely. */
  def compactVsSegments(
      spark: SparkSession, indexPath: String, idCol: String,
      vecCol: String = "embedding"): Unit =
    compactCellSegments(spark, indexPath, idCol, vecCol, "_bucket")

  /** Segment-append twin of [[mergeIvfBatch]] — same shape as
    * [[appendVsSegment]] with the FIXED centroid set as the cell function
    * (retraining centroids remains an index rebuild, as the bucket path
    * documents); tombstones claim cell −1 with a null vector. */
  def appendIvfSegment(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      vecCol: String,
      opCol: Option[String],
      centroids: Seq[(Int, Seq[Float])],
      segOffset: Long = 0L): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      import graft.operators.ApproxAnn
      val isDelete = dedupIsDelete(vecCol, opCol)
      val fresh = ApproxAnn.assignToCentroids(
          batch.filter(!isDelete).select(col(idCol), col(vecCol)),
          vecCol, centroids)
        .select(col(idCol), col(vecCol), col("_centroid").cast("long").as("_centroid"))
      val tombstones = batch.filter(isDelete)
        .select(col(idCol), lit(null).cast(fresh.schema(vecCol).dataType).as(vecCol),
          lit(-1L).as("_centroid"))
      fresh.unionByName(tombstones)
        .withColumn(SegCol, lit(segOffset + batchId))
        .write.mode("append").partitionBy(SegCol, "_centroid").parquet(indexPath)
  }

  /** Reconciled IVF live view (the [[graft.operators.ApproxAnn.searchIvf]]
    * input shape: id, vector, `_centroid` int — like [[readIvfIndex]]). */
  def readIvfSegmentIndex(
      spark: SparkSession, indexPath: String, idCol: String,
      vecCol: String = "embedding"): DataFrame =
    readCellSegments(spark, indexPath, idCol, vecCol, "_centroid")
      .withColumn("_centroid", col("_centroid").cast("int"))

  def compactIvfSegments(
      spark: SparkSession, indexPath: String, idCol: String,
      vecCol: String = "embedding"): Unit =
    compactCellSegments(spark, indexPath, idCol, vecCol, "_centroid")

  /** Segment-append twin of [[mergeIvfPqBatch]] (IVFADC codes): assign +
    * PQ-encode per upsert, rows (id, `_pq`, `_centroid`) append under
    * `_seg/_centroid`; tombstones claim cell −1 with a null code. */
  def appendIvfPqSegment(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      vecCol: String,
      opCol: Option[String],
      centroids: Seq[(Int, Seq[Float])],
      codebooks: graft.operators.ApproxAnn.PqCodebooks,
      segOffset: Long = 0L): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      import graft.operators.ApproxAnn
      val isDelete = dedupIsDelete(vecCol, opCol)
      val fresh = ApproxAnn.pqEncode(
          ApproxAnn.assignToCentroids(
            batch.filter(!isDelete).select(col(idCol), col(vecCol)),
            vecCol, centroids),
          vecCol, codebooks)
        .select(col(idCol), col("_pq"), col("_centroid").cast("long").as("_centroid"))
      val tombstones = batch.filter(isDelete)
        .select(col(idCol), lit(null).cast(fresh.schema("_pq").dataType).as("_pq"),
          lit(-1L).as("_centroid"))
      fresh.unionByName(tombstones)
        .withColumn(SegCol, lit(segOffset + batchId))
        .write.mode("append").partitionBy(SegCol, "_centroid").parquet(indexPath)
  }

  /** Reconciled IVFADC live view (the
    * [[graft.operators.ApproxAnn.searchIvfPq]] `codes` shape, like
    * [[readIvfPqIndex]]). */
  def readIvfPqSegmentIndex(
      spark: SparkSession, indexPath: String, idCol: String): DataFrame =
    readCellSegments(spark, indexPath, idCol, "_pq", "_centroid")
      .withColumn("_centroid", col("_centroid").cast("int"))

  def compactIvfPqSegments(
      spark: SparkSession, indexPath: String, idCol: String): Unit =
    compactCellSegments(spark, indexPath, idCol, "_pq", "_centroid")

  /** Segment-append twin of [[mergePqBatch]] (flat PQ code store): one
    * (id, `_pq`) row per id per touching segment, null-code tombstones;
    * the row IS its claim, so no cell column and no separate claims
    * store. */
  def appendPqSegment(
      spark: SparkSession,
      codesPath: String,
      idCol: String,
      vecCol: String,
      opCol: Option[String],
      codebooks: graft.operators.ApproxAnn.PqCodebooks,
      segOffset: Long = 0L): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      import graft.operators.ApproxAnn
      val isDelete = dedupIsDelete(vecCol, opCol)
      val fresh = ApproxAnn.pqEncode(
          batch.filter(!isDelete).select(col(idCol), col(vecCol)),
          vecCol, codebooks)
        .select(col(idCol), col("_pq"))
      val tombstones = batch.filter(isDelete)
        .select(col(idCol), lit(null).cast(fresh.schema("_pq").dataType).as("_pq"))
      appendSeg(codesPath, fresh.unionByName(tombstones), segOffset + batchId)
  }

  /** Reconciled flat PQ code view: (id, `_pq`), latest claim wins. */
  def readPqSegmentCodes(
      spark: SparkSession, codesPath: String, idCol: String): DataFrame = {
    val live = winners(spark.read.parquet(codesPath), idCol)
      .filter(col("_pq").isNotNull)
    live.select(col(idCol), col("_pq"))
  }

  def compactPqSegments(
      spark: SparkSession, codesPath: String, idCol: String): Unit = {
    val ceiling = spark.read.parquet(codesPath)
      .agg(max(col(SegCol).cast("long"))).head.getLong(0)
    overwriteCeiling(codesPath, readPqSegmentCodes(spark, codesPath, idCol),
      ceiling, Nil)
    dropSegmentsBelow(spark, codesPath, ceiling)
  }

  /** Segment-append twin of [[mergeSpanBatch]] / [[mergeLineBatch]]: the
    * derived rows (span windows / line relation) are the values and a
    * one-row-per-id `_live` flag frame is the claims — the FTS pattern
    * with a boolean claim instead of a doc length. */
  private def appendDerivedSegment(
      valuesPath: String, claimsPath: String, idCol: String,
      batch: DataFrame, isDelete: org.apache.spark.sql.Column,
      derive: DataFrame => DataFrame, seg: Long): Unit = {
    appendSeg(valuesPath, derive(batch.filter(!isDelete)), seg)
    appendSeg(claimsPath, batch.select(col(idCol), (!isDelete).as("_live")), seg)
  }

  private def readDerivedSegments(
      spark: SparkSession, valuesPath: String, claimsPath: String,
      idCol: String): DataFrame = {
    val live = winners(spark.read.parquet(claimsPath), idCol)
      .filter(col("_live"))
    liveValues(valuesPath, live, idCol, spark)
  }

  private def compactDerivedSegments(
      spark: SparkSession, valuesPath: String, claimsPath: String,
      idCol: String): Unit = {
    val values = readDerivedSegments(spark, valuesPath, claimsPath, idCol)
    val claims = winners(spark.read.parquet(claimsPath), idCol)
      .filter(col("_live")).drop(SegCol)
    compactPair(spark, valuesPath, claimsPath, values, claims)
  }

  def appendSpanSegment(
      spark: SparkSession, spanPath: String, claimsPath: String,
      idCol: String, textCol: String, opCol: Option[String],
      windowLen: Int = 10, segOffset: Long = 0L): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      appendDerivedSegment(spanPath, claimsPath, idCol, batch,
        dedupIsDelete(textCol, opCol),
        b => graft.operators.TextAnalysis.spanWindows(b, idCol, textCol, windowLen),
        segOffset + batchId)
  }

  /** Reconciled span-window view (the [[readSpanIndex]] shape). */
  def readSpanSegmentIndex(
      spark: SparkSession, spanPath: String, claimsPath: String,
      idCol: String): DataFrame =
    readDerivedSegments(spark, spanPath, claimsPath, idCol)

  def compactSpanSegments(
      spark: SparkSession, spanPath: String, claimsPath: String,
      idCol: String): Unit =
    compactDerivedSegments(spark, spanPath, claimsPath, idCol)

  def appendLineSegment(
      spark: SparkSession, linePath: String, claimsPath: String,
      idCol: String, textCol: String, opCol: Option[String],
      segOffset: Long = 0L): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      appendDerivedSegment(linePath, claimsPath, idCol, batch,
        dedupIsDelete(textCol, opCol),
        b => graft.operators.TextAnalysis.lineRelation(b, idCol, textCol),
        segOffset + batchId)
  }

  /** Reconciled line-relation view (the [[readLineIndex]] shape). */
  def readLineSegmentIndex(
      spark: SparkSession, linePath: String, claimsPath: String,
      idCol: String): DataFrame =
    readDerivedSegments(spark, linePath, claimsPath, idCol)

  def compactLineSegments(
      spark: SparkSession, linePath: String, claimsPath: String,
      idCol: String): Unit =
    compactDerivedSegments(spark, linePath, claimsPath, idCol)

  /** Segment-append twin of [[StreamingIngest.mergeIntoSnapshot]] for the
    * LWW row state — the log-structured shape of the same semantics: each
    * batch appends its OWN LWW-compacted winners
    * ([[graft.operators.Lww.compactState]]: one row per touched pk with
    * payload + tombstone + winning writetime) as an immutable segment,
    * O(batch) regardless of accumulated state. Cross-batch staleness (the
    * late stale upsert the bucket merge rejects via the base read) is
    * resolved AT READ by [[readSnapshotSegments]]: the winner across
    * segments is picked by the SAME (writetime, first-arrival) order the
    * in-batch compaction uses — LWW max is associative, so hierarchical
    * per-batch-then-cross-segment compaction equals compaction over the
    * raw event log. Tombstones stay until a compaction older than the CDC
    * safety window drops their history (same retention note as
    * [[graft.operators.Lww.applyChanges]]). */
  def appendSnapshotSegment(
      spark: SparkSession,
      statePath: String,
      pkCols: Seq[String],
      tsCol: String,
      opCol: Option[String],
      targetCol: Option[String],
      seqCol: Option[String],
      segOffset: Long = 0L): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      appendSeg(statePath,
        graft.operators.Lww.compactState(batch, pkCols, tsCol, opCol,
          targetCol, seqCol),
        segOffset + batchId)
  }

  /** Reconciled LWW state across snapshot segments (the
    * [[StreamingIngest.mergeIntoSnapshot]] read shape: payload +
    * tombstone + [[graft.operators.Lww.TsCol]] per pk). Winner order:
    * higher writetime; equal writetimes go to the FIRST arrival —
    * (segment, seq) ascending — matching the bucket path's base-wins /
    * min-seq behavior, so the two layouts are row-identical on any event
    * log. */
  def readSnapshotSegments(
      spark: SparkSession, statePath: String, pkCols: Seq[String],
      seqCol: Option[String] = None): DataFrame = {
    import graft.operators.Lww
    val all = spark.read.parquet(statePath)
      .withColumn(SegCol, col(SegCol).cast("long"))
    val payloadCols = all.columns.toSeq.filterNot(_ == SegCol)
    val ordKey = struct(
      Seq(col(Lww.TsCol), (lit(-1L) * col(SegCol)).as("_negseg")) ++
        seqCol.map(s => (lit(-1L) * col(s)).as("_negseq")): _*)
    all.groupBy(pkCols.map(col): _*)
      .agg(max_by(struct(payloadCols.map(col): _*), ordKey).as("_winner"))
      .select(payloadCols.filterNot(pkCols.contains)
        .map(c => col(s"_winner.$c").as(c)) ++ pkCols.map(col): _*)
  }

  /** Fold the snapshot segments into one (see [[compactFtsSegments]]);
    * pass `dropTombstonesOlderThan` (a writetime bound at or beyond the
    * CDC safety window) to also retire tombstone history the wide reader
    * can no longer contradict. */
  def compactSnapshotSegments(
      spark: SparkSession, statePath: String, pkCols: Seq[String],
      seqCol: Option[String] = None,
      dropTombstonesOlderThan: Option[Long] = None): Unit = {
    import graft.operators.Lww
    val ceiling = spark.read.parquet(statePath)
      .agg(max(col(SegCol).cast("long"))).head.getLong(0)
    val state = readSnapshotSegments(spark, statePath, pkCols, seqCol)
    val kept = dropTombstonesOlderThan match {
      case Some(bound) =>
        state.filter(!col(Lww.TombstoneCol) || col(Lww.TsCol) >= bound)
      case None => state
    }
    overwriteCeiling(statePath, kept, ceiling, Nil)
    dropSegmentsBelow(spark, statePath, ceiling)
  }

  /** foreachBatch writer for a materialized LSH vector index
    * ([[graft.operators.ApproxAnn.materializeLshIndex]] layout: rows
    * partitioned by the semantic `_bucket` directory). The reference's
    * usearch index applies CDC upserts/deletes in place
    * (db_index.rs / vs_index/usearch.rs add+remove per key); here:
    *
    * A changed vector may MOVE between buckets, and its old bucket is not
    * derivable from the id — so the index keeps a narrow (id, _bucket)
    * sidecar partitioned by pk-hash. Each batch:
    *  1. looks up the old buckets of its ids in the sidecar (pk-hash-pruned),
    *  2. computes new buckets for upserted vectors,
    *  3. rewrites only old ∪ new bucket directories of the vector store
    *     (drop all rows of touched ids, union fresh rows), and
    *  4. updates the sidecar (pk-hash-bucket rewrite, same as FTS).
    * Per-batch cost is O(changed vectors + their buckets), not O(index).
    *
    * @param dims vector dimensionality (index metadata, fixed per index) */
  def mergeVsBatch(
      spark: SparkSession,
      indexPath: String,
      sidecarPath: String,
      idCol: String,
      vecCol: String,
      opCol: Option[String],
      dims: Int,
      nbits: Int,
      nBuckets: Int = 64): (DataFrame, Long) => Unit = {
    (batch: DataFrame, _: Long) =>
      import graft.operators.ApproxAnn
      val isDelete = {
        // coalesce: see mergeFtsBatch — a NULL op with a live vector upserts
        val op = opCol.map(c => coalesce(upper(col(c)) === "DELETE", lit(false)))
          .getOrElse(lit(false))
        op || col(vecCol).isNull
      }
      val planes = ApproxAnn.hyperplanes(nbits, dims)
      val fresh = batch.filter(!isDelete)
        .select(col(idCol), col(vecCol),
          ApproxAnn.lshBucket(col(vecCol), planes).as("_bucket"))
      val touchedIds = batch.select(col(idCol)).distinct()
      mergeSemanticBuckets(spark, indexPath, sidecarPath, idCol, vecCol,
        "_bucket", fresh, touchedIds, nBuckets)
  }

  /** foreachBatch writer for a materialized IVF index
    * ([[graft.operators.ApproxAnn.buildIvfIndex]] layout: rows partitioned
    * by `_centroid`). Same shape as [[mergeVsBatch]] — the centroid set is
    * FIXED index metadata during maintenance (like the LSH hyperplanes or
    * dims): upserted vectors are assigned to their nearest existing
    * centroid and only old ∪ new centroid cells rewrite. Retraining
    * centroids is an index REBUILD, exactly as the reference rebuilds on
    * index-options change (db_index.rs full-scan bootstrap). */
  def mergeIvfBatch(
      spark: SparkSession,
      indexPath: String,
      sidecarPath: String,
      idCol: String,
      vecCol: String,
      opCol: Option[String],
      centroids: Seq[(Int, Seq[Float])],
      nBuckets: Int = 64): (DataFrame, Long) => Unit = {
    (batch: DataFrame, _: Long) =>
      import graft.operators.ApproxAnn
      val isDelete = {
        // coalesce: see mergeFtsBatch — a NULL op with a live vector upserts
        val op = opCol.map(c => coalesce(upper(col(c)) === "DELETE", lit(false)))
          .getOrElse(lit(false))
        op || col(vecCol).isNull
      }
      val fresh = ApproxAnn.assignToCentroids(
          batch.filter(!isDelete).select(col(idCol), col(vecCol)),
          vecCol, centroids)
        .select(col(idCol), col(vecCol), col("_centroid").cast("long").as("_centroid"))
      val touchedIds = batch.select(col(idCol)).distinct()
      mergeSemanticBuckets(spark, indexPath, sidecarPath, idCol, vecCol,
        "_centroid", fresh, touchedIds, nBuckets)
  }

  /** Shared semantic-bucket merge (LSH `_bucket` / IVF `_centroid`): a
    * changed vector may MOVE between semantic cells and its old cell is not
    * derivable from the id, so the index keeps a narrow (id, cell) sidecar
    * partitioned by pk-hash. Per-batch cost is O(changed vectors + their
    * cells), not O(index). */
  private def mergeSemanticBuckets(
      spark: SparkSession,
      indexPath: String,
      sidecarPath: String,
      idCol: String,
      vecCol: String,
      semCol: String,
      fresh: DataFrame,
      touchedIds: DataFrame,
      nBuckets: Int): Unit = {
      val pkBucket = pmod(xxhash64(col(idCol)), lit(nBuckets.toLong)).cast("int")

      // 1. old semantic buckets of the touched ids, via the pruned sidecar
      val oldBuckets: Seq[Long] =
        if (graft.sources.IndexStorage.hasData(spark, sidecarPath)) {
          val touchedPk = touchedIds.select(pkBucket.as(BucketCol)).distinct()
            .collect().map(_.getInt(0)).toSeq
          spark.read.parquet(sidecarPath)
            .filter(col(BucketCol).isin(touchedPk: _*))
            .join(touchedIds, Seq(idCol), "left_semi")
            .select(col(semCol).cast("long")).distinct()
            .collect().map(_.getLong(0)).toSeq
        } else Nil
      val newBuckets = fresh.select(col(semCol)).distinct()
        .collect().map(_.getLong(0)).toSeq
      val touched = (oldBuckets ++ newBuckets).distinct

      // 2-3. rewrite only the touched semantic bucket directories
      val merged =
        if (graft.sources.IndexStorage.hasData(spark, indexPath))
          spark.read.parquet(indexPath)
            .filter(col(semCol).isin(touched: _*)) // prune on the raw partition col
            .select(col(idCol), col(vecCol), col(semCol).cast("long"))
            .join(touchedIds, Seq(idCol), "left_anti")
            .unionByName(fresh)
        else fresh
      overwriteBuckets(indexPath, semCol, merged, touched)

      // 4. sidecar: replace (id → cell) rows, pk-hash partitioned
      mergeKeyed(spark, sidecarPath, idCol, touchedIds,
        fresh.select(col(idCol), col(semCol)), pkBucket, nBuckets)
  }

  /** foreachBatch writer for the flat PQ code store
    * ([[graft.operators.ApproxAnn.materializePqIndex]] layout: id, _pq,
    * pk-hash bucketed). The codebooks are FIXED index metadata during
    * maintenance, like the IVF centroids or LSH hyperplanes — retraining
    * them is an index rebuild. Codes are derived per row, so maintenance
    * is plain [[mergeKeyed]]: no sidecar, no semantic-cell moves. */
  def mergePqBatch(
      spark: SparkSession,
      codesPath: String,
      idCol: String,
      vecCol: String,
      opCol: Option[String],
      codebooks: graft.operators.ApproxAnn.PqCodebooks,
      nBuckets: Int = 64): (DataFrame, Long) => Unit = {
    (batch: DataFrame, _: Long) =>
      import graft.operators.ApproxAnn
      val fresh = ApproxAnn.pqEncode(
          batch.filter(!dedupIsDelete(vecCol, opCol)).select(col(idCol), col(vecCol)),
          vecCol, codebooks)
        .select(col(idCol), col("_pq"))
      val touchedIds = batch.select(col(idCol)).distinct()
      val bucket = pmod(xxhash64(col(idCol)), lit(nBuckets.toLong)).cast("int")
      mergeKeyed(spark, codesPath, idCol, touchedIds, fresh, bucket, nBuckets)
  }

  /** foreachBatch writer for the IVFADC code store (`_centroid`-partitioned
    * (id, _pq) rows, the [[graft.operators.ApproxAnn.searchIvfPq]] input):
    * assignment + encode per upsert, then the same semantic-bucket merge as
    * the IVF index — a changed vector may move cells, tracked by the
    * sidecar; only old ∪ new cells rewrite. */
  def mergeIvfPqBatch(
      spark: SparkSession,
      indexPath: String,
      sidecarPath: String,
      idCol: String,
      vecCol: String,
      opCol: Option[String],
      centroids: Seq[(Int, Seq[Float])],
      codebooks: graft.operators.ApproxAnn.PqCodebooks,
      nBuckets: Int = 64): (DataFrame, Long) => Unit = {
    (batch: DataFrame, _: Long) =>
      import graft.operators.ApproxAnn
      val fresh = ApproxAnn.pqEncode(
          ApproxAnn.assignToCentroids(
            batch.filter(!dedupIsDelete(vecCol, opCol)).select(col(idCol), col(vecCol)),
            vecCol, centroids),
          vecCol, codebooks)
        .select(col(idCol), col("_pq"), col("_centroid").cast("long").as("_centroid"))
      val touchedIds = batch.select(col(idCol)).distinct()
      mergeSemanticBuckets(spark, indexPath, sidecarPath, idCol, "_pq",
        "_centroid", fresh, touchedIds, nBuckets)
  }

  /** Read the maintained IVFADC code store back (the
    * [[graft.operators.ApproxAnn.searchIvfPq]] `codes` shape). */
  def readIvfPqIndex(spark: SparkSession, indexPath: String): DataFrame =
    spark.read.parquet(indexPath)
      .withColumn("_centroid", col("_centroid").cast("int"))

  /** foreachBatch writer for the positional span-window store
    * ((id, _h), the [[graft.operators.TextAnalysis
    * .duplicatedSpanFractionFromWindows]] input): windows are derived per
    * row, so maintenance is plain [[mergeKeyed]] like the shingle store. */
  def mergeSpanBatch(
      spark: SparkSession,
      spanPath: String,
      idCol: String,
      textCol: String,
      opCol: Option[String],
      windowLen: Int = 10,
      nBuckets: Int = 64): (DataFrame, Long) => Unit = {
    (batch: DataFrame, _: Long) =>
      import graft.operators.TextAnalysis
      val fresh = TextAnalysis.spanWindows(
        batch.filter(!dedupIsDelete(textCol, opCol)), idCol, textCol, windowLen)
      val touchedIds = batch.select(col(idCol)).distinct()
      val bucket = pmod(xxhash64(col(idCol)), lit(nBuckets.toLong)).cast("int")
      mergeKeyed(spark, spanPath, idCol, touchedIds, fresh, bucket, nBuckets)
  }

  /** Read the maintained span-window store back. */
  def readSpanIndex(spark: SparkSession, spanPath: String): DataFrame =
    spark.read.parquet(spanPath).drop(BucketCol)

  /** foreachBatch writer for the (id, ordinal, trimmed-line-hash) line
    * relation ([[graft.operators.TextAnalysis.lineDedupFromLines]]'s
    * input — the cross-doc line-dedup store): lines derive per row, so
    * maintenance is plain [[mergeKeyed]] like the span store. */
  def mergeLineBatch(
      spark: SparkSession,
      linePath: String,
      idCol: String,
      textCol: String,
      opCol: Option[String],
      nBuckets: Int = 64): (DataFrame, Long) => Unit = {
    (batch: DataFrame, _: Long) =>
      import graft.operators.TextAnalysis
      val fresh = TextAnalysis.lineRelation(
        batch.filter(!dedupIsDelete(textCol, opCol)), idCol, textCol)
      val touchedIds = batch.select(col(idCol)).distinct()
      val bucket = pmod(xxhash64(col(idCol)), lit(nBuckets.toLong)).cast("int")
      mergeKeyed(spark, linePath, idCol, touchedIds, fresh, bucket, nBuckets)
  }

  /** Read the maintained line-relation store back. */
  def readLineIndex(spark: SparkSession, linePath: String): DataFrame =
    spark.read.parquet(linePath).drop(BucketCol)

  /** Read the maintained IVF index back (the [[ApproxAnn.searchIvf]] input
    * shape: id, vector, _centroid int). */
  def readIvfIndex(spark: SparkSession, indexPath: String): DataFrame =
    spark.read.parquet(indexPath)
      .withColumn("_centroid", col("_centroid").cast("int"))

  /** Read the maintained vector index back (the [[ApproxAnn.searchLsh]]
    * input shape: id, vector, _bucket). */
  def readVsIndex(spark: SparkSession, indexPath: String): DataFrame =
    spark.read.parquet(indexPath)
      .withColumn("_bucket", col("_bucket").cast("long"))

  /** foreachBatch writer for the dedup index artifacts: the (id, sh)
    * shingle store and the (id, sig_*) MinHash signature store that
    * [[graft.operators.Dedup.minhashNearDupsFromStores]] serves from. Both
    * are keyed by doc id, so maintenance is the [[mergeKeyed]] shape: drop
    * every row of a touched id, union freshly computed shingles/signatures
    * for the upserts, rewrite only the touched pk-hash buckets. Signatures
    * derive from the SAME fresh shingle frame (one tokenize pass per
    * batch), keeping the two stores consistent by construction. */
  def mergeDedupBatch(
      spark: SparkSession,
      shinglePath: String,
      sigPath: String,
      idCol: String,
      textCol: String,
      opCol: Option[String],
      shingleN: Int = 5,
      numHashes: Int = 16,
      nBuckets: Int = 64): (DataFrame, Long) => Unit = {
    (batch: DataFrame, _: Long) =>
      import graft.operators.Dedup
      val isDelete = dedupIsDelete(textCol, opCol)
      val upserts = batch.filter(!isDelete)
      val touchedIds = batch.select(col(idCol)).distinct()
      val freshShingles = Dedup.shingles(upserts, idCol, textCol, shingleN)
        .localCheckpoint(true) // one tokenize pass feeds both stores
      val freshSigs =
        Dedup.minhashSignaturesFromShingles(freshShingles, idCol, numHashes)
      mergeDedupPrepared(spark, shinglePath, sigPath, idCol, nBuckets)(
        touchedIds, freshShingles, freshSigs)
  }

  /** The delete predicate shared by the dedup maintenance and the
    * streaming near-dup probe (one definition, two callers — the two
    * delete semantics must not drift). */
  private[streaming] def dedupIsDelete(
      textCol: String, opCol: Option[String]): org.apache.spark.sql.Column = {
    // coalesce: see mergeFtsBatch — a NULL op with live text upserts
    val op = opCol.map(c => coalesce(upper(col(c)) === "DELETE", lit(false)))
      .getOrElse(lit(false))
    op || col(textCol).isNull
  }

  /** [[mergeDedupBatch]]'s store merge over PREBUILT batch artifacts — for
    * callers that already computed the batch's shingles/signatures (the
    * streaming near-dup probe), so a micro-batch is tokenized and
    * MinHashed exactly once. */
  def mergeDedupPrepared(
      spark: SparkSession,
      shinglePath: String,
      sigPath: String,
      idCol: String,
      nBuckets: Int = 64)(
      touchedIds: DataFrame,
      freshShingles: DataFrame,
      freshSigs: DataFrame): Unit = {
    val bucket = pmod(xxhash64(col(idCol)), lit(nBuckets.toLong)).cast("int")
    mergeKeyed(spark, shinglePath, idCol, touchedIds, freshShingles, bucket, nBuckets)
    mergeKeyed(spark, sigPath, idCol, touchedIds, freshSigs, bucket, nBuckets)
  }

  /** Read the maintained dedup stores back as the
    * (shingles, signatures) pair `minhashNearDupsFromStores` consumes. */
  def readDedupIndex(
      spark: SparkSession, shinglePath: String, sigPath: String)
      : (DataFrame, DataFrame) =
    (spark.read.parquet(shinglePath).drop(BucketCol),
      spark.read.parquet(sigPath).drop(BucketCol))

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
    val exists = graft.sources.IndexStorage.hasData(spark, path)
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
    overwriteBuckets(path, BucketCol, merged.withColumn(BucketCol, bucket), touched)
  }

  /** Dynamic-partition-overwrite `merged` into `path` clustered by
    * `bucketCol`, then clear touched buckets that ended up EMPTY — dynamic
    * overwrite only replaces partitions present in the written data, so a
    * bucket whose rows were all deleted would otherwise keep a stale
    * directory. localCheckpoint cuts lineage to the files being replaced
    * (read-modify-write on one path); clustering by bucket gives one writer
    * per directory.
    *
    * COMMIT VISIBILITY CONTRACT (same as StreamingIngest.mergeIntoSnapshot):
    * touched bucket directories are replaced in place and emptied buckets
    * are deleted outside any commit protocol, so serving reads must plan
    * against a quiesced store — between micro-batches, or through a
    * snapshot-isolating table layer. */
  private def overwriteBuckets(
      path: String, bucketCol: String, merged: DataFrame, touched: Seq[Any]): Unit = {
    val out = merged.repartition(col(bucketCol)).localCheckpoint(true)
    out.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(bucketCol)
      .parquet(path)
    if (touched.nonEmpty) {
      val present = out.select(col(bucketCol)).distinct()
        .collect().map(_.get(0)).toSet
      (touched.toSet -- present).foreach { b =>
        graft.sources.IndexStorage.deleteRecursive(
          merged.sparkSession, s"$path/$bucketCol=$b")
      }
    }
  }
}
