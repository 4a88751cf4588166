package graft.operators

import graft.functions.VectorFunctions
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact ANN top-k as a declarative Spark plan (SURVEY §3.1 "Spark shape").
  *
  * Reference query semantics: `crates/vector-store/src/vs_index/usearch.rs:203-248`
  * (ann / filtered_ann), `crates/vector-store/src/httproutes.rs:661-904` (the
  * HTTP entry point, validation, response shaping).
  *
  * Spark-first: `filter(pred) → withColumn(distance) → orderBy(distance).limit(k)`.
  * Catalyst plans the sort+limit as TakeOrderedAndProject (per-partition top-k,
  * then a k-row merge on the driver — no full sort, no full shuffle), and pushes
  * the compiled restriction predicate into the parquet scan. This is the
  * scale-out analogue of the reference's in-traversal predicate callback
  * (SURVEY §4 O1): filtering happens before/while ranking, never after the
  * top-k is taken, so `limit=k` returns up to k *matching* rows.
  */
object Ann {

  /** `PostIndexAnnRequest` analogue (`crates/httpapi/src/lib.rs:368-374`;
    * default limit 1: `lib.rs:289-293`). */
  final case class AnnRequest(
      vector: Seq[Float],
      limit: Int = 1,
      restrictions: Seq[Restriction] = Nil,
      allowFiltering: Boolean = false)

  final class AnnValidationException(msg: String) extends IllegalArgumentException(msg)

  /** Validate + plan an ANN query against an index's base DataFrame.
    *
    * @param df         base table DataFrame (the "index")
    * @param meta       index metadata (target/pk/partitioning/filtering cols)
    * @param req        query
    * @param tieBreak   when true, adds pk columns to the ordering so results
    *                   are deterministic at equal distance (reference behavior
    *                   is unspecified on ties; tests compare ties as sets)
    */
  def search(
      df: DataFrame,
      meta: Catalog.IndexMetadata,
      req: AnnRequest,
      tieBreak: Boolean = true): DataFrame = {
    val options = validate(meta, req)
    plan(df, meta.targetColumn, meta.primaryKeyColumns, options.space, req, tieBreak)
  }

  /** The API-level validation alone (dims, filtering columns, routing
    * score, ALLOW FILTERING — the 400 taxonomy), returning the index
    * options for the caller's own physical plan. [[search]] = validate +
    * [[plan]]; approximate serving paths validate identically and then
    * substitute their pruned plan (Engine approx routing). */
  def validate(
      meta: Catalog.IndexMetadata,
      req: AnnRequest): Catalog.IndexOptionsVs = {
    val options = meta.kind match {
      case Catalog.Vs(o) => o
      case _ => throw new AnnValidationException(s"index ${meta.index} is not a vector index")
    }
    if (req.vector.length != options.dims)
      throw new AnnValidationException(
        s"wrong vector dimensions: got ${req.vector.length}, index has ${options.dims}")

    // P6: restrictions may only reference pk/partition/filtering columns.
    val allowed = meta.allFilteringColumns
    val bad = req.restrictions.flatMap(_.columns).filterNot(allowed.contains)
    if (bad.nonEmpty)
      throw new AnnValidationException(s"restriction on non-filtering column(s): ${bad.mkString(", ")}")
    if (req.restrictions.flatMap(_.columns).contains(meta.targetColumn))
      throw new AnnValidationException(s"cannot filter on the vector column ${meta.targetColumn}")

    // O2/O4: local-index partition pruning consumes partition-key Eq
    // restrictions; they do not count toward residual filtering.
    val (eqCols, rangeCols) = RestrictionCompiler.splitColumns(req.restrictions)
    val needs = Catalog.scoreIndex(meta, eqCols, rangeCols).getOrElse(
      throw new AnnValidationException(
        "index cannot serve this query (local index requires Eq on partition key columns)"))

    // P7: residual filtering requires ALLOW FILTERING (httproutes.rs:751-758).
    needs match {
      case Catalog.YesFiltering(_) if !req.allowFiltering =>
        throw new AnnValidationException(
          "query requires residual filtering; set allowFiltering=true")
      case _ => ()
    }
    options
  }

  /** The physical plan, without API-level validation — reusable by callers
    * that already routed/validated. */
  def plan(
      df: DataFrame,
      embeddingCol: String,
      pkCols: Seq[String],
      space: Space,
      req: AnnRequest,
      tieBreak: Boolean = true,
      carryCols: Seq[String] = Nil): DataFrame = {
    val dims = req.vector.length
    val pred = RestrictionCompiler.compileAll(df.schema, req.restrictions)
    val distCol = VectorFunctions.distance(space, col(embeddingCol), typedlit(req.vector))
    val ordering: Seq[Column] =
      col("distance").asc +: (if (tieBreak) pkCols.map(col(_).asc) else Nil)
    df
      .filter(col(embeddingCol).isNotNull && pred) // P8 + P1-P5
      .withColumn("distance", distCol)
      .orderBy(ordering: _*)
      .limit(req.limit)
      .withColumn("similarity", VectorFunctions.similarity(space, col("distance"), dims))
      .select(pkCols.map(col) ++ carryCols.map(col) :+
        col("distance") :+ col("similarity"): _*)
  }

  /** All-pairs kNN self-join: for every vector, its k nearest neighbors
    * (excluding itself) — the bulk variant of similarity search used for
    * graph building / near-dup candidate generation. Exact O(n²) baseline;
    * at scale, bucket both sides with ApproxAnn's LSH/IVF assignment and
    * join within buckets. */
  def knnJoin(
      df: DataFrame,
      embeddingCol: String,
      idCol: String,
      space: Space,
      k: Int): DataFrame = {
    val queries = df.filter(col(embeddingCol).isNotNull)
      .select(col(idCol).as("query_id"), col(embeddingCol).as("query_vec"))
    // k+1 then drop self (self may NOT be rank 1 under id tiebreak when an
    // identical vector with a smaller id exists), then re-rank
    val raw = searchBatch(queries, df, embeddingCol, Seq(idCol), space, k + 1)
      .filter(col("query_id") =!= col(idCol))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("distance").asc, col(idCol).asc)
    raw.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Batched multi-query ANN: one small query set against a large vector
    * table. The query side is broadcast (no shuffle of the big side); top-k
    * per query via a window over the crossJoin.
    *
    * At 100 TB this is the shape that scales: the vectors stream through
    * executors once; each partition keeps a per-query running top-k
    * (partial window aggregation under AQE).
    */
  def searchBatch(
      queries: DataFrame, // (query_id, query_vec)
      vectors: DataFrame,
      embeddingCol: String,
      pkCols: Seq[String],
      space: Space,
      k: Int,
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec"): DataFrame = {
    val joined = vectors
      .filter(col(embeddingCol).isNotNull)
      .crossJoin(broadcast(queries))
      .withColumn("distance",
        VectorFunctions.distance(space, col(embeddingCol), col(queryVecCol)))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("distance").asc +: pkCols.map(col(_).asc): _*)
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol) +: pkCols.map(col) :+ col("distance") :+ col("rank"): _*)
  }

  /** kNN classification — each probe labeled by the MAJORITY label of its
    * k nearest corpus vectors (the oldest ML primitive, and the eval
    * loop for embedding quality: "does neighborhood structure predict
    * the label?"). Same batched exact top-k shape as [[searchBatch]]
    * (broadcast probe side, per-probe WindowGroupLimit ships ≤ k rows
    * per probe past the exchange) with the label carried through; at
    * corpus scale swap the cross join for the LSH-bucketed candidate
    * generation ([[ApproxAnn.hardNegatives]]' shape). Every tie is
    * deterministic: distance ties break on the pk, vote ties on the
    * label ascending. */
  def knnClassify(
      queries: DataFrame, // (query_id, query_vec)
      vectors: DataFrame,
      embeddingCol: String,
      pkCols: Seq[String],
      labelCol: String,
      space: Space,
      k: Int,
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec"): DataFrame = {
    val joined = vectors
      .filter(col(embeddingCol).isNotNull && col(labelCol).isNotNull)
      .crossJoin(broadcast(queries))
      .withColumn("distance",
        VectorFunctions.distance(space, col(embeddingCol), col(queryVecCol)))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("distance").asc +: pkCols.map(col(_).asc): _*)
    val neighbors = joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(labelCol))
    val votes = neighbors.groupBy(col(queryIdCol), col(labelCol))
      .agg(count(lit(1)).as("n_votes"))
    val vw = Window.partitionBy(col(queryIdCol))
      .orderBy(col("n_votes").desc, col(labelCol).asc)
    votes.withColumn("_rn", row_number().over(vw)).filter(col("_rn") === 1)
      .select(col(queryIdCol), col(labelCol).as("pred_label"), col("n_votes"))
  }
}
