package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Search-quality metrics the reference's harnesses measure
  * (BASELINE.md: recall@k for the CQL path — benchmark/src/main.rs:608-634;
  * recall@k, precision@k, MRR, nDCG@k for the FTS latte workload —
  * latte/full-text-search/README.md).
  *
  * Input shape: per query, the retrieved ids in rank order and the relevant
  * (ground-truth) ids in ideal order — both as array columns, computed
  * upstream (e.g. approximate results vs the exact plan's results).
  * Everything is per-row array arithmetic: no shuffle beyond what built the
  * arrays; evaluating a million queries is embarrassingly parallel.
  */
object QualityMetrics {

  /** |retrieved[0..k) ∩ relevant| / |relevant| */
  def recallAtK(retrieved: Column, relevant: Column, k: Int): Column =
    size(array_intersect(slice(retrieved, 1, k), relevant)).cast("double") /
      greatest(size(relevant), lit(1))

  /** |retrieved[0..k) ∩ relevant| / k */
  def precisionAtK(retrieved: Column, relevant: Column, k: Int): Column =
    size(array_intersect(slice(retrieved, 1, k), relevant)).cast("double") / k

  /** 1 / rank of the first relevant hit (0 when none). */
  def reciprocalRank(retrieved: Column, relevant: Column): Column = {
    val firstHit = array_position(
      transform(retrieved, r => array_contains(relevant, r)), true)
    when(firstHit > 0, lit(1.0) / firstHit).otherwise(lit(0.0))
  }

  /** Binary-relevance nDCG@k: DCG with gain 1/log2(rank+1) over the first k
    * retrieved, normalized by the ideal DCG for |relevant| items. */
  def ndcgAtK(retrieved: Column, relevant: Column, k: Int): Column = {
    def dcgOf(flags: Column): Column =
      aggregate(
        zip_with(flags, sequence(lit(1), size(flags)),
          (hit, rank) => when(hit, lit(1.0) / log2(rank.cast("double") + 1.0))
            .otherwise(lit(0.0))),
        lit(0.0), _ + _)
    val gains = transform(slice(retrieved, 1, k), r => array_contains(relevant, r))
    val idealSize = least(size(relevant), lit(k))
    val idealGains = transform(sequence(lit(1), greatest(idealSize, lit(1))),
      _ => idealSize > 0) // idealSize ones (or a single false when empty)
    val ideal = dcgOf(idealGains)
    when(ideal > 0, dcgOf(gains) / ideal).otherwise(lit(0.0))
  }

  /** Attach all metrics; `retrievedCol`/`relevantCol` are array columns. */
  def evaluate(df: DataFrame, retrievedCol: String, relevantCol: String, k: Int): DataFrame =
    df.withColumn(s"recall_at_$k", recallAtK(col(retrievedCol), col(relevantCol), k))
      .withColumn(s"precision_at_$k", precisionAtK(col(retrievedCol), col(relevantCol), k))
      .withColumn("mrr", reciprocalRank(col(retrievedCol), col(relevantCol)))
      .withColumn(s"ndcg_at_$k", ndcgAtK(col(retrievedCol), col(relevantCol), k))

  /** Convenience: mean metrics over a whole query set. */
  def summary(evaluated: DataFrame, k: Int): DataFrame =
    evaluated.agg(
      avg(col(s"recall_at_$k")).as(s"recall_at_$k"),
      avg(col(s"precision_at_$k")).as(s"precision_at_$k"),
      avg(col("mrr")).as("mrr"),
      avg(col(s"ndcg_at_$k")).as(s"ndcg_at_$k"))
}
