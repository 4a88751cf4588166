package graft

import graft.operators.QualityMetrics
import org.apache.spark.sql.functions._

/** Metric definitions vs the reference harness semantics (recall@k,
  * precision@k, MRR, nDCG@k — latte/full-text-search metrics table). */
class QualityMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def one(retrieved: Seq[Long], relevant: Seq[Long], k: Int) =
    QualityMetrics.evaluate(
      Seq((retrieved, relevant)).toDF("retrieved", "relevant"),
      "retrieved", "relevant", k).head()

  test("perfect retrieval: all metrics 1") {
    val r = one(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), 3)
    assert(r.getAs[Double]("recall_at_3") == 1.0)
    assert(r.getAs[Double]("precision_at_3") == 1.0)
    assert(r.getAs[Double]("mrr") == 1.0)
    assert(math.abs(r.getAs[Double]("ndcg_at_3") - 1.0) < 1e-12)
  }

  test("partial retrieval: textbook values") {
    // retrieved 1,9,2 vs relevant {1,2,3}: hits at ranks 1 and 3
    val r = one(Seq(1L, 9L, 2L), Seq(1L, 2L, 3L), 3)
    assert(math.abs(r.getAs[Double]("recall_at_3") - 2.0 / 3) < 1e-12)
    assert(math.abs(r.getAs[Double]("precision_at_3") - 2.0 / 3) < 1e-12)
    assert(r.getAs[Double]("mrr") == 1.0)
    val dcg = 1.0 / (math.log(2) / math.log(2)) + 1.0 / (math.log(4) / math.log(2))
    val idcg = 1.0 + 1.0 / (math.log(3) / math.log(2)) + 1.0 / (math.log(4) / math.log(2))
    assert(math.abs(r.getAs[Double]("ndcg_at_3") - dcg / idcg) < 1e-12)
  }

  test("no relevant retrieved: zeros (and no division blowups)") {
    val r = one(Seq(7L, 8L), Seq(1L, 2L), 2)
    assert(r.getAs[Double]("recall_at_2") == 0.0)
    assert(r.getAs[Double]("mrr") == 0.0)
    assert(r.getAs[Double]("ndcg_at_2") == 0.0)
    val empty = one(Seq(7L), Seq.empty[Long], 1)
    assert(empty.getAs[Double]("recall_at_1") == 0.0)
    assert(empty.getAs[Double]("ndcg_at_1") == 0.0)
  }

  test("mrr uses the first hit's rank") {
    assert(one(Seq(9L, 9L, 2L), Seq(2L), 3).getAs[Double]("mrr") == 1.0 / 3)
  }

  test("summary averages across the query set (approx-vs-exact recall)") {
    val df = Seq(
      (Seq(1L, 2L), Seq(1L, 2L)), // recall 1
      (Seq(1L, 9L), Seq(1L, 2L))) // recall .5
      .toDF("retrieved", "relevant")
    val s = QualityMetrics.summary(
      QualityMetrics.evaluate(df, "retrieved", "relevant", 2), 2).head()
    assert(math.abs(s.getAs[Double]("recall_at_2") - 0.75) < 1e-12)
  }
}
