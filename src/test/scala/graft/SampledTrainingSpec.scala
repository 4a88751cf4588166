package graft

import graft.operators.ApproxAnn
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-sample centroid/codebook training (VERDICT r10 #1): k-means
  * fit on a seeded min(n, k·256) sample must be statistically equivalent
  * to a full-corpus fit — this pins the parity quantitatively on a corpus
  * LARGE ENOUGH for the sampling to actually engage (the sf fixtures are
  * below every cap, so the default paths there are bit-identical to
  * pre-sampling behavior — also asserted).
  *
  * The corpus: 3000 rows in 4 well-separated planted clusters (LCG noise,
  * fully deterministic). Any sane k-means fit recovers the 4 centers, so
  * the sampled/full mean quantization error ratio sits at ~1.0; the 15%
  * ceiling leaves room for sampling jitter without admitting a
  * degenerate fit. */
class SampledTrainingSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 8
  private lazy val clustered: DataFrame = {
    val centers = Seq(
      Seq(10f, 0f, 0f, 0f, 0f, 0f, 0f, 0f),
      Seq(0f, 10f, 0f, 0f, 0f, 0f, 10f, 0f),
      Seq(0f, 0f, 10f, 0f, 10f, 0f, 0f, 0f),
      Seq(0f, 0f, 0f, 10f, 0f, 10f, 0f, 10f))
    (0 until 3000).map { i =>
      val c = centers(i % 4)
      val v = (0 until dims).map { j =>
        // deterministic LCG noise in [-0.5, 0.5) — no Random, replayable
        val h = (i.toLong * 2654435761L + j * 40503L) % 1000L
        c(j) + (h.toFloat / 1000f - 0.5f)
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding").repartition(4).cache()
  }

  /** Mean squared distance to the nearest centroid — the k-means
    * objective, the one number that says "these centers describe the
    * data equally well". */
  private def quantErr(df: DataFrame, vecCol: String,
      cents: Seq[(Int, Seq[Float])]): Double =
    df.select(avg(ApproxAnn.centroidBest(vecCol, cents).getField("d")))
      .head.getDouble(0)

  test("ivf: sampled fit matches full fit quality; both deterministic") {
    val full = ApproxAnn.trainIvfCentroids(clustered, "embedding", k = 4,
      seed = 7L, samplePerCentroid = Int.MaxValue)
    // cap = 4·64 = 256 « 3000 rows ⇒ sampling engages
    val sampled = ApproxAnn.trainIvfCentroids(clustered, "embedding", k = 4,
      seed = 7L, samplePerCentroid = 64)
    assert(full.size == 4 && sampled.size == 4)
    val (fe, se) = (quantErr(clustered, "embedding", full),
      quantErr(clustered, "embedding", sampled))
    assert(se <= fe * 1.15,
      s"sampled fit quantization error $se vs full $fe — parity lost")
    // seeded sample + seeded k-means ⇒ replayable end to end
    assert(sampled == ApproxAnn.trainIvfCentroids(clustered, "embedding",
      k = 4, seed = 7L, samplePerCentroid = 64))
  }

  test("ivf: below the cap the sampled path IS the full path") {
    // n = 3000 ≤ 4·1024: the bounded-sample rule must not perturb
    // fixture-scale training at the default budget (oracle stability)
    val a = ApproxAnn.trainIvfCentroids(clustered, "embedding", k = 4,
      seed = 7L, samplePerCentroid = 1024)
    val b = ApproxAnn.trainIvfCentroids(clustered, "embedding", k = 4,
      seed = 7L, samplePerCentroid = Int.MaxValue)
    assert(a == b)
  }

  test("pq: sampled codebooks match full codebook quality per subspace") {
    val m = 2
    val subDim = dims / m
    val full = ApproxAnn.trainPqCodebooks(clustered, "embedding", m = m,
      k = 4, seed = 11L, samplePerCentroid = Int.MaxValue)
    val sampled = ApproxAnn.trainPqCodebooks(clustered, "embedding", m = m,
      k = 4, seed = 11L, samplePerCentroid = 64)
    (0 until m).foreach { j =>
      val sub = clustered
        .select(slice(col("embedding"), j * subDim + 1, subDim).as("sub"))
      val (fe, se) = (quantErr(sub, "sub", full(j)),
        quantErr(sub, "sub", sampled(j)))
      assert(se <= fe * 1.15,
        s"subspace $j sampled error $se vs full $fe — parity lost")
    }
    assert(sampled == ApproxAnn.trainPqCodebooks(clustered, "embedding",
      m = m, k = 4, seed = 11L, samplePerCentroid = 64))
  }

  test("knnJoinIvf end-to-end: trained-on-sample centroids preserve the " +
      "join's neighbor structure") {
    import graft.functions.VectorFunctions.Euclidean
    // with 4 planted clusters a neighbor list is overwhelmingly in-cluster;
    // the joins over full-fit and sampled-fit centroids must agree on
    // nearly every (query, neighbor) pair
    val fullC = ApproxAnn.trainIvfCentroids(clustered, "embedding", k = 4,
      seed = 7L, samplePerCentroid = Int.MaxValue)
    val sampC = ApproxAnn.trainIvfCentroids(clustered, "embedding", k = 4,
      seed = 7L, samplePerCentroid = 64)
    def pairs(c: Seq[(Int, Seq[Float])]) =
      ApproxAnn.knnJoinIvfPinned(clustered.limit(400), "embedding", "vec_id",
          Euclidean, k = 3, c, nprobe = 1)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val (pf, ps) = (pairs(fullC), pairs(sampC))
    val agree = (pf & ps).size.toDouble / math.max(1, pf.size)
    assert(agree >= 0.95, s"join agreement $agree after sampled training")
  }
}
