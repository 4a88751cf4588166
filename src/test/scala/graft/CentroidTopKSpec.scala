package graft

import graft.functions.{CentroidTopKExpr, VectorFunctions}
import org.apache.spark.sql.functions._

/** The native codegen centroid-top-k expression against its executable
  * spec — the interpreted HOF formulation it replaced on the IVF hot
  * path. Equality must be BIT-identical (same l2sq accumulation, same
  * lexicographic (d, cid) order) or the IVF-family hash oracles drift. */
class CentroidTopKSpec extends SparkSpec {
  import spark.implicits._

  private def hof(vecCol: String, cents: Seq[(Int, Seq[Float])], k: Int) =
    slice(array_sort(transform(typedlit(cents), c =>
      struct(VectorFunctions.l2sq(col(vecCol), c.getField("_2")).as("d"),
        c.getField("_1").as("cid")))), 1, k)

  private def lcgVec(seed: Long, dims: Int): Seq[Float] =
    (0 until dims).map { j =>
      ((seed * 2654435761L + j * 40503L) % 2000L).toFloat / 1000f - 1f
    }

  test("equals the interpreted HOF formulation on random vectors") {
    val cents = (0 until 23).map(c => (c, lcgVec(c + 100L, 16)))
    val rows = (0 until 400).map(i => (i.toLong, lcgVec(i, 16)))
      .toDF("vec_id", "v")
    for (k <- Seq(1, 2, 5, 23, 40)) { // incl. k > #centroids
      val got = rows.select(col("vec_id"),
        CentroidTopKExpr.topK(col("v"), cents, k).as("t")).collect()
      val want = rows.select(col("vec_id"), hof("v", cents, k).as("t")).collect()
      assert(got.map(_.toSeq).toSeq == want.map(_.toSeq).toSeq, s"k=$k diverged")
    }
  }

  test("ties break by cid exactly like array_sort's struct order") {
    // duplicate centroid VECTORS under different ids force d-equal ties
    val base = lcgVec(7L, 8)
    val cents = Seq(5 -> base, 2 -> base, 9 -> lcgVec(8L, 8), 1 -> base)
    val rows = (0 until 50).map(i => (i.toLong, lcgVec(i, 8))).toDF("vec_id", "v")
    val got = rows.select(CentroidTopKExpr.topK(col("v"), cents, 4).as("t")).collect()
    val want = rows.select(hof("v", cents, 4).as("t")).collect()
    assert(got.map(_.toSeq).toSeq == want.map(_.toSeq).toSeq)
  }

  test("ragged centroids keep l2sq's min-length contract; null vector -> null") {
    val cents = Seq(0 -> Seq(1f, 2f), 1 -> lcgVec(3L, 8))
    val nonNull = Seq((1L, lcgVec(1L, 8))).toDF("vec_id", "v")
    val got = nonNull.select(col("vec_id"),
      CentroidTopKExpr.topK(col("v"), cents, 2).as("t")).collect()
    val want = nonNull.select(col("vec_id"), hof("v", cents, 2).as("t")).collect()
    assert(got.map(_.toSeq).toSeq == want.map(_.toSeq).toSeq)
    // DELIBERATE divergence from the HOF form on a null vector: the HOF
    // yields an array of (null, cid) structs, the expression yields NULL
    // (null-in/null-out) — saner, and unreachable in the operators (every
    // call site filters isNotNull before assignment/probing)
    val nullRow = Seq((2L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "v")
    val gotNull = nullRow.select(
      CentroidTopKExpr.topK(col("v"), cents, 2).as("t")).collect()
    assert(gotNull.head.isNullAt(0))
  }

  test("NaN vectors equal the HOF order (NaN-greatest, cid tiebreak) — no sentinel leak") {
    val cents = (0 until 7).map(c => (c + 3, lcgVec(c + 50L, 8)))
    // all-NaN, NaN-in-one-dim, and clean vectors in one frame: the NaN
    // distance must sort AFTER every real distance but still select real
    // centroid ids by cid (ADVICE r11: the old `<`/`==` compare dropped
    // NaN rows to the (Inf, Int.MaxValue) sentinel, leaking Int.MaxValue
    // as a cell id into assignment/probing)
    val nan = Float.NaN
    val rows = Seq(
      (0L, Seq.fill(8)(nan)),
      (1L, lcgVec(1L, 8).updated(3, nan)),
      (2L, lcgVec(2L, 8))).toDF("vec_id", "v")
    for (k <- Seq(1, 3, 7)) {
      val got = rows.select(col("vec_id"),
        CentroidTopKExpr.topK(col("v"), cents, k).as("t")).collect()
      val want = rows.select(col("vec_id"), hof("v", cents, k).as("t")).collect()
      assert(got.map(_.toSeq).toSeq == want.map(_.toSeq).toSeq, s"k=$k diverged")
      // and no Int.MaxValue cell id anywhere in the output
      got.foreach { r =>
        val arr = r.getSeq[org.apache.spark.sql.Row](1)
        assert(arr.forall(_.getInt(1) != Int.MaxValue), s"sentinel cid leaked at k=$k")
      }
    }
  }
}
