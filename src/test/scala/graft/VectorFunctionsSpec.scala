package graft

import graft.functions.VectorFunctions
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

/** Distance/similarity semantics vs the reference
  * (usearch.rs:450-483, distance.rs, similarity.rs:26-37,
  * bit-pack usearch.rs:1179-1205). */
class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(a: Seq[Float], b: Seq[Float], f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Double =
    Seq((a, b)).toDF("a", "b").select(f(col("a"), col("b")).cast("double")).head.getDouble(0)

  test("l2sq") {
    assert(one(Seq(1f, 2f, 3f), Seq(1f, 2f, 3f), l2sq) == 0.0)
    assert(one(Seq(0f, 0f), Seq(3f, 4f), l2sq) == 25.0)
  }

  test("cosine distance in [0,2]") {
    assert(math.abs(one(Seq(1f, 0f), Seq(1f, 0f), cosineDistance)) < 1e-12)
    assert(math.abs(one(Seq(1f, 0f), Seq(0f, 1f), cosineDistance) - 1.0) < 1e-12)
    assert(math.abs(one(Seq(1f, 0f), Seq(-1f, 0f), cosineDistance) - 2.0) < 1e-12)
  }

  test("dot distance = -dot") {
    assert(one(Seq(1f, 2f), Seq(3f, 4f), dotDistance) == -11.0)
  }

  test("hamming over sign bits") {
    assert(one(Seq(1f, -1f, 1f, 0f), Seq(1f, 1f, -1f, 1f), (a, b) => hammingSign(a, b).cast("double")) == 3.0)
    // 0 is NOT > 0, so 0 vs negative agree (both bit=0): usearch.rs:1193 `v > 0`
    assert(one(Seq(0f, 0f), Seq(-1f, -2f), (a, b) => hammingSign(a, b).cast("double")) == 0.0)
  }

  test("similarity mapping (similarity.rs:26-37)") {
    val df = Seq(1).toDF("x")
    def s(space: Space, d: Double, dims: Int): Double =
      df.select(similarity(space, lit(d), dims)).head.getDouble(0)
    assert(s(Cosine, 0.5, 3) == 0.75)       // (2-d)/2
    assert(s(DotProduct, 2.0, 3) == 0.0)
    assert(s(Euclidean, 3.0, 3) == 0.25)    // 1/(1+d)
    assert(s(Hamming, 1.0, 4) == 0.75)      // 1 - d/dims
  }

  test("unitNormalize: unit norm, zero vector unchanged") {
    val df = Seq(Tuple1(Seq(3f, 4f)), Tuple1(Seq(0f, 0f))).toDF("v")
      .select(VectorFunctions.unitNormalize(col("v")).as("u"))
    val rows = df.as[Seq[Float]].collect()
    assert(rows(0) == Seq(0.6f, 0.8f))
    assert(rows(1) == Seq(0f, 0f))
  }

  test("b1 pack: bit i set iff v[i] > 0, little-endian within byte") {
    // reference example shape: usearch.rs:1622-1664
    val v = Seq(1f, -1f, 2f, 0f, 0.5f, -3f, 4f, 5f, /*byte 2*/ 1f)
    val packed = Seq(Tuple1(v)).toDF("v")
      .select(VectorFunctions.b1Pack(col("v")).as("p"))
      .head.getSeq[Byte](0)
    // bits 0,2,4,6,7 set = 0b11010101 = 0xD5
    assert(packed == Seq(0xD5.toByte, 0x01.toByte))
  }

  test("native codegen distance expressions are bit-identical to HOF spec") {
    val emb = spark.read.parquet(sf("embeddings")).limit(200)
    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("embedding").as("b")))
      .filter(col("ia") < col("ib")).limit(2000)
    val diff = pairs.select(
      (VectorFunctions.dot(col("a"), col("b")) =!=
        VectorFunctions.dotHof(col("a"), col("b"))).as("d1"),
      (VectorFunctions.l2sq(col("a"), col("b")) =!=
        VectorFunctions.l2sqHof(col("a"), col("b"))).as("d2"),
      (VectorFunctions.hammingSign(col("a"), col("b")) =!=
        VectorFunctions.hammingSignHof(col("a"), col("b"))).as("d3"))
      .filter(col("d1") || col("d2") || col("d3"))
    assert(diff.count() == 0) // exact bit equality, not approximate
  }

  test("hamming on packed bits == hamming on sign bits") {
    val a = Seq(1f, -2f, 3f, -4f, 5f, 6f, -7f, 8f, 9f, -10f)
    val b = Seq(1f, 2f, -3f, -4f, -5f, 6f, 7f, 8f, -9f, -10f)
    val df = Seq((a, b)).toDF("a", "b")
    val viaSign = df.select(hammingSign(col("a"), col("b"))).head.getInt(0)
    val viaPacked = df.select(
      hammingPacked(VectorFunctions.b1Pack(col("a")), VectorFunctions.b1Pack(col("b"))))
      .head.getInt(0)
    assert(viaSign == viaPacked)
    assert(viaSign == 5)
  }
}
