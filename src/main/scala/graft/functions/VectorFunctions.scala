package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector distance / similarity column builders (SURVEY §2.7 F1–F5).
  *
  * Semantics mirror the reference's metric set:
  *  - euclidean = squared L2 ("l2sq"), reference
  *    crates/vector-store/src/vs_index/usearch.rs:480-483,
  *    crates/vector-store/src/distance.rs:72-75
  *  - cosine distance in [0, 2] = 1 - cos(a,b), distance.rs:64-71
  *  - dot-product distance = -dot(a,b) (unbounded), distance.rs:76-83
  *  - hamming = number of differing sign bits (B1), usearch.rs:450-464
  *  - similarity mapping, crates/vector-store/src/similarity.rs:26-37:
  *    cosine/dot → (2-d)/2, euclidean → 1/(1+d), hamming → 1-d/dims
  *
  * All arithmetic is double-precision and accumulates in array order, so
  * results are bit-deterministic and reproducible against a SQL oracle.
  * Compositions of built-in higher-order functions — no UDFs — so Catalyst
  * can still prune/push down around them.
  */
object VectorFunctions {

  sealed trait Space { def name: String }
  case object Euclidean extends Space { val name = "euclidean" }
  case object Cosine extends Space { val name = "cosine" }
  case object DotProduct extends Space { val name = "dot_product" }
  case object Hamming extends Space { val name = "hamming" }
  object Space {
    def fromName(s: String): Space = s.toLowerCase match {
      case "euclidean" => Euclidean
      case "cosine" => Cosine
      case "dot_product" | "dot" => DotProduct
      case "hamming" => Hamming
      case other => throw new IllegalArgumentException(s"unknown space type: $other")
    }
  }

  private def d(c: Column): Column = c.cast("double")

  /** dot(a, b) accumulated left-to-right in double (codegen'd native loop). */
  def dot(a: Column, b: Column): Column = VectorDistanceExpr.dot(a, b)

  /** Squared L2 distance (the reference's "Euclidean" metric). */
  def l2sq(a: Column, b: Column): Column = VectorDistanceExpr.l2sq(a, b)

  /** Interpreted higher-order-function formulations: bit-identical to the
    * native expressions (same accumulation order); kept as the executable
    * spec the parity tests check the codegen'd loops against. */
  private[graft] def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), _ + _)
  private[graft] def l2sqHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))),
      lit(0.0), _ + _)
  private[graft] def hammingSignHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => when((x > 0.0f) =!= (y > 0.0f), 1).otherwise(0)),
      lit(0), _ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Unit-normalize a vector (zero vectors pass through unchanged) — the
    * standard pre-step before cosine/IP indexing. */
  def unitNormalize(a: Column): Column = {
    val n = norm(a)
    when(n === 0.0, a).otherwise(transform(a, x => (x / n).cast("float")))
  }

  /** Cosine distance = 1 - cosine similarity, range [0, 2]. */
  def cosineDistance(a: Column, b: Column): Column =
    lit(1.0) - dot(a, b) / (norm(a) * norm(b))

  /** Dot-product ("inner product") distance = -dot(a, b). */
  def dotDistance(a: Column, b: Column): Column = -dot(a, b)

  /** Hamming distance over sign bits: |{i : (a_i > 0) != (b_i > 0)}|.
    * Matches B1 quantization (bit set iff value > 0,
    * usearch.rs:1179-1205) followed by the Hamming metric. */
  def hammingSign(a: Column, b: Column): Column =
    VectorDistanceExpr.hammingSign(a, b).cast("int")

  /** Distance column for a space type. */
  def distance(space: Space, a: Column, b: Column): Column = space match {
    case Euclidean => l2sq(a, b)
    case Cosine => cosineDistance(a, b)
    case DotProduct => dotDistance(a, b)
    case Hamming => hammingSign(a, b).cast("double")
  }

  /** Similarity score from a distance (similarity.rs:26-37). */
  def similarity(space: Space, dist: Column, dims: Int): Column = space match {
    case Cosine | DotProduct => (lit(2.0) - dist) / lit(2.0)
    case Euclidean => lit(1.0) / (lit(1.0) + dist)
    case Hamming => lit(1.0) - dist / lit(dims.toDouble)
  }

  /** B1 bit-packing: f32 vector → packed bytes, bit i of byte i/8 set iff
    * v(i) > 0, little-endian within the byte (usearch.rs:1179-1205). */
  def b1Pack(a: Column): Column = {
    // group indices into bytes of 8 bits
    val byteCount = ((size(a) + lit(7)) / lit(8)).cast("int")
    transform(sequence(lit(0), byteCount - lit(1)), byteIdx => {
      val unsigned = aggregate(
        sequence(lit(0), lit(7)),
        lit(0),
        (acc, bit) => {
          val i = byteIdx * 8 + bit
          acc + when(i < size(a) && element_at(a, i + 1) > 0.0f,
            pow(lit(2.0), bit.cast("double")).cast("int")).otherwise(0)
        })
      // two's-complement wrap: ANSI mode refuses 128..255 → TINYINT directly
      when(unsigned > 127, unsigned - 256).otherwise(unsigned).cast("byte")
    })
  }

  /** Popcount-based Hamming over two packed byte arrays (as produced by
    * [[b1Pack]]). */
  def hammingPacked(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => bit_count(x.cast("int").bitwiseXOR(y.cast("int")).bitwiseAND(lit(0xff)))),
      lit(0), _ + _)
}
