package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector quantization transforms (SURVEY §1.2; reference quantization kinds
  * F32/F16/BF16/I8/B1, lib.rs:463-495; B1 packing usearch.rs:1179-1205).
  *
  * The logical column type stays ArrayType(FloatType); quantization is a
  * storage/compute transform applied when building the index representation,
  * exactly as the reference treats it. F16/BF16/I8 are simulated
  * (quantize→dequantize round-trip) since parquet has no half-precision
  * type; what matters for the two-stage rescoring plan (O12) is that the
  * first-pass distances are computed on the lossy values.
  */
object Quantization {

  /** f32 → ~half-precision → f32. APPROXIMATION, not IEEE fp16: keeps 10
    * mantissa bits via log2-bucketed round() (half-up, so it can differ from
    * IEEE round-to-nearest-even on exact ties), and below 2^-14 it keeps 10
    * *relative* mantissa bits where real fp16 subnormals have a fixed 2^-24
    * ulp. Precision loss is the same order as fp16, which is all the
    * two-stage rescoring plan (O12) needs from the lossy first pass. */
  def f16(v: Column): Column =
    transform(v, x => float16RoundTrip(x))

  private def float16RoundTrip(x: Column): Column = {
    // clamp to ±65504, then keep 10 mantissa bits as round(x · 2^k)/2^k with
    // k from the log2 magnitude — bit masking isn't expressible with
    // built-ins and the JDK gets Float.floatToFloat16 only in Java 20+.
    val absx = abs(x)
    val exp = floor(log2(absx))
    val scale = pow(lit(2.0), lit(10.0) - exp)
    val q = (round(absx.cast("double") * scale) / scale).cast("float")
    when(x.isNull, lit(null))
      .when(absx === 0.0f, lit(0.0f))
      .when(absx > 65504.0f, signum(x) * lit(Float.PositiveInfinity))
      .otherwise(signum(x) * q)
      .cast("float")
  }

  /** f32 → bfloat16 → f32: bf16 keeps 7 mantissa bits (8-bit exponent as
    * f32, so no range clamp needed). */
  def bf16(v: Column): Column =
    transform(v, x => {
      val absx = abs(x)
      val exp = floor(log2(absx))
      val scale = pow(lit(2.0), lit(7.0) - exp)
      val q = (round(absx.cast("double") * scale) / scale).cast("float")
      when(x.isNull, lit(null))
        .when(absx === 0.0f, lit(0.0f))
        .otherwise(signum(x) * q)
        .cast("float")
    })

  /** Symmetric int8 quantization with a per-vector scale (max-abs / 127),
    * returned as (scale, ARRAY<TINYINT>) struct. All arithmetic explicitly
    * double-precision so the oracle can reproduce it bit-for-bit. */
  def i8(v: Column): Column = {
    val maxAbs = array_max(transform(v, abs(_)))
    val scale = when(maxAbs === 0.0f, lit(1.0))
      .otherwise(maxAbs.cast("double") / 127.0)
    struct(
      scale.as("scale"),
      transform(v, x => {
        val q = round(x.cast("double") / scale).cast("int")
        // two's-complement-safe byte (range is ±127 by construction)
        q.cast("byte")
      }).as("values"))
  }

  /** Dequantize an [[i8]] struct back to float. */
  def i8Dequant(q: Column): Column =
    transform(q.getField("values"),
      x => (x.cast("double") * q.getField("scale")).cast("float"))

  /** B1: sign-bit packing — see [[VectorFunctions.b1Pack]]; kept here for
    * discoverability alongside the other kinds. */
  def b1(v: Column): Column = VectorFunctions.b1Pack(v)
}
