package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Alternator (DynamoDB-compatible) schemaless mode (SURVEY §1.3, §2 S7/F14).
  *
  * Reference: keyspaces prefixed `alternator_` store all attributes in one
  * `map<text, blob>` column `:attrs`; scans read `":attrs"['col']`
  * (db_index_backend.rs:22-62). Attribute blobs carry a 1-byte type tag:
  * tag 5 = sequential big-endian f32s (the optimized FLOAT32VECTOR
  * encoding), tag 4 = unoptimized DynamoDB JSON `{"L":[{"N":"…"}]}`
  * (vector.rs:62-129).
  *
  * Spark mapping: `MapType(StringType, BinaryType)` column + `element_at` +
  * a decode UDF. The UDF runs only on the scan projection (once per row),
  * not in the distance hot loop, so codegen pressure is low.
  */
object Alternator {

  val TagJson: Byte = 4
  val TagFloat32Vector: Byte = 5

  /** Extract one attribute's raw bytes from the `:attrs` map column. */
  def attr(attrsCol: Column, name: String): Column =
    element_at(attrsCol, name)

  /** Decode an Alternator-encoded vector blob (tag 5 binary / tag 4 JSON).
    * Malformed input → null (scan-level bad rows are skipped, they don't
    * fail the job — matching the reference's per-row error handling). */
  def decodeVector(bytes: Array[Byte]): Option[Array[Float]] = {
    if (bytes == null || bytes.isEmpty) return None
    bytes(0) match {
      case TagFloat32Vector =>
        val body = bytes.length - 1
        if (body % 4 != 0) None
        else {
          val buf = ByteBuffer.wrap(bytes, 1, body).order(ByteOrder.BIG_ENDIAN)
          Some(Array.fill(body / 4)(buf.getFloat))
        }
      case TagJson =>
        try {
          val node = new ObjectMapper().readTree(bytes, 1, bytes.length - 1)
          val l = node.get("L")
          if (l == null || !l.isArray) None
          else {
            val out = new Array[Float](l.size())
            var i = 0
            while (i < l.size()) {
              val n = l.get(i).get("N")
              if (n == null) return None
              out(i) = n.asText().toFloat
              i += 1
            }
            Some(out)
          }
        } catch { case _: Exception => None }
      case _ => None
    }
  }

  /** Column form of [[decodeVector]]. */
  val decodeVectorUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((bytes: Array[Byte]) => decodeVector(bytes).map(_.toSeq))

  /** Full scan projection for an Alternator table: pk columns + decoded
    * vector from `:attrs['target']` (S7). */
  def scanProjection(attrsCol: Column, targetAttr: String): Column =
    decodeVectorUdf(attr(attrsCol, targetAttr))

  // ---- encoders (test/fixture side) ----

  def encodeBinary(vec: Seq[Float]): Array[Byte] = {
    val buf = ByteBuffer.allocate(1 + vec.length * 4).order(ByteOrder.BIG_ENDIAN)
    buf.put(TagFloat32Vector)
    vec.foreach(buf.putFloat)
    buf.array()
  }

  def encodeJson(vec: Seq[Float]): Array[Byte] = {
    val inner = vec.map(f => s"""{"N":"$f"}""").mkString(",")
    (TagJson +: s"""{"L":[$inner]}""".getBytes("UTF-8")).toArray
  }
}
