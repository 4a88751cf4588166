package graft

import graft.api.{JsonValueException, JsonValues}
import graft.api.JsonValues._
import graft.operators.Bm25
import graft.sources.Alternator
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JSON-boundary conversions vs httproutes.rs:1271-1477, Alternator decode
  * vs vector.rs:62-129 (+ its inline tests at 131-233). */
class JsonValuesSpec extends AnyFunSuite {

  test("strings: text/ascii/uuid/blob/varint/decimal") {
    assert(fromJson("abc", Text) == "abc")
    assert(fromJson("abc", Ascii) == "abc")
    intercept[JsonValueException](fromJson("café", Ascii))
    assert(fromJson("123e4567-e89b-12d3-a456-426614174000", UuidT) ==
      "123e4567-e89b-12d3-a456-426614174000")
    intercept[JsonValueException](fromJson("not-a-uuid", UuidT))
    assert(fromJson("0x0a0b", BlobT).asInstanceOf[Array[Byte]].toSeq == Seq(0x0a.toByte, 0x0b.toByte))
    intercept[JsonValueException](fromJson("0a0b", BlobT)) // needs 0x prefix
    intercept[JsonValueException](fromJson("0xzz", BlobT))
    assert(fromJson("123456789012345678901234567890", VarintT) ==
      BigDecimal("123456789012345678901234567890"))
    assert(fromJson("1.50", DecimalT) == BigDecimal("1.50"))
  }

  test("temporal: date/time/timestamp incl. CQL space separator") {
    assert(fromJson("2024-03-01", DateT) == java.sql.Date.valueOf("2024-03-01"))
    assert(fromJson("12:34:56", TimeT) ==
      java.time.LocalTime.of(12, 34, 56).toNanoOfDay)
    assert(fromJson("T12:34:56", TimeT) == fromJson("12:34:56", TimeT))
    val iso = fromJson("2024-01-01T00:00:00.000Z", TimestampT)
    val cql = fromJson("2024-01-01 00:00:00.000Z", TimestampT) // space form
    assert(iso == cql)
    intercept[JsonValueException](fromJson("garbage", TimestampT))
  }

  test("numbers: strict typing + range checks") {
    assert(fromJson(42L, IntT) == 42)
    intercept[JsonValueException](fromJson(Long.MaxValue, IntT))
    intercept[JsonValueException](fromJson(200L, TinyIntT))
    assert(fromJson(200L, SmallIntT) == 200.toShort)
    assert(fromJson(1.5, DoubleT) == 1.5)
    intercept[JsonValueException](fromJson(1e300, FloatT)) // out of f32 range
    intercept[JsonValueException](fromJson(1.5, VarintT)) // fractional varint
    intercept[JsonValueException](fromJson(1.5, Text)) // number → string type
    intercept[JsonValueException](fromJson("1.5", DoubleT)) // string → number type
    intercept[JsonValueException](fromJson(true, IntT))
  }

  test("inet literals: Rust IpAddr grammar (no leading zeros, mapped IPv6)") {
    assert(fromJson("10.0.0.1", InetT) == "10.0.0.1")
    assert(fromJson("0.0.0.0", InetT) == "0.0.0.0") // single zero octets fine
    // leading-zero octets are invalid in Rust's IpAddr ('010' is not 10)
    intercept[JsonValueException](fromJson("010.0.0.1", InetT))
    intercept[JsonValueException](fromJson("1.2.3.04", InetT))
    intercept[JsonValueException](fromJson("256.1.1.1", InetT))
    // IPv4-mapped IPv6 carries a trailing dotted quad and canonicalizes to
    // the mapped form, as Rust's Ipv6Addr Display does
    assert(fromJson("::ffff:1.2.3.4", InetT) == "::ffff:1.2.3.4")
    assert(fromJson("0:0:0:0:0:ffff:1.2.3.4", InetT) == "::ffff:1.2.3.4")
    intercept[JsonValueException](fromJson("::ffff:01.2.3.4", InetT))
    assert(fromJson("2001:db8::1", InetT) == "2001:db8:0:0:0:0:0:1")
    intercept[JsonValueException](fromJson("example.com", InetT)) // never DNS
  }

  test("toJson round-trips the encodings") {
    assert(toJson(Array[Byte](10, 11), BlobT) == "0x0a0b")
    assert(toJson(BigDecimal("1.50"), DecimalT) == "1.50")
    assert(toJson(BigDecimal(BigInt("123")), VarintT) == "123")
    assert(toJson(java.sql.Date.valueOf("2024-03-01"), DateT) == "2024-03-01")
    assert(toJson(fromJson("2024-01-01 01:02:03.5Z", TimestampT), TimestampT) ==
      "2024-01-01T01:02:03.500Z")
    intercept[JsonValueException](toJson(Double.PositiveInfinity, DoubleT))
  }
}

class AlternatorSpec extends SparkSpec {
  import spark.implicits._

  test("binary tag-5 decode: big-endian f32 round trip") {
    val v = Seq(1.5f, -2.25f, 0f)
    assert(Alternator.decodeVector(Alternator.encodeBinary(v)).get.toSeq == v)
  }

  test("json tag-4 decode: DynamoDB list-of-numbers") {
    val v = Seq(0.5f, 3f)
    assert(Alternator.decodeVector(Alternator.encodeJson(v)).get.toSeq == v)
  }

  test("malformed blobs decode to null, not errors") {
    assert(Alternator.decodeVector(Array.emptyByteArray).isEmpty)
    assert(Alternator.decodeVector(Array[Byte](9, 1, 2)).isEmpty) // bad tag
    assert(Alternator.decodeVector(Array[Byte](5, 1, 2, 3)).isEmpty) // not mult of 4
    assert(Alternator.decodeVector((4.toByte +: "junk".getBytes.toSeq).toArray).isEmpty)
  }

  test(":attrs map scan projection decodes per row") {
    val rows = Seq(
      (1L, Map("emb" -> Alternator.encodeBinary(Seq(1f, 2f)))),
      (2L, Map("emb" -> Alternator.encodeJson(Seq(3f, 4f)))),
      (3L, Map("other" -> Array[Byte](1)))) // missing attr → null
      .toDF("pk", ":attrs")
    val out = rows.select(col("pk"),
        Alternator.scanProjection(col(":attrs"), "emb").as("embedding"))
      .as[(Long, Option[Seq[Float]])].collect().toMap
    assert(out(1L).get == Seq(1f, 2f))
    assert(out(2L).get == Seq(3f, 4f))
    assert(out(3L).isEmpty)
  }
}

class PhraseSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "spark query engine for big data"),
    (1L, "engine query spark reversed order"),
    (2L, "spark query engine spark query engine"), // phrase twice
    (3L, "unrelated words entirely"))
    .toDF("doc_id", "text")

  test("phrase matches consecutive positions only") {
    val idx = Bm25.buildPositionalIndex(docs, "doc_id", "text")
    val res = Bm25.searchPhrase(idx, "spark query engine", 10)
      .as[(Long, Double)].collect()
    assert(res.map(_._1).toSet == Set(0L, 2L)) // doc 1 has the words, wrong order
    // doc 2 has phrase frequency 2 → higher score than doc 0 (same dl ballpark)
    val byId = res.toMap
    assert(byId(2L) > byId(0L))
  }

  test("parsed query combines phrases and bare terms") {
    val res = Bm25.searchParsed(docs, "doc_id", "text", "\"query engine\" unrelated", 10)
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(res == Set(0L, 2L, 3L)) // phrase hits 0,2; bare term 'unrelated' hits 3
  }

  test("phrase with stopwords skips them like the analyzer does") {
    val d = Seq((0L, "the spark and engine")).toDF("doc_id", "text")
    val idx = Bm25.buildPositionalIndex(d, "doc_id", "text")
    // analyzer drops 'the'/'and' at index time, so 'spark engine' IS consecutive
    val res = Bm25.searchPhrase(idx, "spark engine", 10).count()
    assert(res == 1)
  }
}
