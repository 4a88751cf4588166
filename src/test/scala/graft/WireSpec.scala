package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.api.{JsonValues => JV, Wire}
import graft.api.JsonValues.NativeType
import graft.functions.VectorFunctions.Euclidean
import graft.operators.{Catalog, Engine, QueryException, Restriction}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** The HTTP JSON wire contract, validated the way the reference's serde
  * suite does (crates/validator/src/serde.rs + httpapi/src/lib.rs unit
  * tests): every native type serializes/deserializes across the boundary,
  * arbitrary-precision varint/decimal filters work, limits validate, and
  * non-finite floats saturate to f32::MAX. Test names match the reference. */
class WireSpec extends SparkSpec {
  spark
  private val om = new ObjectMapper

  private def sparkType(t: NativeType): DataType = t match {
    case JV.Ascii | JV.Text | JV.UuidT | JV.TimeuuidT | JV.InetT => StringType
    case JV.TinyIntT => ByteType
    case JV.SmallIntT => ShortType
    case JV.IntT => IntegerType
    case JV.BigIntT | JV.TimeT => LongType
    case JV.FloatT => FloatType
    case JV.DoubleT => DoubleType
    case JV.BooleanT => BooleanType
    case JV.DateT => DateType
    case JV.TimestampT => TimestampType
    case JV.BlobT => BinaryType
    case JV.VarintT => DecimalType(38, 0)
    case JV.DecimalT => DecimalType(38, 18)
  }

  /** One-row (id: typ, vec: array<float>) table + engine-registered index. */
  private def tableOf(t: NativeType, idValue: Any,
      vec: Seq[Float] = Seq(1f, 2f, 3f)): (Engine, DataFrame) = {
    val jvmValue = idValue match {
      case bd: BigDecimal => bd.bigDecimal
      case v => v
    }
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(jvmValue, vec)),
      StructType(Seq(StructField("id", sparkType(t)),
        StructField("vec", ArrayType(FloatType)))))
    val eng = new Engine
    eng.addIndex(Catalog.IndexMetadata("ks", "idx", "tbl", "vec",
      primaryKeyColumns = Seq("id"),
      kind = Catalog.Vs(Catalog.IndexOptionsVs(3, Euclidean))), df)
    (eng, df)
  }

  test("test_serialization_deserialization_all_types (serde.rs:41)") {
    // the reference's 17 (type, literal) cases, CQL literals rendered in
    // their JSON-boundary form
    val cases: Seq[(NativeType, Any)] = Seq(
      JV.Ascii -> "random_text",
      JV.BigIntT -> 1234L,
      JV.BlobT -> "0xdeadbeef",
      JV.BooleanT -> true,
      JV.DateT -> "2023-10-01",
      JV.DecimalT -> "-98765432109876543210.123456789",
      JV.DoubleT -> 3.14159d,
      JV.FloatT -> 2.71828d,
      JV.IntT -> 42L,
      JV.SmallIntT -> 123L,
      JV.TinyIntT -> 7L,
      JV.UuidT -> "841685b2-8803-11f0-8de9-0242ac120002",
      JV.TimeuuidT -> "841685b2-8803-11f0-8de9-0242ac120002",
      JV.TimeT -> "08:12:54.2137",
      JV.TimestampT -> "2023-10-01T12:34:56.789Z",
      JV.Text -> "some_text",
      JV.VarintT -> "-98765432109876543210")
    for ((t, wireLit) <- cases) {
      val typed = JV.fromJson(wireLit, t) // F7: in through the boundary
      val (eng, _) = tableOf(t, typed)
      val req = Wire.parseAnnRequest(
        """{"vector": [1.0, 2.0, 3.0], "limit": 1}""", Map("id" -> t))
      val res = eng.ann("ks", "idx", req)
      val json = om.readTree(Wire.annResponseJson(res, Seq("id"), Map("id" -> t)))
      assert(json.get("distances").size() == 1, t.name)
      assert(json.get("distances").get(0).asDouble() == 0.0, t.name)
      assert(json.get("similarity_scores").size() == 1, t.name)
      // F8: the pk comes back out through try_to_json — same value the
      // boundary conversion produces for the stored form
      val back = json.get("primary_keys").get("id").get(0)
      val expected = JV.toJson(typed, t)
      val got = if (back.isTextual) back.asText()
        else if (back.isBoolean) back.asBoolean()
        else if (back.isIntegralNumber) back.asLong()
        else back.decimalValue()
      (t, expected) match {
        // F9 (SURVEY §2.7): decimals canonicalize to the storage scale, so
        // the wire round-trip preserves VALUE, not the literal's scale
        case (JV.DecimalT, s: String) =>
          assert(BigDecimal(back.asText()).compare(BigDecimal(s)) == 0, t.name)
        case (_, s: String) => assert(got == s, t.name)
        case (_, b: Boolean) => assert(got == b, t.name)
        case (_, l: Long) => assert(got == l, t.name)
        case (_, d: Double) => assert(back.asDouble() == d, t.name)
        case (_, other) => assert(got.toString == other.toString, t.name)
      }
    }
    // hand-pinned wire forms (not derived from toJson, so a toJson
    // regression cannot self-consistently pass)
    val (eng, _) = tableOf(JV.BlobT, JV.fromJson("0xdeadbeef", JV.BlobT))
    val res = eng.ann("ks", "idx",
      Wire.parseAnnRequest("""{"vector": [1.0, 2.0, 3.0]}""", Map("id" -> JV.BlobT)))
    val json = om.readTree(Wire.annResponseJson(res, Seq("id"), Map("id" -> JV.BlobT)))
    assert(json.get("primary_keys").get("id").get(0).asText() == "0xdeadbeef")
  }

  test("test_varint_filter (serde.rs:113): arbitrary precision beyond i64") {
    val big = BigDecimal("-98765432109876543210")
    val (eng, _) = tableOf(JV.VarintT, big)
    // == on the huge varint, literal carried as a JSON number
    val hit = Wire.parseAnnRequest(
      """{"vector": [1.0, 2.0, 3.0],
        | "filter": {"restrictions": [
        |   {"type": "==", "lhs": "id", "rhs": -98765432109876543210}],
        |  "allow_filtering": true}}""".stripMargin,
      Map("id" -> JV.VarintT))
    assert(hit.restrictions == Seq(Restriction.Eq("id", big)))
    assert(eng.ann("ks", "idx", hit).count() == 1)
    // > excludes it
    val miss = Wire.parseAnnRequest(
      """{"vector": [1.0, 2.0, 3.0],
        | "filter": {"restrictions": [
        |   {"type": ">", "lhs": "id", "rhs": 0}], "allow_filtering": true}}""".stripMargin,
      Map("id" -> JV.VarintT))
    assert(eng.ann("ks", "idx", miss).count() == 0)
  }

  test("test_decimal_filter (serde.rs:353): scale-insensitive value compare") {
    // F9 note (SURVEY §2.7): DecimalType compares by VALUE — 1.0 == 1.00 —
    // so wire literals of differing scale select the same row; the stored
    // representation is the canonical fixed-scale decimal, not the original
    // text (the documented deviation from CQL's byte-identity).
    val (eng, _) = tableOf(JV.DecimalT, JV.fromJson("1.0", JV.DecimalT))
    for (lit <- Seq("1.0", "1.00", "1")) {
      val req = Wire.parseAnnRequest(
        s"""{"vector": [1.0, 2.0, 3.0],
           | "filter": {"restrictions": [
           |   {"type": "==", "lhs": "id", "rhs": $lit}],
           |  "allow_filtering": true}}""".stripMargin,
        Map("id" -> JV.DecimalT))
      assert(eng.ann("ks", "idx", req).count() == 1, s"literal $lit")
    }
  }

  test("all 12 wire restriction forms parse to their Restriction analogues") {
    val types = Map("a" -> (JV.IntT: NativeType), "b" -> (JV.Text: NativeType))
    def parse(r: String): Seq[Restriction] =
      Wire.parseAnnRequest(
        s"""{"vector": [0.0], "filter": {"restrictions": [$r]}}""", types).restrictions
    assert(parse("""{"type": "==", "lhs": "a", "rhs": 1}""") ==
      Seq(Restriction.Eq("a", 1)))
    assert(parse("""{"type": "IN", "lhs": "a", "rhs": [1, 2]}""") ==
      Seq(Restriction.In("a", Seq(1, 2))))
    assert(parse("""{"type": "<", "lhs": "a", "rhs": 5}""") ==
      Seq(Restriction.Lt("a", 5)))
    assert(parse("""{"type": "<=", "lhs": "a", "rhs": 5}""") ==
      Seq(Restriction.Lte("a", 5)))
    assert(parse("""{"type": ">", "lhs": "a", "rhs": 5}""") ==
      Seq(Restriction.Gt("a", 5)))
    assert(parse("""{"type": ">=", "lhs": "a", "rhs": 5}""") ==
      Seq(Restriction.Gte("a", 5)))
    assert(parse("""{"type": "()==()", "lhs": ["a", "b"], "rhs": [1, "x"]}""") ==
      Seq(Restriction.EqTuple(Seq("a", "b"), Seq(1, "x"))))
    assert(parse("""{"type": "()IN()", "lhs": ["a", "b"], "rhs": [[1, "x"], [2, "y"]]}""") ==
      Seq(Restriction.InTuple(Seq("a", "b"), Seq(Seq(1, "x"), Seq(2, "y")))))
    assert(parse("""{"type": "()<()", "lhs": ["a", "b"], "rhs": [1, "x"]}""") ==
      Seq(Restriction.LtTuple(Seq("a", "b"), Seq(1, "x"))))
    assert(parse("""{"type": "()<=()", "lhs": ["a", "b"], "rhs": [1, "x"]}""") ==
      Seq(Restriction.LteTuple(Seq("a", "b"), Seq(1, "x"))))
    assert(parse("""{"type": "()>()", "lhs": ["a", "b"], "rhs": [1, "x"]}""") ==
      Seq(Restriction.GtTuple(Seq("a", "b"), Seq(1, "x"))))
    assert(parse("""{"type": "()>=()", "lhs": ["a", "b"], "rhs": [1, "x"]}""") ==
      Seq(Restriction.GteTuple(Seq("a", "b"), Seq(1, "x"))))
  }

  test("limit: default 1, zero/negative/fractional rejected (Limit, lib.rs:273-293)") {
    val types = Map("a" -> (JV.IntT: NativeType))
    assert(Wire.parseAnnRequest("""{"vector": [0.0]}""", types).limit == 1)
    assert(Wire.parseAnnRequest("""{"vector": [0.0], "limit": 7}""", types).limit == 7)
    // 2^64+1 is a BigInteger node — longValue() would wrap it to 1; the
    // canConvertToLong guard must reject it instead of silently accepting
    for (bad <- Seq("0", "-3", "1.5", "\"x\"",
        "18446744073709551617", "-18446744073709551617")) {
      val e = intercept[QueryException](
        Wire.parseAnnRequest(s"""{"vector": [0.0], "limit": $bad}""", types))
      assert(e.status == 400, bad)
    }
  }

  test("malformed requests are 400s: bad JSON, missing vector, unknown restriction") {
    val types = Map("a" -> (JV.IntT: NativeType))
    for (bad <- Seq(
      "{not json",
      """{"limit": 1}""", // missing vector
      """{"vector": "nope"}""",
      """{"vector": [0.0], "filter": {"restrictions": [{"type": "~", "lhs": "a", "rhs": 1}]}}""",
      """{"vector": [0.0], "filter": {"restrictions": [{"type": "==", "lhs": "zz", "rhs": 1}]}}"""))
      assert(intercept[QueryException](Wire.parseAnnRequest(bad, types)).status == 400, bad)
  }

  test("non_finite_ann_values_serialize_as_f32_max (lib.rs:416 unit test)") {
    assert(Wire.saturate(Double.PositiveInfinity) == Float.MaxValue)
    assert(Wire.saturate(Double.NegativeInfinity) == Float.MinValue)
    assert(Wire.saturate(1e300) == Float.MaxValue)
    assert(Wire.saturate(3.5) == 3.5f)
  }

  test("NaN scores encode as JSON null, never the string \"NaN\"") {
    // serde_json writes non-finite floats as null; Jackson's default would
    // emit the non-standard quoted string "NaN" — pinned here
    import spark.implicits._
    val scored = Seq((1L, Double.NaN), (2L, 0.5)).toDF("doc_id", "score")
    val json = Wire.bm25ResponseJson(scored, "doc_id", Map("doc_id" -> JV.BigIntT))
    assert(!json.contains("\"NaN\""), json)
    val n = om.readTree(json)
    assert(n.get("scores").get(0).isNull)
    assert(n.get("scores").get(1).floatValue() == 0.5f)
  }

  test("bm25 request/response wire shapes (lib.rs:464-480)") {
    val (q, limit) = Wire.parseBm25Request("""{"query": "spark data", "limit": 5}""")
    assert(q == "spark data" && limit == 5)
    assert(Wire.parseBm25Request("""{"query": "x"}""")._2 == 1)
    assert(intercept[QueryException](Wire.parseBm25Request("""{"limit": 2}""")).status == 400)

    import spark.implicits._
    val scored = Seq((7L, 1.5), (3L, 0.5)).toDF("doc_id", "score")
    val json = om.readTree(Wire.bm25ResponseJson(scored, "doc_id",
      Map("doc_id" -> JV.BigIntT)))
    assert(json.get("primary_keys").get("doc_id").get(0).asLong() == 7L)
    assert(json.get("scores").get(0).floatValue() == 1.5f)
    assert(json.get("scores").size() == 2)
  }

  test("error taxonomy serializes with status + message") {
    val e = new QueryException(503, "index ks/idx not serving (build 40.0%)")
    val json = om.readTree(Wire.errorJson(e))
    assert(json.get("status").asInt() == 503)
    assert(json.get("message").asText().contains("not serving"))
  }

  test("request encode/decode round-trip is identity (client half of the wire)") {
    // the reference's request types derive Serialize AND Deserialize; a
    // seeded sweep over all 12 forms x mixed column types pins our pair
    val types: Map[String, NativeType] = Map(
      "i" -> JV.IntT, "l" -> JV.BigIntT, "t" -> JV.Text, "b" -> JV.BooleanT,
      "d" -> JV.DoubleT, "f" -> JV.FloatT, "dec" -> JV.DecimalT,
      "dt" -> JV.DateT, "v" -> JV.VarintT)
    val rnd = new scala.util.Random(42)
    def value(t: NativeType): Any = t match {
      case JV.IntT => rnd.nextInt()
      case JV.BigIntT => rnd.nextLong()
      case JV.Text => rnd.alphanumeric.take(rnd.nextInt(12)).mkString + "\"quote\u00e9"
      case JV.BooleanT => rnd.nextBoolean()
      case JV.DoubleT => rnd.nextDouble() * 1e6
      case JV.FloatT => rnd.nextFloat()
      case JV.DecimalT => BigDecimal(BigInt(rnd.nextLong() % 100000), rnd.nextInt(6))
      case JV.DateT => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(rnd.nextInt(30000).toLong))
      case JV.VarintT => BigDecimal(BigInt(rnd.nextLong()) * BigInt(rnd.nextInt(1000) + 1))
      case other => fail(s"unexpected $other")
    }
    val cols = types.keys.toVector
    def col(): String = cols(rnd.nextInt(cols.size))
    def scalarR(): Restriction = {
      val c = col()
      rnd.nextInt(6) match {
        case 0 => Restriction.Eq(c, value(types(c)))
        case 1 => Restriction.In(c, (0 to rnd.nextInt(3)).map(_ => value(types(c))))
        case 2 => Restriction.Lt(c, value(types(c)))
        case 3 => Restriction.Lte(c, value(types(c)))
        case 4 => Restriction.Gt(c, value(types(c)))
        case _ => Restriction.Gte(c, value(types(c)))
      }
    }
    def tupleR(): Restriction = {
      val cs = Vector.fill(2 + rnd.nextInt(2))(col()).distinct
      val vs = cs.map(c => value(types(c)))
      rnd.nextInt(6) match {
        case 0 => Restriction.EqTuple(cs, vs)
        case 1 => Restriction.InTuple(cs,
          (0 to rnd.nextInt(2)).map(_ => cs.map(c => value(types(c)))))
        case 2 => Restriction.LtTuple(cs, vs)
        case 3 => Restriction.LteTuple(cs, vs)
        case 4 => Restriction.GtTuple(cs, vs)
        case _ => Restriction.GteTuple(cs, vs)
      }
    }
    for (_ <- 1 to 200) {
      val req = graft.operators.Ann.AnnRequest(
        vector = Seq.fill(1 + rnd.nextInt(4))(rnd.nextFloat()),
        limit = 1 + rnd.nextInt(100),
        restrictions = Seq.fill(rnd.nextInt(4))(
          if (rnd.nextBoolean()) scalarR() else tupleR()),
        allowFiltering = rnd.nextBoolean())
      val json = Wire.annRequestJson(req, types)
      val back = Wire.parseAnnRequest(json, types)
      assert(back == req, json)
    }
    // bm25 pair too
    val (q2, l2) = Wire.parseBm25Request(Wire.bm25RequestJson("spark \"data\"", 9))
    assert(q2 == "spark \"data\"" && l2 == 9)
  }
}
