package graft

import graft.operators.{Restriction, RestrictionCompiler}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Restriction semantics across every native type on the F4 fixture —
  * mirrors the reference's exhaustive per-type filtering cases
  * (crates/validator/src/filtering.rs, tests/integration/vs_index.rs:230-1923):
  * each comparison operator per comparable type, plus the type-strict
  * rejection rule (P2: mismatched literal types are analysis errors, never
  * silent exclusion). */
class TypedRestrictionsSpec extends SparkSpec {
  import Restriction._

  private lazy val df: DataFrame =
    Fixtures.itemsTyped(spark, "/root/testdata/sf0.001").cache()

  private def count(rs: Restriction*): Long =
    df.filter(RestrictionCompiler.compileAll(df.schema, rs)).count()

  private def countWhere(c: org.apache.spark.sql.Column): Long = df.filter(c).count()

  test("text: eq and lexicographic range") {
    val sample = df.select("c_text").head.getString(0)
    assert(count(Eq("c_text", sample)) == countWhere(col("c_text") === sample))
    assert(count(Gt("c_text", "m")) == countWhere(col("c_text") > "m"))
  }

  test("integer widths: tinyint/smallint/int/bigint") {
    assert(count(Lte("c_tinyint", 25)) == countWhere(col("c_tinyint") <= 25))
    assert(count(Gt("c_smallint", 2000)) == countWhere(col("c_smallint") > 2000))
    assert(count(In("c_int", Seq(10, 20, 30))) ==
      countWhere(col("c_int").isin(10, 20, 30)))
    assert(count(Gte("c_bigint", 100L)) == countWhere(col("c_bigint") >= 100L))
  }

  test("float/double") {
    assert(count(Lt("c_float", 1000.0f)) == countWhere(col("c_float") < 1000.0f))
    assert(count(Gt("c_double", 1500.0)) == countWhere(col("c_double") > 1500.0))
  }

  test("decimal/varint: value-based comparison regardless of representation") {
    assert(count(Gt("c_decimal", BigDecimal("1200.50"))) ==
      countWhere(col("c_decimal") > 1200.50))
    assert(count(Lte("c_varint", BigDecimal(150))) ==
      countWhere(col("pk") <= 150))
  }

  test("boolean eq") {
    assert(count(Eq("c_boolean", true)) == countWhere(col("c_boolean") === true))
    assert(count(Eq("c_boolean", true)) + count(Eq("c_boolean", false)) == df.count())
  }

  test("temporal: date/time/timestamp ranges") {
    assert(count(Gte("c_date", java.sql.Date.valueOf("2024-01-01"))) == df.count())
    val mid = java.sql.Date.valueOf("2024-06-01")
    assert(count(Gte("c_date", mid)) == countWhere(col("c_date") >= mid))
    assert(count(Gte("c_date", mid)) > 0 && count(Gte("c_date", mid)) < df.count())
    // c_time is nanos-of-day (LongType per SURVEY §1.2)
    val noonNanos = 12L * 3600 * 1000000000L
    assert(count(Lt("c_time", noonNanos)) == countWhere(col("c_time") < noonNanos))
    val cut = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:01:40Z"))
    assert(count(Gte("c_timestamp", cut)) == countWhere(col("c_timestamp") >= cut))
  }

  test("uuid-ish and inet as canonical strings") {
    val u = df.select("c_uuidish").head.getString(0)
    assert(count(Eq("c_uuidish", u)) >= 1)
    assert(count(Gt("c_inet", "10.0.1")) == countWhere(col("c_inet") > "10.0.1"))
  }

  test("tuple forms over mixed types") {
    assert(count(LtTuple(Seq("c_int", "c_text"), Seq(25, "m"))) ==
      countWhere(col("c_int") < 25 ||
        (col("c_int") === 25 && col("c_text") < "m")))
  }

  test("no-match filters return empty, not error (filtering.rs:459)") {
    assert(count(Eq("c_int", -99999)) == 0)
    assert(count(InTuple(Seq("c_int", "c_boolean"), Seq(Seq(-1, true)))) == 0)
  }

  test("embedding filter columns carry through combined with ANN (F4 + T2)") {
    import graft.functions.VectorFunctions.Euclidean
    import graft.operators.Ann
    val qv = df.select("embedding").head.getSeq[Float](0)
    val res = Ann.plan(df, "embedding", Seq("pk"), Euclidean,
      Ann.AnnRequest(qv, limit = 5,
        restrictions = Seq(Gt("c_double", 1000.0), Eq("c_boolean", true)),
        allowFiltering = true))
    assert(res.count() <= 5)
    val filtered = df.filter(col("c_double") > 1000.0 && col("c_boolean") === true).count()
    assert(res.count() == math.min(5, filtered))
  }
}
