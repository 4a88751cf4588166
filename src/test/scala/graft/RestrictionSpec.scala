package graft

import graft.operators.{Restriction, RestrictionCompiler, RestrictionException}
import org.apache.spark.sql.DataFrame

/** Restriction compiler semantics vs the reference's 12 forms
  * (lib.rs:507-558, table/mod.rs:1182-1276 / tuple compare 1377-1391). */
class RestrictionSpec extends SparkSpec {
  import Restriction._
  import spark.implicits._

  private lazy val df: DataFrame = Seq(
    (1, 10L, "a", 1.5),
    (1, 20L, "b", 2.5),
    (2, 10L, "c", 3.5),
    (2, 30L, "d", 4.5),
    (3, 40L, "e", 5.5)
  ).toDF("pk", "ck", "name", "score")

  private def keys(rs: Restriction*): Set[(Int, Long)] =
    df.filter(RestrictionCompiler.compileAll(df.schema, rs))
      .select("pk", "ck").as[(Int, Long)].collect().toSet

  test("Eq / In") {
    assert(keys(Eq("pk", 2)) == Set((2, 10L), (2, 30L)))
    assert(keys(In("ck", Seq(10L, 40L))) == Set((1, 10L), (2, 10L), (3, 40L)))
  }

  test("Lt / Lte / Gt / Gte") {
    assert(keys(Lt("score", 2.5)) == Set((1, 10L)))
    assert(keys(Lte("score", 2.5)) == Set((1, 10L), (1, 20L)))
    assert(keys(Gt("ck", 20L)) == Set((2, 30L), (3, 40L)))
    assert(keys(Gte("ck", 20L)) == Set((1, 20L), (2, 30L), (3, 40L)))
  }

  test("conjunction of forms") {
    assert(keys(Eq("pk", 1), Gt("ck", 10L)) == Set((1, 20L)))
  }

  test("tuple forms are lexicographic (first non-equal pair decides)") {
    // (pk, ck) > (1, 10): everything after the first row
    assert(keys(GtTuple(Seq("pk", "ck"), Seq(1, 10L))) ==
      Set((1, 20L), (2, 10L), (2, 30L), (3, 40L)))
    assert(keys(GteTuple(Seq("pk", "ck"), Seq(2, 10L))) ==
      Set((2, 10L), (2, 30L), (3, 40L)))
    assert(keys(LtTuple(Seq("pk", "ck"), Seq(2, 10L))) ==
      Set((1, 10L), (1, 20L)))
    assert(keys(LteTuple(Seq("pk", "ck"), Seq(2, 10L))) ==
      Set((1, 10L), (1, 20L), (2, 10L)))
    assert(keys(EqTuple(Seq("pk", "ck"), Seq(2, 30L))) == Set((2, 30L)))
    assert(keys(InTuple(Seq("pk", "ck"), Seq(Seq(1, 10L), Seq(3, 40L)))) ==
      Set((1, 10L), (3, 40L)))
  }

  test("tuple compile matches reference lexicographic compare on all pairs") {
    val rows = df.select("pk", "ck").as[(Int, Long)].collect().toSeq
    for ((p, c) <- rows) {
      val expected = rows.filter { case (p2, c2) =>
        p2 < p || (p2 == p && c2 < c)
      }.toSet
      assert(keys(LtTuple(Seq("pk", "ck"), Seq(p, c))) == expected,
        s"LtTuple vs ($p,$c)")
    }
  }

  test("unknown column / arity mismatch rejected at compile time") {
    intercept[RestrictionException] {
      RestrictionCompiler.compile(df.schema, Eq("nope", 1))
    }
    intercept[RestrictionException] {
      RestrictionCompiler.compile(df.schema, LtTuple(Seq("pk", "ck"), Seq(1)))
    }
  }

  test("splitColumns separates equality from range columns") {
    val (eq, rng) = RestrictionCompiler.splitColumns(Seq(
      Eq("pk", 1), In("name", Seq("a")), Gt("ck", 5L), Lte("score", 9.0)))
    assert(eq == Seq("pk", "name"))
    assert(rng == Seq("ck", "score"))
  }

  test("empty restriction set compiles to true") {
    assert(df.filter(RestrictionCompiler.compileAll(df.schema, Nil)).count() == 5)
  }
}
