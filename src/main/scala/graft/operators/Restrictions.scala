package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** The reference's 12 CQL-style restriction forms and their compilation to a
  * single Catalyst predicate `Column` (SURVEY §2.2 P1–P5).
  *
  * Reference: `crates/vector-store/src/lib.rs:507-558` (Restriction enum),
  * wire forms `crates/httpapi/src/lib.rs:320-366` ("==", "IN", "<", "()<()" …),
  * per-row evaluation `crates/vector-store/src/table/mod.rs:1182-1276`, tuple
  * lexicographic compare `table/mod.rs:1377-1391`.
  *
  * Spark-first design: the whole restriction set compiles to one `Column`
  * conjunction that Catalyst pushes down to the parquet scan. Tuple forms are
  * struct comparisons (Spark struct ordering is lexicographic by field
  * position, matching the reference's tuple compare).
  */
sealed trait Restriction {
  /** Columns this restriction references. */
  def columns: Seq[String]
  /** True for equality-shaped restrictions (Eq/In and their tuple forms) —
    * the split used by the router (`httproutes.rs:615-646`). */
  def isEquality: Boolean
}

object Restriction {
  final case class Eq(column: String, value: Any) extends Restriction {
    def columns = Seq(column); def isEquality = true
  }
  final case class In(column: String, values: Seq[Any]) extends Restriction {
    def columns = Seq(column); def isEquality = true
  }
  final case class Lt(column: String, value: Any) extends Restriction {
    def columns = Seq(column); def isEquality = false
  }
  final case class Lte(column: String, value: Any) extends Restriction {
    def columns = Seq(column); def isEquality = false
  }
  final case class Gt(column: String, value: Any) extends Restriction {
    def columns = Seq(column); def isEquality = false
  }
  final case class Gte(column: String, value: Any) extends Restriction {
    def columns = Seq(column); def isEquality = false
  }
  final case class EqTuple(cols: Seq[String], values: Seq[Any]) extends Restriction {
    def columns = cols; def isEquality = true
  }
  final case class InTuple(cols: Seq[String], values: Seq[Seq[Any]]) extends Restriction {
    def columns = cols; def isEquality = true
  }
  final case class LtTuple(cols: Seq[String], values: Seq[Any]) extends Restriction {
    def columns = cols; def isEquality = false
  }
  final case class LteTuple(cols: Seq[String], values: Seq[Any]) extends Restriction {
    def columns = cols; def isEquality = false
  }
  final case class GtTuple(cols: Seq[String], values: Seq[Any]) extends Restriction {
    def columns = cols; def isEquality = false
  }
  final case class GteTuple(cols: Seq[String], values: Seq[Any]) extends Restriction {
    def columns = cols; def isEquality = false
  }
}

/** Raised at analysis time for invalid restrictions — mirrors the reference's
  * HTTP 400 responses (`httproutes.rs:1056-1216`). */
final class RestrictionException(msg: String) extends IllegalArgumentException(msg)

object RestrictionCompiler {
  import Restriction._

  private def colType(schema: StructType, name: String): DataType =
    schema.fields.find(_.name == name).map(_.dataType).getOrElse(
      throw new RestrictionException(s"unknown column: $name"))

  /** A literal cast to the column's exact type — the analysis-time analogue of
    * the reference's strict typed-value conversion (`try_from_json`,
    * `httproutes.rs:1327-1477`): a value that cannot be represented in the
    * column type is rejected up front, never silently compared. */
  private def typedLit(schema: StructType, column: String, v: Any): Column =
    lit(v).cast(colType(schema, column))

  /** Literal struct whose field names/types match `struct(cols…)` so Spark's
    * struct comparison resolves without implicit coercion surprises. */
  private def tupleLit(schema: StructType, cols: Seq[String], vs: Seq[Any]): Column = {
    if (cols.length != vs.length)
      throw new RestrictionException(
        s"tuple arity mismatch: ${cols.length} columns vs ${vs.length} values")
    struct(cols.zip(vs).map { case (c, v) => typedLit(schema, c, v).as(c) }: _*)
  }

  private def tupleCol(cols: Seq[String]): Column = struct(cols.map(col): _*)

  /** Compile one restriction to a predicate `Column` against `schema`. */
  def compile(schema: StructType, r: Restriction): Column = r match {
    case Eq(c, v) => col(c) === typedLit(schema, c, v)
    case In(c, vs) => col(c).isin(vs.map(v => typedLit(schema, c, v)): _*)
    case Lt(c, v) => col(c) < typedLit(schema, c, v)
    case Lte(c, v) => col(c) <= typedLit(schema, c, v)
    case Gt(c, v) => col(c) > typedLit(schema, c, v)
    case Gte(c, v) => col(c) >= typedLit(schema, c, v)
    case EqTuple(cs, vs) => tupleCol(cs) === tupleLit(schema, cs, vs)
    case InTuple(cs, vss) =>
      vss.map(vs => tupleCol(cs) === tupleLit(schema, cs, vs))
        .reduceOption(_ || _).getOrElse(lit(false))
    case LtTuple(cs, vs) => tupleCol(cs) < tupleLit(schema, cs, vs)
    case LteTuple(cs, vs) => tupleCol(cs) <= tupleLit(schema, cs, vs)
    case GtTuple(cs, vs) => tupleCol(cs) > tupleLit(schema, cs, vs)
    case GteTuple(cs, vs) => tupleCol(cs) >= tupleLit(schema, cs, vs)
  }

  /** Compile a restriction set to one conjunction (empty set ⇒ `true`). */
  def compileAll(schema: StructType, rs: Seq[Restriction]): Column =
    rs.map(compile(schema, _)).reduceOption(_ && _).getOrElse(lit(true))

  def compileAll(df: DataFrame, rs: Seq[Restriction]): Column =
    compileAll(df.schema, rs)

  /** Restriction columns split into (equality, range) sets, preserving
    * first-appearance order — mirrors `httproutes.rs:615-646`. */
  def splitColumns(rs: Seq[Restriction]): (Seq[String], Seq[String]) = {
    val eq = rs.filter(_.isEquality).flatMap(_.columns).distinct
    val rng = rs.filterNot(_.isEquality).flatMap(_.columns).distinct
    (eq, rng)
  }
}
