package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode-normalization expression (NFC/NFKC): Spark has no
  * built-in for canonical composition, yet corpus text arrives in mixed
  * composed/decomposed forms (`e`+U+0301 vs `é`) that break tokenization,
  * dedup digests and shingle hashes — normalizing at ingest is standard
  * training-data hygiene (the same reason DuckDB ships `nfc_normalize`).
  *
  * Already-normalized strings (the overwhelming majority of real text)
  * short-circuit through `Normalizer.isNormalized` — a single scan, no
  * allocation — so the expression's hot path is comparable to a pass-through.
  */
object NormalizeExpr {
  def nfc(c: Column): Column =
    GraftSqlBridge.column(UnicodeNormalize(GraftSqlBridge.expression(c), "NFC"))

  def nfkc(c: Column): Column =
    GraftSqlBridge.column(UnicodeNormalize(GraftSqlBridge.expression(c), "NFKC"))
}

case class UnicodeNormalize(child: Expression, form: String)
  extends UnaryExpression with CodegenFallback {

  // analysis-time rejection of non-string arguments: the SQL-registered
  // unicode_nfc/unicode_nfkc must fail in the analyzer, not as a per-task
  // ClassCastException mid-job (ExpectsInputTypes is private[sql] in
  // Spark 4, so the check is hand-rolled)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // NullType: a bare NULL literal is fine (always evaluates to null)
    case _: StringType | org.apache.spark.sql.types.NullType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  @transient private lazy val nf: Normalizer.Form = Normalizer.Form.valueOf(form)

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = u.toString
    if (Normalizer.isNormalized(s, nf)) u
    else UTF8String.fromString(Normalizer.normalize(s, nf))
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}
