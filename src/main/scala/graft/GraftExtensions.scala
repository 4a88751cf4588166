package graft

import graft.functions.{VectorDistance, VectorDistanceExpr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Catalyst integration point: registers the native vector functions for SQL
  * use, so `spark.sql("SELECT vector_l2sq(a, b) …")` plans the codegen'd
  * expression directly.
  *
  * Enable with:
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions) …
  * // or: --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(
      name: String,
      metric: VectorDistanceExpr.Metric): (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[VectorDistance].getName, name),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"$name expects exactly 2 arguments")
        VectorDistance(exprs(0), exprs(1), metric)
      })

  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction(fn("vector_l2sq", VectorDistanceExpr.L2Sq))
    extensions.injectFunction(fn("vector_dot", VectorDistanceExpr.Dot))
    extensions.injectFunction(fn("vector_hamming", VectorDistanceExpr.HammingSign))
    Seq("NFC", "NFKC").foreach { form =>
      val name = s"unicode_${form.toLowerCase}"
      extensions.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[graft.functions.UnicodeNormalize].getName, name),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 1, s"$name expects exactly 1 argument")
          graft.functions.UnicodeNormalize(exprs.head, form)
        }))
    }
  }
}
