package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression conversions —
  * the supported extension-point pattern for libraries that define native
  * Catalyst expressions against the classic (non-Connect) API.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Rebind a frame's logical plan to another session of the SAME
    * SparkContext (e.g. a `spark.newSession()` clone): the rebound frame
    * plans under the target session's SQLConf, so per-job conf overrides
    * stay invisible to queries planned in the source session. Cached
    * blocks still hit — the cache manager lives in the shared state. */
  def inSession(df: DataFrame, spark: SparkSession): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession],
      df.asInstanceOf[classic.Dataset[Row]].queryExecution.logical)

  /** True when no DataFrame/Dataset cache entries are registered — the
    * no-cache-leak serving contract asserted by DedupSpec (a long-lived
    * serving session must not accumulate blocks per query). */
  def cacheManagerEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty
}
