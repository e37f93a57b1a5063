package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to `org.apache.spark.sql`-private helpers.
  *
  * Spark 4's `Column` wraps a `ColumnNode` rather than a Catalyst
  * `Expression`; the conversion helpers live in `classic.ExpressionUtils`,
  * which is `private[sql]`. Declaring this object inside the
  * `org.apache.spark.sql` package tree is the standard extension-library
  * technique for reaching such internals (used by Delta, Sedona, etc.).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The classic (non-Connect) session implementation behind the API. */
  def classicSession(s: SparkSession): org.apache.spark.sql.classic.SparkSession =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  /** DataFrame from a logical plan (classic Dataset.ofRows). */
  def ofRows(
      s: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(classicSession(s), plan)

  /** The persisted RDD behind a `localCheckpoint`ed Dataset (its analyzed
    * plan is a LogicalRDD). `Dataset.unpersist` only clears CacheManager
    * entries — checkpoint blocks are RDD-level and need an RDD-level
    * unpersist, or they linger until the object is GC'd and show up as
    * leaked caches in `sparkContext.getPersistentRDDs`.
    */
  def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
}
