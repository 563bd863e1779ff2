package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.SparkSession

/** Minimal bridge into Spark's `private[sql]` surface.
  *
  * Spark 4.x moved `Column` onto `ColumnNode` (sql-api) and hid the
  * Expression<->Column conversions in `org.apache.spark.sql.classic`.
  * Custom Catalyst expressions (graft.functions.HexToDecimal) still need
  * them, so this object — compiled inside the `org.apache.spark.sql`
  * package scope — re-exports exactly the two conversions plus function
  * registration. Nothing else of Spark's internals leaks out of here.
  */
object Internal {
  /** Wrap a raw Catalyst Expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column to its analyzed Catalyst Expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a builder under `name` in an existing session's function
    * registry (idempotent) so `expr("name(...)")`/`spark.sql` resolve it.
    */
  def register(
      spark: SparkSession,
      name: String,
      info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.functionRegistry
      .registerFunction(new FunctionIdentifier(name), info, builder)
  }
}
