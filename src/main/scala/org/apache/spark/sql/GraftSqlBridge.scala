package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ↔ Expression converters so
  * graft's native Catalyst expressions can expose a public Column API
  * (the standard extension-library technique for Spark 4's split
  * Column representation).
  */
object GraftSqlBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** The file-source [[sources.BaseRelation]] inside a DataFrame's
    * analyzed plan — what lets graft's pointer-resolving data source
    * ([[graft.sources.SnapshotSource]]) hand Spark the REAL
    * HadoopFsRelation of the resolved generation, so SQL reads over a
    * snapshot get native pushdown/pruning instead of a wrapper scan.
    * Defined here because [[execution.datasources.LogicalRelation]]
    * is an sql-internal plan node.
    */
  def fileRelationOf(df: Dataset[Row]): sources.BaseRelation =
    df.queryExecution.analyzed.collectFirst {
      case l: execution.datasources.LogicalRelation => l.relation
    }.getOrElse(throw new IllegalStateException(
      "no file relation in plan — expected a plain file-source read"))

  /** Re-wrap a batch DataFrame as a STREAMING one — what a DSv1
    * streaming [[execution.streaming.Source]]'s `getBatch` must
    * return (MicroBatchExecution asserts `isStreaming` on the plan).
    * `internalCreateDataFrame(isStreaming = true)` is the standard
    * source-implementation technique (Spark's own FileStreamSource
    * does exactly this); it is `private[sql]`, hence bridged here.
    */
  def asStreamingBatch(df: Dataset[Row]): Dataset[Row] = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
