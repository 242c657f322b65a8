package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression conversions so graft
  * can wrap its native codegen'd Catalyst expressions (e.g.
  * [[graft.functions.VecDot]]) as user-facing Columns without registering
  * them in a FunctionRegistry. This is the same mechanism Spark's own
  * `functions` object uses internally (classic/columnNodeSupport.scala).
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Plan-truncated DataFrame over an InternalRow RDD — what
    * `Dataset.checkpoint` builds internally. Used by
    * [[graft.core.CacheScope.checkpoint]] so iterative algorithms can
    * truncate lineage WITHOUT the external-Row decode/re-encode of the
    * public `createDataFrame(df.rdd, schema)` round trip (each row would
    * deserialize to a GenericRow and re-encode on every downstream
    * read — measurable per-round overhead in the connected-components
    * loop).
    */
  def dataFrameFromInternalRdd(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)
}
