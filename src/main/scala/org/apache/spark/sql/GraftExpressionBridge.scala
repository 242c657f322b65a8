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

  /** Compile every WholeStageCodegen span of a plan EAGERLY, returning
    * the per-span (methodName, generated-source length, error) — the
    * probe behind the codegen-compilability pin: Spark demotes a span
    * whose generated code fails Janino (e.g. a method past the JVM's
    * 64 KB limit) to INTERPRETED execution with only a log line, which
    * is a silent multi-× slowdown on a 100 TB scan. Returns one entry
    * per span; `error` is None when it compiled.
    */
  def compileSpans(df: DataFrame): Seq[(String, Int, Option[String])] = {
    import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}
    import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
    val plan = df.queryExecution.executedPlan
    // AdaptiveSparkPlanExec is a leaf node — recurse into its current
    // physical plan or the spans would be invisible under AQE
    def spans(p: SparkPlan): Seq[WholeStageCodegenExec] = p.collect {
      case w: WholeStageCodegenExec => Seq(w)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        spans(a.executedPlan)
    }.flatten
    spans(plan).map { w =>
      val (_, source) = w.doCodeGen()
      val err =
        try { CodeGenerator.compile(source); None }
        catch { case e: Throwable =>
          Some(e.getMessage.linesIterator.toSeq.lastOption.getOrElse(e.toString))
        }
      (w.child.nodeName, source.body.length, err)
    }
  }
}
