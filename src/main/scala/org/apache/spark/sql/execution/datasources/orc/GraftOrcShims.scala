package org.apache.spark.sql.execution.datasources.orc

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.hive.ql.io.sarg.SearchArgument
import org.apache.orc.TypeDescription
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Access to the `private[sql]` ORC helpers the graft-orc DSv2 connector
  * reuses (filter -> SearchArgument compilation and column-id mapping) —
  * the same seam Spark's own v2 ORC source uses.
  */
object GraftOrcShims {

  /** Compile data-source filters to an ORC SearchArgument; None when no
    * filter is convertible (the reference's A8 contract: unsupported
    * pieces degrade gracefully to no-pushdown).
    */
  def createFilter(schema: StructType, filters: Seq[Filter]): Option[SearchArgument] =
    OrcFilters.createFilter(schema, filters)

  /** Map the requested read columns to ORC column ids for one file.
    * Returns (colIds with -1 for missing, canPruneColumns).
    */
  def requestedColumnIds(
      isCaseSensitive: Boolean,
      dataSchema: StructType,
      readDataSchema: StructType,
      orcSchema: TypeDescription,
      conf: Configuration): Option[(Array[Int], Boolean)] =
    OrcUtils.requestedColumnIds(
      isCaseSensitive, dataSchema, readDataSchema, orcSchema, conf)
      .map { case (ids, canPrune) => (ids, canPrune) }

  /** Aggregate-pushdown eligibility + result schema (MIN/MAX/COUNT over
    * footer statistics): delegates to the shared
    * `AggregatePushDownUtils.getSchemaForPushedAggregation`, which rejects
    * unsupported aggregate functions and un-stats-able column types.
    */
  def aggSchemaForPushdown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation,
      dataSchema: StructType,
      partitionNames: Set[String]): Option[StructType] =
    org.apache.spark.sql.execution.datasources.AggregatePushDownUtils
      .getSchemaForPushedAggregation(agg, dataSchema, partitionNames, Nil)

  /** One partial-aggregate row for one file, computed purely from the ORC
    * footer statistics (no stripe I/O) — Spark's own per-file agg kernel.
    */
  def aggRowFromFooter(
      reader: org.apache.orc.Reader,
      filePath: String,
      dataSchema: StructType,
      partitionSchema: StructType,
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation,
      aggSchema: StructType,
      partitionValues: org.apache.spark.sql.catalyst.InternalRow)
      : org.apache.spark.sql.catalyst.InternalRow =
    OrcUtils.createAggInternalRowFromFooter(
      reader, filePath, dataSchema, partitionSchema, agg, aggSchema,
      partitionValues)

  /** Driver-side write preparation for the graft-orc DSv2 sink: delegate
    * to Spark's `OrcFileFormat.prepareWrite` (compression mapping, the
    * `orc.mapred.output.schema` conf key the row writer reads) and return
    * BOTH the serializable per-task writer factory and the prepared Hadoop
    * configuration — the factory's `newInstance` reads its settings from
    * the TaskAttemptContext conf, so the prepared conf must travel to the
    * executors with it.
    */
  def orcWriteSupport(spark: SparkSession, options: Map[String, String],
                      dataSchema: StructType): (OutputWriterFactory, Configuration) = {
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      spark.sessionState.newHadoopConf())
    // `orc.*` writer options (bloom filters, stride, ...) reach the ORC
    // writer through the Hadoop conf — the same propagation the v1 path
    // gets from newHadoopConfWithOptions; prepareWrite itself only
    // consumes the compression option
    options.foreach { case (k, v) =>
      if (k.toLowerCase(java.util.Locale.ROOT).startsWith("orc."))
        job.getConfiguration.set(k, v)
    }
    val factory = new OrcFileFormat().prepareWrite(spark, job, options, dataSchema)
    (factory, job.getConfiguration)
  }

  /** Result schema string for the ORC reader conf (also sets the conf key). */
  def orcResultSchemaString(
      canPruneCols: Boolean,
      dataSchema: StructType,
      resultSchema: StructType,
      partitionSchema: StructType,
      conf: Configuration): String =
    OrcUtils.orcResultSchemaString(
      canPruneCols, dataSchema, resultSchema, partitionSchema, conf)
}
