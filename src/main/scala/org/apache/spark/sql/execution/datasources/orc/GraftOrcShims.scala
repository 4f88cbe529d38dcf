package org.apache.spark.sql.execution.datasources.orc

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.hive.ql.io.sarg.SearchArgument
import org.apache.orc.TypeDescription
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
