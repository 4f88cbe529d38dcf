package graft

import org.apache.spark.sql.sources.Filter

/** Shared planner probe for the receipts: the planned partition count
  * of a graft-orc scan over `dir` with the given options and pushed
  * filters. Plan only — nothing executes. Used by the ScaleStress
  * file-pruning receipts (pass `graft.pack_small_files=false` there:
  * they count SURVIVING FILES, and bin packing would fold them into
  * shared tasks) and the bench packing probe (which counts exactly
  * that folding).
  */
private[graft] object PlanProbe {

  def plannedPartitions(dir: String, opts: Map[String, String],
                        filters: Filter*): Int = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val m = new CaseInsensitiveStringMap(
      (Map("path" -> dir) ++ opts).asJava)
    val schema = new graft.sources.v2.GraftOrcDataSource().inferSchema(m)
    val b = new graft.sources.v2.GraftOrcScanBuilder(schema, m)
    if (filters.nonEmpty) b.pushFilters(filters.toArray)
    b.build().asInstanceOf[graft.sources.v2.GraftOrcScan]
      .planInputPartitions().length
  }
}
