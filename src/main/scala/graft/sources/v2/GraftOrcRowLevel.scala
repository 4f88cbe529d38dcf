package graft.sources.v2

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, Write, WriteBuilder}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Group-based (copy-on-write) row-level operations — `UPDATE` and
  * `MERGE INTO` — for manifest tables.
  *
  * Spark's group-based rewrite reads the affected rows through THIS
  * operation's scan, reconstructs every row of the touched groups
  * (updated matched rows unioned with preserved unmatched rows), and
  * writes them back through this operation's write. The connector's part
  * of the contract is exact group replacement: the commit swaps the
  * files the scan PLANNED for the files the write produced, in one
  * atomic snapshot (`GraftOrcWrite.publish` replace mode). Everything
  * the scan pruned away — by partition filters, runtime group filtering
  * on partition columns, or sidecar ranges — keeps its file identity and
  * is never rewritten, so the rewrite cost scales with the touched data,
  * not the table. The pre-update snapshot stays time-travelable until
  * expiry, and a crash anywhere leaves unmanifested garbage, never a
  * half-updated table.
  */
class GraftOrcRowLevelOperation(tableSchema: StructType, tablePath: String,
                                partitionCols: Seq[String], cmd: Command,
                                branch: Option[String] = None)
    extends RowLevelOperation {

  // the one scan Spark builds for this operation; its post-pruning file
  // list IS the group set the write replaces
  @volatile private var scanBuilder: GraftOrcScanBuilder = _

  override def command(): Command = cmd

  override def description(): String =
    s"GraftOrcRowLevelOperation($cmd, $tablePath)"

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new java.util.HashMap[String, String](
      options.asCaseSensitiveMap())
    merged.put("path", tablePath)
    // a branch-scoped operation scans the BRANCH state — its write then
    // swaps against the same lineage (GraftOrcWrite branch commit)
    branch.foreach(b => merged.put("graft.branch", b))
    // group-replacement correctness: the pushed condition may prune
    // whole FILES (group granularity — pruned groups keep their
    // identity) but must NEVER reach the reader as a SearchArgument —
    // stripe/row-group skipping inside a SURVIVING file would silently
    // drop its non-matching rows from the rewrite
    merged.put("graft.row_level_scan", "true")
    scanBuilder = new GraftOrcScanBuilder(tableSchema,
      new CaseInsensitiveStringMap(merged))
    scanBuilder
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write =
        new GraftOrcWrite(tablePath, info.schema(),
          info.options().asCaseSensitiveMap().asScala.toMap ++
            branch.map("graft.branch" -> _),
          truncate = false, partitionCols,
          rowLevelMode = true,
          replaceScanned = () => {
            val sb = scanBuilder
            require(sb != null && sb.lastBuiltScan != null,
              "graft-orc: row-level write committed before its scan was " +
                "planned — the group-replacement contract is broken")
            // evaluated at COMMIT time: runtime group filters have
            // re-pruned the list by then
            Some(sb.lastBuiltScan.selectedFiles.map(_.path).toSet)
          })
    }
}
