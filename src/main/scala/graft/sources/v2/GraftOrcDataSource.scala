package graft.sources.v2

import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.hadoop.mapreduce.TaskType
import org.apache.hadoop.mapreduce.lib.input.FileSplit
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.hadoop.mapreduce.TaskAttemptID
import org.apache.orc.{OrcConf, OrcFile, TypeDescription}
import org.apache.orc.mapred.OrcInputFormat

import org.apache.spark.memory.MemoryMode
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.execution.datasources.orc.{GraftOrcShims, OrcColumnarBatchReader}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch

/** `graft-orc`: a DataSource V2 ORC connector making the reference's scan
  * contracts explicit (SURVEY.md §2.A):
  *
  *  - A1  `DataSourceRegister.shortName = "graft-orc"`  (file_format.rs:41-86)
  *  - A2  multi-file schema inference                    (file_format.rs:137-162)
  *  - A3  footer statistics -> `SupportsReportStatistics` (metadata.rs:60-86)
  *  - A5  pushdown negotiation on the ScanBuilder         (source.rs:54-295)
  *  - A6  column pruning -> per-file ORC column ids       (opener.rs:139-153)
  *  - A7  limit pushdown with exact mid-batch truncation  (opener.rs:211-266)
  *  - A8  Filter -> ORC SearchArgument compilation        (predicate.rs:53-245)
  *  - A9  INEXACT pushdown: stripe pruning only, every filter is returned
  *        as residual so Catalyst re-applies it row-level  (source.rs:257-289)
  *  - A10 per-file vectorized batch reader                (opener.rs:97-272)
  *  - A12 scan metrics: bytes/rows/batches/files          (metrics.rs:52-218)
  *
  * Scope: full type matrix including nested map/list/struct (Spark 4's
  * vectorized reader handles nested columns); no hive-partition columns
  * (plain file/dir layouts — partitioned layouts go through the built-in
  * source, see q29); large files fan out into stripe-aligned splits.
  * Decode is delegated to Spark's vectorized `OrcColumnarBatchReader` —
  * the point of the rebuild is the connector protocol, not a slower
  * re-implementation of the decoder.
  */
class GraftOrcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-orc"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val ps = GraftOrcDataSource.paths(options)
    require(ps.nonEmpty, "graft-orc: no path specified")
    // A2: merge schemas across ALL paths/files (conflict => AnalysisException)
    graft.sources.OrcTables.inferSchema(spark, ps)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new GraftOrcTable(schema, properties.asScala.toMap)
}

object GraftOrcDataSource {
  /** Resolve load paths: Spark passes `load(p1, p2, ...)` as a JSON string
    * array under the "paths" option (DataSourceV2Utils.getOptionsWithPaths)
    * and a single `load(p)` under "path".
    */
  def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val single = Option(options.get("path")).toSeq
    val multi = Option(options.get("paths")).toSeq.flatMap(parseJsonArray)
    (single ++ multi).distinct
  }

  private[v2] def parseJsonArray(s: String): Seq[String] = {
    val t = s.trim
    if (t.startsWith("[")) {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      mapper.readValue(t, classOf[Array[String]]).toSeq
    } else t.split(",").map(_.trim).filter(_.nonEmpty).toSeq
  }
}

class GraftOrcTable(tableSchema: StructType, props: Map[String, String])
    extends Table with SupportsRead {
  override def schema(): StructType = tableSchema
  override def name(): String =
    "graft-orc:" + props.getOrElse("path", props.getOrElse("paths", "?"))
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftOrcScanBuilder(tableSchema, options)
}

/** A5: the pushdown negotiation surface. */
class GraftOrcScanBuilder(dataSchema: StructType,
                          options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit {

  private var readSchema: StructType = dataSchema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Option[Int] = None

  // A6: column pruning
  override def pruneColumns(requiredSchema: StructType): Unit =
    readSchema = StructType(requiredSchema.fields.filter(f =>
      dataSchema.fieldNames.contains(f.name)))

  // A8 + A9: keep the convertible conjunction for stripe pruning, but
  // report EVERY filter as residual (inexact pushdown) — Catalyst keeps a
  // Filter above the scan, mirroring the reference's PushedDown::No.
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f =>
      GraftOrcShims.createFilter(dataSchema, Seq(f)).isDefined)
    filters // all residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  // A7: limit is only partially pushed (per-file early termination);
  // returning false keeps the global Limit operator above the scan.
  override def pushLimit(n: Int): Boolean = { limit = Some(n); false }

  override def build(): Scan = {
    val ps = GraftOrcDataSource.paths(options)
    if (ps.isEmpty) throw new IllegalArgumentException("graft-orc: no path")
    new GraftOrcScan(dataSchema, readSchema, pushed, limit, ps,
      options.asCaseSensitiveMap().asScala.toMap)
  }
}

case class GraftOrcInputPartition(filePath: String, start: Long, length: Long)
  extends InputPartition

class GraftOrcScan(dataSchema: StructType, override val readSchema: StructType,
                   pushedFilters: Array[Filter], limit: Option[Int],
                   paths: Seq[String], options: Map[String, String])
    extends Scan with Batch with SupportsReportStatistics {

  private def spark = SparkSession.active

  private lazy val files: Seq[(String, Long)] = paths.flatMap { path =>
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, conf)
    val st = fs.getFileStatus(p)
    val all =
      if (st.isDirectory) fs.listStatus(p).toSeq
        .filter(s => s.getPath.getName.endsWith(".orc"))
      else Seq(st)
    all.map(s => (s.getPath.toString, s.getLen))
  }

  override def toBatch: Batch = this

  override def description(): String =
    s"GraftOrcScan path=${paths.mkString(",")}, " +
      s"pushedFilters=${pushedFilters.mkString("[", ",", "]")}, limit=$limit"

  // A3: exact footer statistics (rows + bytes); like the reference, the
  // estimate degrades to size-only exactness when a filter is pushed
  // (src/source.rs:212-230 to_inexact): we still report the raw counts —
  // Catalyst treats DSv2 stats as estimates. Footer sweep is done once
  // and cached (Catalyst may ask repeatedly during planning).
  private lazy val footerStats: (Long, Long) = {
    val conf = spark.sparkContext.hadoopConfiguration
    var rows = 0L
    var bytes = 0L
    files.foreach { case (f, len) =>
      bytes += len
      val r = OrcFile.createReader(new Path(f), OrcFile.readerOptions(conf))
      try rows += r.getNumberOfRows finally r.close()
    }
    (rows, bytes)
  }

  override def estimateStatistics(): Statistics = {
    val (r, b) = footerStats
    new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.of(b)
      override def numRows(): OptionalLong = OptionalLong.of(r)
    }
  }

  // Stripe-aligned input splits: a large ORC file becomes multiple
  // partitions of ~targetSplitBytes, cut at stripe boundaries (a stripe is
  // the ORC unit of independent decode). Without this, one 1 GB file =
  // one task — the single-file parallelism killer at scale. Footer reads
  // happen once on the driver (same place Spark lists files).
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val targetSplitBytes = options.get("graft.split_size")
      .map(_.toLong).getOrElse(128L * 1024 * 1024)
    files.flatMap { case (f, len) =>
      if (len <= targetSplitBytes) {
        Seq(GraftOrcInputPartition(f, 0, len))
      } else {
        val r = OrcFile.createReader(new Path(f), OrcFile.readerOptions(conf))
        val stripes =
          try r.getStripes.asScala.map(s => (s.getOffset, s.getLength)).toSeq
          finally r.close()
        // greedily pack consecutive stripes into ~target-size ranges
        val splits = collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var start = -1L; var acc = 0L; var end = 0L
        stripes.foreach { case (off, slen) =>
          if (start < 0) { start = off; acc = 0L }
          acc += slen; end = off + slen
          if (acc >= targetSplitBytes) {
            splits += ((start, end - start)); start = -1L
          }
        }
        if (start >= 0) splits += ((start, end - start))
        if (splits.isEmpty) Seq(GraftOrcInputPartition(f, 0, len))
        else splits.map { case (s, l) => GraftOrcInputPartition(f, s, l) }.toSeq
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // same typed option semantics as the A13 contract (OrcTables)
    val parsed = graft.sources.OrcTables.parseOptions(options)
    val batchSize = parsed.batchSize.getOrElse(4096)
    // ship the session Hadoop configuration to executor-side readers
    // (fs.* credentials, orc.* tuning) — a bare new Configuration() would
    // drop s3a/gcs settings on a real cluster
    val serConf = org.apache.spark.GraftSparkBridge.serializableConf(
      spark.sparkContext.hadoopConfiguration)
    new GraftOrcPartitionReaderFactory(dataSchema, readSchema,
      if (parsed.pushdownPredicate) pushedFilters else Array.empty,
      limit, batchSize, serConf)
  }

  // A12: custom scan metrics, mirroring the reference's metric names.
  override def supportedCustomMetrics(): Array[CustomMetric] = Array(
    new GraftBytesScannedMetric, new GraftRowsDecodedMetric,
    new GraftBatchesProducedMetric, new GraftFilesReadMetric)
}

// metric classes need zero-arg constructors (Spark instantiates them by
// reflection when aggregating task metrics for the SQL UI)
class GraftBytesScannedMetric extends CustomSumMetric {
  override def name: String = "graftBytesScanned"
  override def description: String = "graft: bytes scanned"
}
class GraftRowsDecodedMetric extends CustomSumMetric {
  override def name: String = "graftRowsDecoded"
  override def description: String = "graft: rows decoded"
}
class GraftBatchesProducedMetric extends CustomSumMetric {
  override def name: String = "graftBatchesProduced"
  override def description: String = "graft: batches produced"
}
class GraftFilesReadMetric extends CustomSumMetric {
  override def name: String = "graftFilesRead"
  override def description: String = "graft: files read"
}

case class GraftTaskMetric(name: String, value: Long) extends CustomTaskMetric

/** A10: per-file vectorized reader with metric instrumentation and exact
  * limit truncation.
  */
class GraftOrcPartitionReaderFactory(dataSchema: StructType,
                                     readSchema: StructType,
                                     pushedFilters: Array[Filter],
                                     limit: Option[Int], batchSize: Int,
                                     serConf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean = true

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    throw new UnsupportedOperationException(
      "graft-orc is a columnar source; Spark should call createColumnarReader")

  override def createColumnarReader(
      partition: InputPartition): PartitionReader[ColumnarBatch] = {
    val p = partition.asInstanceOf[GraftOrcInputPartition]
    // per-reader copy of the shipped session conf (mutated below)
    val conf = new Configuration(serConf.value)
    // A9: SARG prunes stripes/row-groups only; row-level filtering stays
    // with Catalyst's residual Filter
    OrcConf.ALLOW_SARG_TO_FILTER.setBoolean(conf, false)

    val filePath = new Path(p.filePath)
    val orcReader = OrcFile.createReader(filePath, OrcFile.readerOptions(conf))
    val (colIds, canPrune) =
      try GraftOrcShims.requestedColumnIds(isCaseSensitive = false,
          dataSchema, readSchema, orcReader.getSchema, conf)
        .getOrElse((Array.empty[Int], true))
      finally orcReader.close()

    if (colIds.isEmpty && readSchema.nonEmpty) {
      // file has none of the requested columns -> empty reader
      return new PartitionReader[ColumnarBatch] {
        override def next(): Boolean = false
        override def get(): ColumnarBatch = throw new NoSuchElementException
        override def close(): Unit = ()
      }
    }

    val resultSchemaString = GraftOrcShims.orcResultSchemaString(
      canPrune, dataSchema, readSchema, new StructType(), conf)

    if (pushedFilters.nonEmpty) {
      GraftOrcShims.createFilter(dataSchema, pushedFilters).foreach { sarg =>
        OrcInputFormat.setSearchArgument(conf, sarg, dataSchema.fieldNames)
      }
    }

    val attemptId = new TaskAttemptID("graft", 0, TaskType.MAP, 0, 0)
    val ctx = new TaskAttemptContextImpl(conf, attemptId)
    val split = new FileSplit(filePath, p.start, p.length, Array.empty[String])
    val reader = new OrcColumnarBatchReader(batchSize, MemoryMode.ON_HEAP)
    reader.initialize(split, ctx)
    reader.initBatch(
      TypeDescription.fromString(resultSchemaString),
      readSchema.fields,
      colIds,
      Array.fill(readSchema.length)(-1),
      InternalRow.empty)

    new PartitionReader[ColumnarBatch] {
      private var rowsOut = 0L
      private var batches = 0L
      private var done = false
      private var current: ColumnarBatch = _

      override def next(): Boolean = {
        if (done) return false
        if (limit.exists(rowsOut >= _)) { done = true; return false }
        if (!reader.nextKeyValue()) { done = true; return false }
        current = reader.getCurrentValue
        // A7: slice the straddling batch to exactly `limit` rows
        limit.foreach { l =>
          val remaining = l - rowsOut
          if (current.numRows() > remaining) current.setNumRows(remaining.toInt)
        }
        rowsOut += current.numRows()
        batches += 1
        true
      }

      override def get(): ColumnarBatch = current
      override def close(): Unit = reader.close()

      override def currentMetricsValues(): Array[CustomTaskMetric] = Array(
        GraftTaskMetric("graftBytesScanned", p.length),
        GraftTaskMetric("graftRowsDecoded", rowsOut),
        GraftTaskMetric("graftBatchesProduced", batches),
        GraftTaskMetric("graftFilesRead", 1L))
    }
  }
}
