package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC read/write layer — the Spark-native equivalent of the reference
  * connector's registration + options surface.
  *
  * Reference mapping (file:line into /root/reference):
  *  - A1 format factory / "orc" extension binding: `src/file_format.rs:41-86`
  *  - A2 multi-file schema inference + merge:     `src/file_format.rs:137-162`
  *  - A13 read options (`orc.batch_size`, `orc.pushdown_predicate`,
  *    `orc.metadata_size_hint`):                  `src/options.rs:29-114`
  *  - A14 writer (reference stub only, `src/writer.rs:18-23`) — implemented
  *    here via Spark's built-in OrcOutputWriter.
  *
  * Design note: Spark's built-in vectorized ORC source already satisfies the
  * reference's observable contracts (stripe-level "inexact" pushdown with a
  * residual FilterExec above the scan, column pruning via requestedColumnIds,
  * limit short-circuit). This layer therefore translates the reference's
  * option/registration semantics onto that source instead of re-implementing
  * a DSv2 connector — idiomatic, codegen'd, and faster.
  */
object OrcTables {

  /** Typed view of the reference's `OrcReadOptions` (src/options.rs:29-47).
    * Unknown `orc.*` keys are ignored, mirroring src/options.rs:92-99.
    */
  final case class OrcReadOptions(
      batchSize: Option[Int] = None,        // orc.batch_size (reader vector size)
      pushdownPredicate: Boolean = true,    // orc.pushdown_predicate
      metadataSizeHint: Option[Long] = None, // orc.metadata_size_hint (sizes the one-ranged-read footer fetch in the graft-orc connector)
      mergeSchema: Boolean = false)

  /** Parse a string option map exactly like the reference's
    * `apply_format_options` (src/options.rs:62-114): typed errors on bad
    * values, unknown keys tolerated.
    */
  def parseOptions(opts: Map[String, String]): OrcReadOptions = {
    def intOpt(k: String): Option[Int] = opts.get(k).map { v =>
      try v.trim.toInt
      catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"Invalid value for $k: '$v' (expected integer)")
      }
    }
    def boolOpt(k: String, dflt: Boolean): Boolean = opts.get(k) match {
      case None => dflt
      case Some(v) => v.trim.toLowerCase match {
        case "true" | "1" => true
        case "false" | "0" => false
        case other => throw new IllegalArgumentException(
          s"Invalid value for $k: '$other' (expected boolean)")
      }
    }
    OrcReadOptions(
      batchSize = intOpt("orc.batch_size"),
      pushdownPredicate = boolOpt("orc.pushdown_predicate", dflt = true),
      metadataSizeHint = intOpt("orc.metadata_size_hint").map(_.toLong),
      mergeSchema = boolOpt("orc.merge_schema", dflt = false))
  }

  /** A configured reader over the built-in source (no per-scan option
    * semantics — see [[read]] for option routing).
    */
  def reader(spark: SparkSession, o: OrcReadOptions = OrcReadOptions(),
             explicitKeys: Set[String] = Set.empty): DataFrameReader = {
    val r = spark.read.format("orc")
    if (o.mergeSchema) r.option("mergeSchema", "true") else r
  }

  /** Option-aware read. `orc.batch_size` / `orc.pushdown_predicate` /
    * `orc.metadata_size_hint` have NO per-read equivalent on the built-in
    * source (only session confs, read at execution time — setting them
    * would leak into every later ORC read in the session). Reads carrying
    * those options therefore route through the graft-orc DSv2 connector,
    * where all three are genuinely per-scan
    * (`GraftOrcScan.createReaderFactory`; the hint sizes the one-ranged-
    * read footer fetch, see `GraftOrcTailReader`); plain reads stay on
    * the built-in source.
    */
  def read(spark: SparkSession, path: String,
           opts: Map[String, String] = Map.empty): DataFrame = {
    val o = parseOptions(opts) // validate eagerly: typed errors either way
    val perScan = opts.contains("orc.batch_size") ||
      opts.contains("orc.pushdown_predicate") ||
      opts.contains("orc.metadata_size_hint")
    if (perScan) {
      val r = spark.read.format("graft-orc")
      opts.foreach { case (k, v) => r.option(k, v) }
      r.load(path)
    } else reader(spark, o, opts.keySet).load(path)
  }

  /** Schema inference without reading data — footer-only, like
    * `read_orc_schema` (src/metadata.rs:35-58). Multi-file dirs merge
    * schemas (conflict => AnalysisException, mirroring
    * Schema::try_merge error semantics at src/file_format.rs:157-161).
    */
  def inferSchema(spark: SparkSession, path: String): StructType =
    inferSchema(spark, Seq(path))

  /** Multi-path variant: schemas merge across every path's files. With
    * `ignoreCorrupt`, unreadable footers are skipped during the merge
    * (forwarded to the built-in source's per-relation option) instead of
    * failing inference.
    */
  def inferSchema(spark: SparkSession, paths: Seq[String],
                  ignoreCorrupt: Boolean = false): StructType = {
    val r = reader(spark, OrcReadOptions(mergeSchema = true))
    (if (ignoreCorrupt) r.option("ignoreCorruptFiles", "true") else r)
      .load(paths: _*).schema
  }

  /** Register every `<name>.orc` file/dir under `dir` as a temp view —
    * the analogue of ListingTable registration
    * (tests/basic_reading.rs:124-160). Returns registered names.
    */
  def register(spark: SparkSession, dir: String,
               opts: Map[String, String] = Map.empty): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val st = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
    val names = st.toSeq
      .filter(s => s.getPath.getName.endsWith(".orc") || s.isDirectory)
      .map(_.getPath)
    names.map { p =>
      val name = p.getName.stripSuffix(".orc")
      read(spark, p.toString, opts).createOrReplaceTempView(name)
      name
    }
  }

  /** Writer — A14, which the reference leaves as a stub. Compression
    * defaults to snappy to match the reference fixtures
    * (alltypes.snappy.orc).
    */
  def write(df: DataFrame, path: String, compression: String = "snappy",
            mode: String = "overwrite"): Unit =
    df.write.mode(mode).option("compression", compression).orc(path)

  /** Tuned writer: stripe size controls split/pruning granularity, bloom
    * filters buy point-lookup stripe skips at ~1-2% size cost — the two
    * knobs that matter when laying out data for 100 TB scans.
    *
    * Spark's ORC writer reads these from the Hadoop configuration (not
    * from writer options), so they are set for the duration of the write
    * and restored after.
    */
  def writeTuned(df: DataFrame, path: String,
                 compression: String = "snappy",
                 stripeSizeBytes: Option[Long] = None,
                 bloomFilterColumns: Seq[String] = Nil,
                 mode: String = "overwrite"): Unit = {
    val hc = df.sparkSession.sparkContext.hadoopConfiguration
    val tuned = Seq(
      stripeSizeBytes.map("orc.stripe.size" -> _.toString),
      Option.when(bloomFilterColumns.nonEmpty)(
        "orc.bloom.filter.columns" -> bloomFilterColumns.mkString(","))).flatten
    val saved = tuned.map { case (k, _) => k -> Option(hc.get(k)) }
    try {
      tuned.foreach { case (k, v) => hc.set(k, v) }
      df.write.mode(mode).option("compression", compression).orc(path)
    } finally saved.foreach {
      case (k, Some(v)) => hc.set(k, v)
      case (k, None) => hc.unset(k)
    }
  }
}
